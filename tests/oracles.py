"""Pure-numpy oracles reproducing the reference's exact sequential semantics.

These are hand-written re-derivations (not copies) of the behaviors documented
in SURVEY.md section 2: the order-dependent voxelizer
(reference: utils/point_cloud_ops.py:7-104), the PFN decoration
(modules/pointpillars.py:115-140), and the threshold segmentation
(utils/utils.py:198-220).  They intentionally keep the reference's quirks —
including the `break` that drops every remaining point once `max_voxels` new
cells have been created — so tests can assert both parity and the documented
deviations.
"""

import numpy as np


def voxelize_oracle(points, voxel_size, pc_range, max_points, max_voxels,
                    reverse_index=True, reference_break=True):
    """Sequential first-touch voxelizer, reference semantics.

    Returns (voxels, coors, num_points) trimmed to the real pillar count,
    like the reference's dynamic-shape return (utils/point_cloud_ops.py:162-164).
    """
    points = np.asarray(points)
    voxel_size = np.asarray(voxel_size, dtype=np.float64)
    pc_range = np.asarray(pc_range, dtype=np.float64)
    grid = np.round((pc_range[3:] - pc_range[:3]) / voxel_size).astype(np.int64)

    cell_to_idx = {}
    voxels = np.zeros((max_voxels, max_points, points.shape[1]), points.dtype)
    coors = np.zeros((max_voxels, 3), np.int32)
    num_points = np.zeros((max_voxels,), np.int32)
    n_vox = 0
    for i in range(points.shape[0]):
        c = np.floor((points[i, :3] - pc_range[:3]) / voxel_size).astype(np.int64)
        if np.any(c < 0) or np.any(c >= grid):
            continue
        key = tuple(c)
        idx = cell_to_idx.get(key, -1)
        if idx == -1:
            if n_vox >= max_voxels:
                if reference_break:
                    break  # reference drops ALL remaining points here
                continue
            idx = n_vox
            n_vox += 1
            cell_to_idx[key] = idx
            coors[idx] = c[::-1] if reverse_index else c
        k = num_points[idx]
        if k < max_points:
            voxels[idx, k] = points[i]
            num_points[idx] += 1
    return voxels[:n_vox], coors[:n_vox], num_points[:n_vox]


def decorate_oracle(voxels, num_points, coors_xy, voxel_size, pc_range,
                    with_distance=False):
    """PFN decoration, reference semantics (modules/pointpillars.py:115-140)."""
    voxels = np.asarray(voxels, np.float64)
    m, p, f = voxels.shape
    mean = voxels[:, :, :3].sum(1, keepdims=True) / np.maximum(
        num_points, 1).astype(np.float64)[:, None, None]
    f_cluster = voxels[:, :, :3] - mean
    vx, vy = voxel_size[0], voxel_size[1]
    cx = coors_xy[:, 0].astype(np.float64) * vx + (vx / 2 + pc_range[0])
    cy = coors_xy[:, 1].astype(np.float64) * vy + (vy / 2 + pc_range[1])
    f_center = np.stack(
        [voxels[:, :, 0] - cx[:, None], voxels[:, :, 1] - cy[:, None]], -1)
    feats = [voxels, f_cluster, f_center]
    if with_distance:
        feats.append(np.linalg.norm(voxels[:, :, :3], axis=-1, keepdims=True))
    out = np.concatenate(feats, -1)
    mask = (np.arange(p)[None, :] < np.asarray(num_points)[:, None])
    return out * mask[..., None]


def pfn_forward_oracle(decorated, w, b, max_points, num_points):
    """Linear+ReLU+max over points, including the reference's padding-row
    quirk: rows >= num_points are zeros pre-linear, so they contribute
    relu(b) to the per-pillar max (modules/pointpillars.py:52-65 with
    use_norm=False).  `decorated` must already be padding-masked."""
    x = decorated @ w + b            # (M, P, C)
    x = np.maximum(x, 0.0)
    return x.max(axis=1)             # padding rows included, like torch


def scatter_canvas_oracle(pillar_feats, coors_zyx, n_pillars, ny, nx):
    """Dense scatter, reference semantics (modules/pointpillars.py:168-199):
    later pillars overwrite earlier on index collision."""
    c = pillar_feats.shape[-1]
    canvas = np.zeros((ny * nx, c), pillar_feats.dtype)
    for i in range(n_pillars):
        idx = coors_zyx[i, 1] * nx + coors_zyx[i, 2]
        canvas[idx] = pillar_feats[i]
    return canvas.reshape(ny, nx, c)


def segment_cloud_oracle(points, grid_range, cell_size, elevation_map,
                         threshold):
    """Threshold segmentation, reference semantics (utils/utils.py:198-220),
    including the quirky `0 < x` lower-bound exclusion of row/col 0."""
    out = np.zeros(points.shape[0])
    ix = np.floor((points[:, 0] - grid_range[0]) / cell_size).astype(np.int64)
    iy = np.floor((points[:, 1] - grid_range[1]) / cell_size).astype(np.int64)
    for i in range(points.shape[0]):
        x, y = ix[i], iy[i]
        if 0 < x < elevation_map.shape[0] and 0 < y < elevation_map.shape[1]:
            out[i] = 1.0 if points[i, 2] > elevation_map[x, y] + threshold else 0.0
        else:
            out[i] = -1.0
    return out


def lidar_to_img_oracle(points, grid_range, cell_size, fill, lidar_height):
    """Occupancy image, reference semantics (utils/utils.py:250-268): the
    z < 10 test runs on z + lidar_height (the reference hardcodes +1.732),
    bounds are the quirky 0 < idx."""
    h = int((grid_range[2] - grid_range[0]) / cell_size)
    w = int((grid_range[3] - grid_range[1]) / cell_size)
    img = np.zeros((h, w))
    ix = np.floor((points[:, 0] - grid_range[0]) / cell_size).astype(np.int64)
    iy = np.floor((points[:, 1] - grid_range[1]) / cell_size).astype(np.int64)
    for i in range(points.shape[0]):
        if points[i, 2] + lidar_height < 10:
            if 0 < ix[i] < h and 0 < iy[i] < w:
                img[ix[i], iy[i]] = fill
    return img


def lidar_to_heightmap_eval_oracle(points, grid_range, cell_size, max_points):
    """Mean-z heightmap, the EVALUATION variant's semantics
    (utils/utils.py:271-295): unshifted z < 10, 0 < idx bounds, and the
    ones-initialised divisor — mean = sum / (count + 1).  (The reference's
    `k-1 <= max_points` off-by-one writes out of bounds at exactly
    max_points kept points — undefined numba behavior we do not reproduce;
    callers keep per-cell counts below max_points.)"""
    h = int((grid_range[2] - grid_range[0]) / cell_size)
    w = int((grid_range[3] - grid_range[1]) / cell_size)
    sums = np.zeros((h, w))
    counts = np.zeros((h, w), np.int64)
    ix = np.floor((points[:, 0] - grid_range[0]) / cell_size).astype(np.int64)
    iy = np.floor((points[:, 1] - grid_range[1]) / cell_size).astype(np.int64)
    for i in range(points.shape[0]):
        x, y, z = ix[i], iy[i], points[i, 2]
        if z < 10 and 0 < x < h and 0 < y < w and counts[x, y] < max_points:
            sums[x, y] += z
            counts[x, y] += 1
    return sums / (counts + 1.0)


def eval_frame_oracle(pred_elevation, cloud, sem_label, grid_range, cell_size,
                      lidar_height, threshold=0.0, max_points=100,
                      ground_classes=(40, 44, 48, 49, 60, 72)):
    """One frame of the reference's metric harness, re-derived sequentially
    (evaluate_SemanticKITTI.py:94-235) given the model's elevation output.

    Mirrors the reference pipeline: the prediction segments the SHIFTED
    cloud (InferGround's in-place _shift_cloud, :114-116 — the z<10 mask
    image sees the same shift via its hardcoded +1.732) while the target
    heightmap uses unshifted z (:120-128).  Returns (iou, precision,
    recall, mse)."""
    # shift in float32, like the device pipeline and the reference's numba
    shifted = np.asarray(cloud, np.float32).copy()
    shifted[:, 2] += np.float32(lidar_height)

    pred_seg = segment_cloud_oracle(shifted, grid_range, cell_size,
                                    pred_elevation.T, threshold)
    gnd_seg = np.ones(sem_label.shape)                 # get_GndSeg (:94-100)
    gnd_seg[np.isin(sem_label, ground_classes)] = 0
    gnd_seg[np.isin(sem_label, [0, 1])] = -1

    keep = (pred_seg >= 0) & (gnd_seg >= 0)            # remove_outliers
    p = 1.0 - pred_seg[keep]
    g = 1.0 - gnd_seg[keep]
    inter = np.logical_and(g, p).sum()
    union = np.logical_or(g, p).sum()
    iou = inter / union
    prec = inter / p.sum()
    rec = inter / g.sum()

    gnd_pts = np.asarray(cloud, np.float32)[
        np.isin(sem_label, ground_classes)][:, :3]     # get_target_gnd
    mask = lidar_to_img_oracle(gnd_pts, grid_range, cell_size, 1.0,
                               lidar_height)
    hm = lidar_to_heightmap_eval_oracle(gnd_pts, grid_range, cell_size,
                                        max_points)
    mse = (np.square(hm - pred_elevation.T) * mask).sum() / mask.sum()
    return float(iou), float(prec), float(rec), float(mse)
