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
