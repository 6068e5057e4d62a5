"""Post-processing ops: threshold segmentation, occupancy/height maps,
frustum culling — vectorized jax replacements for the reference's numba
kernels (reference: utils/utils.py:198-295,
dataset_utils/gnd_data_generator/dataset_generator_utils.py:146-232,
dataset_utils/gnd_data_generator/frustrum_culling.py:23-102).

All reference quirks are reproduced where they are semantics, not bugs:

* the `0 < x` LOWER-bound exclusion drops points in grid row/col 0
  (utils/utils.py:213) — kept, because every reference entry point and
  therefore every published metric depends on it;
* `lidar_to_heightmap` exists in two variants: the evaluation one whose cell
  mean divides by count+1 (ones-initialised divisor, utils/utils.py:283-295)
  and the corrected generator one (dataset_generator_utils.py:167-192).
  `lidar_to_heightmap(..., reference_eval_bug=True)` reproduces the former
  for metric parity; the default is the corrected semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cell_indices(points, grid_range, cell_size):
    """floor((xy - grid_min) / cell) as int32 (reference utils.py:204-207)."""
    gx = jnp.asarray(grid_range[0], points.dtype)
    gy = jnp.asarray(grid_range[1], points.dtype)
    ix = jnp.floor((points[:, 0] - gx) / cell_size).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - gy) / cell_size).astype(jnp.int32)
    return ix, iy


def _lookup_2d(map2d, ix, iy):
    """Per-point map2d[ix, iy] lookup.

    On TPU, XLA lowers a large scalar gather to a serialized ~10 ns/row loop
    (~1.1 ms at 114k points); the one-hot MXU selector form replaces it.
    Exactness: each one-hot row selects a single f32 value with weight 1.0,
    and every term the 'highest'-precision decomposition drops is multiplied
    by 0 — the result is the selected value bit-exactly.  The gather stays
    for small inputs and CPU (tests/oracles).

    A VMEM-streaming Mosaic selector variant was measured SLOWER than this
    XLA form on the v5e (+65 us at 100x100, +163 us at 250x250 over the
    flagship 102400-point lookup) and deleted — docs/KERNELS.md "in-VMEM
    lookup post-mortem"."""
    h, w = map2d.shape
    n = ix.shape[0]
    if jax.default_backend() != "tpu" or n < 4096:
        return map2d.reshape(-1)[ix * w + iy]
    return _lookup_2d_xla_onehot(map2d, ix, iy)


def _lookup_2d_xla_onehot(map2d, ix, iy):
    """The MXU one-hot selector form (see `_lookup_2d`)."""
    ohx = (ix[:, None] == jnp.arange(map2d.shape[0], dtype=ix.dtype)
           ).astype(map2d.dtype)
    rows = jnp.dot(ohx, map2d, precision=jax.lax.Precision("highest"))
    ohy = (iy[:, None] == jnp.arange(map2d.shape[1], dtype=iy.dtype)
           ).astype(map2d.dtype)
    return jnp.sum(rows * ohy, axis=1)


def segment_cloud(points, grid_range, cell_size, elevation_map,
                  threshold: float = 0.2):
    """Per-point {1: obstacle, 0: ground, -1: out of grid} labels.

    `elevation_map` is indexed [x_cell, y_cell] — i.e. the transposed model
    output, matching the reference call convention
    (predict_ground.py:168 passes pred_gnd.T).
    """
    ix, iy = _cell_indices(points, grid_range, cell_size)
    h, w = elevation_map.shape
    inside = (ix > 0) & (ix < h) & (iy > 0) & (iy < w)
    ixc = jnp.clip(ix, 0, h - 1)
    iyc = jnp.clip(iy, 0, w - 1)
    elev = _lookup_2d(elevation_map, ixc, iyc)
    obstacle = points[:, 2] > elev + threshold
    return jnp.where(inside, obstacle.astype(jnp.float32), -1.0)


def segment_cloud_masked(points, grid_range, cell_size, elevation_map,
                         threshold: float = 0.2):
    """Like `segment_cloud` but returns (labels, obstacle_mask) so callers can
    compact an obstacle-only cloud without a second pass — the fixed-shape
    analog of the reference's in-place compaction
    (utils/utils.py:222-248, which also contains an indexing bug: it copies
    from `points_obstacle[i]` instead of `points[i]`; we do not reproduce it).
    """
    labels = segment_cloud(points, grid_range, cell_size, elevation_map,
                           threshold)
    return labels, labels == 1.0


def compact_obstacles(points, obstacle_mask):
    """Stable-compact obstacle points to the front; returns (cloud, count).

    Fixed-shape replacement for the reference's dynamic obstacle cloud:
    rows past `count` are zeros."""
    n = points.shape[0]
    order = jnp.argsort(~obstacle_mask, stable=True)  # obstacles first
    compacted = points[order]
    count = jnp.sum(obstacle_mask.astype(jnp.int32))
    row_ids = jnp.arange(n)[:, None]
    return jnp.where(row_ids < count, compacted, 0), count


def lidar_to_img(points, grid_range, cell_size, fill: float = 1.0,
                 lidar_height: float = 0.0, out_shape=None):
    """Occupancy image: cells touched by any point with z+lidar_height < 10
    get `fill` (reference utils/utils.py:250-268 with its hardcoded +1.732
    generalized to `lidar_height`; bounds are the quirky 0 < idx)."""
    if out_shape is None:
        h = int(round((grid_range[2] - grid_range[0]) / cell_size))
        w = int(round((grid_range[3] - grid_range[1]) / cell_size))
    else:
        h, w = out_shape
    ix, iy = _cell_indices(points, grid_range, cell_size)
    z = points[:, 2] + lidar_height
    ok = (z < 10) & (ix > 0) & (ix < h) & (iy > 0) & (iy < w)
    flat = jnp.where(ok, ix * w + iy, h * w)
    img = jnp.zeros((h * w + 1,), jnp.float32).at[flat].set(fill, mode="drop")
    return img[: h * w].reshape(h, w)


def lidar_to_heightmap(points, grid_range, cell_size, max_points: int = 100,
                       lidar_height: float = 0.0,
                       reference_eval_bug: bool = False, out_shape=None):
    """Mean-z per cell over (up to) the first `max_points` points.

    Default semantics follow the corrected generator variant
    (dataset_generator_utils.py:167-192): 0 <= idx bounds, divisor = true
    kept count (empty cells -> 0).  With `reference_eval_bug=True` it
    reproduces the evaluation variant (utils/utils.py:271-295): 0 < idx
    bounds and mean = sum / (count + 1) — needed for bit-parity with the
    reference's published MSE metric.

    Returns (heightmap, counts).
    """
    if out_shape is None:
        h = int(round((grid_range[2] - grid_range[0]) / cell_size))
        w = int(round((grid_range[3] - grid_range[1]) / cell_size))
    else:
        h, w = out_shape
    ix, iy = _cell_indices(points, grid_range, cell_size)
    z = points[:, 2] + lidar_height
    if reference_eval_bug:
        inside = (ix > 0) & (ix < h) & (iy > 0) & (iy < w)
    else:
        inside = (ix >= 0) & (ix < h) & (iy >= 0) & (iy < w)
    ok = (z < 10) & inside
    flat = jnp.where(ok, ix * w + iy, h * w)

    # occurrence rank within cell (stream order), to honour max_points
    order = jnp.argsort(flat, stable=True)
    sorted_cell = flat[order]
    pos = jnp.arange(flat.shape[0], dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_cell[1:] != sorted_cell[:-1]])
    start = jax.lax.cummax(jnp.where(is_start, pos, 0))
    rank = jnp.zeros_like(pos).at[order].set(pos - start)
    kept = ok & (rank < max_points)

    flat_kept = jnp.where(kept, flat, h * w)
    sums = jnp.zeros((h * w + 1,), jnp.float32).at[flat_kept].add(
        jnp.where(kept, z, 0.0))
    counts = jnp.zeros((h * w + 1,), jnp.int32).at[flat_kept].add(
        kept.astype(jnp.int32))
    sums, counts = sums[: h * w], counts[: h * w]
    if reference_eval_bug:
        hm = sums / (counts.astype(jnp.float32) + 1.0)
    else:
        hm = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), 0.0)
    return hm.reshape(h, w), counts.reshape(h, w)


def semantically_segment_cloud(points, grid_range, cell_size, elevation_map,
                               lidar_height: float, threshold: float = 0.08):
    """(N, 3) rgb-style labels with channel 0 = {1,0,-1}
    (reference dataset_generator_utils.py:209-232)."""
    shifted = points.at[:, 2].add(lidar_height) if hasattr(points, "at") else points
    labels = segment_cloud(shifted, grid_range, cell_size, elevation_map,
                           threshold)
    rgb = jnp.zeros((points.shape[0], 3), jnp.float32)
    return rgb.at[:, 0].set(labels)


def remove_outliers(pred_seg, gt_seg):
    """Joint validity mask for metric computation: keep points labelled in
    BOTH segmentations, inverted so ground == 1
    (reference evaluate_SemanticKITTI.py:102-111).  Returns
    (pred_ground, gt_ground, valid_mask) with invalid rows zeroed."""
    valid = (pred_seg >= 0) & (gt_seg >= 0)
    return (
        jnp.where(valid, 1.0 - pred_seg, 0.0),
        jnp.where(valid, 1.0 - gt_seg, 0.0),
        valid,
    )


# ---------------------------------------------------------------------------
# frustum culling (vectorized plane tests)
# ---------------------------------------------------------------------------

def frustum_planes(observer_position, observer_direction, fov_degrees,
                   near_clip, far_clip, aspect_ratio=1.0):
    """Six frustum planes as (origins (6,3), normals (6,3)); same basis
    construction as the reference (frustrum_culling.py:24-67)."""
    import numpy as np

    pos = np.asarray(observer_position, np.float64)
    fwd = np.asarray(observer_direction, np.float64)
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross([0.0, 0.0, -1.0], fwd)
    up = -np.cross(fwd, right)
    fov = np.radians(fov_degrees)

    nc = pos + fwd * near_clip
    fc = pos + fwd * far_clip
    nh = np.tan(fov / 2) * near_clip
    nw = nh * aspect_ratio
    fh = np.tan(fov / 2) * far_clip
    fw = fh * aspect_ratio

    ntl = nc + up * nh - right * nw
    ntr = nc + up * nh + right * nw
    nbl = nc - up * nh - right * nw
    nbr = nc - up * nh + right * nw
    ftl = fc + up * fh - right * fw
    ftr = fc + up * fh + right * fw
    fbl = fc - up * fh - right * fw
    fbr = fc - up * fh + right * fw

    planes = [
        (ntl, ntr, nbl),   # near
        (ftr, ftl, fbr),   # far
        (ntl, ftl, ftr),   # top
        (ntr, ftr, fbr),   # right
        (nbr, fbr, fbl),   # bottom
        (nbl, fbl, ftl),   # left
    ]
    origins, normals = [], []
    for p0, p1, p2 in planes:
        n = np.cross(p1 - p0, p2 - p0)
        n = n / np.linalg.norm(n)
        origins.append(p0)
        normals.append(n)
    return np.stack(origins), np.stack(normals)


def filter_points_by_frustum(points, observer_position, observer_direction,
                             fov, aspect_ratio, near, far):
    """Boolean inside-frustum mask for (N, >=3) points — one (N, 6) dot
    product instead of the reference's per-point loop
    (frustrum_culling.py:92-102)."""
    origins, normals = frustum_planes(
        observer_position, observer_direction, fov, near, far, aspect_ratio)
    o = jnp.asarray(origins, points.dtype)
    n = jnp.asarray(normals, points.dtype)
    d = jnp.einsum("npk,pk->np",
                   points[:, None, :3] - o[None, :, :], n)
    return jnp.all(d >= 0, axis=1)
