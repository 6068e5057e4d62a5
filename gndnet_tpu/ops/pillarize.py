"""Fixed-shape, fully-jittable pillarization.

TPU-native replacement for the reference's sequential numba voxelizer
(`points_to_voxel` + `_points_to_voxel_reverse_kernel`,
reference: utils/point_cloud_ops.py:7-167).  The reference builds a dynamic
number of pillars on the host with a full-grid dedup map; XLA requires static
shapes, so here every output is padded to (`max_voxels`, `max_points`) with an
explicit validity mask — semantically identical for the model, which already
masks padding (reference: modules/pointpillars.py:135-140).

Two paths are provided:

1. `pillarize` — reference-API-compatible: returns (voxels, coors, num_points)
   with the reference's semantics: zyx coordinate order, pillars ordered by
   first occurrence of their cell in the point stream, at most `max_points`
   points kept per pillar (in point order), at most `max_voxels` pillars kept
   (earliest-created first).
   (Known deliberate difference: when a scan produces more than `max_voxels`
   distinct cells the reference *breaks* its loop and silently drops every
   remaining point, even points of already-created pillars
   (utils/point_cloud_ops.py:43-45); we instead keep all points of the
   `max_voxels` earliest-created pillars — strictly more data, same shapes.)

2. The fused path (`bin_points`/`bin_points_batch` -> `count_and_rank` ->
   `decorate_points` -> `scatter_max_canvas`): per-point decoration over the
   flat point stream so the PFN linear layer becomes one large MXU matmul
   followed by a masked segment-max straight onto the pseudo-image canvas —
   the (max_voxels, max_points) intermediate never exists.  Batched scans
   share one flat segment space (cell ids offset per batch item), so every
   step is a single sort/segment op with no vmapped scatters.

All functions are shape-polymorphic in N and jit-friendly (no data-dependent
control flow).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp


class PillarGeometry(NamedTuple):
    """Static grid geometry (hashable; safe to close over in jit)."""

    pc_range: tuple          # (xmin, ymin, zmin, xmax, ymax, zmax)
    voxel_size: tuple        # (vx, vy, vz)
    grid_size: tuple         # (nx, ny, nz)

    @classmethod
    def from_config(cls, cfg) -> "PillarGeometry":
        return cls(tuple(cfg.pc_range), tuple(cfg.voxel_size), tuple(cfg.grid_size))

    @property
    def nx(self):
        return self.grid_size[0]

    @property
    def ny(self):
        return self.grid_size[1]

    @property
    def nz(self):
        return self.grid_size[2]

    @property
    def num_cells_3d(self):
        return self.nx * self.ny * self.nz

    @property
    def num_cells_2d(self):
        return self.nx * self.ny


class PillarBatch(NamedTuple):
    """Fixed-shape pillarization result (reference-style API)."""

    voxels: jax.Array       # (max_voxels, max_points, F) float
    coors: jax.Array        # (max_voxels, 3) int32, zyx order (reverse_index)
    num_points: jax.Array   # (max_voxels,) int32, min(cell population, max_points)
    mask: jax.Array         # (max_voxels,) bool, True for real pillars
    n_pillars: jax.Array    # () int32, number of real pillars


class PointContext(NamedTuple):
    """Per-point binning over a flat point stream (possibly several scans).

    `cell` is a flat segment id: scan b's 3-D cell c maps to b * C3 + c, and
    every invalid point maps to the shared drop segment `num_segments - 1`.
    """

    cx: jax.Array            # (M,) int32 x-cell
    cy: jax.Array            # (M,) int32 y-cell
    cz: jax.Array            # (M,) int32 z-cell
    cell: jax.Array          # (M,) int32 flat segment id
    valid: jax.Array         # (M,) bool, inside the pc_range box
    num_segments: int        # static: batch * num_cells_3d + 1
    batch: int               # static scan count folded into the flat stream


def _bin(points, geom: PillarGeometry):
    """Per-axis floor binning with range check.

    Matches reference utils/point_cloud_ops.py:33-38: c = floor((p - lo)/v),
    invalid when c < 0 or c >= grid_size (upper edge exclusive).

    Computed as three independent (M,) column chains, NOT one (M, 3) chain:
    a 3-wide minor dim pads to the 128-lane tile on TPU, so every
    elementwise op on (M, 3) writes ~42x the useful bytes (measured ~1.1 ms
    of the B=16 kitti_sem bin stage); the column slices fuse into the
    arithmetic and the (M,) chains run at full lane occupancy.
    """
    out = []
    valid = None
    for k in range(3):
        c = jnp.floor((points[..., k] - geom.pc_range[k])
                      / geom.voxel_size[k])
        ok = (c >= 0) & (c < geom.grid_size[k])
        valid = ok if valid is None else (valid & ok)
        out.append(c.astype(jnp.int32))
    return out[0], out[1], out[2], valid


def bin_points(points: jax.Array, geom: PillarGeometry) -> PointContext:
    """Bin one scan: points (N, F) -> PointContext with batch == 1."""
    cx, cy, cz, valid = _bin(points, geom)
    nx, ny, _ = geom.grid_size
    c3 = geom.num_cells_3d
    cell = (cz * ny + cy) * nx + cx
    cell = jnp.where(valid, cell, c3)
    return PointContext(cx, cy, cz, cell, valid, c3 + 1, 1)


def bin_points_batch(points_b: jax.Array, geom: PillarGeometry) -> PointContext:
    """Bin a batch of scans (B, N, F) into one flat (B*N,) segment space."""
    b, n, _ = points_b.shape
    flat = points_b.reshape(b * n, -1)
    cx, cy, cz, valid = _bin(flat, geom)
    nx, ny, _ = geom.grid_size
    c3 = geom.num_cells_3d
    batch_ids = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    cell = batch_ids * c3 + (cz * ny + cy) * nx + cx
    cell = jnp.where(valid, cell, b * c3)
    return PointContext(cx, cy, cz, cell, valid, b * c3 + 1, b)


class PointRanks(NamedTuple):
    rank: jax.Array          # (M,) int32 occurrence index of the point inside its cell
    kept: jax.Array          # (M,) bool valid & rank < max_points
    cell_count: jax.Array    # (num_segments,) int32 kept points per cell
    raw_count: jax.Array     # (num_segments,) int32 all valid points per cell


def point_ranks(ctx: PointContext) -> jax.Array:
    """(M,) occurrence rank of every point within its cell, stream order.

    Replaces the reference's sequential `num < max_points` counter
    (utils/point_cloud_ops.py:49-52) with a stable sort by segment id: stable
    sorting preserves point order within a cell, so rank = position - run
    start."""
    m = ctx.cell.shape[0]
    order = jnp.argsort(ctx.cell, stable=True)
    sorted_cell = ctx.cell[order]
    pos = jnp.arange(m, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_cell[1:] != sorted_cell[:-1]]
    )
    start_pos = jax.lax.cummax(jnp.where(is_start, pos, 0))
    rank_sorted = pos - start_pos
    return jnp.zeros((m,), jnp.int32).at[order].set(rank_sorted)


def count_and_rank(ctx: PointContext, max_points: int) -> PointRanks:
    """rank + kept mask + per-cell kept/raw counts (test/reference-API path;
    the fused model path uses `fused_frontend`, which folds the counting into
    the decoration scatter)."""
    m = ctx.cell.shape[0]
    order = jnp.argsort(ctx.cell, stable=True)
    sorted_cell = ctx.cell[order]
    pos = jnp.arange(m, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_cell[1:] != sorted_cell[:-1]]
    )
    start_pos = jax.lax.cummax(jnp.where(is_start, pos, 0))
    rank_sorted = pos - start_pos
    rank = jnp.zeros((m,), jnp.int32).at[order].set(rank_sorted)

    kept = ctx.valid & (rank < max_points)
    cell_count = jnp.zeros((ctx.num_segments,), jnp.int32).at[ctx.cell].add(
        kept.astype(jnp.int32)
    )
    raw_count = jnp.zeros((ctx.num_segments,), jnp.int32).at[ctx.cell].add(
        ctx.valid.astype(jnp.int32)
    )
    return PointRanks(rank, kept, cell_count, raw_count)


def fused_frontend(
    points: jax.Array,
    ctx: PointContext,
    geom: PillarGeometry,
    max_points: int,
    with_distance: bool = False,
    exact_point_cap: bool = True,
) -> tuple:
    """Minimal-op front half of the fused path.

    Computes the decorated per-point features, the kept mask, and the per-cell
    kept count with exactly: [one argsort + scans when exact_point_cap] +
    ONE scatter-add (xyz and the count fused as a 4th channel) + ONE gather —
    on this hardware duplicate-index scatters and gathers dominate the whole
    network, so op count is the budget that matters.

    `exact_point_cap=False` (serving option) skips the rank/sort entirely and
    reduces over ALL in-range points of each cell — a documented deviation
    from the reference's first-`max_points` truncation; train and serve with
    the same setting.

    Returns (decorated (M, D), kept (M,), cell_count (num_segments-1,) int32).
    """
    ftype = points.dtype
    if exact_point_cap:
        rank = point_ranks(ctx)
        kept = ctx.valid & (rank < max_points)
    else:
        kept = ctx.valid
    keptf = kept.astype(ftype)[:, None]

    xyz = points[:, :3]
    stats = jnp.zeros((ctx.num_segments, 4), ftype).at[ctx.cell].add(
        jnp.concatenate([xyz * keptf, keptf], axis=-1))
    per_point = stats[ctx.cell]                      # ONE gather: sums + count
    count_pp = per_point[:, 3:4]
    mean_pp = per_point[:, :3] / jnp.maximum(count_pp, 1.0)
    f_cluster = xyz - mean_pp

    vx, vy = geom.voxel_size[0], geom.voxel_size[1]
    x_offset = vx / 2.0 + geom.pc_range[0]
    y_offset = vy / 2.0 + geom.pc_range[1]
    f_center = jnp.stack(
        [
            points[:, 0] - (ctx.cx.astype(ftype) * vx + x_offset),
            points[:, 1] - (ctx.cy.astype(ftype) * vy + y_offset),
        ],
        axis=-1,
    )
    feats = [points, f_cluster, f_center]
    if with_distance:
        feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
    decorated = jnp.concatenate(feats, axis=-1) * keptf
    cell_count = stats[: ctx.num_segments - 1, 3].astype(jnp.int32)
    return decorated, kept, cell_count


def canvas_from_activations(
    point_feats: jax.Array,
    ctx: PointContext,
    kept: jax.Array,
    cell_count: jax.Array,
    geom: PillarGeometry,
    max_points: int,
    pad_floor: jax.Array | None = None,
    cap_is_exact: bool = True,
) -> jax.Array:
    """Masked per-cell max of point features into the dense (B, ny, nx, C)
    canvas (see scatter_max_canvas for semantics; this variant takes the
    already-computed kept mask and counts from `fused_frontend`)."""
    if geom.nz != 1:
        raise ValueError("fused canvas scatter requires nz == 1")
    m, c = point_feats.shape
    ncells = ctx.num_segments - 1
    neg = jnp.asarray(jnp.finfo(point_feats.dtype).min, point_feats.dtype)
    contrib = jnp.where(kept[:, None], point_feats, neg)
    canvas = jnp.full((ctx.num_segments, c), neg, point_feats.dtype).at[
        ctx.cell
    ].max(contrib)
    canvas = canvas[:ncells]
    occupied = cell_count > 0
    if pad_floor is not None:
        # with an exact cap, full pillars have no padding row; without the
        # cap, counts can exceed max_points while the reference pillar would
        # still be full -> treat count >= max_points as full.
        has_padding_row = occupied & (cell_count < max_points)
        canvas = jnp.where(
            has_padding_row[:, None],
            jnp.maximum(canvas, pad_floor[None, :].astype(canvas.dtype)),
            canvas,
        )
    canvas = jnp.where(occupied[:, None], canvas, 0)
    return canvas.reshape(ctx.batch, geom.ny, geom.nx, c)


def pillarize(
    points: jax.Array,
    geom: PillarGeometry,
    max_points: int,
    max_voxels: int,
) -> PillarBatch:
    """Reference-style fixed-shape pillarization of one scan.

    Args:
      points: (N, F) float array; columns 0..2 are xyz, the rest ride along
        (reflectivity etc.), exactly like reference utils/point_cloud_ops.py:120.
      geom: static grid geometry.
      max_points: per-pillar point capacity (extra points dropped, point order).
      max_voxels: pillar capacity (latest-created cells dropped).

    Returns a PillarBatch with zyx `coors` (reverse_index=True semantics,
    reference utils/point_cloud_ops.py:125-128,144-145).
    """
    n, f = points.shape
    ctx = bin_points(points, geom)
    ranks = count_and_rank(ctx, max_points)
    num_cells = geom.num_cells_3d

    # Creation order: cells ranked by first occurrence in the point stream
    # (reference assigns voxelidx in first-touch order, point_cloud_ops.py:41-48).
    big = jnp.int32(2 * n + 1)
    contrib = jnp.where(ctx.valid, jnp.arange(n, dtype=jnp.int32), big)
    first_orig = jnp.full((num_cells + 1,), big, jnp.int32).at[ctx.cell].min(contrib)
    # Exclude the invalid-point segment from ranking entirely.
    first_orig = first_orig.at[num_cells].set(big)
    cells_by_creation = jnp.argsort(first_orig)          # slot -> cell
    creation_rank = jnp.argsort(cells_by_creation)       # cell -> slot
    slot_per_point = creation_rank[ctx.cell]

    # Scatter points into (max_voxels * max_points, F); out-of-capacity writes drop.
    flat_idx = slot_per_point * max_points + ranks.rank
    oob = max_voxels * max_points
    flat_idx = jnp.where(
        ranks.kept & (slot_per_point < max_voxels), flat_idx, oob
    )
    voxels = (
        jnp.zeros((max_voxels * max_points, f), points.dtype)
        .at[flat_idx].set(points, mode="drop")
        .reshape(max_voxels, max_points, f)
    )

    # Per-slot metadata.  When capacity exceeds the cell count, pad the
    # slot->cell map with the invalid segment (always count 0, masked out).
    if max_voxels > num_cells + 1:
        cells_by_creation = jnp.concatenate(
            [
                cells_by_creation,
                jnp.full((max_voxels - num_cells - 1,), num_cells, jnp.int32),
            ]
        )
    slot_cells = cells_by_creation[:max_voxels]           # (max_voxels,) cell ids
    slot_counts = ranks.cell_count[slot_cells]
    n_pillars_total = jnp.sum((ranks.cell_count[:num_cells] > 0).astype(jnp.int32))
    slot_ids = jnp.arange(max_voxels, dtype=jnp.int32)
    mask = slot_ids < jnp.minimum(n_pillars_total, max_voxels)

    nx, ny, _ = geom.grid_size
    ccx = slot_cells % nx
    ccy = (slot_cells // nx) % ny
    ccz = slot_cells // (nx * ny)
    coors = jnp.stack([ccz, ccy, ccx], axis=-1).astype(jnp.int32)
    coors = jnp.where(mask[:, None], coors, 0)
    num_points = jnp.where(mask, slot_counts, 0)

    return PillarBatch(voxels, coors, num_points, mask,
                       jnp.minimum(n_pillars_total, max_voxels))


def pillarize_batch(
    points_b: jax.Array,
    geom: PillarGeometry,
    max_points: int,
    max_voxels: int,
) -> PillarBatch:
    """vmap of `pillarize` over a (B, N, F) batch; all fields gain a leading
    batch axis.  Replaces the reference train loop's per-sample host
    voxelization (training.py:131-143) with one on-device batched program."""
    return jax.vmap(lambda p: pillarize(p, geom, max_points, max_voxels))(points_b)


def decorate_pillars(
    voxels: jax.Array,
    num_points: jax.Array,
    coors_xy: jax.Array,
    geom: PillarGeometry,
    max_points: int,
    with_distance: bool = False,
) -> jax.Array:
    """PFN feature decoration on materialized pillars.

    Reproduces reference modules/pointpillars.py:115-140 exactly:
      * cluster offset: xyz minus the pillar mean over its `num_points` kept
        points (padding rows are zero so sum/num == masked mean),
      * center offset: x,y minus the pillar cell centre
        (coors x * vx + vx/2 + xmin, analogously y),
      * optional L2 norm of xyz,
      * padding rows zeroed afterwards (mask applied to the whole feature).

    Args:
      voxels: (..., max_points, F) — works on single scans (M, P, F) and
        batches (B, M, P, F).
      num_points: (...,) int, kept points per pillar.
      coors_xy: (..., 2) int32 (x_cell, y_cell) — callers with zyx coors pass
        coors[..., [2, 1]].
    Returns (..., max_points, F + 5 [+1]).
    """
    ftype = voxels.dtype
    denom = jnp.maximum(num_points, 1).astype(ftype)[..., None, None]
    points_mean = jnp.sum(voxels[..., :3], axis=-2, keepdims=True) / denom
    f_cluster = voxels[..., :3] - points_mean

    vx, vy = geom.voxel_size[0], geom.voxel_size[1]
    x_offset = vx / 2.0 + geom.pc_range[0]
    y_offset = vy / 2.0 + geom.pc_range[1]
    cx = coors_xy[..., 0].astype(ftype)[..., None] * vx + x_offset
    cy = coors_xy[..., 1].astype(ftype)[..., None] * vy + y_offset
    f_center = jnp.stack(
        [voxels[..., 0] - cx, voxels[..., 1] - cy], axis=-1
    )

    feats = [voxels, f_cluster, f_center]
    if with_distance:
        feats.append(
            jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True)
        )
    out = jnp.concatenate(feats, axis=-1)

    point_ids = jnp.arange(max_points, dtype=jnp.int32)
    pad_mask = (point_ids < num_points[..., None]).astype(ftype)[..., None]
    return out * pad_mask


def decorate_points(
    points: jax.Array,
    ctx: PointContext,
    ranks: PointRanks,
    geom: PillarGeometry,
    with_distance: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Flat per-point decoration for the fused path.

    Computes the same decorated feature vector as `decorate_pillars`, but over
    the flat (M, F) point stream: cluster means come from a masked segment-sum
    over kept points of each cell, centre offsets from the point's own cell.

    Returns:
      decorated: (M, F + 5 [+1]) — rows of dropped points are zeroed.
      kept: (M,) bool.
    """
    ftype = points.dtype
    kept = ranks.kept
    keptf = kept.astype(ftype)[:, None]

    xyz = points[:, :3]
    sums = jnp.zeros((ctx.num_segments, 3), ftype).at[ctx.cell].add(xyz * keptf)
    counts = jnp.maximum(ranks.cell_count, 1).astype(ftype)
    mean_per_point = sums[ctx.cell] / counts[ctx.cell][:, None]
    f_cluster = xyz - mean_per_point

    vx, vy = geom.voxel_size[0], geom.voxel_size[1]
    x_offset = vx / 2.0 + geom.pc_range[0]
    y_offset = vy / 2.0 + geom.pc_range[1]
    f_center = jnp.stack(
        [
            points[:, 0] - (ctx.cx.astype(ftype) * vx + x_offset),
            points[:, 1] - (ctx.cy.astype(ftype) * vy + y_offset),
        ],
        axis=-1,
    )

    feats = [points, f_cluster, f_center]
    if with_distance:
        feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
    decorated = jnp.concatenate(feats, axis=-1) * keptf
    return decorated, kept


def scatter_max_canvas(
    point_feats: jax.Array,
    ctx: PointContext,
    ranks: PointRanks,
    geom: PillarGeometry,
    max_points: int,
    pad_floor: jax.Array | None = None,
) -> jax.Array:
    """Masked per-cell max of point features into the dense pseudo-image.

    Fuses the PFN max-pool (reference modules/pointpillars.py:58) with the
    PointPillarsScatter (reference modules/pointpillars.py:168-199): each
    point's feature row competes in a segment-max over its 2-D cell, landing
    directly on the (B, ny, nx, C) canvas.  Requires nz == 1 (true for every
    shipped reference config; the z voxel extent always spans the full range).

    Args:
      point_feats: (M, C) post-activation features (>= 0 after ReLU).
      pad_floor: optional (C,) tensor reproducing the reference's padding-row
        quirk: pillars with fewer than `max_points` points max over at least
        one all-zero padding row, which after Linear(+bias)+ReLU contributes
        relu(bias).  Pass relu(bias) to reproduce; None for empty-row-free max.

    Returns (batch, ny, nx, C) canvas; cells with no pillar are zero
    (reference: torch.zeros canvas, modules/pointpillars.py:174).
    """
    if geom.nz != 1:
        raise ValueError("fused canvas scatter requires nz == 1")
    m, c = point_feats.shape
    ncells = ctx.num_segments - 1   # == batch * num_cells_2d when nz == 1
    neg = jnp.asarray(jnp.finfo(point_feats.dtype).min, point_feats.dtype)
    contrib = jnp.where(ranks.kept[:, None], point_feats, neg)
    canvas = jnp.full((ctx.num_segments, c), neg, point_feats.dtype).at[
        ctx.cell
    ].max(contrib)
    canvas = canvas[:ncells]

    count = ranks.cell_count[:ncells]
    occupied = count > 0
    if pad_floor is not None:
        has_padding_row = occupied & (count < max_points)
        canvas = jnp.where(
            has_padding_row[:, None],
            jnp.maximum(canvas, pad_floor[None, :].astype(canvas.dtype)),
            canvas,
        )
    canvas = jnp.where(occupied[:, None], canvas, 0)
    return canvas.reshape(ctx.batch, geom.ny, geom.nx, c)


# ---------------------------------------------------------------------------
# affine sorted frontend (round-2 fast path)
# ---------------------------------------------------------------------------

def _segment_flags(sorted_cell: jax.Array) -> jax.Array:
    return jnp.concatenate(
        [jnp.ones((1,), bool), sorted_cell[1:] != sorted_cell[:-1]])


def segmented_scan_sum(vals: jax.Array, flags: jax.Array) -> jax.Array:
    """Inclusive segmented running sum along axis 0 (flags mark run starts).

    Exact segment-local accumulation in stream order — unlike cumsum-diff,
    no catastrophic cancellation against the global running total."""
    f = flags[:, None] if vals.ndim == 2 else flags

    def combine(a, b):
        (s1, f1), (s2, f2) = a, b
        return jnp.where(f2, s2, s1 + s2), f1 | f2

    out, _ = jax.lax.associative_scan(combine, (vals, f), axis=0)
    return out


def segmented_scan_max(vals: jax.Array, flags: jax.Array) -> jax.Array:
    """Inclusive segmented running max along axis 0 (generic dtype)."""
    f = flags[:, None] if vals.ndim == 2 else flags

    def combine(a, b):
        (m1, f1), (m2, f2) = a, b
        return jnp.where(f2, m2, jnp.maximum(m1, m2)), f1 | f2

    out, _ = jax.lax.associative_scan(combine, (vals, f), axis=0)
    return out


def segmented_max_intkey(vals_bf16: jax.Array, sorted_cell: jax.Array,
                         seg_bits: int) -> jax.Array:
    """Segmented running max of bf16 values over a SORTED id stream via one
    plain int32 cummax: bf16 -> 16-bit monotonic key, segment id in the high
    bits (monotone non-decreasing), so a later segment's smallest key beats
    any earlier segment's largest and the segment structure never leaks.
    Exact (a bit-level total order of bf16).  Requires seg ids < 2^seg_bits
    with seg_bits <= 16."""
    if seg_bits > 16:
        raise ValueError("intkey segmax supports at most 2^16 segments")
    bits = jax.lax.bitcast_convert_type(vals_bf16, jnp.uint16)
    key = jnp.where(bits >= 0x8000, ~bits,
                    bits | jnp.uint16(0x8000)).astype(jnp.uint32)
    t = (sorted_cell.astype(jnp.uint32)[:, None] << 16) | key
    run = jax.lax.cummax(t, axis=0)
    k16 = (run & 0xFFFF).astype(jnp.uint16)
    back = jnp.where(k16 >= 0x8000, k16 & jnp.uint16(0x7FFF), ~k16)
    return jax.lax.bitcast_convert_type(back, jnp.bfloat16)


def affine_pfn_weights(kernel: jax.Array, bias: jax.Array, num_features: int,
                       geom: PillarGeometry, with_distance: bool = False):
    """Split the PFN linear over decorated features into a per-point matrix
    and a per-cell offset map (the round-2 'affine' decomposition).

    The decorated feature vector (reference modules/pointpillars.py:115-140)
    is AFFINE in the raw point given its cell:
        d_p = [p, xyz_p - mean_cell, xy_p - center_cell (, |xyz_p|)]
    so with kernel rows split as [W_pts | W_clu | W_cen (| W_dst)]:
        z_p = d_p @ kernel + bias = p_aug @ M  +  w(cell)
        M   = W_pts with W_clu added on the xyz rows and W_cen on xy
              (+ a |xyz| row when with_distance)
        w   = bias - mean_cell @ W_clu - center_cell @ W_cen   (per cell)
    and because both relu and (+ w) are monotone,
        canvas[cell] = max_p relu(z_p) = relu(segmax_p(p_aug @ M) + w[cell]).

    Returns (M, w_clu, w_cen, bias) ready for `affine_canvas`."""
    f = num_features
    w_pts = kernel[:f]
    w_clu = kernel[f:f + 3]
    w_cen = kernel[f + 3:f + 5]
    m = w_pts.at[0:3].add(w_clu).at[0:2].add(w_cen)
    if with_distance:
        m = jnp.concatenate([m, kernel[f + 5:f + 6]], axis=0)
    return m, w_clu, w_cen, bias


def affine_canvas(
    points: jax.Array,
    ctx: PointContext,
    geom: PillarGeometry,
    max_points: int,
    kernel: jax.Array,
    bias: jax.Array,
    with_distance: bool = False,
    exact_point_cap: bool = True,
    compute_dtype=jnp.float32,
    precision: str = "highest",
    differentiable: bool = False,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Raw flat points -> post-PFN pseudo-image canvas, sort-based, with NO
    duplicate-index scatter and NO per-point stats gather.

    Replaces fused_frontend + activate_flat + canvas_from_activations for
    single-layer bias-affine PFNs (every shipped reference config;
    use_norm folds in eval mode — models/pfn.py:effective_affine).  Chip
    cost structure (scripts/microbench.py): one multi-operand stable sort
    keyed by flat cell id, one segmented scan for [xyz, 1] sums, one
    segmented max for the activations, two 10k-row boundary gathers — the
    scatter-add/scatter-max/stats-gather trio of the scatter impl
    (~0.66/0.66/0.17 ms at 100k rows) disappears.

    Exactness: the kept set, ranks and counts are bit-identical to
    `fused_frontend`; per-cell sums accumulate in stream order like the
    reference; activations differ from the decorate-then-matmul order only
    by float re-association (tested to tolerance), and the final max/relu/
    +w composition is exact by monotonicity.

    Gradient contract (use_pallas=True, the default on TPU): the custom VJP
    delivers cotangents for the PFN PARAMETERS (kernel/bias) only; the
    cotangents w.r.t. `points` are defined as ZERO, matching the reference,
    which never backprops into the cloud.  A caller that needs point
    gradients (input-sensitivity analysis) must pass use_pallas=False to
    get XLA autodiff through the scan path instead of silent zeros — on
    the CPU backend (or at sub-32-bit compute) only: the f32 XLA scan
    graph is guarded off on TPU (ValueError; docs/PARITY.md known #10).

    Returns (B, ny, nx, C) canvas in compute_dtype.
    """
    if geom.nz != 1:
        raise ValueError("affine canvas requires nz == 1")
    m_pts = points.shape[0]
    ncells = ctx.num_segments - 1
    ftype = points.dtype
    if use_pallas is None:
        # compiles on TPU (interpret mode covers CPU tests); differentiable
        # callers get the custom-VJP wrapper (parameter grads only — point
        # cotangents are defined as zero, see pallas_affine._make_scan_gather)
        use_pallas = interpret or jax.default_backend() == "tpu"
    if (not use_pallas and not interpret
            and jnp.dtype(compute_dtype).itemsize >= 4
            and jax.default_backend() == "tpu"
            and not os.environ.get("GNDNET_ALLOW_TPU_F32_XLA_SCAN")):
        # The f32 XLA scan graph hits a super-linear fusion/scheduling
        # blowup in XLA's TPU pipeline (the isolated (N, 64) tuple-carry
        # segmented scan compiles in 2.6 s, one extra producer makes it
        # 65 s, the full graph hangs 40+ min — scripts/probe_f32_compile.py;
        # structural, not size-gated).  Fail fast instead of hanging the
        # process: the supported f32 paths on TPU are the default pallas
        # kernel (bit-pinned vs CPU XLA by scripts/verify_tpu.py) and, for
        # XLA autodiff / point gradients, the CPU backend or the scatter
        # impl.  docs/PARITY.md known #10.
        raise ValueError(
            "affine_canvas(use_pallas=False) with a >=32-bit compute dtype "
            "is not supported on the TPU backend: XLA's TPU pipeline hangs "
            "compiling the f32 segmented-scan graph at realistic sizes "
            "(docs/PARITY.md known #10). Use the default pallas path, the "
            "CPU backend, or fused_impl='scatter'. This trace-time check "
            "sees only the PROCESS default backend: if your jit explicitly "
            "targets another backend (jit(..., backend='cpu')), or you "
            "accept the hang risk under a watchdog, set "
            "GNDNET_ALLOW_TPU_F32_XLA_SCAN=1.")

    mmat, w_clu, w_cen, bias = affine_pfn_weights(
        kernel, bias, points.shape[1], geom, with_distance)

    # Per-item cell space with stride C3+1 (each item's drop segment sits
    # between its own cells and the next item's), so that every per-cell
    # cost below is LINEAR in batch size and the concatenated per-item
    # sorted streams remain globally non-decreasing.
    b = ctx.batch
    n_per = m_pts // b
    c3 = geom.num_cells_3d
    stride = c3 + 1
    f = points.shape[1]
    batch_ids = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n_per)
    local = jnp.where(ctx.valid, ctx.cell - batch_ids * c3, c3)

    # ONE sort PER ITEM (lax.sort batches over leading dims).  When
    # (local id, stream index) packs into 31 bits, a single-key sort of the
    # packed int + one row gather beats the 5-operand stable sort by ~2x
    # (scripts/profile_affine.py: 0.47 vs 0.9 ms at 114k) — the embedded
    # index also provides the stability the rank semantics need.  Huge
    # grids that overflow the packing (fine_grid's 62501 cells) fall back
    # to a (cell, iota) stable key sort + the same row gather — measured
    # equal to packed at 114k (sort2_idx_gather 890 us vs 902) and ~1.6x
    # cheaper than hauling all 4 feature columns through the sort network.
    idxcap = 1 << max(n_per - 1, 1).bit_length()
    packed_fits = (stride - 1) * idxcap + (n_per - 1) < 2 ** 31
    # b == 1 only: at B=16 the post-sort row gather (3 ns/row across B*N
    # rows) outweighs what the packed sort saves, while the multi-operand
    # sort amortizes across the batch (bin_sort_B16 ~0.18 ms/scan measured)
    packed_gather_ok = b == 1 and packed_fits
    pts2d = points.reshape(b, n_per, f)
    local2d = local.reshape(b, n_per)
    if packed_gather_ok:
        key = local2d * idxcap + jnp.arange(n_per, dtype=jnp.int32)
        # is_stable=False: jax.lax.sort DEFAULTS to stable, and XLA:TPU
        # implements stability by adding a hidden iota operand + two-word
        # comparator (~2x the sort time — the same cost the batched path's
        # is_stable=False already avoids).  The packed key is unique, so
        # the unstable sort is deterministic and identical.  On TPU the
        # compiled path uses the in-VMEM bitonic kernel instead (948 ->
        # 639 us standalone at flagship size incl. pow2 padding,
        # ops/pallas_sort.py); CPU/interpret keeps the XLA sort (the
        # 153-stage interpret unroll is minutes-slow, and the kernel is
        # unit-tested at small n + covered on device by verify_tpu).
        if use_pallas and not interpret and jax.default_backend() == "tpu":
            from gndnet_tpu.ops.pallas_sort import sort_padded_i32
            skey = sort_padded_i32(key.reshape(-1)).reshape(1, -1)
        else:
            skey = jax.lax.sort(key, dimension=-1, is_stable=False)
        local_s2 = skey // idxcap
        idx_s = skey - local_s2 * idxcap
        spts2d = jnp.take_along_axis(pts2d, idx_s[..., None], axis=1)
    elif b == 1:
        iota = jnp.broadcast_to(
            jnp.arange(n_per, dtype=jnp.int32), (b, n_per))
        # num_keys=2 + is_stable=False: the iota tiebreaker makes the
        # order identical to a stable single-key sort, without the HIDDEN
        # stability-iota operand XLA:TPU adds for is_stable=True.
        # A two-word in-VMEM bitonic kernel (pallas_sort.sort2_padded_i32)
        # measured a TIE with this sort (680 vs 668 us standalone at 100k,
        # scripts/probe_sort2.py) at 116 s of Mosaic compile — the doubled
        # per-stage roll/select work eats the VMEM-residency win, so the
        # XLA fallback stays.
        local_s2, idx_s = jax.lax.sort(
            (local2d, iota), num_keys=2, is_stable=False, dimension=-1)
        spts2d = jnp.take_along_axis(pts2d, idx_s[..., None], axis=1)
    elif packed_fits:
        # batched: haul the feature columns as sort PAYLOAD (re-gathering
        # them after a key-only sort costs ~3 ns/row across B*N rows —
        # measured 4x the whole sort), but pack (cell, iota) into the one
        # int32 key: a stable multi-key sort would add a hidden iota
        # OPERAND (XLA materializes one for stability) plus a two-word
        # comparator, measured 2.75 ms vs 1.86 ms packed at B=16 kitti_sem
        # shapes on a v5e.  Uniqueness of the packed key makes the order
        # deterministic and identical to the stable sort.
        key = local2d * idxcap + jnp.arange(n_per, dtype=jnp.int32)
        sorted_all = jax.lax.sort(
            (key,) + tuple(pts2d[..., i] for i in range(f)),
            num_keys=1, is_stable=False, dimension=-1)
        local_s2 = sorted_all[0] // idxcap
        spts2d = jnp.stack(sorted_all[1:], axis=-1)
    else:
        sorted_all = jax.lax.sort(
            (local2d,) + tuple(pts2d[..., i] for i in range(f)),
            num_keys=1, is_stable=True, dimension=-1)
        local_s2 = sorted_all[0]
        spts2d = jnp.stack(sorted_all[1:], axis=-1)

    # pad every item to a chunk multiple with its own drop id (keeps kernel
    # chunks from straddling items with colliding run ids); the transposed
    # kernel amortizes per-chunk overhead best at 4096 lanes
    # (654/683/727 us at 4096/2048/1024, scripts/profile_affine.py probes).
    # f32 output doubles the unrolled-round live ranges and chunk=4096 sends
    # the Mosaic compile into double-digit MINUTES (observed on v5e) — keep
    # f32 at 2048.
    if use_pallas:
        chunk = 4096 if jnp.dtype(compute_dtype).itemsize <= 2 else 2048
    else:
        chunk = 1024
    pad = (-n_per) % chunk
    n_pad = n_per + pad
    if pad:
        local_s2 = jnp.pad(local_s2, ((0, 0), (0, pad)),
                           constant_values=c3)
        spts2d = jnp.pad(spts2d, ((0, 0), (0, pad), (0, 0)))
    cell_s2 = local_s2 + (jnp.arange(b, dtype=jnp.int32) * stride)[:, None]
    cell_s = cell_s2.reshape(b * n_pad)
    spts = spts2d.reshape(b * n_pad, f)
    local_s = local_s2                               # (b, n_pad) per item
    valid = (local_s < c3).reshape(-1)

    if use_pallas:
        from gndnet_tpu.ops.pallas_affine import (
            affine_scan_t, histogram_ends)

        # pts_t layout: ROWS [x, y, z, extras..., dist?] — just the sorted
        # points transposed (A = f (+1 with distance) real feature rows; the
        # valid flag ships as its own (1, N) row, so no 8-row widening is
        # materialized).  The kept mask (valid & rank < cap) is computed
        # IN-kernel on a (1, chunk) lane row, so no XLA cummax over the
        # stream is needed.  mmat_t rows follow the feature-row layout.
        sptst = spts.T                                    # (f, m_flat)
        if with_distance:
            pts_t = jnp.concatenate(
                [sptst, jnp.linalg.norm(sptst[:3], axis=0,
                                        keepdims=True)], axis=0)
        else:
            pts_t = sptst
        if pts_t.shape[0] < 4:
            pts_t = jnp.concatenate(
                [pts_t, jnp.zeros((4 - pts_t.shape[0], pts_t.shape[1]),
                                  ftype)], axis=0)
            mmat = jnp.concatenate(
                [mmat, jnp.zeros((4 - mmat.shape[0], mmat.shape[1]),
                                 mmat.dtype)], axis=0)
        valid_row = valid.astype(ftype)
        mmat_t = mmat.T                                   # (C, A)
        from gndnet_tpu.ops.pallas_affine import _make_scan_gather

        # in-VMEM histogram only where it wins: B=1 with a LARGE grid —
        # the XLA einsum materializes (B, Np, ny|nx) bf16 one-hots in HBM
        # (~205 MB at fine_grid scale, 391 us measured vs 101 us pallas),
        # but at kitti's 100x100 it stays ahead (29 vs 46 us) and at B=16
        # the one big einsum beats the serialized (b, steps) kernel grid
        # (scripts/probe_hist.py on a v5e)
        hist_pallas = b == 1 and geom.ny * geom.nx > 16384
        ends_local, counts_raw = histogram_ends(
            local_s, geom.ny, geom.nx, use_pallas=hist_pallas,
            interpret=interpret)
        starts_local = ends_local - counts_raw + 1
        if exact_point_cap:
            # the kernel's shortened scan window only completes rows within
            # max_points of their run start; everything past the cap is
            # masked anyway, so gather at start + min(count, cap) - 1
            ends_local = jnp.maximum(
                starts_local + jnp.minimum(counts_raw, max_points) - 1, 0)
        offs = (jnp.arange(b, dtype=jnp.int32) * n_pad)[:, None]
        ends = (ends_local + offs).reshape(-1)
        # global run starts: the packed-argmax VJP decodes first-winner
        # rank -> global stream position as starts + rank
        starts = (starts_local + offs).reshape(-1)
        counts_flat = counts_raw.reshape(-1)
        scan_gather = _make_scan_gather(
            max_points if exact_point_cap else None,
            jnp.dtype(compute_dtype).name, chunk, interpret,
            b, c3, precision)
        tot, smax = scan_gather(cell_s, ends, starts, pts_t, valid_row,
                                mmat_t)
        count = jnp.where(counts_flat > 0, tot[:, 3], 0.0)
    else:
        pos = jnp.arange(b * n_pad, dtype=jnp.int32)
        flags = _segment_flags(cell_s)
        if exact_point_cap:
            start_pos = jax.lax.cummax(jnp.where(flags, pos, 0))
            kept = valid & ((pos - start_pos) < max_points)
        else:
            kept = valid
        keptf = kept.astype(ftype)[:, None]

        # per-cell [sum xyz, count] in stream order (exact, no cancellation)
        xyz = spts[:, :3]
        g = jnp.concatenate([xyz * keptf, keptf], axis=-1)
        run_tot = segmented_scan_sum(g, flags)

        # per-point activations a = p_aug @ M (the whole PFN linear minus
        # the per-cell offset), in compute precision
        p_aug = spts
        if with_distance:
            p_aug = jnp.concatenate(
                [spts, jnp.linalg.norm(xyz, axis=-1, keepdims=True)],
                axis=-1)
        a = jnp.dot(p_aug.astype(compute_dtype), mmat.astype(compute_dtype),
                    precision=jax.lax.Precision(precision))

        neg = jnp.asarray(jnp.finfo(compute_dtype).min, compute_dtype)
        a_masked = jnp.where(kept[:, None], a, neg)
        # the int-key cummax is exact for bf16 but goes through bitcasts (no
        # gradients); training takes the associative-scan form.  It runs
        # per item on LOCAL ids (< 2^16 for every shipped grid).
        if (compute_dtype == jnp.bfloat16 and stride < (1 << 16)
                and not differentiable):
            am3 = a_masked.reshape(b, n_pad, -1)
            run_max = jax.vmap(
                lambda v, cc: segmented_max_intkey(v, cc, 16)
            )(am3, local_s).reshape(b * n_pad, -1)
        else:
            run_max = segmented_scan_max(a_masked, flags)

        # run ends per strided cell id: searchsorted right - 1 on the
        # globally non-decreasing stream (empty cells masked out)
        cell_range = jnp.arange(ncells, dtype=cell_s.dtype)
        qids = (cell_range // c3) * stride + cell_range % c3
        ends = jnp.searchsorted(cell_s, qids, side="right") - 1
        ends_c = jnp.clip(ends, 0, b * n_pad - 1)
        tot = run_tot[ends_c]
        smax = run_max[ends_c]
        hit = cell_s[ends_c] == qids
        count = jnp.where(hit, tot[:, 3], 0.0)
    mean = tot[:, :3] / jnp.maximum(count, 1.0)[:, None]

    # per-cell offset w = bias - mean@W_clu - center@W_cen on the dense grid
    nx = geom.nx
    cell_ids = jnp.arange(ncells, dtype=jnp.int32) % geom.num_cells_2d
    ccx = (cell_ids % nx).astype(ftype)
    ccy = (cell_ids // nx).astype(ftype)
    vx, vy = geom.voxel_size[0], geom.voxel_size[1]
    centers = jnp.stack(
        [ccx * vx + (vx / 2.0 + geom.pc_range[0]),
         ccy * vy + (vy / 2.0 + geom.pc_range[1])], axis=-1)
    # explicit precision: at f32 the TPU MXU default truncates operands to
    # bf16 (~4e-3 rel) — parity mode ('highest') must reach these dots too
    # (found by the CPU-reference check, scripts/probe_f32_diff.py)
    pp = jax.lax.Precision(precision)
    w_cell = (bias.astype(compute_dtype)
              - jnp.dot(mean.astype(compute_dtype),
                        w_clu.astype(compute_dtype), precision=pp)
              - jnp.dot(centers.astype(compute_dtype),
                        w_cen.astype(compute_dtype), precision=pp))

    canvas = jax.nn.relu(smax + w_cell)
    pad_floor = jax.nn.relu(bias.astype(compute_dtype))
    occupied = count > 0
    has_padding_row = occupied & (count < max_points)
    canvas = jnp.where(has_padding_row[:, None],
                       jnp.maximum(canvas, pad_floor[None, :]), canvas)
    canvas = jnp.where(occupied[:, None], canvas, 0)
    return canvas.reshape(ctx.batch, geom.ny, geom.nx, -1)


# ---------------------------------------------------------------------------
# sorted-stream fused frontend (pallas-accelerated alternative)
# ---------------------------------------------------------------------------

def fused_frontend_sorted(points, ctx, geom, max_points,
                          with_distance: bool = False,
                          exact_point_cap: bool = True,
                          chunk: int = 1024,
                          interpret: bool = False):
    """Sorted-stream variant of `fused_frontend`.

    One argsort reorders the stream by cell; everything else becomes
    contiguous-run work: rank = position - run start (scalar cummax, no
    inverse scatter), per-run statistics via two pallas suffix-sum passes
    (prefix = flip(suffix(flip))) so every row owns its run total with NO
    duplicate-index scatter and NO stats gather.  Cell coordinates and
    validity are recomputed elementwise from the sorted points instead of
    being gathered.

    Returns (decorated_sorted, kept_sorted, sorted_cell, cell_count) —
    features are in SORTED order; pair with `canvas_from_sorted_activations`.
    """
    from gndnet_tpu.ops.pallas_segment import suffix_segment_reduce

    ftype = points.dtype
    m = points.shape[0]
    pad = (-m) % chunk
    order = jnp.argsort(ctx.cell, stable=True)
    spts = points[order]                       # the one narrow gather
    cx, cy, _, valid = _bin(spts, geom)
    sorted_cell = ctx.cell[order]

    if pad:
        spts = jnp.pad(spts, ((0, pad), (0, 0)))
        cx = jnp.pad(cx, (0, pad))
        cy = jnp.pad(cy, (0, pad))
        valid = jnp.pad(valid, (0, pad))
        sorted_cell = jnp.pad(sorted_cell, (0, pad),
                              constant_values=ctx.num_segments - 1)

    n = spts.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_cell[1:] != sorted_cell[:-1]])
    start_pos = jax.lax.cummax(jnp.where(is_start, pos, 0))
    if exact_point_cap:
        kept = valid & ((pos - start_pos) < max_points)
    else:
        kept = valid
    keptf = kept.astype(ftype)[:, None]

    xyz = spts[:, :3]
    xyzk = jnp.concatenate([xyz * keptf, keptf], axis=-1)
    suffix = suffix_segment_reduce(xyzk, sorted_cell, op="sum", chunk=chunk,
                                   interpret=interpret)
    flipped = suffix_segment_reduce(
        jnp.flip(xyzk, 0), jnp.flip(-sorted_cell, 0), op="sum", chunk=chunk,
        interpret=interpret)
    prefix = jnp.flip(flipped, 0)
    totals = prefix + suffix - xyzk            # every row: its run's totals
    count_pp = totals[:, 3:4]
    mean_pp = totals[:, :3] / jnp.maximum(count_pp, 1.0)
    f_cluster = xyz - mean_pp

    vx, vy = geom.voxel_size[0], geom.voxel_size[1]
    x_offset = vx / 2.0 + geom.pc_range[0]
    y_offset = vy / 2.0 + geom.pc_range[1]
    f_center = jnp.stack(
        [spts[:, 0] - (cx.astype(ftype) * vx + x_offset),
         spts[:, 1] - (cy.astype(ftype) * vy + y_offset)], axis=-1)
    feats = [spts, f_cluster, f_center]
    if with_distance:
        feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
    decorated = jnp.concatenate(feats, axis=-1) * keptf

    ncells = ctx.num_segments - 1
    starts = jnp.searchsorted(sorted_cell,
                              jnp.arange(ncells, dtype=sorted_cell.dtype),
                              side="left")
    starts_c = jnp.clip(starts, 0, n - 1)
    cell_count = jnp.where(
        sorted_cell[starts_c] == jnp.arange(ncells),
        totals[starts_c, 3], 0.0).astype(jnp.int32)
    return decorated, kept, sorted_cell, cell_count


def canvas_from_sorted_activations(acts, kept, sorted_cell, cell_count,
                                   ctx, geom, max_points,
                                   pad_floor=None, chunk: int = 1024,
                                   interpret: bool = False):
    """Canvas from SORTED activations: pallas suffix-max + searchsorted +
    one unique-index gather (no duplicate-index scatter)."""
    from gndnet_tpu.ops.pallas_segment import suffix_segment_reduce

    if geom.nz != 1:
        raise ValueError("fused canvas requires nz == 1")
    n, c = acts.shape
    neg = jnp.asarray(jnp.finfo(acts.dtype).min, acts.dtype)
    masked = jnp.where(kept[:, None], acts, neg)
    reduced = suffix_segment_reduce(masked, sorted_cell, op="max",
                                    chunk=chunk, interpret=interpret)
    ncells = ctx.num_segments - 1
    starts = jnp.searchsorted(sorted_cell,
                              jnp.arange(ncells, dtype=sorted_cell.dtype),
                              side="left")
    rows = reduced[jnp.clip(starts, 0, n - 1)]
    occupied = cell_count > 0
    canvas = rows
    if pad_floor is not None:
        has_padding_row = occupied & (cell_count < max_points)
        canvas = jnp.where(has_padding_row[:, None],
                           jnp.maximum(canvas, pad_floor[None, :]
                                       .astype(canvas.dtype)), canvas)
    canvas = jnp.where(occupied[:, None], canvas, 0)
    return canvas.reshape(ctx.batch, geom.ny, geom.nx, c)
