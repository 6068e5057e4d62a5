"""Pallas TPU mega-kernel for the affine pillar frontend.

One forward pass over the cell-sorted point stream computes, per row:

  * rank      — 0-based position within the row's cell run (the reference's
                per-pillar point counter, utils/point_cloud_ops.py:49-52),
  * kept      — rank < max_points (exact point cap) & not the drop segment,
  * run_tot   — inclusive segmented running sum of [xyz*kept, kept] (f32),
  * run_max   — inclusive segmented running max of the PFN pre-activations
                a = p_aug @ M (matmul on the MXU inside the kernel, masked
                to kept rows),

carrying the partial state of the run that spans a chunk boundary in
VMEM/SMEM scratch across sequential grid steps.  Run-END rows therefore hold
their cell's complete [sums, count] and max — `affine_canvas` gathers them
into the dense canvas with one unique-index gather.

Why a kernel: XLA lowers segmented scans to O(n log n) HBM passes (~1.4-2 ms
for (100k, 64) on a v5e, scripts/microbench.py) while this kernel streams
the data once (~30 MB) and does the log2(chunk) combine rounds on VMEM
tiles.  Mosaic rules honored (the axon quirks memory): pltpu.roll instead of
odd concats, chunk kept at 1024 so unrolled-round temporaries fit VMEM.

The layout contract with the caller: `pts8` packs [x, y, z, 1, feat4...,
dist?, 0...] so that the masked stats columns are simply (pts8 * kept)[:,:4]
— no in-kernel concatenation — and M's rows follow the same layout (row 3
zero: the constant column must not contribute to a).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_NEG = -3.0e38


def _kernel(cell_ref, pts_ref, mmat_ref, tot_ref, amax_ref,
            carry_cell, carry_cnt, carry_tot, carry_max, *,
            chunk: int, rounds: int, cap: int, out_dtype):
    i = pl.program_id(0)
    cells = cell_ref[...]                    # (chunk, 1) int32
    pts = pts_ref[...]                       # (chunk, 8) f32
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    # --- rank: 0-based position within the chunk-local run ---------------
    prev_c = pltpu.roll(cells, shift=1, axis=0)
    is_start = (cells != prev_c) | (row == 0)
    sp = jnp.where(is_start, row, 0)
    for k in range(rounds):
        s = 1 << k
        prev = pltpu.roll(sp, shift=s, axis=0)
        sp = jnp.where(row >= s, jnp.maximum(sp, prev), sp)
    rank = row - sp

    # rows of the run spanning the chunk boundary continue the carried run
    in_first = (i > 0) & (cells == carry_cell[0])
    rank = rank + jnp.where(in_first, carry_cnt[0], 0)
    # validity rides in pts8 column 3 (1.0 for real rows, 0.0 for drop/pad)
    kept = (rank < cap) & (pts[:, 3:4] > 0)
    kf = kept.astype(jnp.float32)

    # --- segmented inclusive prefix sum of [xyz, 1] * kept ----------------
    g = (pts * kf)[:, :4]                    # col 3 of pts8 is the 1s column
    for k in range(rounds):
        s = 1 << k
        pg = pltpu.roll(g, shift=s, axis=0)
        pc = pltpu.roll(cells, shift=s, axis=0)
        ok = (row >= s) & (pc == cells)
        g = jnp.where(ok, g + pg, g)
    g = jnp.where(in_first, g + jnp.max(carry_tot[...], axis=0,
                                        keepdims=True), g)

    # --- PFN pre-activations on the MXU, masked segmented prefix max ------
    a = jnp.dot(pts.astype(out_dtype), mmat_ref[...].astype(out_dtype),
                preferred_element_type=jnp.float32)
    # round to out_dtype NOW (bit-compat with an out_dtype matmul result),
    # but run the combine rounds in f32: Mosaic's dynamic_rotate only
    # supports 32-bit lanes, and a monotone cast commutes with max so the
    # final cast-back is exact.
    a = a.astype(out_dtype).astype(jnp.float32)
    neg = jnp.float32(_BIG_NEG)
    am = jnp.where(kept, a, neg)
    for k in range(rounds):
        s = 1 << k
        pa = pltpu.roll(am, shift=s, axis=0)
        pc = pltpu.roll(cells, shift=s, axis=0)
        ok = (row >= s) & (pc == cells)
        am = jnp.where(ok, jnp.maximum(am, pa), am)
    cm = jnp.max(carry_max[...], axis=0, keepdims=True)
    am = jnp.where(in_first, jnp.maximum(am, cm), am)

    tot_ref[...] = g
    amax_ref[...] = am.astype(out_dtype)

    # --- new carry: the LAST row's inclusive state -------------------------
    last = row == (chunk - 1)
    carry_cell[0] = jnp.max(jnp.where(last[:, 0], cells[:, 0], -1))
    carry_cnt[0] = jnp.max(jnp.where(last[:, 0], rank[:, 0] + 1, 0))
    lt = jnp.max(jnp.where(last, g, jnp.float32(_BIG_NEG)), axis=0,
                 keepdims=True)
    lm = jnp.max(jnp.where(last, am, neg), axis=0, keepdims=True)
    carry_tot[...] = jnp.broadcast_to(lt, carry_tot.shape)
    carry_max[...] = jnp.broadcast_to(lm, carry_max.shape)


def affine_segment_scan(cell_sorted: jax.Array, pts8: jax.Array,
                        mmat8: jax.Array, *, cap: int,
                        out_dtype=jnp.float32, chunk: int = 1024,
                        interpret: bool = False):
    """Fused rank/sums/matmul/max pass over a run-contiguous stream.

    Args:
      cell_sorted: (N,) int32 flat cell ids with equal ids contiguous
        (per-item sorted streams concatenated are fine — ids only need to
        never repeat across run boundaries).
      pts8: (N, 8) f32, columns [x, y, z, valid, extra..., 0 pad] (see
        module docstring); column 3 is 1.0 for real rows and 0.0 for
        drop/pad rows; N divisible by `chunk`.
      mmat8: (8, C) per-point weight matrix, row 3 zero.
      cap: max_points_voxel (exact point cap); pass N to disable.

    Returns (run_tot (N, 4) f32, run_max (N, C) out_dtype) where run-END rows
    hold their cell's totals/max.
    """
    n = cell_sorted.shape[0]
    if n % chunk != 0:
        raise ValueError(f"N={n} must be divisible by chunk={chunk}")
    width = mmat8.shape[1]
    num_chunks = n // chunk
    rounds = max(1, (chunk - 1).bit_length())

    kernel = functools.partial(
        _kernel, chunk=chunk, rounds=rounds, cap=int(cap),
        out_dtype=out_dtype)

    def idx(i):
        return (i, 0)

    return pl.pallas_call(
        kernel,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, 1), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 8), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, 4), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, width), idx, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 4), jnp.float32),
            jax.ShapeDtypeStruct((n, width), out_dtype),
        ],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((8, 4), jnp.float32),
            pltpu.VMEM((8, width), jnp.float32),
        ],
        interpret=interpret,
    )(cell_sorted[:, None].astype(jnp.int32), pts8, mmat8)


def histogram_ends(local_cells: jax.Array, ny: int, nx: int):
    """Per-item run-END index per cell via factored one-hot histogram
    matmuls.

    XLA's searchsorted costs ~1 ms for 10k queries in 100k keys on a v5e
    (log-rounds of serialized gathers); a bf16 one-hot histogram einsum is
    exact (0/1 inputs, f32 accumulation, counts << 2^24) and runs on the MXU
    in ~0.1 ms.  The one-hots are factored per item over q = c // nx (ny
    wide) and r = c % nx (nx wide), so the cost stays LINEAR in batch size
    (a flat batched cell space would need a B*ny-wide one-hot).

    Args:
      local_cells: (B, Np) int32 per-item sorted LOCAL cell ids; drop/pad
        rows carry ny*nx (their q == ny falls outside the one-hot).

    Returns (ends (B, ny*nx) int32 clipped >= 0 — row indices within each
    item's Np stream, counts_raw (B, ny*nx) int32); cells with zero raw
    points have counts_raw == 0 (their `ends` value is meaningless and must
    be masked by the caller).
    """
    q = (local_cells // nx).astype(jnp.int32)
    r = (local_cells - q * nx).astype(jnp.int32)
    ohq = (q[..., None] == jnp.arange(ny, dtype=jnp.int32)
           ).astype(jnp.bfloat16)
    ohr = (r[..., None] == jnp.arange(nx, dtype=jnp.int32)
           ).astype(jnp.bfloat16)
    counts = jnp.einsum("bpy,bpx->byx", ohq, ohr,
                        preferred_element_type=jnp.float32)
    counts = counts.reshape(local_cells.shape[0], -1).astype(jnp.int32)
    ends = jnp.cumsum(counts, axis=-1) - 1
    return jnp.maximum(ends, 0), counts
