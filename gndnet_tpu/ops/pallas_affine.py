"""Pallas TPU mega-kernel for the affine pillar frontend.

One forward pass over the cell-sorted point stream computes, per row:

  * run_tot   — inclusive segmented running sum of [xyz*kept, kept] (f32),
  * run_max   — inclusive segmented running max of the PFN pre-activations
                a = p_aug @ M (matmul on the MXU inside the kernel, masked
                to kept rows),

carrying the partial state of the run that spans a chunk boundary in
VMEM/SMEM scratch across sequential grid steps.  Run-END rows therefore hold
their cell's complete [sums, count] and max — `affine_canvas` gathers them
into the dense canvas with one unique-index gather.

The kept mask (rank < max_points & valid — the reference's per-pillar point
counter, utils/point_cloud_ops.py:49-52) is computed by the CALLER in plain
XLA and shipped in pts8 column 3: a 1-channel int cummax is nearly free in
XLA, while the same scan inside the kernel costs ~10 pointer-jump rounds on
(chunk, 1) tiles that use 1/128th of the VPU lanes.

Why a kernel for the rest: XLA lowers wide segmented scans to O(n log n)
HBM passes (~1.4-2 ms for (100k, 64) on a v5e, scripts/microbench.py) while
this kernel streams the data once (~30 MB) and does the log2(chunk) combine
rounds on VMEM tiles, sharing one cells-roll per round between the sum and
max scans.  Mosaic rules honored (the axon quirks memory): pltpu.roll
instead of odd concats, 32-bit lanes only inside rounds, chunk kept at 1024
so unrolled-round temporaries fit VMEM.

The layout contract with the caller: `pts8` packs [x, y, z, kept, feat4...,
dist?, 0...] so that the masked stats columns are simply
pts8[:, :4] * kept — no in-kernel concatenation — and M's rows follow the
same layout (row 3 zero: the kept column must not contribute to a).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_NEG = -3.0e38


def _kernel(cell_ref, pts_ref, mmat_ref, tot_ref, amax_ref,
            carry_cell, carry_tot, carry_max, *,
            chunk: int, rounds: int, out_dtype):
    i = pl.program_id(0)
    cells = cell_ref[...]                    # (chunk, 1) int32
    pts = pts_ref[...]                       # (chunk, 8) f32
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    # rows of the run spanning the chunk boundary continue the carried run
    in_first = (i > 0) & (cells == carry_cell[0])

    kept = pts[:, 3:4]                       # caller-computed mask (0/1)
    g = pts[:, :4] * kept                    # [xyz, 1] * kept

    # PFN pre-activations on the MXU; round to out_dtype NOW (bit-compat
    # with an out_dtype matmul result) but run the combine rounds in f32:
    # Mosaic's dynamic_rotate only supports 32-bit lanes, and a monotone
    # cast commutes with max so the final cast-back is exact.
    a = jnp.dot(pts.astype(out_dtype), mmat_ref[...].astype(out_dtype),
                preferred_element_type=jnp.float32)
    a = a.astype(out_dtype).astype(jnp.float32)
    neg = jnp.float32(_BIG_NEG)
    am = jnp.where(kept > 0, a, neg)

    # segmented inclusive prefix scans (sum for g, max for am), one shared
    # cells-roll + predicate per round
    for k in range(rounds):
        s = 1 << k
        pc = pltpu.roll(cells, shift=s, axis=0)
        ok = (row >= s) & (pc == cells)
        g = jnp.where(ok, g + pltpu.roll(g, shift=s, axis=0), g)
        am = jnp.where(ok, jnp.maximum(am, pltpu.roll(am, shift=s, axis=0)),
                       am)

    g = jnp.where(in_first, g + jnp.max(carry_tot[...], axis=0,
                                        keepdims=True), g)
    cm = jnp.max(carry_max[...], axis=0, keepdims=True)
    am = jnp.where(in_first, jnp.maximum(am, cm), am)

    tot_ref[...] = g
    amax_ref[...] = am.astype(out_dtype)

    # --- new carry: the LAST row's inclusive state -------------------------
    last = row == (chunk - 1)
    carry_cell[0] = jnp.max(jnp.where(last[:, 0], cells[:, 0], -1))
    lt = jnp.max(jnp.where(last, g, jnp.float32(_BIG_NEG)), axis=0,
                 keepdims=True)
    lm = jnp.max(jnp.where(last, am, neg), axis=0, keepdims=True)
    carry_tot[...] = jnp.broadcast_to(lt, carry_tot.shape)
    carry_max[...] = jnp.broadcast_to(lm, carry_max.shape)


def affine_segment_scan(cell_sorted: jax.Array, pts8: jax.Array,
                        mmat8: jax.Array, *,
                        out_dtype=jnp.float32, chunk: int = 1024,
                        max_prefix: int | None = None,
                        interpret: bool = False):
    """Fused sums/matmul/max pass over a run-contiguous stream.

    Args:
      cell_sorted: (N,) int32 flat cell ids with equal ids contiguous
        (per-item sorted streams concatenated are fine — ids only need to
        never repeat across run boundaries).
      pts8: (N, 8) f32, columns [x, y, z, kept, extra..., 0 pad] (see
        module docstring); column 3 is the caller-computed kept mask (1.0
        for rows that count toward sums and max, 0.0 for capped/drop/pad
        rows); N divisible by `chunk`.
      mmat8: (8, C) per-point weight matrix, row 3 zero.
      max_prefix: when the caller only reads rows within `max_prefix` rows
        of their run start (the exact point cap: everything past rank
        cap-1 is masked, so the per-cell state is complete at row
        start+cap-1), the scan statically drops to ceil(log2(max_prefix))
        rounds.  Rows deeper into a run hold incomplete partials — callers
        must gather at start+min(count, cap)-1, not at the run end.  Carry
        correctness holds: a cross-chunk read is <= max_prefix rows from
        its run start, which the shortened window still covers.

    Returns (run_tot (N, 4) f32, run_max (N, C) out_dtype) where the rows
    described above hold their cell's totals/max.
    """
    n = cell_sorted.shape[0]
    if n % chunk != 0:
        raise ValueError(f"N={n} must be divisible by chunk={chunk}")
    width = mmat8.shape[1]
    num_chunks = n // chunk
    window = chunk if max_prefix is None else min(chunk, max_prefix)
    rounds = max(1, (window - 1).bit_length())

    kernel = functools.partial(
        _kernel, chunk=chunk, rounds=rounds, out_dtype=out_dtype)

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
