"""Pallas TPU kernel: suffix segmented reduce over a sorted stream.

XLA lowers duplicate-index scatters (the segment-max that builds the
pseudo-image canvas, ops/pillarize.scatter_max_canvas) to a serialized
per-row update loop — measured ~1.4 ms for (114k, 64) on a v5e, 50x off the
memory roofline.  This kernel computes the same per-cell reduction in ONE
pass over the cell-sorted stream:

  out[i, :] = reduce(x[j, :] for j >= i while cell[j] == cell[i])

so every run-START row ends up holding its cell's full reduction.  The canvas
is then a plain (unique-index) gather of the run-start rows.

TPU-idiomatic structure:
  * the grid walks chunks of the stream in REVERSE data order (TPU grid steps
    execute sequentially per core), carrying the partially-reduced first run
    of the later chunk in VMEM/SMEM scratch across steps;
  * within a chunk the reduction is log2(chunk) pointer-jumping rounds on
    (chunk, C) tiles in VMEM — pure VPU work, no HBM traffic;
  * one HBM read of the stream, one HBM write of the result.

`suffix_segment_reduce(..., op='max'|'sum')` is the public entry;
`interpret=True` runs the same kernel on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, cell_ref, out_ref, carry_val, carry_cell, *,
            chunk: int, rounds: int, is_max: bool):
    i = pl.program_id(0)

    x = x_ref[...]                      # (chunk, C)
    cells = cell_ref[...]               # (chunk, 1) int32

    # in-chunk suffix segmented reduce: pointer jumping over VMEM values
    identity = x.dtype.type(-jnp.inf) if is_max else x.dtype.type(0)
    c = cells[:, 0]
    for k in range(rounds):
        s = 1 << k
        nxt_x = jnp.concatenate(
            [x[s:], jnp.full((s, x.shape[1]), identity, x.dtype)], axis=0)
        nxt_c = jnp.concatenate(
            [c[s:], jnp.full((s,), -2, jnp.int32)], axis=0)
        same = (nxt_c == c)[:, None]
        if is_max:
            x = jnp.where(same, jnp.maximum(x, nxt_x), x)
        else:
            x = jnp.where(same, x + nxt_x, x)

    # merge the carried partial run from the LATER (already processed) chunk:
    # rows whose cell equals the later chunk's first cell extend into it.
    @pl.when(i > 0)
    def _():
        match = (c == carry_cell[0])[:, None]
        cv = carry_val[...].astype(x.dtype)
        if is_max:
            out_ref[...] = jnp.where(match, jnp.maximum(x, cv), x)
        else:
            out_ref[...] = jnp.where(match, x + cv, x)

    @pl.when(i == 0)
    def _():
        out_ref[...] = x

    # new carry = this chunk's first row after full merging
    @pl.when(i > 0)
    def _():
        carry_val[...] = out_ref[0:1, :].astype(carry_val.dtype)

    @pl.when(i == 0)
    def _():
        carry_val[...] = x[0:1, :].astype(carry_val.dtype)
    carry_cell[0] = c[0]


def suffix_segment_reduce(x: jax.Array, cell: jax.Array, op: str = "max",
                          chunk: int = 4096,
                          interpret: bool = False) -> jax.Array:
    """Suffix segmented reduce of (N, C) `x` over sorted (N,) `cell` runs.

    Requirements: N divisible by `chunk`; `cell` sorted ascending (runs
    contiguous); cell values >= -1 (-2 is reserved as an internal sentinel).
    Returns (N, C) where each run-start row holds the run's full reduction
    (other rows hold suffix partials).
    """
    if op not in ("max", "sum"):
        raise ValueError(f"op must be 'max' or 'sum', got {op!r}")
    n, width = x.shape
    if n % chunk != 0:
        raise ValueError(f"N={n} must be divisible by chunk={chunk}")
    num_chunks = n // chunk
    rounds = max(1, (chunk - 1).bit_length())

    kernel = functools.partial(
        _kernel, chunk=chunk, rounds=rounds, is_max=(op == "max"))

    # reverse data order: grid step i processes chunk (num_chunks - 1 - i)
    def idx(i):
        return (num_chunks - 1 - i, 0)

    return pl.pallas_call(
        kernel,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, width), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, width), idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, width), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, width), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(x, cell[:, None].astype(jnp.int32))


def segment_reduce_canvas(point_feats: jax.Array, cell: jax.Array,
                          num_cells: int, op: str = "max",
                          chunk: int = 4096, interpret: bool = False):
    """Per-cell reduction of a sorted stream into a dense (num_cells, C) map.

    `cell` must be sorted ascending with values in [0, num_cells] (num_cells
    = drop segment).  Returns (canvas (num_cells, C), counts (num_cells,)).
    Empty cells are zero.  This is the sorted-stream alternative to the
    duplicate-index scatter in ops/pillarize.scatter_max_canvas.
    """
    reduced = suffix_segment_reduce(point_feats, cell, op=op, chunk=chunk,
                                    interpret=interpret)
    # run-start positions per cell id: one searchsorted per cell (binary
    # search — no scatter); start[c] == start[c+1] means cell c is empty.
    starts = jnp.searchsorted(cell, jnp.arange(num_cells + 1, dtype=cell.dtype),
                              side="left")
    counts = (starts[1:] - starts[:-1]).astype(jnp.int32)
    rows = reduced[jnp.clip(starts[:-1], 0, point_feats.shape[0] - 1)]
    canvas = jnp.where((counts > 0)[:, None], rows, 0).astype(point_feats.dtype)
    return canvas, counts
