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
    (chunk, C) tiles in VMEM — pure VPU work, no HBM traffic (chunk is kept
    at 1024 because Mosaic stack-allocates each unrolled round's temporaries
    without reuse; larger chunks exhaust the 16 MB VMEM);
  * one HBM read of the stream, one HBM write of the result.

`suffix_segment_reduce(..., op='max'|'sum')` is the public entry;
`interpret=True` runs the same kernel on CPU for tests.

Status: bit-exact vs the scatter path on real v5e at (114688, 64)/10k cells;
measured ~1.9 ms vs ~2.5 ms for the XLA scatter-max under the dev pool's
~0.75 ms/dispatch noise floor.  Not yet wired into the model's fused path —
the next optimization step is fusing the PFN matmul into this kernel (MXU in
the same pass) and capping the pointer-jump rounds to the chunk's longest
run, which removes most of the per-round VPU work.
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
    width = x.shape[1]
    row_id = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    # in-chunk suffix segmented reduce: pointer jumping with pltpu.roll
    # (layout-friendly on Mosaic; wrapped rows masked via iota)
    for k in range(rounds):
        s = 1 << k
        # roll by chunk - s == roll by -s (pltpu.roll wants shift >= 0):
        # row i sees row i + s (wrapped rows masked below)
        nxt_x = pltpu.roll(x, shift=chunk - s, axis=0)
        nxt_c = pltpu.roll(cells, shift=chunk - s, axis=0)
        same = (row_id < chunk - s) & (nxt_c == cells)
        if is_max:
            x = jnp.where(same, jnp.maximum(x, nxt_x), x)
        else:
            x = jnp.where(same, x + nxt_x, x)

    # merge the carried partial run from the LATER (already processed) chunk:
    # rows whose cell equals the later chunk's first cell extend into it.
    cv = carry_val[...].astype(x.dtype)               # (8, C), rows identical
    cv_row = jnp.max(cv, axis=0, keepdims=True)       # (1, C)
    match = (i > 0) & (cells == carry_cell[0])
    if is_max:
        merged = jnp.where(match, jnp.maximum(x, cv_row), x)
    else:
        merged = jnp.where(match, x + cv_row, x)
    out_ref[...] = merged

    # new carry = this chunk's fully-merged first row, broadcast to 8 rows
    if is_max:
        first = jnp.max(jnp.where(row_id == 0, merged,
                                  x.dtype.type(-jnp.inf)),
                        axis=0, keepdims=True)
    else:
        first = jnp.sum(jnp.where(row_id == 0, merged, x.dtype.type(0)),
                        axis=0, keepdims=True)
    carry_val[...] = jnp.broadcast_to(first, (8, width)).astype(jnp.float32)
    carry_cell[0] = jnp.min(jnp.where(row_id[:, 0] == 0, cells[:, 0],
                                      jnp.int32(2 ** 30)))


def suffix_segment_reduce(x: jax.Array, cell: jax.Array, op: str = "max",
                          chunk: int = 1024,
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
            pltpu.VMEM((8, width), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(x, cell[:, None].astype(jnp.int32))


def segment_reduce_canvas(point_feats: jax.Array, cell: jax.Array,
                          num_cells: int, op: str = "max",
                          chunk: int = 1024, interpret: bool = False):
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
