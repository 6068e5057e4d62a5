"""Pallas TPU mega-kernels for the affine pillar frontend.

The production pass is `affine_scan_t` (transposed layout: stream position
in LANES, channels in sublanes).  One pass over the cell-sorted point
stream computes, per row:

  * run_tot   — inclusive segmented running sum of [xyz*kept, kept] (f32),
  * run_max   — inclusive segmented running max of the PFN pre-activations
                a = mmat @ pts (matmul on the MXU inside the kernel,
                masked to kept rows),
  * kept      — IN-kernel: valid & occurrence-rank < cap, the reference's
                per-pillar point counter (utils/point_cloud_ops.py:49-52),
                derived from the (1, chunk) cell row via capped lookback
                rounds,

carrying the partial state of the run that spans a chunk boundary in
VMEM/SMEM scratch across sequential grid steps.  With the exact point cap,
rows at start+min(count, cap)-1 hold their cell's complete [sums, count]
and max — `affine_canvas` gathers them into the dense canvas with one
unique-index gather; `_make_scan_gather` wraps scan+gather in a custom VJP
whose backward delivers per-point payloads by ONE row gather from a
strided cell-id table.

Why a kernel: XLA lowers wide segmented scans to O(n log n) HBM passes
(~1.4-2 ms for (100k, 64) on a v5e, scripts/microbench.py) while this
kernel streams the data once (~30 MB) and runs the log2(window) combine
rounds on VMEM tiles, sharing one cells-roll per round between the sum and
max scans.  Mosaic rules honored (the axon quirks memory): pltpu.roll
instead of odd concats, 32-bit lanes inside rounds.

`affine_segment_scan` (row-major layout, caller-computed kept mask in pts8
column 3) is the retained predecessor — same math, ~2.5x more VPU work —
kept as a covered reference implementation; see its docstring for the
pts8 layout contract.
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


def _kernel_t(cell_ref, pts_ref, valid_ref, mmat_ref, tot_ref, amax_ref,
              *refs,
              chunk: int, rounds: int, rank_cap: int | None, out_dtype,
              unroll: bool = True, transpose_out: bool = False,
              precision=None, want_argmax: bool = False,
              packed_argmax: bool = False, dot_in_f32: bool = False):
    """Transposed-layout kernel body: stream position lives in LANES.

    cell_ref (1, chunk) i32, pts_ref (A, chunk) f32 augmented features
    (A >= 4; rows [x, y, z, extras...]), valid_ref (1, chunk) f32 0/1,
    mmat_ref (C, A) — the per-point matrix pre-transposed so the MXU
    produces activations directly as (C, chunk).  See `affine_scan_t`.

    With want_argmax, the max scan carries (value, position) pairs with the
    lexicographic combine max-value-then-MIN-position, so a third output
    delivers each row's inclusive argmax STREAM POSITION per channel —
    the first kept row attaining the running max, i.e. exactly the row
    torch.max routes gradient to in the reference's pillar pooling.  The
    value output is bit-identical either way (ties pick an equal value).
    With packed_argmax (16-bit values + rank cap only), value and
    first-winner rank ride ONE i32 key through a plain max scan instead —
    zero extra scan cost — and the single non-tot output is that key.
    """
    if want_argmax and packed_argmax:
        carry_scalars, carry_tot, carry_key = refs
    elif want_argmax:
        argpos_ref, carry_scalars, carry_tot, carry_max, carry_pos = refs
    else:
        carry_scalars, carry_tot, carry_max = refs
    i = pl.program_id(0)
    cells = cell_ref[...]                    # (1, chunk) i32
    pts = pts_ref[...]                       # (A, chunk) f32
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    pos = i * chunk + lane                   # global stream position
    validf = valid_ref[...]                  # (1, chunk) 0/1

    carry_cell = jnp.where(i > 0, carry_scalars[0], -1)
    prev_cell = jnp.where(lane == 0, carry_cell,
                          pltpu.roll(cells, shift=1, axis=1))
    in_first = (i > 0) & (cells == carry_cell)

    if rank_cap is not None:
        # occurrence rank via an UNSEGMENTED running max of start positions:
        # runs are contiguous, so the most recent run-start at-or-before a row
        # is that row's own start.  ceil(log2(cap)) lookback rounds suffice:
        # rows whose start is further back have true rank >= 2^rounds >= cap,
        # and any stale (older) start only makes the computed rank LARGER, so
        # kept=0 either way.  Cross-chunk: rows with no start in-window fall
        # back to the carried start of the run live at the previous chunk's
        # end (same >=cap argument when stale).
        cand = jnp.where(cells != prev_cell, pos, -1)

        def cand_round(k, c):
            s = jnp.int32(1) << k if not unroll else 1 << k
            return jnp.where(
                lane >= s,
                jnp.maximum(c, pltpu.roll(c, shift=s, axis=1)), c)

        if unroll:
            for k in range(rounds):
                cand = cand_round(k, cand)
        else:
            cand = jax.lax.fori_loop(0, rounds, cand_round, cand)
        carry_start = jnp.where(i > 0, carry_scalars[1], 0)
        start = jnp.where(cand >= 0, cand, carry_start)
        keptf = validf * ((pos - start) < rank_cap).astype(jnp.float32)
    else:
        start = jnp.where(cells != prev_cell, pos, -1)  # carry bookkeeping
        keptf = validf

    # g rows: [x*kept, y*kept, z*kept, kept] — row 3 of the (4, chunk) tile
    # is the kept mask itself, not a point feature
    riota = jax.lax.broadcasted_iota(jnp.int32, (4, chunk), 0)
    g = jnp.where(riota == 3, jnp.broadcast_to(keptf, (4, chunk)),
                  pts[:4, :] * keptf)

    # PFN pre-activations on the MXU; round to out_dtype NOW (bit-compat
    # with an out_dtype matmul result) but run the combine rounds in f32.
    # precision matters for f32 operands: the MXU's default truncates to
    # bf16 (~4e-3 rel) — parity mode threads 'highest' through here so the
    # kernel matches a true-f32 reference (scripts/probe_f32_diff.py).
    # dot_in_f32 (interpret mode): CPU XLA cannot execute bf16 x bf16 ->
    # f32 dots; upcasting the ALREADY-ROUNDED bf16 operands to f32 is
    # mathematically identical (bf16 products are exact in f32, f32
    # accumulation either way)
    dot_t = jnp.float32 if dot_in_f32 else out_dtype
    a = jnp.dot(mmat_ref[...].astype(out_dtype).astype(dot_t),
                pts.astype(out_dtype).astype(dot_t),
                preferred_element_type=jnp.float32, precision=precision)
    a_rounded = a.astype(out_dtype)

    def scan(vals, combine):
        """Shared segmented-scan driver: one cells-roll + predicate per
        round, combine applied to the (g, ...) tuple."""
        def scan_round(k, carry):
            s = jnp.int32(1) << k if not unroll else 1 << k
            pc = pltpu.roll(cells, shift=s, axis=1)
            ok = (lane >= s) & (pc == cells)
            rolled = tuple(pltpu.roll(v, shift=s, axis=1) for v in carry)
            return combine(ok, carry, rolled)

        if unroll:
            for k in range(rounds):
                vals = scan_round(k, vals)
            return vals
        return jax.lax.fori_loop(0, rounds, scan_round, vals)

    # segmented inclusive prefix scans along lanes, one shared
    # roll+predicate per round; (1, chunk) cell ops cost 1/64th of the
    # (C, chunk) data ops.  unroll=True emits `rounds` static rolls
    # (fastest; measured round-2); unroll=False runs them as a fori_loop
    # with a dynamic rotate — every scanned tensor is 32-bit inside the
    # rounds (Mosaic's dynamic_rotate constraint) and the loop caps the
    # unrolled live ranges that send the f32 Mosaic compile into
    # double-digit minutes (docs/STATUS.md r2).
    if want_argmax and packed_argmax:
        # 16-bit-value mode with a rank cap: ONE i32 key packs the
        # monotone 16-bit image of the rounded value above an INVERTED
        # 12-bit occurrence rank, so the plain max scan yields the value
        # AND its first-winner rank simultaneously — argmax tracking at
        # zero extra scan cost vs the serving kernel (vs ~2x for the
        # (value, position) pair scan below).  mono: flip all bits for
        # negatives, set the sign bit for positives — a total order of
        # bf16 as ints (same trick as pillarize.segmented_max_intkey),
        # done arithmetically (65535-b / b+32768) to stay in i32 ops.
        bits = jax.lax.bitcast_convert_type(
            a_rounded, jnp.uint16).astype(jnp.int32)
        mono = jnp.where(bits >= 32768, 65535 - bits, bits + 32768)
        rank = jnp.minimum(pos - start, jnp.int32(4095))
        key = jnp.where(keptf > 0,
                        (mono << 12) | (4095 - rank), 0)

        def combine(ok, cur, rolled):
            g, km = cur
            gr, kr = rolled
            return (jnp.where(ok, g + gr, g),
                    jnp.where(ok, jnp.maximum(km, kr), km))

        g, key = scan((g, key), combine)
        g = jnp.where(in_first, g + jnp.max(carry_tot[...], axis=1,
                                            keepdims=True), g)
        ck = jnp.max(carry_key[...], axis=1, keepdims=True)
        key = jnp.where(in_first, jnp.maximum(key, ck), key)
        tot_ref[...] = g
        amax_ref[...] = key.T if transpose_out else key
        last = lane == (chunk - 1)
        carry_scalars[0] = jnp.max(jnp.where(last, cells, -1))
        carry_scalars[1] = jnp.max(jnp.where(last, start, -1))
        lt = jnp.max(jnp.where(last, g, jnp.float32(_BIG_NEG)), axis=1,
                     keepdims=True)
        lk = jnp.max(jnp.where(last, key, -1), axis=1, keepdims=True)
        carry_tot[...] = jnp.broadcast_to(lt, carry_tot.shape)
        carry_key[...] = jnp.broadcast_to(lk, carry_key.shape)
        return

    neg = jnp.float32(_BIG_NEG)
    am = jnp.where(keptf > 0, a_rounded.astype(jnp.float32), neg)
    if want_argmax:
        pm = jnp.broadcast_to(pos, am.shape)

        def combine(ok, cur, rolled):
            g, am, pm = cur
            gr, am_r, pm_r = rolled
            # earlier window wins ties (>=) -> min position for the max
            take = ok & (am_r >= am)
            return (jnp.where(ok, g + gr, g),
                    jnp.where(take, am_r, am),
                    jnp.where(take, pm_r, pm))

        g, am, pm = scan((g, am, pm), combine)
    else:
        def combine(ok, cur, rolled):
            g, am = cur
            gr, am_r = rolled
            return (jnp.where(ok, g + gr, g),
                    jnp.where(ok, jnp.maximum(am, am_r), am))

        g, am = scan((g, am), combine)

    g = jnp.where(in_first, g + jnp.max(carry_tot[...], axis=1,
                                        keepdims=True), g)
    cm = jnp.max(carry_max[...], axis=1, keepdims=True)
    if want_argmax:
        # carried state is EARLIER in the stream: it wins ties too
        cpos = jnp.max(carry_pos[...], axis=1, keepdims=True)
        take_c = in_first & (cm >= am)
        am = jnp.where(take_c, cm, am)
        pm = jnp.where(take_c, cpos, pm)
    else:
        am = jnp.where(in_first, jnp.maximum(am, cm), am)

    tot_ref[...] = g
    if transpose_out:
        # row-major (chunk, C) max tiles: the caller's end-row gather then
        # reads a row-major array directly instead of paying a full-stream
        # XLA transpose copy (410 MB at B=16).  Only the WIDE output is
        # transposed — a (chunk, 4) tot would pad its 4-wide minor dim to
        # the 128-lane tile (32x write amplification), while (4, N) tot is
        # a free BITCAST to column-major (N, 4) for XLA's gather.  The
        # VMEM-local tile transpose is vreg shuffles — values bit-identical.
        amax_ref[...] = am.astype(out_dtype).T
        if want_argmax:
            argpos_ref[...] = pm.T
    else:
        amax_ref[...] = am.astype(out_dtype)
        if want_argmax:
            argpos_ref[...] = pm

    # --- new carry: the LAST lane's inclusive state -----------------------
    last = lane == (chunk - 1)
    carry_scalars[0] = jnp.max(jnp.where(last, cells, -1))
    if rank_cap is not None:
        carry_scalars[1] = jnp.max(jnp.where(last, start, -1))
    lt = jnp.max(jnp.where(last, g, jnp.float32(_BIG_NEG)), axis=1,
                 keepdims=True)
    lm = jnp.max(jnp.where(last, am, neg), axis=1, keepdims=True)
    carry_tot[...] = jnp.broadcast_to(lt, carry_tot.shape)
    carry_max[...] = jnp.broadcast_to(lm, carry_max.shape)
    if want_argmax:
        lp = jnp.max(jnp.where(last, pm, -1), axis=1, keepdims=True)
        carry_pos[...] = jnp.broadcast_to(lp, carry_pos.shape)


def affine_scan_t(cell_sorted: jax.Array, pts_t: jax.Array,
                  valid: jax.Array, mmat_t: jax.Array, *,
                  max_points: int | None = None,
                  out_dtype=jnp.float32, chunk: int = 1024,
                  unroll_rounds: bool | None = None,
                  transpose_out: bool = False,
                  precision=None,
                  want_argmax: bool = False,
                  packed_argmax: bool = False,
                  interpret: bool = False):
    """Transposed, rank-fusing successor of `affine_segment_scan`.

    Stream position lives in the LANE dimension: cell ids are a (1, N) row
    (8 vregs per roll instead of chunk/8 half-empty ones), the 4-channel sum
    scan runs on (4, chunk) tiles, and the 64-channel max scan at full lane
    occupancy — ~2.5x less VPU work than the row-major kernel.  The kept
    mask (valid & rank < max_points) is computed IN-kernel from the cell
    row (the reference's per-pillar counter, utils/point_cloud_ops.py:49-52)
    so the caller no longer pays an XLA cummax over the stream.

    Args:
      cell_sorted: (N,) int32 run-contiguous ids (see affine_segment_scan).
      pts_t: (A, N) f32 augmented features, ROWS [x, y, z, extras...],
        A >= 4 (pad a zero row if needed); typically just the sorted
        points transposed — no widening to 8 rows is materialized.
      valid: (N,) or (1, N) f32/bool validity flag (1 in-range, 0
        drop/pad).
      mmat_t: (C, A) transposed per-point weight matrix (every row of
        pts_t is a real feature; there is no in-band valid column).
      max_points: exact per-cell point cap (None = keep every valid point).
      precision: lax matmul precision for the in-kernel dot.  None (the
        default) uses the MXU default, which TRUNCATES f32 operands to
        bf16 (~4e-3 rel); parity-precision callers must thread 'highest'
        (exactness matters only for f32 — bf16 operands are unaffected).
      unroll_rounds: True statically unrolls the combine rounds (fastest;
        the bf16 default), False runs them as an in-kernel fori_loop with
        dynamic rotates — same math, bounded live ranges, which keeps the
        f32 Mosaic compile in normal time instead of 5-11 minutes
        (docs/STATUS.md round-2 known issue).  None picks by out_dtype
        (unroll for <= 16-bit outputs, fori_loop for f32).

    Returns (run_tot (4, N) f32 rows [sum x, sum y, sum z, kept count],
    run_max (C, N) out_dtype) in TRANSPOSED layout; gather columns at
    start+min(count, cap)-1 (cap mode) or run ends (no cap), as with
    `affine_segment_scan`.  With `transpose_out=True` the MAX output comes
    back ROW-major (N, C) via a VMEM-local tile transpose at the write
    (bit-identical values), so its end-row gather skips the full-stream
    XLA transpose copy; tot stays (4, N) — its .T is a free bitcast for
    XLA, and a (chunk, 4) tile would pad the minor dim to 128 lanes
    (32x write amplification).

    With `want_argmax=True` a THIRD output is appended: the inclusive
    argmax stream position per (row, channel) — the FIRST kept row
    attaining the running max (torch.max tie semantics, reference
    modules/pointpillars.py pillar pooling).  Same layout rule as the max
    output.  The max values are bit-identical with or without it; the
    custom-VJP training path uses the positions for an exact first-winner
    backward instead of recomputing activations.

    With `packed_argmax=True` on top (requires a 16-bit out_dtype and
    max_points <= 4096): returns (run_tot, packed_key) where packed_key is
    `mono16(value) << 12 | (4095 - rank)` i32 — the plain max scan yields
    value AND first-winner rank at the serving kernel's cost.  Decode:
    value = mono16^-1(key >> 12) (exact), rank = 4095 - (key & 4095),
    argmax position = run start + rank.  Empty runs decode to key 0
    (value NaN) and must be masked by occupancy, as with the -inf max.
    """
    n = cell_sorted.shape[0]
    if n % chunk != 0:
        raise ValueError(f"N={n} must be divisible by chunk={chunk}")
    aug = pts_t.shape[0]
    if aug < 4:
        raise ValueError("pts_t needs >= 4 rows (pad a zero row)")
    width = mmat_t.shape[0]
    num_chunks = n // chunk
    window = chunk if max_points is None else min(chunk, max_points)
    rounds = max(1, (window - 1).bit_length())
    if unroll_rounds is None:
        unroll_rounds = jnp.dtype(out_dtype).itemsize <= 2
    if jnp.dtype(out_dtype).itemsize <= 2:
        # Mosaic rejects contract_precision<fp32> with sub-f32 operands
        # ("Bad lhs type"); precision only matters for f32 operands anyway
        precision = None
    if packed_argmax:
        if not want_argmax:
            raise ValueError("packed_argmax requires want_argmax")
        if jnp.dtype(out_dtype).itemsize > 2:
            raise ValueError("packed_argmax needs a 16-bit out_dtype")
        if max_points is None or max_points > 4096:
            raise ValueError("packed_argmax needs max_points <= 4096")

    kernel = functools.partial(
        _kernel_t, chunk=chunk, rounds=rounds,
        rank_cap=max_points, out_dtype=out_dtype, unroll=unroll_rounds,
        transpose_out=transpose_out, precision=precision,
        want_argmax=want_argmax, packed_argmax=packed_argmax,
        dot_in_f32=interpret)

    def idx(i):
        return (0, i)

    wide_dtype = jnp.int32 if packed_argmax else out_dtype
    if transpose_out:
        out_specs = [
            pl.BlockSpec((4, chunk), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((4, n), jnp.float32),
            jax.ShapeDtypeStruct((n, width), wide_dtype),
        ]
        if want_argmax and not packed_argmax:
            out_specs.append(pl.BlockSpec((chunk, width), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((n, width), jnp.int32))
    else:
        out_specs = [
            pl.BlockSpec((4, chunk), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((width, chunk), idx, memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((4, n), jnp.float32),
            jax.ShapeDtypeStruct((width, n), wide_dtype),
        ]
        if want_argmax and not packed_argmax:
            out_specs.append(pl.BlockSpec((width, chunk), idx,
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((width, n), jnp.int32))

    return pl.pallas_call(
        kernel,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((1, chunk), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((aug, chunk), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((width, aug), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.SMEM((2,), jnp.int32),
             pltpu.VMEM((4, 128), jnp.float32)]
            + ([pltpu.VMEM((width, 128), jnp.int32)] if packed_argmax
               else [pltpu.VMEM((width, 128), jnp.float32)])
            + ([pltpu.VMEM((width, 128), jnp.int32)]
               if want_argmax and not packed_argmax else [])),
        interpret=interpret,
    )(cell_sorted[None, :].astype(jnp.int32), pts_t,
      valid.reshape(1, n).astype(pts_t.dtype), mmat_t)


def _broadcast_kernel_t(cell_ref, vals_ref, out_ref, carry_scalar, carry_val,
                        *, chunk: int, rounds: int):
    """Segmented inclusive prefix-MAX along lanes with cross-chunk carries:
    a payload placed at each run's START row propagates to every row of the
    run (all other rows hold -inf).  General segmented-broadcast utility
    over run-contiguous streams (the custom VJP used it before the strided
    cell-id table made a plain row gather cheaper)."""
    i = pl.program_id(0)
    cells = cell_ref[...]                    # (1, chunk)
    v = vals_ref[...]                        # (C, chunk) f32
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    in_first = (i > 0) & (cells == jnp.where(i > 0, carry_scalar[0], -1))

    for k in range(rounds):
        s = 1 << k
        pc = pltpu.roll(cells, shift=s, axis=1)
        ok = (lane >= s) & (pc == cells)
        v = jnp.where(ok, jnp.maximum(v, pltpu.roll(v, shift=s, axis=1)), v)

    cm = jnp.max(carry_val[...], axis=1, keepdims=True)
    v = jnp.where(in_first, jnp.maximum(v, cm), v)
    out_ref[...] = v

    last = lane == (chunk - 1)
    carry_scalar[0] = jnp.max(jnp.where(last, cells, -1))
    lm = jnp.max(jnp.where(last, v, jnp.float32(_BIG_NEG)), axis=1,
                 keepdims=True)
    carry_val[...] = jnp.broadcast_to(lm, carry_val.shape)


def segment_broadcast_t(cell_sorted: jax.Array, vals_t: jax.Array, *,
                        chunk: int = 2048, interpret: bool = False):
    """Per-run prefix-max broadcast over a run-contiguous stream.

    vals_t: (C, N) f32 with the payload at each run's FIRST row and -inf
    (any dominated value) elsewhere; returns (C, N) where every row of a run
    holds the run's payload.  Full-window scan (runs of any length)."""
    n = cell_sorted.shape[0]
    if n % chunk != 0:
        raise ValueError(f"N={n} must be divisible by chunk={chunk}")
    width = vals_t.shape[0]
    rounds = max(1, (chunk - 1).bit_length())

    kernel = functools.partial(_broadcast_kernel_t, chunk=chunk,
                               rounds=rounds)

    def idx(i):
        return (0, i)

    return pl.pallas_call(
        kernel,
        grid=(n // chunk,),
        in_specs=[
            pl.BlockSpec((1, chunk), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((width, chunk), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((width, chunk), idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((width, n), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((width, 128), jnp.float32),
        ],
        interpret=interpret,
    )(cell_sorted[None, :].astype(jnp.int32), vals_t)


def _bwd_dmmat_kernel(both_ref, pts_ref, out_ref, *,
                      chunk: int, out_dtype, precision=None,
                      dot_in_f32: bool = False):
    """Fused d(mmat) backward: per chunk, select each row's cotangent by
    ARGMAX POSITION equality and accumulate the (C, A) contraction on the
    MXU.

    both_ref is the gathered (chunk, 2C) f32 table tile
    [float(argpos) | d_smax]: row p's first half holds, per channel, the
    stream position of its cell's first kept max row (from the forward
    kernel's want_argmax scan) as an EXACT integer-valued f32 (stream
    length is guarded < 2**24, so the convert round-trips bit-exactly).
    Positions must NOT ride as an int32->f32 BITCAST: positions < 2**23
    are denormal f32 bit patterns, and XLA:TPU's concatenate lowering
    flushes denormal lanes to zero (fusion-dependent in larger graphs) —
    measured on a v5e by scripts/probe_argpos.py + /tmp denorm repro,
    round 4; it silently re-routed cotangents to stream position 0.  d(a)[p, c] = d_smax[cell_p, c] iff
    p == argpos[cell_p, c] — exact torch.max first-winner semantics, no
    activation recompute, no tolerance window, robust to any compiler
    reduction-order divergence.  Replaces the XLA chain gather -> relayout
    copy (410 MB at B=16) -> cummax -> masked einsum: everything after the
    row gather streams through VMEM once.
    """
    i = pl.program_id(0)
    both = both_ref[...]                      # (chunk, 2C) f32
    width = both.shape[1] // 2
    argpos = both[:, :width].astype(jnp.int32)
    ds = both[:, width:]
    pts = pts_ref[...]                        # (A, chunk) f32
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    pos = i * chunk + row                     # global stream position
    dot_t = jnp.float32 if dot_in_f32 else out_dtype
    da = jnp.where(argpos == pos, ds, jnp.zeros((), ds.dtype)
                   ).astype(out_dtype).astype(dot_t)
    # (C, A) partial: contract the stream dim of da (dim 0) with pts (dim 1)
    partial = jax.lax.dot_general(
        da, pts.astype(out_dtype).astype(dot_t), (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = partial

    @pl.when(i > 0)
    def _acc():
        out_ref[...] += partial


def affine_bwd_dmmat(cell_sorted: jax.Array, both: jax.Array,
                     pts_t: jax.Array, width: int,
                     *, out_dtype=jnp.float32, chunk: int = 1024,
                     precision=None,
                     interpret: bool = False) -> jax.Array:
    """d(mmat_t) for the affine segment-max: one fused pass over the sorted
    stream.  `both` is the per-point (N, 2C) gathered f32 payload
    [float(argpos) | d_smax] (see _make_scan_gather.bwd); `width` = C.
    `cell_sorted` is unused by the kernel (selection is by position
    equality) but kept in the signature as the stream-defining operand for
    symmetry with the forward.  Returns (C, A) f32."""
    n = both.shape[0]
    if n % chunk != 0:
        raise ValueError(f"N={n} must be divisible by chunk={chunk}")
    aug = pts_t.shape[0]
    if jnp.dtype(out_dtype).itemsize <= 2:
        precision = None   # Mosaic: no fp32 contract precision on bf16

    kernel = functools.partial(
        _bwd_dmmat_kernel, chunk=chunk, out_dtype=out_dtype,
        precision=precision, dot_in_f32=interpret)

    def idx(i):
        return (0, i)

    return pl.pallas_call(
        kernel,
        grid=(n // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 2 * width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((aug, chunk), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((width, aug), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((width, aug), jnp.float32),
        interpret=interpret,
    )(both, pts_t)


@functools.lru_cache(maxsize=None)
def _make_scan_gather(max_points, out_dtype, chunk, interpret,
                      batch, cells_per_item, precision=None):
    """custom_vjp'd (kernel scan + end-row gather) factory, cached per
    static configuration (`batch`/`cells_per_item` describe the strided
    per-item cell space of the caller, ops/pillarize.affine_canvas).

    Forward runs `affine_scan_t` and gathers the per-cell completed rows.
    Backward hand-derives d(mmat_t) only:

      smax[cell] = max over kept p of a_p,  a_p = round(mmat_t @ pts_t)
      => da[:, p] = d_smax[cell_p] * [p == argmax-position[cell_p]],
         d mmat_t = da @ pts_t.T

    The per-point (argpos, d_smax) copies come from ONE row gather of a
    combined (b*stride, 2C) table: `cell_s` is the strided id (stride =
    cells_per_item + 1, the trailing slot being each item's drop segment),
    so padding the (b, c3, 2C) payload with one zero row per item yields a
    table that `cell_s` indexes directly.  The zero drop-slot is safe
    because every drop-run row has kept=0.  This replaced a (N, 2C) -inf
    canvas scatter + full-window segmented broadcast kernel — measured
    ~21 ms of the 39 ms B=16 train step on a v5e — with padded reshape +
    one row gather.  Three further round-3 cuts (scripts/probe_decomp_b16
    measured the bwd at ~10.3 ms of the 27 ms B=16 step before them):

      * the argpos and d_smax rows ride ONE combined (·, 2C) f32 gather
        (positions bitcast to f32) — row gathers here are per-row bound,
        so width is free and a second gather would be pure overhead;
      * da and the pts operand of the d_mmat contraction feed the MXU in
        out_dtype with f32 accumulation (bf16 rounding of the point
        coordinates is far below bf16 training noise; f32 mode is
        unchanged — everything is f32 there anyway).

    Cotangents for points (and for the sums/count output) are defined as
    ZERO: training differentiates parameters, not point coordinates
    (matches the reference, which never backprops into the cloud).  Argmax
    rows are selected by POSITION: the forward kernel's (value, position)
    scan records, per (cell, channel), the stream position of the FIRST
    kept row attaining the max (want_argmax), and the backward routes the
    whole cotangent to exactly that row — torch.max semantics
    (modules/pointpillars.py pillar pooling), robust by construction to
    any compiler/hardware reduction-order divergence.  This replaced a
    2-ULP value-window match against a recomputed activation, which gave
    the FULL cotangent to every tied row: the reference's fixed-size scans
    duplicate ~30% of points (dataset_utils sampling with replacement), so
    every duplicated point is an exact tie and the window over-counted its
    gradient by its multiplicity (~0.4 rel d(kernel) error on the real
    fixture, scripts/verify_tpu.py found it; for identical duplicates the
    first-winner sum equals XLA autodiff's tie-split sum exactly).
    """

    out_dtype = jnp.dtype(out_dtype)   # cached by name for hashability
    b, c3 = batch, cells_per_item
    # 16-bit values + cap: value and first-winner rank ride one packed i32
    # key through a plain max scan — argmax tracking at zero extra scan
    # cost.  f32 (or capless) falls back to the (value, position) pair
    # scan.  `starts` (per-cell run starts) is a primal argument so the
    # packed decode can map rank -> global position; it is unused by the
    # pair-scan modes and gets a zero cotangent either way.
    packed = (out_dtype.itemsize <= 2 and max_points is not None
              and max_points <= 4096)

    @jax.custom_vjp
    def scan_gather(cell_s, ends, starts, pts_t, valid, mmat_t):
        # transpose_out: the kernel writes the max row-major (N, C), so the
        # end-row gather below reads it directly — the (C, N) layout would
        # cost a full-stream XLA transpose copy first (410 MB at B=16).
        # tot stays (4, N): its .T is a free bitcast for XLA's gather.
        tot_t, max_nc = affine_scan_t(
            cell_s, pts_t, valid, mmat_t, max_points=max_points,
            out_dtype=out_dtype, chunk=chunk, transpose_out=True,
            precision=precision, interpret=interpret)
        return tot_t.T[ends], max_nc[ends]

    def fwd(cell_s, ends, starts, pts_t, valid, mmat_t):
        # the VJP fwd runs the argmax-tracking variant (same max VALUES,
        # bit-identical) and keeps the gathered per-cell argmax positions
        # as the residual — max_g itself is NOT needed by the backward
        if packed:
            tot_t, key_nc = affine_scan_t(
                cell_s, pts_t, valid, mmat_t, max_points=max_points,
                out_dtype=out_dtype, chunk=chunk, transpose_out=True,
                precision=precision, want_argmax=True, packed_argmax=True,
                interpret=interpret)
            key_g = key_nc[ends]                       # (b*c3, C) i32
            mono = key_g >> 12
            bits = jnp.where(mono >= 32768, mono - 32768, 65535 - mono)
            # HAZARD: XLA:TPU's `concatenate` flushes denormal lanes of
            # bitcast-produced floats (docs/KERNELS.md "Denormal bit-pattern
            # hazard") — max_g may hold denormal bf16 bit patterns here.
            # Never route max_g through a concatenate; keep consumers
            # elementwise/gather-only (today its only consumer is the fwd
            # output epilogue).
            max_g = jax.lax.bitcast_convert_type(
                bits.astype(jnp.uint16), out_dtype)    # exact inverse
            argpos_g = starts[:, None] + (4095 - (key_g & 4095))
        else:
            tot_t, max_nc, argpos_nc = affine_scan_t(
                cell_s, pts_t, valid, mmat_t, max_points=max_points,
                out_dtype=out_dtype, chunk=chunk, transpose_out=True,
                precision=precision, want_argmax=True, interpret=interpret)
            max_g = max_nc[ends]
            argpos_g = argpos_nc[ends]
        return ((tot_t.T[ends], max_g),
                (cell_s, pts_t, valid, mmat_t, argpos_g))

    def pad_table(vals):
        """(b*c3, W) cell-ordered rows -> (b*(c3+1), W) strided-id table
        with a zero drop-slot row per item."""
        width = vals.shape[-1]
        return jnp.pad(vals.reshape(b, c3, width),
                       ((0, 0), (0, 1), (0, 0))).reshape(-1, width)

    def bwd(res, cts):
        cell_s, pts_t, valid, mmat_t, argpos_g = res
        _, d_max_g = cts

        # Everything stays in (N, C) layout — the gathered tables' natural
        # row-major shape.  One combined gather delivers both the argmax
        # position and the cotangent: TPU row gathers at this size are
        # per-ROW bound (~2.6 ns/row on v5e, flat from 64- to 128-wide
        # rows), so one wide gather costs half of two narrow ones.  The
        # positions ride as EXACT integer-valued f32 (convert, not
        # bitcast: positions < 2**23 are denormal f32 bit patterns and
        # XLA:TPU's concatenate flushes denormal lanes to zero — see
        # _bwd_dmmat_kernel's docstring; convert is exact below 2**24,
        # guarded here).  The drop-slot zero row decodes to argpos 0 with
        # d_smax 0, so drop/pad rows contribute nothing.
        if cell_s.shape[0] >= (1 << 24):  # static shape: trace-time check
            raise ValueError(
                "affine custom-VJP backward encodes argmax positions as "
                f"exact f32; stream length {cell_s.shape[0]} >= 2**24 "
                "would round them — split the batch")
        both = pad_table(jnp.concatenate(
            [argpos_g.astype(jnp.float32),
             d_max_g.astype(jnp.float32)], axis=-1))[cell_s]

        # everything after the gather — the position-equality mask and the
        # (C, A) contraction — runs in ONE fused Mosaic pass that consumes
        # the gather output in its natural row-major layout
        # (affine_bwd_dmmat); the XLA chain needed a 410 MB relayout copy
        # before the dot plus a full-stream cummax (B=16 measurements in
        # docs/KERNELS.md "Train backward budget").
        d_mmat = affine_bwd_dmmat(
            cell_s, both, pts_t, mmat_t.shape[0],
            out_dtype=out_dtype, chunk=chunk,
            precision=precision, interpret=interpret)
        return (None, None, None, jnp.zeros_like(pts_t),
                jnp.zeros_like(valid), d_mmat)

    scan_gather.defvjp(fwd, bwd)
    return scan_gather


def _hist_kernel(cells_ref, out_ref, *, ny: int, nx: int, chunk: int):
    """One grid step: build the chunk's factored one-hots IN VMEM and
    accumulate their (ny, nx) outer-product histogram on the MXU."""
    step = pl.program_id(1)
    c = cells_ref[...].reshape(1, chunk)            # (1, 1, 1, chunk) int32
    q = c // nx
    r = c - q * nx
    yiota = jax.lax.broadcasted_iota(jnp.int32, (ny, chunk), 0)
    xiota = jax.lax.broadcasted_iota(jnp.int32, (nx, chunk), 0)
    ohq = (q == yiota).astype(jnp.bfloat16)         # drop rows: q == ny,
    ohr = (r == xiota).astype(jnp.bfloat16)         # matches nothing
    acc = jax.lax.dot_general(ohq, ohr, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    @pl.when(step == 0)
    def _init():
        out_ref[0] = acc

    @pl.when(step != 0)
    def _accum():
        out_ref[0] += acc


def histogram_counts_pallas(local_cells: jax.Array, ny: int, nx: int, *,
                            chunk: int = 2048,
                            interpret: bool = False) -> jax.Array:
    """(B, ny, nx) f32 per-item cell-count histogram, one-hots never
    leaving VMEM.

    The XLA form below materializes both (B, Np, ny|nx) bf16 one-hots in
    HBM — ~205 MB of traffic at fine_grid scale (Np=102400, ny=nx=250),
    measured 352 us in-situ vs ~33 us of MXU math.  This kernel streams
    (1, chunk) cell-id rows, builds the (ny|nx, chunk) one-hot tiles in
    VMEM, and accumulates the counts on the MXU across a sequential grid.
    Exact: 0/1 bf16 operands with f32 accumulation, counts << 2^24.
    """
    b, n = local_cells.shape
    pad = (-n) % chunk
    if pad:
        # drop id ny*nx: its q == ny falls outside the one-hot -> zero row
        local_cells = jnp.pad(local_cells, ((0, 0), (0, pad)),
                              constant_values=ny * nx)
    steps = local_cells.shape[1] // chunk
    # explicit singleton sublane dim: Mosaic requires the block's last two
    # dims be (8k, 128k) or EQUAL to the array's — (1, chunk) blocks on a
    # (B, Np) array violate that for B > 1, so block over (B, steps, 1,
    # chunk) where (1, chunk) == the array's own trailing dims.
    cells4 = local_cells.reshape(b, steps, 1, chunk)
    kernel = functools.partial(_hist_kernel, ny=ny, nx=nx, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid=(b, steps),
        in_specs=[pl.BlockSpec((1, 1, 1, chunk), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ny, nx), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ny, nx), jnp.float32),
        interpret=interpret,
    )(cells4)


def histogram_ends(local_cells: jax.Array, ny: int, nx: int, *,
                   use_pallas: bool = False, interpret: bool = False):
    """Per-item run-END index per cell via factored one-hot histogram
    matmuls.

    XLA's searchsorted costs ~1 ms for 10k queries in 100k keys on a v5e
    (log-rounds of serialized gathers); a bf16 one-hot histogram einsum is
    exact (0/1 inputs, f32 accumulation, counts << 2^24) and runs on the MXU
    in ~0.1 ms.  The one-hots are factored per item over q = c // nx (ny
    wide) and r = c % nx (nx wide), so the cost stays LINEAR in batch size
    (a flat batched cell space would need a B*ny-wide one-hot).

    With use_pallas=True the counts come from `histogram_counts_pallas`
    (identical values; the one-hots stay in VMEM) — a win once ny/nx are
    large enough that the XLA form's HBM one-hot materialization dominates
    (fine_grid's 250-wide grid: 352 -> ~100 us).

    Args:
      local_cells: (B, Np) int32 per-item sorted LOCAL cell ids; drop/pad
        rows carry ny*nx (their q == ny falls outside the one-hot).

    Returns (ends (B, ny*nx) int32 clipped >= 0 — row indices within each
    item's Np stream, counts_raw (B, ny*nx) int32); cells with zero raw
    points have counts_raw == 0 (their `ends` value is meaningless and must
    be masked by the caller).
    """
    if use_pallas:
        counts = histogram_counts_pallas(local_cells, ny, nx,
                                         interpret=interpret)
    else:
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
