"""In-VMEM bitonic sort of int32 keys (Pallas/Mosaic).

Why: the B=1 affine frontend sorts ONE packed (cell << log2(idxcap) | iota)
int32 key per scan.  XLA:TPU's sort custom-call measured ~400 us for 102400
keys on a v5e (already with is_stable=False) — it streams HBM on every one
of the ~153 bitonic stages.  The whole key array is only 0.5 MB: this
kernel keeps it resident in VMEM (~16 MB/core) for all stages, so each
stage is two vector rolls + a handful of selects with zero HBM traffic.

Layout: keys live as an (R, 128) i32 block (global index i = row * 128 +
lane).  A bitonic compare-exchange at distance d pairs index i with i ^ d:

  * d < 128: partners stay WITHIN a 128-lane row (d | 128), so two LANE
    rolls (by d and 128 - d, both wrap per row) deliver x[lane - d] and
    x[lane + d]; each lane selects the one matching its XOR partner.
  * d >= 128: d = 128 * e pairs row r with r ^ e in the same lane — two
    SUBLANE-dim rolls (by e and R - e) + a row-bit select.

Direction: standard bitonic — ascending iff bit k of i is 0, where the
current merge block is 2^(k+1) wide.  The (k, d) schedule for all
sum(1..log2 n) stages ships as a small SMEM operand so the kernel is one
fori_loop over stages (dynamic roll shifts are fine for 32-bit data;
unrolling 153 stages risks the Mosaic compile blowups seen for the f32
scan rounds, docs/STATUS.md r2).

Scope: ascending, power-of-two n, int32, single array (the caller embeds
any payload/stability iota in the key — exactly what the packed-key sort
needs).  Callers pad to the next power of two with INT32_MAX sentinels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _schedule(n: int) -> np.ndarray:
    """(num_stages, 2) int32 [k_bit, distance] for bitonic-sorting n keys."""
    logn = n.bit_length() - 1
    rows = []
    for k in range(1, logn + 1):          # block size 2^k after this merge
        for j in range(k - 1, -1, -1):    # exchange distance 2^j
            rows.append((1 << k, 1 << j))
    return np.asarray(rows, np.int32)


def _sort_kernel(sched_ref, x_ref, out_ref, *, rows: int, num_stages: int):
    """Dynamic-schedule variant: one fori_loop over SMEM (k, d) rows.
    Slower than the static unroll (dynamic rotates + an in-loop cond cost
    ~7x the raw vector work: 843 vs 119 us at n=131072 on a v5e) but kept
    as the compile-time-bounded fallback."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    gidx = row * 128 + lane

    def stage(s, x):
        kbit = sched_ref[s, 0]            # 2^k: direction block size
        d = sched_ref[s, 1]               # exchange distance

        def lane_exchange(x):
            lo = pltpu.roll(x, shift=jnp.mod(128 - d, 128), axis=1)
            hi = pltpu.roll(x, shift=d, axis=1)
            # partner of lane l is l ^ d: lanes with bit d clear read
            # x[lane + d] (the 128-d roll), set read x[lane - d]
            return jnp.where((lane & d) == 0, lo, hi)

        def row_exchange(x):
            e = d // 128
            lo = pltpu.roll(x, shift=jnp.mod(rows - e, rows), axis=0)
            hi = pltpu.roll(x, shift=e, axis=0)
            return jnp.where((row & (d // 128)) == 0, lo, hi)

        partner = jax.lax.cond(d < 128, lane_exchange, row_exchange, x)
        # ascending iff bit k of the global index is 0; the lower XOR
        # partner keeps min when ascending (and max when descending)
        take_min = ((gidx & d) == 0) == ((gidx & kbit) == 0)
        return jnp.where(take_min, jnp.minimum(x, partner),
                         jnp.maximum(x, partner))

    out_ref[...] = jax.lax.fori_loop(0, num_stages, stage, x_ref[...])


def _sort_kernel_static(x_ref, out_ref, *, rows: int, n: int):
    """Statically-unrolled bitonic network: every stage's distance and
    direction mask are trace-time constants, so rolls lower to fixed
    shuffles and there is no in-loop branching."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    gidx = row * 128 + lane
    x = x_ref[...]
    for kbit, d in _schedule(n):
        kbit, d = int(kbit), int(d)
        if d < 128:
            lo = pltpu.roll(x, shift=(128 - d) % 128, axis=1)
            hi = pltpu.roll(x, shift=d, axis=1)
            partner = jnp.where((lane & d) == 0, lo, hi)
        else:
            e = d // 128
            lo = pltpu.roll(x, shift=(rows - e) % rows, axis=0)
            hi = pltpu.roll(x, shift=e, axis=0)
            partner = jnp.where((row & e) == 0, lo, hi)
        take_min = ((gidx & d) == 0) == ((gidx & kbit) == 0)
        x = jnp.where(take_min, jnp.minimum(x, partner),
                      jnp.maximum(x, partner))
    out_ref[...] = x


def _sort2_kernel_static(hi_ref, lo_ref, hi_out, lo_out, *, rows: int,
                         n: int):
    """Two-word lexicographic variant of `_sort_kernel_static`: sorts
    (hi, lo) int32 pairs ascending by (hi, then lo).  When `lo` is unique
    (the call sites pass a stream iota) every comparison is tie-free, so
    the unstable network reproduces exactly the stable-by-hi order —
    this is the in-VMEM replacement for the (cell, iota) two-operand XLA
    fallback that oversized grids (fine_grid's 62501 cells, pillarize.py)
    take when (cell, iota) cannot pack into one int32 word."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    gidx = row * 128 + lane
    hi = hi_ref[...]
    lo = lo_ref[...]
    for kbit, d in _schedule(n):
        kbit, d = int(kbit), int(d)
        if d < 128:
            sel = (lane & d) == 0
            phi = jnp.where(sel, pltpu.roll(hi, shift=(128 - d) % 128,
                                            axis=1),
                            pltpu.roll(hi, shift=d, axis=1))
            plo = jnp.where(sel, pltpu.roll(lo, shift=(128 - d) % 128,
                                            axis=1),
                            pltpu.roll(lo, shift=d, axis=1))
        else:
            e = d // 128
            sel = (row & e) == 0
            phi = jnp.where(sel, pltpu.roll(hi, shift=(rows - e) % rows,
                                            axis=0),
                            pltpu.roll(hi, shift=e, axis=0))
            plo = jnp.where(sel, pltpu.roll(lo, shift=(rows - e) % rows,
                                            axis=0),
                            pltpu.roll(lo, shift=e, axis=0))
        take_min = ((gidx & d) == 0) == ((gidx & kbit) == 0)
        self_lt = (hi < phi) | ((hi == phi) & (lo < plo))
        keep = take_min == self_lt
        hi = jnp.where(keep, hi, phi)
        lo = jnp.where(keep, lo, plo)
    hi_out[...] = hi
    lo_out[...] = lo


def _sort2_kernel(sched_ref, hi_ref, lo_ref, hi_out, lo_out, *, rows: int,
                  num_stages: int):
    """Dynamic-schedule two-word variant (compile-time-bounded fallback,
    like `_sort_kernel`)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    gidx = row * 128 + lane

    def stage(s, carry):
        hi, lo = carry
        kbit = sched_ref[s, 0]
        d = sched_ref[s, 1]

        def lane_exchange(hi, lo):
            sel = (lane & d) == 0
            phi = jnp.where(sel,
                            pltpu.roll(hi, shift=jnp.mod(128 - d, 128),
                                       axis=1),
                            pltpu.roll(hi, shift=d, axis=1))
            plo = jnp.where(sel,
                            pltpu.roll(lo, shift=jnp.mod(128 - d, 128),
                                       axis=1),
                            pltpu.roll(lo, shift=d, axis=1))
            return phi, plo

        def row_exchange(hi, lo):
            e = d // 128
            sel = (row & e) == 0
            phi = jnp.where(sel,
                            pltpu.roll(hi, shift=jnp.mod(rows - e, rows),
                                       axis=0),
                            pltpu.roll(hi, shift=e, axis=0))
            plo = jnp.where(sel,
                            pltpu.roll(lo, shift=jnp.mod(rows - e, rows),
                                       axis=0),
                            pltpu.roll(lo, shift=e, axis=0))
            return phi, plo

        phi, plo = jax.lax.cond(d < 128, lane_exchange, row_exchange,
                                hi, lo)
        take_min = ((gidx & d) == 0) == ((gidx & kbit) == 0)
        self_lt = (hi < phi) | ((hi == phi) & (lo < plo))
        keep = take_min == self_lt
        return (jnp.where(keep, hi, phi), jnp.where(keep, lo, plo))

    hi, lo = jax.lax.fori_loop(0, num_stages, stage,
                               (hi_ref[...], lo_ref[...]))
    hi_out[...] = hi
    lo_out[...] = lo


def bitonic_sort_i32(x: jax.Array, *, static: bool = True,
                     interpret: bool = False) -> jax.Array:
    """Ascending in-VMEM sort of (n,) int32, n a power of two >= 256."""
    n = x.shape[0]
    if n & (n - 1) or n < 256:
        raise ValueError(f"n={n} must be a power of two >= 256")
    rows = n // 128

    if static:
        kernel = functools.partial(_sort_kernel_static, rows=rows, n=n)
        in_specs = [pl.BlockSpec((rows, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)]
        args = (x.reshape(rows, 128),)
    else:
        sched = _schedule(n)
        kernel = functools.partial(_sort_kernel, rows=rows,
                                   num_stages=len(sched))
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = (jnp.asarray(sched), x.reshape(rows, 128))

    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        interpret=interpret,
    )(*args)
    return out.reshape(n)


def sort_padded_i32(x: jax.Array, *, interpret: bool = False) -> jax.Array:
    """Ascending sort of (n,) int32 for arbitrary n: pads to the next
    power of two with INT32_MAX sentinels (all real keys must be smaller),
    sorts in VMEM, returns the first n keys.  Below the kernel's 256-key
    minimum the XLA sort takes over (tiny smoke/debug scans — the network
    would be all padding)."""
    n = x.shape[0]
    m = 1 << max(n - 1, 1).bit_length()
    if m < 256:
        return jax.lax.sort(x, is_stable=False)
    if m == n:
        return bitonic_sort_i32(x, interpret=interpret)
    pad = jnp.full((m - n,), jnp.iinfo(jnp.int32).max, jnp.int32)
    return bitonic_sort_i32(jnp.concatenate([x, pad]),
                            interpret=interpret)[:n]


def bitonic_sort2_i32(hi: jax.Array, lo: jax.Array, *, static: bool = True,
                      interpret: bool = False):
    """Ascending lexicographic in-VMEM sort of (n,) int32 (hi, lo) pairs,
    n a power of two >= 256.  With a unique `lo` (stream iota) the order
    equals `jax.lax.sort((hi, lo), num_keys=2)` exactly."""
    n = hi.shape[0]
    if n & (n - 1) or n < 256:
        raise ValueError(f"n={n} must be a power of two >= 256")
    if lo.shape != hi.shape:
        raise ValueError(f"shape mismatch: {hi.shape} vs {lo.shape}")
    rows = n // 128

    blk = pl.BlockSpec((rows, 128), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    if static:
        kernel = functools.partial(_sort2_kernel_static, rows=rows, n=n)
        in_specs = [blk, blk]
        args = (hi.reshape(rows, 128), lo.reshape(rows, 128))
    else:
        sched = _schedule(n)
        kernel = functools.partial(_sort2_kernel, rows=rows,
                                   num_stages=len(sched))
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), blk, blk]
        args = (jnp.asarray(sched), hi.reshape(rows, 128),
                lo.reshape(rows, 128))

    hi_s, lo_s = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=in_specs,
        out_specs=(blk, blk),
        out_shape=(jax.ShapeDtypeStruct((rows, 128), jnp.int32),
                   jax.ShapeDtypeStruct((rows, 128), jnp.int32)),
        interpret=interpret,
    )(*args)
    return hi_s.reshape(n), lo_s.reshape(n)


def sort2_padded_i32(hi: jax.Array, lo: jax.Array, *, static: bool = True,
                     interpret: bool = False):
    """Lexicographic (hi, lo) sort for arbitrary n: pads both words with
    INT32_MAX sentinels (all real `hi` keys must be smaller; padded pairs
    tie only among themselves, where the exchange is value-neutral) and
    returns the first n pairs.  Below the kernel's 256-key minimum the
    XLA two-key sort takes over."""
    n = hi.shape[0]
    m = 1 << max(n - 1, 1).bit_length()
    if m < 256:
        return jax.lax.sort((hi, lo), num_keys=2, is_stable=False)
    if m == n:
        return bitonic_sort2_i32(hi, lo, static=static, interpret=interpret)
    pad = jnp.full((m - n,), jnp.iinfo(jnp.int32).max, jnp.int32)
    hi_s, lo_s = bitonic_sort2_i32(jnp.concatenate([hi, pad]),
                                   jnp.concatenate([lo, pad]),
                                   static=static, interpret=interpret)
    return hi_s[:n], lo_s[:n]
