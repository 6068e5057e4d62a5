"""Microbenchmark the irregular-op primitives of the pillarize front half.

Prices each candidate building block on the real chip with the trusted
methodology (see bench.py / the axon timing notes): every measurement chains
R applications of the op inside ONE lax.scan dispatch over perturbed inputs,
anchors on a host-fetched scalar that data-depends on every result, and takes
the min over dispatches.  Used to choose between scatter-, sort-, and
matmul-based frontends (docs/STATUS.md round-2 perf plan).

Usage: python scripts/microbench.py [--reps 32] [--only name_substr]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def _scan_time(fn, inputs, reps, unroll, dispatches=4):
    import jax
    import jax.numpy as jnp

    def chained(args):
        def body(acc, i):
            s = acc
            for u in range(unroll):
                out = fn(i * unroll + u, *args)
                s = s + jnp.sum(out.astype(jnp.float32))
            return s, ()
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(reps, dtype=jnp.int32))
        return acc

    g = jax.jit(chained)
    float(g(inputs))  # compile
    best = float("inf")
    for _ in range(dispatches):
        t0 = time.perf_counter()
        float(g(inputs))
        best = min(best, time.perf_counter() - t0)
    return best / reps


def timed(fn, inputs, reps, unroll=8):
    """Marginal per-op cost: each lax.scan iteration on this platform pays a
    ~0.75-1.5 ms dispatch-quantum floor that swamps sub-ms ops, so measure
    the slope between `unroll+1` and 1 applications per iteration instead of
    the absolute time (the axon timing notes in the memory file)."""
    t1 = _scan_time(fn, inputs, reps, 1)
    tk = _scan_time(fn, inputs, reps, unroll + 1)
    return max((tk - t1) / unroll, 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)

    M, NY, NX, C, K = 100_000, 100, 100, 64, 100
    NCELL = NY * NX
    rng = np.random.default_rng(0)
    cell_np = rng.integers(0, NCELL, M).astype(np.int32)
    # realistic cell stream: LiDAR-ish azimuth order (sorted-by-angle runs)
    xy = rng.normal(size=(M, 2)) * 20
    ang = np.arctan2(xy[:, 1], xy[:, 0])
    order = np.argsort(ang + rng.integers(0, 64, M) * 7)  # ring-ish interleave
    cellr_np = cell_np[order]

    cell = jnp.asarray(cell_np)
    cellr = jnp.asarray(cellr_np)
    vals4 = jnp.asarray(rng.normal(size=(M, 4)).astype(np.float32))
    vals64 = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    vals64b = vals64.astype(jnp.bfloat16)
    stats = jnp.asarray(rng.normal(size=(NCELL + 1, 4)).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(M, 4)).astype(np.float32))
    w94 = jnp.asarray(rng.normal(size=(9, C)).astype(np.float32))

    def pert_i(i):  # cheap per-iteration int perturbation
        return i.astype(jnp.int32)

    cases = {}

    cases["argsort_100k_i32"] = (
        lambda i, c: jnp.argsort(c + pert_i(i), stable=True), (cell,))
    cases["sort_kv_100k"] = (
        lambda i, c, v: jax.lax.sort_key_val(c + pert_i(i), v[:, 0])[1],
        (cell, vals4))
    cases["scatter_add_100kx4"] = (
        lambda i, c, v: jnp.zeros((NCELL + 1, 4), jnp.float32)
        .at[c].add(v + i.astype(jnp.float32)), (cell, vals4))
    cases["scatter_max_100kx64_f32"] = (
        lambda i, c, v: jnp.full((NCELL + 1, C), -1e30, jnp.float32)
        .at[c].max(v + i.astype(jnp.float32)), (cell, vals64))
    cases["scatter_max_100kx64_bf16"] = (
        lambda i, c, v: jnp.full((NCELL + 1, C), jnp.finfo(jnp.bfloat16).min,
                                 jnp.bfloat16).at[c].max(
            v + i.astype(jnp.bfloat16)), (cell, vals64b))
    cases["scatter_max_32kx64_f32"] = (
        lambda i, c, v: jnp.full((NCELL + 1, C), -1e30, jnp.float32)
        .at[c[:32768]].max(v[:32768] + i.astype(jnp.float32)),
        (cell, vals64))
    cases["gather_100k_from_10kx4"] = (
        lambda i, c, s: (s + i.astype(jnp.float32))[c], (cell, stats))
    cases["gather_perm_100kx4"] = (
        lambda i, o, p: (p + i.astype(jnp.float32))[o],
        (jnp.asarray(order.astype(np.int32)), pts))
    cases["gather_perm_100kx64"] = (
        lambda i, o, p: (p + i.astype(jnp.float32))[o],
        (jnp.asarray(order.astype(np.int32)), vals64))
    cases["cumsum_100k"] = (
        lambda i, v: jnp.cumsum(v[:, 0] + i.astype(jnp.float32)), (vals4,))
    cases["cummax_100k_i32"] = (
        lambda i, c: jax.lax.cummax(c + pert_i(i)), (cell,))
    cases["matmul_100kx9x64"] = (
        lambda i, d, w: (d + i.astype(jnp.float32)) @ w,
        (jnp.concatenate([pts, pts, pts[:, :1]], 1), w94))

    # --- chunked one-hot matmul pipeline: ranks + per-cell count ----------
    def matmul_rank(i, cy, cx, chunk=2000):
        """rank of every point within its (cy,cx) cell, stream order, via
        factored one-hot matmuls inside one lax.scan (no scatter/gather)."""
        nchunks = M // chunk
        cyc = (cy + pert_i(i) * 0).reshape(nchunks, chunk)
        cxc = cx.reshape(nchunks, chunk)

        def body(count_canvas, io):
            cyk, cxk = io
            oy = (cyk[:, None] == jnp.arange(NY)[None, :]).astype(jnp.float32)
            ox = (cxk[:, None] == jnp.arange(NX)[None, :]).astype(jnp.float32)
            # prefix count from canvas: per-point count = oy @ canvas . ox
            pc = jnp.einsum("py,yx,px->p", oy, count_canvas, ox,
                            precision="highest")
            # intra-chunk causal equal-count
            eq = (oy @ oy.T) * (ox @ ox.T)
            causal = jnp.tril(jnp.ones((chunk, chunk), jnp.float32), -1)
            local = jnp.sum(eq * causal, axis=1)
            new_canvas = count_canvas + jnp.einsum(
                "py,px->yx", oy, ox, precision="highest")
            return new_canvas, pc + local

        _, ranks = jax.lax.scan(
            body, jnp.zeros((NY, NX), jnp.float32), (cyc, cxc))
        return ranks.reshape(M)

    cy_all = cell // NX
    cx_all = cell % NX
    cases["matmul_rank_chunk2000"] = (
        lambda i, cy, cx: matmul_rank(i, cy, cx, 2000), (cy_all, cx_all))
    cases["matmul_rank_chunk10000"] = (
        lambda i, cy, cx: matmul_rank(i, cy, cx, 10000), (cy_all, cx_all))

    def matmul_stats(i, cy, cx, g):
        """per-cell sum of g (M,4) via factored one-hot matmuls, one shot."""
        oy = (cy[:, None] == jnp.arange(NY)[None, :]).astype(jnp.float32)
        ox = (cx[:, None] == jnp.arange(NX)[None, :]).astype(jnp.float32)
        gg = g + i.astype(jnp.float32)
        t = ox[:, :, None] * gg[:, None, :]          # (M, NX, 4)
        return jnp.einsum("py,pt->yt", oy, t.reshape(M, -1),
                          precision="highest")

    cases["matmul_stats_oneshot"] = (
        lambda i, cy, cx, g: matmul_stats(i, cy, cx, g),
        (cy_all, cx_all, vals4))

    # sequential-friendly: suffix segmented max on ring-ordered stream,
    # capped rounds (raw-run reduction candidate)
    def capped_runmax(i, c, v, rounds=6):
        x = v + i.astype(jnp.float32)
        seg = c
        for r in range(rounds):
            s = 1 << r
            same = jnp.concatenate([seg[s:] == seg[:-s],
                                    jnp.zeros((s,), bool)])
            shifted = jnp.concatenate([x[s:], jnp.full((s, C), -1e30)])
            x = jnp.where(same[:, None], jnp.maximum(x, shifted), x)
        return x

    cases["runmax6_100kx64"] = (
        lambda i, c, v: capped_runmax(i, c, v), (cellr, vals64))

    # --- sorted-frontend building blocks (round-2 cumsum/segscan design) --
    cell_sorted = jnp.sort(cellr)
    vals64s = vals64  # stand-in for activations in sorted order

    cases["sort5_100k"] = (
        lambda i, c, p: jax.lax.sort(
            (c + pert_i(i), p[:, 0], p[:, 1], p[:, 2], p[:, 3]),
            num_keys=1, is_stable=True)[1], (cellr, pts))
    cases["cumsum_100kx4"] = (
        lambda i, v: jnp.cumsum(v + i.astype(jnp.float32), axis=0), (vals4,))

    def seg_max_assoc(i, c, v):
        x = v + i.astype(jnp.float32)
        flags = jnp.concatenate(
            [jnp.ones((1,), bool), c[1:] != c[:-1]])[:, None]

        def op(a, b):
            (m1, f1), (m2, f2) = a, b
            return jnp.where(f2, m2, jnp.maximum(m1, m2)), f1 | f2

        out, _ = jax.lax.associative_scan(op, (x, flags), axis=0)
        return out

    cases["segmax_assoc_100kx64_f32"] = (
        lambda i, c, v: seg_max_assoc(i, c, v), (cell_sorted, vals64s))

    def seg_max_intkey(i, c, v):
        """bf16 values -> 16-bit monotonic keys, cell id in the high bits,
        ONE plain cummax over int32 does the whole segmented max exactly."""
        x = (v + i.astype(jnp.float32)).astype(jnp.bfloat16)
        bits = jax.lax.bitcast_convert_type(x, jnp.uint16)
        key = jnp.where(bits >= 0x8000, ~bits, bits | 0x8000).astype(jnp.uint32)
        t = (c.astype(jnp.uint32)[:, None] << 16) | key
        run = jax.lax.cummax(t, axis=0)
        k16 = (run & 0xFFFF).astype(jnp.uint16)
        back = jnp.where(k16 >= 0x8000, k16 & 0x7FFF, ~k16)
        return jax.lax.bitcast_convert_type(back.astype(jnp.uint16),
                                            jnp.bfloat16)

    cases["segmax_intkey_100kx64_bf16"] = (
        lambda i, c, v: seg_max_intkey(i, c, v), (cell_sorted, vals64s))

    cases["searchsorted_10k_in_100k"] = (
        lambda i, c: jnp.searchsorted(c, jnp.arange(NCELL) + (pert_i(i) & 1)),
        (cell_sorted,))
    cases["gather_10kx64_from_100k"] = (
        lambda i, e, v: (v + i.astype(jnp.float32))[e],
        (jnp.linspace(0, M - 1, NCELL).astype(jnp.int32), vals64))

    if not args.only or "floor" in args.only:
        # dispatch-quantum floor: absolute per-iteration time of a trivial op
        # at different lax.scan unroll factors
        tiny = jnp.ones((128,), jnp.float32)
        for u in (1, 2, 4, 8):
            t = _scan_time(lambda i, v: v * (1.0 + 1e-6), (tiny,),
                           reps=64, unroll=u)
            print(f"floor_scan_unroll{u:<2d}              "
                  f"{t/u*1e6:10.1f} us/op ({t*1e6:.1f} us/iter)", flush=True)

    reps = args.reps
    for name, (fn, inputs) in cases.items():
        if args.only and args.only not in name:
            continue
        try:
            dt = timed(fn, inputs, reps)
            print(f"{name:32s} {dt*1e6:10.1f} us", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
