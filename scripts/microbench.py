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
