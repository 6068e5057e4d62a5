"""One-off probe: where do the ~575 us of affine_canvas epilogue live?

Variants of the end-row gather after affine_scan_t, plus the dense-canvas
epilogue math, at the true engine size (102400).  Methodology = chained
lax.scan ring (see scripts/profile_affine.py: numbers include the ~0.36 ms
dispatch quantum; read DIFFERENCES).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def timed(fn, inputs, reps=48, dispatches=4):
    import jax
    import jax.numpy as jnp

    def chained(args):
        def body(acc, i):
            out = fn(i, *args)
            return acc + jnp.sum(
                jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(x.astype(jnp.float32)),
                    out, jnp.float32(0))), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(reps, dtype=jnp.int32))
        return acc

    g = jax.jit(chained)
    float(g(inputs))
    best = float("inf")
    for _ in range(dispatches):
        t0 = time.perf_counter()
        float(g(inputs))
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    import jax
    import jax.numpy as jnp

    from gndnet_tpu.ops.pallas_affine import affine_scan_t, histogram_ends

    print("backend:", jax.default_backend(), flush=True)
    n = 102400
    ncell = 10000
    rng = np.random.default_rng(0)
    cell = jnp.asarray(np.sort(rng.integers(0, ncell + 1, n)).astype(np.int32))
    pts4t = jnp.asarray(rng.normal(size=(4, n)).astype(np.float32))
    valid = jnp.ones((1, n), jnp.float32)
    mmat4t = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32) * 0.3)
    ends = jnp.asarray(np.sort(rng.choice(n, ncell, replace=False))
                       .astype(np.int32))

    def scan_only(i, c, p, v, m):
        return affine_scan_t(c, p + i.astype(jnp.float32) * 1e-6, v, m,
                             max_points=100, out_dtype=jnp.bfloat16,
                             chunk=2048)[1]

    def scan_gather_rowT(i, c, p, v, m):
        tot_t, max_t = affine_scan_t(c, p + i.astype(jnp.float32) * 1e-6, v, m,
                                     max_points=100, out_dtype=jnp.bfloat16,
                                     chunk=2048)
        return tot_t.T[ends], max_t.T[ends]

    def scan_gather_colT(i, c, p, v, m):
        tot_t, max_t = affine_scan_t(c, p + i.astype(jnp.float32) * 1e-6, v, m,
                                     max_points=100, out_dtype=jnp.bfloat16,
                                     chunk=2048)
        return tot_t[:, ends].T, max_t[:, ends].T

    def scan_gather_col_noT(i, c, p, v, m):
        tot_t, max_t = affine_scan_t(c, p + i.astype(jnp.float32) * 1e-6, v, m,
                                     max_points=100, out_dtype=jnp.bfloat16,
                                     chunk=2048)
        return tot_t[:, ends], max_t[:, ends]

    def gather_only_rowT(i, big):
        return (big + i.astype(jnp.bfloat16) * 0).T[ends]

    def gather_only_col(i, big):
        return (big + i.astype(jnp.bfloat16) * 0)[:, ends]

    big = jnp.zeros((64, n), jnp.bfloat16)

    def hist_102k(i, c):
        return histogram_ends(c[None] + (i - i), 100, 100)[1]

    cases = {
        "scan_only": (scan_only, (cell, pts4t, valid, mmat4t)),
        "scan_gather_rowT": (scan_gather_rowT, (cell, pts4t, valid, mmat4t)),
        "scan_gather_colT": (scan_gather_colT, (cell, pts4t, valid, mmat4t)),
        "scan_gather_col_noT": (scan_gather_col_noT, (cell, pts4t, valid, mmat4t)),
        "gather_only_rowT": (gather_only_rowT, (big,)),
        "gather_only_col": (gather_only_col, (big,)),
        "hist_102k": (hist_102k, (cell,)),
    }
    for name, (fn, inputs) in cases.items():
        dt = timed(fn, inputs)
        print(f"{name:24s} {dt*1e6:10.1f} us", flush=True)


if __name__ == "__main__":
    main()
