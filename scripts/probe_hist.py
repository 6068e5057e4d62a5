"""XLA einsum vs in-VMEM pallas histogram counts, on the real chip.

The factored one-hot histogram (pallas_affine.histogram_ends) builds both
(B, Np, ny|nx) bf16 one-hots in HBM before the einsum — ~205 MB of traffic
at fine_grid scale (Np=102400, ny=nx=250), measured 352 us in-situ.
`histogram_counts_pallas` streams (1, chunk) cell rows and keeps the
one-hot tiles in VMEM.  This probe measures both at the two geometries the
dispatch heuristic must cover:

  kitti_sem  ny=nx=100, Np=102400  (in-situ stage marginal ~29 us)
  fine_grid  ny=nx=250, Np=102400  (in-situ 352 us)

Deltas are the signal; absolutes carry ~25/reps ms of amortized relay
dispatch (scripts/probe_quantum.py).

Run: python scripts/probe_hist.py   (on the TPU)
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def timed(fn, inputs, reps=64, dispatches=5):
    import jax
    import jax.numpy as jnp

    def chained(args):
        def body(acc, i):
            out = fn(i, *args)
            return acc + jnp.sum(out.astype(jnp.float32)), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(reps, dtype=jnp.int32))
        return acc

    g = jax.jit(chained)
    t0 = time.perf_counter()
    ref = float(g(inputs))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(dispatches):
        t0 = time.perf_counter()
        got = float(g(inputs))
        best = min(best, time.perf_counter() - t0)
        assert got == ref
    return best / reps, compile_s


def main():
    import jax
    import jax.numpy as jnp

    from gndnet_tpu.ops.pallas_affine import histogram_counts_pallas

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    for name, ny, nx, b in [("kitti_sem", 100, 100, 1),
                            ("kitti_B16", 100, 100, 16),
                            ("fine_grid", 250, 250, 1)]:
        n = 102400
        cells = jnp.asarray(
            rng.integers(0, ny * nx + 1, (b, n)).astype(np.int32))

        def perturb(i, c):
            return (c + i) % (ny * nx + 1)

        def xla(i, c, _ny=ny, _nx=nx):
            cc = perturb(i, c)
            q = (cc // _nx).astype(jnp.int32)
            r = (cc - q * _nx).astype(jnp.int32)
            ohq = (q[..., None] == jnp.arange(_ny, dtype=jnp.int32)
                   ).astype(jnp.bfloat16)
            ohr = (r[..., None] == jnp.arange(_nx, dtype=jnp.int32)
                   ).astype(jnp.bfloat16)
            return jnp.einsum("bpy,bpx->byx", ohq, ohr,
                              preferred_element_type=jnp.float32)

        def pal(i, c, _ny=ny, _nx=nx):
            return histogram_counts_pallas(perturb(i, c), _ny, _nx)

        for impl, fn in [("xla", xla), ("pallas", pal)]:
            per, compile_s = timed(fn, (cells,))
            print(f"{name:>10} B={b:<2} {impl:>7}: {per * 1e6:8.1f} us/rep"
                  f"   (compile {compile_s:5.1f} s)", flush=True)

        # correctness on-device
        ref = np.asarray(jax.jit(lambda c: xla(0, c))(cells))
        got = np.asarray(jax.jit(
            lambda c: histogram_counts_pallas(c, ny, nx))(cells))
        print(f"{name:>10} exact: {bool((ref == got).all())}", flush=True)


if __name__ == "__main__":
    main()
