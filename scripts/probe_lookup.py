"""Per-point 2D map lookup variants on the real chip (segment_cloud's
elevation fetch, ~119 us of the 1.64 ms B=1 budget as the XLA one-hot
selector — docs/KERNELS.md).

  gather   — map2d.reshape(-1)[ix*w+iy] (XLA serialized scalar gather)
  onehot   — (N,h)@(h,w) f32 selector + (N,w) mask (round-2 form;
             ~120 MB of HBM one-hot traffic at 102400x100x100)
  pallas   — in-VMEM selector kernel (lookup_2d_pallas)

Run: python scripts/probe_lookup.py   (on the TPU)
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def timed(fn, inputs, reps=96, dispatches=5):
    import jax
    import jax.numpy as jnp

    def chained(args):
        def body(acc, i):
            out = fn(i, *args)
            return acc + jnp.sum(out), ()
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

    from gndnet_tpu.ops.postproc import (_lookup_2d_xla_onehot,
                                         lookup_2d_pallas)

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    for h, w, n in ((100, 100, 102400), (250, 250, 102400)):
        map2d = jnp.asarray(rng.normal(size=(h, w)).astype(np.float32))
        ix = jnp.asarray(rng.integers(0, h, n).astype(np.int32))
        iy = jnp.asarray(rng.integers(0, w, n).astype(np.int32))

        def jit_ix(i, ix):
            return jnp.minimum(ix + i, h - 1)

        variants = {
            "gather": lambda i, m, ix, iy: m.reshape(-1)[
                jit_ix(i, ix) * w + iy],
            "onehot": lambda i, m, ix, iy: _lookup_2d_xla_onehot(
                m, jit_ix(i, ix), iy),
            "pallas": lambda i, m, ix, iy: lookup_2d_pallas(
                m, jit_ix(i, ix), iy),
        }
        ref = np.asarray(map2d)[np.asarray(ix), np.asarray(iy)]
        line = f"({h}x{w}, n={n}):"
        for name, fn in variants.items():
            got = np.asarray(jax.jit(lambda m, ix, iy: fn(
                jnp.int32(0), m, ix, iy))(map2d, ix, iy))
            ok = np.array_equal(got, ref)
            t = timed(fn, (map2d, ix, iy)) * 1e6
            line += f"  {name} {t:8.1f} us{'' if ok else ' (MISMATCH)'}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
