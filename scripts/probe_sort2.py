"""Two-word (cell, iota) sort variants for the fine_grid B=1 frontend.

fine_grid's 62501 cells overflow the 31-bit packed key, so its frontend
takes the two-operand XLA fallback (pillarize.py), which the round-3
profiler trace measured at 759 us in-situ — the largest non-conv stage.
This probe measures the in-VMEM replacements on the real chip:

  1. xla2      — jax.lax.sort((cell, iota), num_keys=2, is_stable=False)
                 (the current fallback)
  2. bitonic2s — ops/pallas_sort.sort2_padded_i32, static unroll
  3. bitonic2d — same, dynamic SMEM schedule (compile-time-bounded)

plus the compile wall-time of each (the 1-word static unroll cost ~160 s
of Mosaic compile at n=131072; the 2-word network has ~2x the per-stage
work).  Deltas are the signal; absolute numbers carry ~25/reps ms of
amortized relay dispatch (scripts/probe_quantum.py).

Run: python scripts/probe_sort2.py   (on the TPU)
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def timed(fn, inputs, reps=48, dispatches=5):
    import jax
    import jax.numpy as jnp

    def chained(args):
        def body(acc, i):
            out = fn(i, *args)
            return acc + jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.float32)),
                out, jnp.float32(0)), ()
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

    from gndnet_tpu.ops.pallas_sort import sort2_padded_i32

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    n, c3 = 100000, 62501
    cells = jnp.asarray(rng.integers(0, c3 + 1, n).astype(np.int32))
    iota = jnp.arange(n, dtype=jnp.int32)

    def perturb(i, cells):
        return (cells + i) % (c3 + 1)

    def xla2(i, cells, iota):
        c, x = jax.lax.sort((perturb(i, cells), iota), num_keys=2,
                            is_stable=False, dimension=-1)
        return c, x

    def bitonic2s(i, cells, iota):
        return sort2_padded_i32(perturb(i, cells), iota, static=True)

    def bitonic2d(i, cells, iota):
        return sort2_padded_i32(perturb(i, cells), iota, static=False)

    for name, fn in [("xla2", xla2), ("bitonic2d", bitonic2d),
                     ("bitonic2s", bitonic2s)]:
        per, compile_s = timed(fn, (cells, iota))
        print(f"{name:>10}: {per * 1e6:8.1f} us/rep   "
              f"(compile {compile_s:6.1f} s)", flush=True)

    # correctness on-device: bitonic static vs the XLA reference order
    c_ref, x_ref = jax.jit(lambda c, i: jax.lax.sort(
        (c, i), num_keys=2, is_stable=False))(cells, iota)
    c_got, x_got = jax.jit(
        lambda c, i: sort2_padded_i32(c, i, static=True))(cells, iota)
    ok = bool(jnp.array_equal(c_ref, c_got) & jnp.array_equal(x_ref, x_got))
    print("bit-exact vs XLA 2-op sort:", ok, flush=True)


if __name__ == "__main__":
    main()
