"""Cost of rank-indexed row-gather payload delivery for the custom-VJP
backward, vs the scatter+broadcast it would replace (B=16 flat size)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def timed(fn, inputs, reps=12, dispatches=4):
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

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    n = 16 * 100352
    nrank = 16 * 10001
    rank = jnp.asarray(np.sort(rng.integers(0, nrank, n)).astype(np.int32))

    pay_f32 = jnp.asarray(rng.normal(size=(nrank, 192)).astype(np.float32))
    pay_bf16 = pay_f32.astype(jnp.bfloat16)
    pay_f32_128 = pay_f32[:, :128]

    def g_f32_192(i, p):
        return (p + i.astype(jnp.float32) * 1e-6)[rank]

    def g_bf16_192(i, p):
        return (p + i.astype(jnp.bfloat16) * 0)[rank]

    def g_f32_128(i, p):
        return (p + i.astype(jnp.float32) * 1e-6)[rank]

    def null(i, p):
        return p[0, 0] + i

    def rank_build(i, c):
        cells = c + (i - i)
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), cells[1:] != cells[:-1]])
        return jnp.cumsum(is_start.astype(jnp.int32)) - 1

    cell = jnp.asarray(np.sort(rng.integers(0, 10001, n)).astype(np.int32))

    cases = [
        ("null", null, (pay_f32,)),
        ("gather_f32_192w", g_f32_192, (pay_f32,)),
        ("gather_bf16_192w", g_bf16_192, (pay_bf16,)),
        ("gather_f32_128w", g_f32_128, (pay_f32_128,)),
        ("rank_cumsum_1.6M", rank_build, (cell,)),
    ]
    for name, fn, inputs in cases:
        dt = timed(fn, inputs) * 1e6
        print(f"{name:20s} {dt:10.1f} us", flush=True)


if __name__ == "__main__":
    main()
