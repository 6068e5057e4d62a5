"""Is the chained-scan overhead fixed per DISPATCH or per ITERATION?

Times a null body and the full engine at reps 24/48/96/192.  If per-rep time
falls ~2x with each doubling for the null case, the overhead is a fixed
per-dispatch (relay RPC + launch) cost and bench.py should amortize it over
a longer device-resident ring.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def timed(fn, inputs, reps, dispatches=5):
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
    return best


def main():
    import jax
    import jax.numpy as jnp

    from gndnet_tpu.config import kitti_sem_config
    from gndnet_tpu.models.gndnet import init_model
    from gndnet_tpu.infer import GroundInferenceEngine

    print("backend:", jax.default_backend(), flush=True)
    cfg = kitti_sem_config().replace(
        compute_dtype="bfloat16", matmul_precision="default",
        fused_impl="affine")
    _, variables = init_model(cfg)
    scan = np.load(
        "/root/reference/data/training/seq_000/reduced_velo/000000.npy"
    ).astype(np.float32)[:, :4]
    pad = np.full((2400, 4), 1e9, np.float32)
    pts = jnp.asarray(np.concatenate([scan, pad]))

    def bump(i, p):
        return p + (i.astype(jnp.float32) * 1e-6) * jnp.asarray(
            [0, 0, 1, 0], jnp.float32)

    engine = GroundInferenceEngine(cfg, variables, threshold=0.08,
                                   shift_cloud=True)

    def null(i, p):
        return p[0, 0] + i

    def eng(i, p):
        return engine._run(variables, bump(i, p))

    for reps in (24, 48, 96, 192):
        t_null = timed(null, (pts,), reps)
        t_eng = timed(eng, (pts,), reps)
        print(f"reps={reps:4d}  null total {t_null*1e3:8.2f} ms "
              f"({t_null/reps*1e6:7.1f} us/it)   engine total "
              f"{t_eng*1e3:8.2f} ms ({t_eng/reps*1e6:7.1f} us/it)",
              flush=True)


if __name__ == "__main__":
    main()
