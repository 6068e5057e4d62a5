"""Train-step stage costs at B=16 (affine bf16): full step vs forward-only
vs the custom-VJP backward pieces (payload canvas scatter + segment
broadcast kernel), chained-ring methodology."""

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
    import argparse

    import jax
    import jax.numpy as jnp

    from gndnet_tpu.config import kitti_sem_config
    from gndnet_tpu.models.gndnet import GroundEstimatorNet
    from gndnet_tpu import train as tr

    print("backend:", jax.default_backend(), flush=True)
    cfg = kitti_sem_config().replace(
        compute_dtype="bfloat16", matmul_precision="default",
        fused_impl="affine")
    model, tx, state = tr.create_train_state(cfg, steps_per_epoch=100)
    rng = np.random.default_rng(0)
    scan = np.load(
        "/root/reference/data/training/seq_000/reduced_velo/000000.npy"
    ).astype(np.float32)[:, :4]
    pts16 = jnp.asarray(
        np.broadcast_to(scan[None], (16,) + scan.shape).copy())
    labels16 = jnp.asarray(rng.normal(size=(16, 100, 100))
                           .astype(np.float32) * 0.1)

    step = tr.make_train_step(model, tx, cfg)
    total = tr.loss_fn(cfg)

    def full_step_chain(reps=12, dispatches=4):
        """Chained real train steps with the state CARRIED (so the update
        is not dead-code-eliminated); anchors on final loss + a param."""
        import time as _t

        def chained(s, p, y):
            def body(carry, i):
                s, acc = carry
                s2, loss = step(s, p + i.astype(jnp.float32) * 1e-6, y)
                return (s2, acc + loss), ()
            (s_f, acc), _ = jax.lax.scan(
                body, (s, jnp.float32(0)),
                jnp.arange(reps, dtype=jnp.int32))
            anchor = jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x).astype(jnp.float32),
                s_f.params, jnp.float32(0))
            return acc + anchor

        g = jax.jit(chained)
        float(g(state, pts16, labels16))
        best = float("inf")
        for _ in range(dispatches):
            t0 = _t.perf_counter()
            float(g(state, pts16, labels16))
            best = min(best, _t.perf_counter() - t0)
        return best / reps

    def fwd_loss(i, s, p, y):
        variables = {"params": s.params, "batch_stats": s.batch_stats}
        pred, mut = model.apply(
            variables, p + i.astype(jnp.float32) * 1e-6, train=True,
            mutable=["batch_stats"], method=GroundEstimatorNet.fused)
        return total(pred, y)

    def grad_step(i, s, p, y):
        def compute(params):
            variables = {"params": params, "batch_stats": s.batch_stats}
            pred, mut = model.apply(
                variables, p + i.astype(jnp.float32) * 1e-6, train=True,
                mutable=["batch_stats"], method=GroundEstimatorNet.fused)
            return total(pred, y)
        loss, grads = jax.value_and_grad(compute)(s.params)
        return loss, grads

    # bwd pieces at flat stream size 16*100352
    from gndnet_tpu.ops.pallas_affine import segment_broadcast_t

    n = 16 * 100352
    cell = jnp.asarray(np.sort(rng.integers(0, 10001, n)).astype(np.int32))
    payload = jnp.asarray(rng.normal(size=(10000 * 16, 128))
                          .astype(np.float32))
    starts = jnp.asarray(
        np.sort(rng.choice(n, 10000 * 16, replace=False)).astype(np.int32))

    def canvas_scatter(i, pay):
        canvas = jnp.full((n, 128), -3e38, jnp.float32)
        return canvas.at[starts].set(pay + i.astype(jnp.float32) * 1e-6,
                                     mode="drop")

    bigT = jnp.asarray(rng.normal(size=(128, n)).astype(np.float32))

    def bcast_only(i, v):
        return segment_broadcast_t(cell, v + i.astype(jnp.float32) * 1e-6,
                                   chunk=2048)

    dt = full_step_chain() * 1e6
    print(f"{'full_step_carried_B16':26s} {dt:10.1f} us "
          f"({16 / (dt / 1e6):.0f} scans/s)", flush=True)

    cases = [
        ("fwd_loss_B16", fwd_loss, (state, pts16, labels16)),
        ("grad_step_B16", grad_step, (state, pts16, labels16)),
        ("canvas_scatter_1.6Mx128", canvas_scatter, (payload,)),
        ("bcast_128x1.6M", bcast_only, (bigT,)),
    ]
    for name, fn, inputs in cases:
        try:
            dt = timed(fn, inputs) * 1e6
            print(f"{name:26s} {dt:10.1f} us", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:26s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
