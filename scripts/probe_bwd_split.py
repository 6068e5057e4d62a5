"""Backward-half decomposition of the B=16 affine-bf16 train step.

Times four jitted programs with the chained-carry methodology (bench.py
docstring) and differences them:

  canvas     : frontend forward only (points -> canvas, differentiable
               variant so the forward work matches the grad programs)
  fwd        : frontend + SegNet + loss forward
  grad_seg   : value_and_grad with stop_gradient(canvas) — SegNet/
               regressor backward only, the frontend custom VJP is cut
  grad_full  : the real value_and_grad over all params

  segnet backward cost   ~= grad_seg - fwd
  frontend backward cost ~= grad_full - grad_seg

Findings land in docs/KERNELS.md ("train backward budget").
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from gndnet_tpu.config import kitti_sem_config
    from gndnet_tpu.parallel.spatial import _fused_canvas
    from gndnet_tpu import train as tr

    print("backend:", jax.default_backend(), flush=True)
    cfg = kitti_sem_config().replace(
        compute_dtype="bfloat16", matmul_precision="default",
        fused_impl="affine")
    model, tx, state = tr.create_train_state(cfg, steps_per_epoch=100)
    total = tr.loss_fn(cfg)

    rng = np.random.default_rng(0)
    scan = np.load(
        "/root/reference/data/training/seq_000/reduced_velo/000000.npy"
    ).astype(np.float32)[:, :4]
    pts16 = jnp.asarray(np.broadcast_to(scan[None], (16,) + scan.shape).copy())
    labels16 = jnp.asarray(
        rng.normal(size=(16, 100, 100)).astype(np.float32) * 0.1)

    def head_loss(params, canvas, y):
        variables = {"params": params, "batch_stats": state.batch_stats}
        pred, _ = model.apply(
            variables, canvas, train=True, mutable=["batch_stats"],
            method=lambda m, c, train: m.encoder_decoder(c, train=train))
        return total(jnp.squeeze(pred, axis=-1), y)

    def canvas_only(i, params, p, y):
        return _fused_canvas(cfg, params, p + i.astype(jnp.float32) * 1e-6,
                             train=True)

    def fwd(i, params, p, y):
        return head_loss(params, canvas_only(i, params, p, y), y)

    def make_grad(cut):
        def compute(params, i, p, y):
            canvas = canvas_only(i, params, p, y)
            if cut:
                canvas = jax.lax.stop_gradient(canvas)
            return head_loss(params, canvas, y)

        def g(i, params, p, y):
            return jax.value_and_grad(compute)(params, i, p, y)
        return g

    def timed(fn, reps=8, dispatches=3):
        def chained(params, p, y):
            def body(acc, i):
                out = fn(i, params, p, y)
                return acc + jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(x.astype(jnp.float32)),
                    out, jnp.float32(0)), ()
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(reps, dtype=jnp.int32))
            return acc

        g = jax.jit(chained)
        float(g(state.params, pts16, labels16))
        best = float("inf")
        for _ in range(dispatches):
            t0 = time.perf_counter()
            float(g(state.params, pts16, labels16))
            best = min(best, time.perf_counter() - t0)
        return best / reps * 1e6

    t_canvas = timed(canvas_only)
    print(f"{'canvas_fwd_B16':22s} {t_canvas:10.1f} us", flush=True)
    t_fwd = timed(fwd)
    print(f"{'fwd_loss_B16':22s} {t_fwd:10.1f} us "
          f"(segnet+loss fwd ~{t_fwd - t_canvas:.0f})", flush=True)
    t_seg = timed(make_grad(True))
    print(f"{'grad_segnet_only_B16':22s} {t_seg:10.1f} us "
          f"(segnet bwd ~{t_seg - t_fwd:.0f})", flush=True)
    t_full = timed(make_grad(False))
    print(f"{'grad_full_B16':22s} {t_full:10.1f} us "
          f"(frontend bwd ~{t_full - t_seg:.0f})", flush=True)


if __name__ == "__main__":
    main()
