"""SegNet stage costs: pool/unpool primitives vs alternatives, BN dtype,
plus a chaos-amplification check (how a 1e-6 canvas perturbation grows
through the untrained conv stack — context for affine-vs-scatter pred
diffs)."""

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

    from gndnet_tpu.config import kitti_sem_config
    from gndnet_tpu.models.gndnet import GroundEstimatorNet, init_model
    from gndnet_tpu.ops.pooling import max_pool_argmax, max_unpool

    print("backend:", jax.default_backend(), flush=True)
    cfg = kitti_sem_config().replace(
        compute_dtype="bfloat16", matmul_precision="default",
        fused_impl="affine")
    model = GroundEstimatorNet(cfg)
    _, variables = init_model(cfg)

    rng = np.random.default_rng(0)
    x128 = jnp.asarray(rng.normal(size=(1, 100, 100, 128))
                       .astype(np.float32)).astype(jnp.bfloat16)
    x256 = jnp.asarray(rng.normal(size=(1, 50, 50, 256))
                       .astype(np.float32)).astype(jnp.bfloat16)
    canvas0 = jnp.asarray(rng.normal(size=(1, 100, 100, 64))
                          .astype(np.float32)).astype(jnp.bfloat16)

    def segnet_only(i, canvas):
        return model.apply(
            variables, canvas + i.astype(jnp.bfloat16) * 1e-6, train=False,
            method=lambda m, c, train: m.encoder_decoder(c, train=train))

    def pool128(i, x):
        return max_pool_argmax(x + i.astype(jnp.bfloat16) * 1e-6)

    def pool256(i, x):
        return max_pool_argmax(x + i.astype(jnp.bfloat16) * 1e-6)

    p128, i128 = jax.jit(max_pool_argmax)(x128)
    p256, i256 = jax.jit(max_pool_argmax)(x256)

    def unpool128(i, p, ix):
        return max_unpool(p + i.astype(jnp.bfloat16) * 1e-6, ix, (100, 100))

    def unpool256(i, p, ix):
        return max_unpool(p + i.astype(jnp.bfloat16) * 1e-6, ix, (50, 50))

    def pool_slice(i, x):
        """Alternative: strided-slice pool + compare-chain argmax."""
        x = x + i.astype(jnp.bfloat16) * 1e-6
        a = x[:, 0::2, 0::2, :]
        b = x[:, 0::2, 1::2, :]
        c = x[:, 1::2, 0::2, :]
        d = x[:, 1::2, 1::2, :]
        m = jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))
        idx = jnp.where(
            a == m, jnp.int8(0),
            jnp.where(b == m, jnp.int8(1),
                      jnp.where(c == m, jnp.int8(2), jnp.int8(3))))
        return m, idx

    def conv_bn(i, x):
        import flax.linen as nn
        from gndnet_tpu.models.segnet import ConvBNRelu

        class One(nn.Module):
            @nn.compact
            def __call__(self, y):
                return ConvBNRelu(128, jnp.bfloat16, "default",
                                  name="c")(y, False)
        mod = One()
        v = mod.init(jax.random.PRNGKey(0), x)
        return mod.apply(v, x + i.astype(jnp.bfloat16) * 1e-6)

    def conv_plain(i, x):
        import flax.linen as nn

        class One(nn.Module):
            @nn.compact
            def __call__(self, y):
                return nn.relu(nn.Conv(128, (3, 3), padding="SAME",
                                       dtype=jnp.bfloat16,
                                       name="c")(y))
        mod = One()
        v = mod.init(jax.random.PRNGKey(0), x)
        return mod.apply(v, x + i.astype(jnp.bfloat16) * 1e-6)

    cases = [
        ("segnet_full", segnet_only, (canvas0,)),
        ("pool_128ch_100x100", pool128, (x128,)),
        ("pool_256ch_50x50", pool256, (x256,)),
        ("unpool_128_50->100", unpool128, (p128, i128)),
        ("unpool_256_25->50", unpool256, (p256, i256)),
        ("pool_slice_128ch", pool_slice, (x128,)),
        ("convbn_128_100x100", conv_bn, (x128,)),
        ("convplain_128_100x100", conv_plain, (x128,)),
    ]
    for name, fn, inputs in cases:
        dt = timed(fn, inputs) * 1e6
        print(f"{name:24s} {dt:9.1f} us", flush=True)

    # chaos amplification: |pred(canvas+eps) - pred(canvas)| for eps=1e-6
    f = jax.jit(lambda c: model.apply(
        variables, c, train=False,
        method=lambda m, cc, train: m.encoder_decoder(cc, train=train)))
    base = np.asarray(f(canvas0)).astype(np.float64)
    pert = np.asarray(f(canvas0 + jnp.bfloat16(1e-2) * 0 +
                        jnp.asarray(rng.normal(size=canvas0.shape) * 1e-6,
                                    jnp.bfloat16))).astype(np.float64)
    print("amplification of 1e-6 canvas noise at pred:",
          float(np.abs(pert - base).max()), flush=True)


if __name__ == "__main__":
    main()
