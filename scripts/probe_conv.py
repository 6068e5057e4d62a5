"""Conv lowering experiments for the SegNet budget (round-3 VERDICT item 3).

The engine's 1.64 ms B=1 budget holds ~316 us of SegNet = 9 convs x ~30 us
at (1,100,100,C) (scripts/probe_segnet.py).  bf16 roofline for the
(1,100,100,64)->128 stage is ~7.5 us MXU / ~5 us HBM, so XLA's conv is ~4x
off speed-of-light at this small-spatial B=1 shape.  This probe measures
alternatives on the real chip:

  1. xla        — lax.conv_general_dilated NHWC/HWIO (the model's lowering)
  2. pad8       — same with H,W padded to multiples of 8, result sliced
  3. im2col     — conv_general_dilated_patches + one (HW, 9C)@(9C, F) matmul
  4. taps9      — 9 shifted (HW, C)@(C, F) matmuls accumulated (SAME pad)
  5. fused_bnrelu — xla conv + folded BN scale/shift + relu (epilogue cost)

Run: python scripts/probe_conv.py   (on the TPU; CPU numbers meaningless)
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
    h = w = 100
    shapes = [(64, 128), (128, 128), (128, 256)]
    for cin, cout in shapes:
        hh, ww = (h, w) if cin <= 128 else (h // 2, w // 2)
        x = jnp.asarray(rng.normal(size=(1, hh, ww, cin)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        scale = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        shift = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        dn = ("NHWC", "HWIO", "NHWC")

        def jitter(i, x):
            return x + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-6)

        def conv_xla(i, x, k):
            return jax.lax.conv_general_dilated(
                jitter(i, x), k, (1, 1), "SAME", dimension_numbers=dn)

        def conv_pad8(i, x, k):
            hp, wp = (-hh) % 8, (-ww) % 8
            xp = jnp.pad(jitter(i, x), ((0, 0), (0, hp), (0, wp), (0, 0)))
            y = jax.lax.conv_general_dilated(
                xp, k, (1, 1), "SAME", dimension_numbers=dn)
            return y[:, :hh, :ww]

        def conv_im2col(i, x, k):
            p = jax.lax.conv_general_dilated_patches(
                jitter(i, x), (3, 3), (1, 1), "SAME",
                dimension_numbers=dn)            # (1, hh, ww, cin*9)
            km = k.transpose(2, 0, 1, 3).reshape(cin * 9, cout)
            return (p.reshape(hh * ww, cin * 9) @ km).reshape(
                1, hh, ww, cout)

        def conv_taps9(i, x, k):
            xp = jnp.pad(jitter(i, x), ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros((hh * ww, cout), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    sl = xp[0, dy:dy + hh, dx:dx + ww].reshape(hh * ww, cin)
                    acc = acc + jnp.dot(sl, k[dy, dx],
                                        preferred_element_type=jnp.float32)
            return acc.astype(jnp.bfloat16).reshape(1, hh, ww, cout)

        def conv_bnrelu(i, x, k):
            y = jax.lax.conv_general_dilated(
                jitter(i, x), k, (1, 1), "SAME", dimension_numbers=dn)
            return jax.nn.relu(y.astype(jnp.float32) * scale + shift
                               ).astype(jnp.bfloat16)

        outs = {}
        for name, fn, args in [
            ("xla", conv_xla, (x, k)),
            ("pad8", conv_pad8, (x, k)),
            ("im2col", conv_im2col, (x, k)),
            ("taps9", conv_taps9, (x, k)),
            ("bnrelu", conv_bnrelu, (x, k)),
        ]:
            us = timed(fn, args) * 1e6
            outs[name] = us
            print(f"({hh}x{ww},{cin}->{cout}) {name:8s} {us:8.1f} us",
                  flush=True)
        print()


if __name__ == "__main__":
    main()
