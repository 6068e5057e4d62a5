"""Pallas VMEM-resident 3x3 conv vs XLA's native conv (SegNet budget).

probe_conv.py established that no XLA-expressible schedule beats
`lax.conv_general_dilated` at the model's (1,100,100,C) shapes — but all
of those still stream through HBM between taps.  This probe measures a
Mosaic kernel that holds the whole activation in VMEM and runs the conv
as 9 accumulating MXU dots over statically-offset row slices of a
flattened (HW + 2W + 2, Cin) image:

  * flatten NHWC -> (H*W, C); pad W+1 zero rows on each side, so tap
    (dy, dx) is the single global row offset dy*W + dx (vertical edge
    contributions hit the zero padding and vanish on their own),
  * only two masks remain (w == 0 for dx=0 taps, w == W-1 for dx=2),
    precomputed once per kernel call from a row iota,
  * each tap: acc(HW, Cout) += masked_slice(HW, Cin) @ K[dy,dx] in f32
    on the MXU (matching XLA conv's f32 accumulation), cast once at the
    end; optional folded scale/shift + relu epilogue.

Roofline at (10000, 64->128): ~7.5 us MXU; XLA in-situ ~30 us.

Run: python scripts/probe_conv_pallas.py   (on the TPU)
"""

import functools
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
    dn = ("NHWC", "HWIO", "NHWC")
    shapes = [(100, 100, 64, 128), (100, 100, 128, 128),
              (50, 50, 128, 256), (50, 50, 256, 256),
              (100, 100, 128, 64),
              # fine_grid stages (banded: several grid steps per conv)
              (250, 250, 64, 128), (250, 250, 128, 128),
              (125, 125, 128, 256), (125, 125, 256, 256)]
    batched = [(16, 100, 100, 64, 128), (16, 50, 50, 256, 256)]
    from gndnet_tpu.ops.pallas_conv import conv3x3

    for h, w, cin, cout in shapes:
        x = jnp.asarray(rng.normal(size=(1, h, w, cin)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
                        * 0.05).astype(jnp.bfloat16)
        zero_b = jnp.zeros((cout,), jnp.float32)

        def jitter(i, x):
            return x + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-6)

        def conv_xla(i, x, k):
            return jax.lax.conv_general_dilated(
                jitter(i, x), k, (1, 1), "SAME", dimension_numbers=dn)

        def conv_pl(i, x, k):
            return conv3x3(jitter(i, x), k, zero_b)

        # correctness first
        ref = np.asarray(conv_xla(jnp.int32(0), x, k), np.float32)
        got = np.asarray(conv_pl(jnp.int32(0), x, k), np.float32)
        err = np.max(np.abs(ref - got))
        t_x = timed(conv_xla, (x, k)) * 1e6
        t_p = timed(conv_pl, (x, k)) * 1e6
        print(f"({h}x{w}, {cin}->{cout}): xla {t_x:8.1f} us   "
              f"pallas {t_p:8.1f} us   delta {t_p - t_x:+7.1f}   "
              f"max|diff| {err:.3e}", flush=True)

    # batched (training-forward / batched-serving shapes): per-item grid
    for b, h, w, cin, cout in batched:
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
                        * 0.05).astype(jnp.bfloat16)
        zero_b = jnp.zeros((cout,), jnp.float32)

        def jitter(i, x):
            return x + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-6)

        def conv_xla(i, x, k):
            return jax.lax.conv_general_dilated(
                jitter(i, x), k, (1, 1), "SAME", dimension_numbers=dn)

        def conv_pl(i, x, k):
            return conv3x3(jitter(i, x), k, zero_b)

        t_x = timed(conv_xla, (x, k), reps=24) * 1e6
        t_p = timed(conv_pl, (x, k), reps=24) * 1e6
        print(f"(B={b}, {h}x{w}, {cin}->{cout}): xla {t_x:8.1f} us   "
              f"pallas {t_p:8.1f} us   delta {t_p - t_x:+8.1f}",
              flush=True)


if __name__ == "__main__":
    main()
