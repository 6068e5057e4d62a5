"""VMEM-resident 3x3 SAME conv for the SegNet stages (serving bf16).

XLA's `conv_general_dilated` is the best XLA-expressible schedule at the
model's small-spatial B=1 shapes (scripts/probe_conv.py), but it still
streams the activation through HBM once per op.  This kernel runs the
conv as nine accumulating MXU dots over statically-offset row slices of a
flattened image held in VMEM (reference conv stages:
modules/segnet.py:118-142):

* NHWC (B, H, W, Cin) flattens to (B, H*W, Cin) rows and is cut into
  BANDS of `band = k*W` rows; each band is materialized with its W+1-row
  halo on both sides, so tap (dy, dx) of the 3x3 stencil is the SINGLE
  in-band row offset `dy*W + dx` — vertical edge contributions land in
  the zero padding and vanish on their own, and only two lane-free masks
  remain (w == 0 rows for dx=0 taps, w == W-1 for dx=2), built from a row
  iota (band % W == 0 keeps them band-local).
* Each tap: `acc(band, Cout) += masked_slice(band, Cin) @ K[dy*3+dx]` on
  the MXU with float32 accumulation (exactly XLA conv's accumulation
  dtype).  Bands/items run as a sequential kernel grid, each fully
  VMEM-resident; the band size is chosen as the largest multiple of W
  under the VMEM budget, so kitti's 100x100 runs as ONE band and
  fine_grid's 250x250 as a handful.
* The epilogue reproduces the flax ConvBNRelu eval sequence including its
  rounding points: bf16(conv) + bf16(bias) in bf16 (via
  `lax.reduce_precision` — XLA elides f32->bf16->f32 convert chains
  around arithmetic), then the f32 eval-BatchNorm affine folded to
  `z*mul + shift`, optional ReLU, one output cast.  XLA fuses bias/BN/
  relu into its conv for free; folding them here preserves that.

Scope: bf16 inference compute.  Training and f32/'highest' parity mode
keep the XLA conv (the parity contract pins the f32 path bit-stable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# leave headroom under the ~16 MB/core VMEM for Mosaic temporaries
_VMEM_BUDGET = 12 * 1024 * 1024


def _band_rows(h: int, w: int, cin: int, cout: int, out_f32: bool) -> int:
    """Largest per-grid-step band (a multiple of W, <= H*W rows) whose
    input-with-halo, accumulator/output, and weights fit the VMEM budget.
    Returns 0 if even one image row does not fit."""
    cin_l = max(cin, 128)     # lane padding: bf16 tiles are (16, 128)
    cout_l = max(cout, 128)
    lead = w + 1
    const = 9 * cin * cout * 2 + 2 * (lead + 16) * cin_l * 2
    # f32 output IS the accumulator; bf16 output adds a separate f32 acc
    per_row = 2 * cin_l + cout_l * (4 if out_f32 else 6)
    band_max = (_VMEM_BUDGET - const) // per_row
    k = min(h, band_max // w)
    return k * w if k >= 1 else 0


def conv3x3_supported(h: int, w: int, cin: int, cout: int,
                      out_f32: bool = False) -> bool:
    """True when at least one image row fits the banded kernel's VMEM
    budget (in practice: any shipped config)."""
    return _band_rows(h, w, cin, cout, out_f32) > 0


def _conv_kernel(x_ref, k_ref, aff_ref, out_ref, *, band: int, w: int,
                 cout: int, relu: bool):
    iota = jax.lax.broadcasted_iota(jnp.int32, (band, 1), 0)
    wmod = iota - (iota // w) * w
    m_left = wmod != 0                    # dx = 0 taps invalid at w == 0
    m_right = wmod != w - 1               # dx = 2 taps invalid at w == W-1
    f32_out = out_ref.dtype == jnp.float32
    if f32_out:
        # f32 output: the out ref IS the accumulator (a separate f32 acc
        # would put ~13 MB of live buffers in VMEM at (10000, 128->128))
        out_ref[0] = jnp.zeros((band, cout), jnp.float32)
    acc = None if f32_out else jnp.zeros((band, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[0, dy * w + dx:dy * w + dx + band, :]
            if dx == 0:
                xs = jnp.where(m_left, xs, jnp.bfloat16(0))
            elif dx == 2:
                xs = jnp.where(m_right, xs, jnp.bfloat16(0))
            part = jax.lax.dot_general(
                xs, k_ref[3 * dy + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if f32_out:
                out_ref[0] += part
            else:
                acc += part
    if f32_out:
        acc = out_ref[0]
    # flax rounding points: bf16 conv output, bf16 bias add, f32 BN affine.
    # reduce_precision, not dtype casts: XLA elides f32->bf16->f32 convert
    # chains around arithmetic, silently skipping the rounding.
    def rp(t):
        return jax.lax.reduce_precision(t, 8, 7)

    z = rp(rp(acc) + rp(aff_ref[0:1, :]))
    y = z * aff_ref[1:2, :] + aff_ref[2:3, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


def conv3x3(x: jax.Array, kernel: jax.Array, bias: jax.Array, *,
            bn_mul: jax.Array | None = None,
            bn_shift: jax.Array | None = None,
            relu: bool = False,
            out_dtype=jnp.bfloat16,
            band_rows: int | None = None,
            interpret: bool = False) -> jax.Array:
    """3x3 SAME stride-1 conv + bias + folded eval-BN affine (+ ReLU).

    Computes `relu((bf16(conv(x)) + bf16(bias)) * bn_mul + bn_shift)` with
    the same rounding points as nn.Conv(dtype=bf16) -> nn.BatchNorm(eval,
    f32) -> relu.  Fold the BN as `bn_mul = gamma * rsqrt(var + eps)`,
    `bn_shift = beta - mean * bn_mul`.

    Args:
      x: (B, H, W, Cin); cast to bfloat16 (the conv compute dtype).
        Items and row bands run as a sequential kernel grid (one VMEM
        residency each); oversize images are cut into halo-overlapped
        bands outside the kernel (one extra HBM copy of the input).
      kernel: (3, 3, Cin, Cout) HWIO, cast to bfloat16.
      bias: (Cout,) conv bias (added in bf16, like flax).
      bn_mul, bn_shift: per-channel f32 affine; defaults 1 / 0 (plain conv).
      relu: apply max(y, 0) before the output cast.
      out_dtype: bfloat16 (serving chains) or float32 (mirrors the flax
        path, whose eval BatchNorm emits f32 into pooling).
      band_rows: override the auto band size (tests; must divide by W).
    Returns (B, H, W, Cout) in `out_dtype`.
    """
    b, h, w, cin = x.shape
    kh, kw, kcin, cout = kernel.shape
    if (kh, kw) != (3, 3) or kcin != cin:
        raise ValueError(f"unsupported shapes x={x.shape} k={kernel.shape}")
    out_f32 = jnp.dtype(out_dtype) == jnp.float32
    band = (band_rows if band_rows is not None
            else _band_rows(h, w, cin, cout, out_f32))
    if band == 0:
        raise ValueError(f"one {w}x{cin}->{cout} image row exceeds the "
                         "VMEM budget")
    if band % w:
        raise ValueError(f"band_rows={band} must be a multiple of w={w}")
    hw = h * w
    nbands = -(-hw // band)
    lead = w + 1
    win_pad = -(-(band + 2 * lead) // 16) * 16

    xf = x.astype(jnp.bfloat16).reshape(b, hw, cin)
    # windows: band i covers flat rows [i*band, i*band + band) plus a
    # lead-row halo on each side; zero padding provides both the vertical
    # edges and the final partial band
    total = (nbands - 1) * band + win_pad
    xp = jnp.pad(xf, ((0, 0), (lead, total - hw - lead), (0, 0)))
    if nbands == 1:
        xw = xp[:, None]
    else:
        xw = jnp.stack([xp[:, i * band:i * band + win_pad]
                        for i in range(nbands)], axis=1)
    xw = xw.reshape(b * nbands, win_pad, cin)

    kf = kernel.astype(jnp.bfloat16).reshape(9, cin, cout)
    one = jnp.ones((cout,), jnp.float32)
    zero = jnp.zeros((cout,), jnp.float32)
    aff = jnp.stack([bias.astype(jnp.float32),
                     one if bn_mul is None else bn_mul.astype(jnp.float32),
                     zero if bn_shift is None
                     else bn_shift.astype(jnp.float32)])

    y = pl.pallas_call(
        functools.partial(_conv_kernel, band=band, w=w, cout=cout,
                          relu=relu),
        grid=(b * nbands,),
        in_specs=[pl.BlockSpec((1, win_pad, cin), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, cout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, band, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * nbands, band, cout),
                                       jnp.dtype(out_dtype)),
        interpret=interpret,
    )(xw, kf, aff)
    return y.reshape(b, nbands * band, cout)[:, :hw].reshape(
        b, h, w, cout)
