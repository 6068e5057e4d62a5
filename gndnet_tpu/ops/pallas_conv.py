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
  rounding points: bf16(conv) + bf16(bias) in bf16 (in-kernel convert
  round-trips — Mosaic has no reduce_precision lowering, and XLA's
  convert-chain elision never sees a pallas body), then the f32
  eval-BatchNorm affine folded to
  `z*mul + shift`, optional ReLU, one output cast.  XLA fuses bias/BN/
  relu into its conv for free; folding them here preserves that.

Scope: bf16 compute.  `conv3x3` (+ the fused eval twin in models/segnet)
serves inference; `conv3x3_train` adds a hand-derived VJP for the
training forward.  f32/'highest' parity mode keeps the XLA conv (the
parity contract pins the f32 path bit-stable).
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


def _band_geometry(h: int, w: int, cin: int, cout: int, out_f32: bool,
                   band_rows: int | None):
    """(band, nbands, lead, win_pad) for the banded window decomposition
    shared by the forward and wgrad kernels."""
    band = (band_rows if band_rows is not None
            else _band_rows(h, w, cin, cout, out_f32))
    if band == 0:
        raise ValueError(f"one {w}x{cin}->{cout} image row exceeds the "
                         "VMEM budget")
    if band % w:
        raise ValueError(f"band_rows={band} must be a multiple of w={w}")
    lead = w + 1
    win_pad = -(-(band + 2 * lead) // 16) * 16
    return band, -(-(h * w) // band), lead, win_pad


def _edge_masks(band: int, w: int):
    iota = jax.lax.broadcasted_iota(jnp.int32, (band, 1), 0)
    wmod = iota - (iota // w) * w
    return wmod != 0, wmod != w - 1      # dx=0 invalid at w==0; dx=2 at w-1


def _masked_tap(x_ref, m_left, m_right, dy, dx, w, band):
    xs = x_ref[0, dy * w + dx:dy * w + dx + band, :]
    if dx == 0:
        return jnp.where(m_left, xs, jnp.bfloat16(0))
    if dx == 2:
        return jnp.where(m_right, xs, jnp.bfloat16(0))
    return xs


def _conv_kernel(x_ref, k_ref, aff_ref, out_ref, *, band: int, w: int,
                 cout: int, relu: bool, round_bf16: bool):
    m_left, m_right = _edge_masks(band, w)
    f32_out = out_ref.dtype == jnp.float32
    if f32_out:
        # f32 output: the out ref IS the accumulator (a separate f32 acc
        # would put ~13 MB of live buffers in VMEM at (10000, 128->128))
        out_ref[0] = jnp.zeros((band, cout), jnp.float32)
    acc = None if f32_out else jnp.zeros((band, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = _masked_tap(x_ref, m_left, m_right, dy, dx, w, band)
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
    # In-kernel this is a plain convert round-trip: Mosaic has no
    # reduce_precision lowering, and XLA's f32->bf16->f32 elision pass
    # never sees a pallas body.  verify_tpu check 4 pins the rounding.
    # round_bf16=False (gradient convs) keeps the f32 accumulation intact.
    def rp(t):
        if not round_bf16:
            return t
        return t.astype(jnp.bfloat16).astype(jnp.float32)

    z = rp(rp(acc) + rp(aff_ref[0:1, :]))
    y = z * aff_ref[1:2, :] + aff_ref[2:3, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


def _windows(x: jax.Array, band: int, lead: int, win_pad: int,
             nbands: int) -> jax.Array:
    """(B, HW, C) -> (B*nbands, win_pad, C) halo-overlapped row bands:
    band i covers flat rows [i*band, i*band + band) plus a lead-row halo
    on each side; zero padding provides the vertical edges and the final
    partial band."""
    b, hw, c = x.shape
    total = (nbands - 1) * band + win_pad
    xp = jnp.pad(x, ((0, 0), (lead, total - hw - lead), (0, 0)))
    if nbands == 1:
        xw = xp[:, None]
    else:
        xw = jnp.stack([xp[:, i * band:i * band + win_pad]
                        for i in range(nbands)], axis=1)
    return xw.reshape(b * nbands, win_pad, c)


def conv3x3(x: jax.Array, kernel: jax.Array, bias: jax.Array, *,
            bn_mul: jax.Array | None = None,
            bn_shift: jax.Array | None = None,
            relu: bool = False,
            out_dtype=jnp.bfloat16,
            band_rows: int | None = None,
            round_bf16: bool = True,
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
    band, nbands, lead, win_pad = _band_geometry(h, w, cin, cout, out_f32,
                                                 band_rows)
    hw = h * w

    xw = _windows(x.astype(jnp.bfloat16).reshape(b, hw, cin),
                  band, lead, win_pad, nbands)
    kf = kernel.astype(jnp.bfloat16).reshape(9, cin, cout)
    one = jnp.ones((cout,), jnp.float32)
    zero = jnp.zeros((cout,), jnp.float32)
    aff = jnp.stack([bias.astype(jnp.float32),
                     one if bn_mul is None else bn_mul.astype(jnp.float32),
                     zero if bn_shift is None
                     else bn_shift.astype(jnp.float32)])

    y = pl.pallas_call(
        functools.partial(_conv_kernel, band=band, w=w, cout=cout,
                          relu=relu, round_bf16=round_bf16),
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


def _wgrad_kernel(x_ref, dy_ref, out_ref, *, band: int, w: int,
                  cin: int, cout: int):
    """One band's contribution to d(kernel): per tap,
    d_K[tap] += masked_window_slice(band, Cin)^T @ d_y(band, Cout) on the
    MXU, accumulated in the (9, Cin, Cout) f32 out ref across the
    sequential grid."""
    i = pl.program_id(0)
    m_left, m_right = _edge_masks(band, w)
    dy_b = dy_ref[0]

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros((9, cin, cout), jnp.float32)

    for dy in range(3):
        for dx in range(3):
            xs = _masked_tap(x_ref, m_left, m_right, dy, dx, w, band)
            out_ref[3 * dy + dx] += jax.lax.dot_general(
                xs, dy_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def conv3x3_wgrad(x: jax.Array, d_y: jax.Array, *,
                  band_rows: int | None = None,
                  interpret: bool = False) -> jax.Array:
    """d(kernel) of `conv3x3` w.r.t. its HWIO weights: (3, 3, Cin, Cout)
    f32 from the same banded window decomposition as the forward."""
    b, h, w, cin = x.shape
    _, _, _, cout = d_y.shape
    band, nbands, lead, win_pad = _band_geometry(h, w, cin, cout, False,
                                                 band_rows)
    hw = h * w

    xw = _windows(x.astype(jnp.bfloat16).reshape(b, hw, cin),
                  band, lead, win_pad, nbands)
    # d_y cut into the same bands (no halo); zero-pad the partial tail
    dyf = d_y.astype(jnp.bfloat16).reshape(b, hw, cout)
    dyp = jnp.pad(dyf, ((0, 0), (0, nbands * band - hw), (0, 0))
                  ).reshape(b * nbands, band, cout)

    k = pl.pallas_call(
        functools.partial(_wgrad_kernel, band=band, w=w, cin=cin,
                          cout=cout),
        grid=(b * nbands,),
        in_specs=[pl.BlockSpec((1, win_pad, cin), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, band, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, cin, cout), jnp.float32),
        interpret=interpret,
    )(xw, dyp)
    return k.reshape(3, 3, cin, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_train(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """Differentiable plain conv3x3 (bias, no BN/relu, bf16 output) for
    the training forward: the VJP hand-derives all three gradients with
    the same banded Mosaic kernels.

      d_x = conv3x3(d_y, rot180(K)^T)   (SAME-padded correlation)
      d_K[tap] = shifted-masked-x^T @ d_y  (`conv3x3_wgrad`)
      d_bias = sum(d_y)

    Matches nn.Conv(dtype=bf16) + XLA autodiff up to f32 accumulation
    order (gradient convs skip the forward's bf16 rounding points:
    round_bf16=False keeps the f32 accumulation intact)."""
    return conv3x3(x, kernel, bias, interpret=interpret)


def _conv3x3_train_fwd(x, kernel, bias, interpret):
    y = conv3x3(x, kernel, bias, interpret=interpret)
    # zero-length sentinels carry the primal dtypes (dtypes themselves are
    # not valid residuals)
    return y, (x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
               jnp.zeros((0,), x.dtype), jnp.zeros((0,), kernel.dtype),
               jnp.zeros((0,), bias.dtype))


def _conv3x3_train_bwd(interpret, res, d_y):
    x16, k16, x_s, k_s, b_s = res
    x_dt, k_dt, b_dt = x_s.dtype, k_s.dtype, b_s.dtype
    # rot180 + transpose(Cin<->Cout): SAME-padded full correlation
    k_rot = jnp.transpose(k16[::-1, ::-1], (0, 1, 3, 2))
    d_x = conv3x3(d_y, k_rot, jnp.zeros((k16.shape[2],), jnp.float32),
                  out_dtype=jnp.float32, round_bf16=False,
                  interpret=interpret).astype(x_dt)
    d_k = conv3x3_wgrad(x16, d_y, interpret=interpret).astype(k_dt)
    d_b = jnp.sum(d_y.astype(jnp.float32), axis=(0, 1, 2)).astype(b_dt)
    return d_x, d_k, d_b


conv3x3_train.defvjp(_conv3x3_train_fwd, _conv3x3_train_bwd)
