"""SegNet-style conv encoder-decoder elevation regressor, NHWC.

Re-derivation of the reference's 2-down/2-up SegNet variant
(reference: modules/segnet.py:11-142): each down stage is two
Conv3x3+BatchNorm+ReLU blocks followed by an argmax max-pool; each up stage
unpools with the saved argmax routes and applies two conv blocks; a final 3x3
conv regresses one elevation channel.  Differences by design:

* NHWC layout and `ops.pooling` argmax routing instead of torch flat indices
  (see ops/pooling.py docstring for the exact-equivalence argument).
* `dtype` lets conv compute run in bfloat16 on the MXU with float32 params
  (replaces the reference's dormant torchplus fp16 machinery,
  torchplus/train/optim.py:31-110).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from gndnet_tpu.ops.pallas_conv import (conv3x3, conv3x3_supported,
                                        conv3x3_train)
from gndnet_tpu.ops.pooling import max_pool_argmax, max_unpool


class ConvBNRelu(nn.Module):
    """conv2DBatchNormRelu (reference modules/segnet.py:11-44): 3x3 conv with
    bias + BatchNorm2d(default eps 1e-5, momentum 0.1) + ReLU.

    `pallas_train_conv=True` swaps the TRAINING forward's conv for the
    banded VMEM kernel with its hand-derived VJP (ops/pallas_conv.
    conv3x3_train) — same bf16 semantics, params untouched (the nn.Conv
    submodule still owns them).  Eval dispatch happens one level up
    (SegnetGndEst's fused twin, which also folds BN/ReLU)."""

    filters: int
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"
    bn_axis: str | None = None   # mesh axis for cross-device sync-BN
    pallas_train_conv: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        fast = (self.pallas_train_conv and train
                and not self.is_initializing()
                and self.dtype == jnp.bfloat16
                and jax.default_backend() == "tpu"
                and conv3x3_supported(x.shape[1], x.shape[2], x.shape[3],
                                      self.filters))
        conv = nn.Conv(
            self.filters, (3, 3), padding="SAME", use_bias=True,
            dtype=self.dtype, precision=jax.lax.Precision(self.precision),
            name="conv",
        )
        if fast:
            p = self.variables["params"]["conv"]
            x = conv3x3_train(x, p["kernel"], p["bias"])
        else:
            x = conv(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, axis_name=self.bn_axis, name="bn",
        )(x)
        return nn.relu(x)


class SegnetDown2(nn.Module):
    filters: int
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"
    bn_axis: str | None = None   # mesh axis for cross-device sync-BN
    pallas_train_conv: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNRelu(self.filters, self.dtype, self.precision,
                       self.bn_axis, self.pallas_train_conv,
                       name="conv1")(x, train)
        x = ConvBNRelu(self.filters, self.dtype, self.precision,
                       self.bn_axis, self.pallas_train_conv,
                       name="conv2")(x, train)
        unpooled_hw = x.shape[1:3]
        pooled, idx = max_pool_argmax(x)
        return pooled, idx, unpooled_hw


class SegnetUp2(nn.Module):
    """Unpool then two conv blocks; conv1 keeps the input width, conv2 maps to
    `out_filters` (reference modules/segnet.py:81-92)."""

    in_filters: int
    out_filters: int
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"
    bn_axis: str | None = None
    pallas_train_conv: bool = False

    @nn.compact
    def __call__(self, x, idx, out_hw, train: bool = False):
        x = max_unpool(x, idx, out_hw)
        x = ConvBNRelu(self.in_filters, self.dtype, self.precision,
                       self.bn_axis, self.pallas_train_conv,
                       name="conv1")(x, train)
        x = ConvBNRelu(self.out_filters, self.dtype, self.precision,
                       self.bn_axis, self.pallas_train_conv,
                       name="conv2")(x, train)
        return x


def _cbr_eval(p, s, x, interpret):
    """ConvBNRelu eval via the VMEM conv kernel: fold the eval BatchNorm
    into the conv epilogue (`mul = gamma*rsqrt(var+eps)`, flax eps 1e-5),
    preserving the flax rounding points (pallas_conv docstring)."""
    mul = p["bn"]["scale"] * jax.lax.rsqrt(s["bn"]["var"] + 1e-5)
    shift = p["bn"]["bias"] - s["bn"]["mean"] * mul
    # f32 output mirrors the flax path (eval BatchNorm emits f32 into the
    # argmax pooling, whose tie-breaks routing must match)
    return conv3x3(x, p["conv"]["kernel"], p["conv"]["bias"],
                   bn_mul=mul, bn_shift=shift, relu=True,
                   out_dtype=jnp.float32, interpret=interpret)


def segnet_stage_shapes(h: int, w: int, in_channels: int):
    """(h, w, cin, cout) of every conv in SegnetGndEst's 9-conv stack."""
    h2, w2 = -(-h // 2), -(-w // 2)
    return [(h, w, in_channels, 128), (h, w, 128, 128),
            (h2, w2, 128, 256), (h2, w2, 256, 256),
            (h2, w2, 256, 256), (h2, w2, 256, 128),
            (h, w, 128, 128), (h, w, 128, 64), (h, w, 64, 1)]


def fused_segnet_supported(h: int, w: int, in_channels: int) -> bool:
    return all(conv3x3_supported(*s, out_f32=True)
               for s in segnet_stage_shapes(h, w, in_channels))


def fused_segnet_eval(params, batch_stats, x, *,
                      interpret: bool = False) -> jax.Array:
    """Functional serving twin of `SegnetGndEst.__call__(train=False)`:
    the nine convs run as VMEM-resident pallas kernels with bias + eval-BN
    + ReLU folded into their epilogues; pool/unpool stay the shared
    `ops.pooling` routes.  `params`/`batch_stats` are SegnetGndEst's own
    variable subtrees (the module dispatches here itself when eligible)."""

    def down(name, x):
        p, s = params[name], batch_stats[name]
        x = _cbr_eval(p["conv1"], s["conv1"], x, interpret)
        x = _cbr_eval(p["conv2"], s["conv2"], x, interpret)
        hw = x.shape[1:3]
        pooled, idx = max_pool_argmax(x)
        return pooled, idx, hw

    def up(name, x, idx, out_hw):
        x = max_unpool(x, idx, out_hw)
        p, s = params[name], batch_stats[name]
        x = _cbr_eval(p["conv1"], s["conv1"], x, interpret)
        x = _cbr_eval(p["conv2"], s["conv2"], x, interpret)
        return x

    d1, i1, hw1 = down("down1", x.astype(jnp.bfloat16))
    d2, i2, hw2 = down("down2", d1)
    u2 = up("up2", d2, i2, hw2)
    u1 = up("up1", u2, i1, hw1)
    rp = params["regressor"]
    pred = conv3x3(u1, rp["kernel"], rp["bias"], out_dtype=jnp.float32,
                   interpret=interpret)
    return pred


class SegnetGndEst(nn.Module):
    """The full elevation head (reference modules/segnet.py:118-142):
    in->128 -> 128->256 -> unpool 256->128 -> unpool 128->64 -> 1."""

    in_channels: int = 64
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"
    bn_axis: str | None = None
    # serving fast path (eval, bf16, B=1, TPU).  Default OFF until the
    # kernels have compiled+measured on the real chip (the relay was down
    # when they landed — docs/RUNBOOK_conv_measure.md flips this)
    use_pallas_conv: bool = False
    pallas_train_conv: bool = False  # training conv via conv3x3_train VJP

    @nn.compact
    def __call__(self, x, train: bool = False):
        if (self.use_pallas_conv and not train and not self.is_initializing()
                and self.dtype == jnp.bfloat16 and x.shape[0] == 1
                and jax.default_backend() == "tpu"
                and "batch_stats" in self.variables
                and fused_segnet_supported(x.shape[1], x.shape[2],
                                           x.shape[3])):
            return fused_segnet_eval(self.variables["params"],
                                     self.variables["batch_stats"], x)
        ptc = self.pallas_train_conv
        down1, idx1, hw1 = SegnetDown2(128, self.dtype, self.precision,
                                       self.bn_axis, ptc,
                                       name="down1")(x, train)
        down2, idx2, hw2 = SegnetDown2(256, self.dtype, self.precision,
                                       self.bn_axis, ptc,
                                       name="down2")(down1, train)
        up2 = SegnetUp2(256, 128, self.dtype, self.precision,
                        self.bn_axis, ptc,
                        name="up2")(down2, idx2, hw2, train)
        up1 = SegnetUp2(128, 64, self.dtype, self.precision,
                        self.bn_axis, ptc,
                        name="up1")(up2, idx1, hw1, train)
        pred = nn.Conv(
            1, (3, 3), padding="SAME", use_bias=True, dtype=self.dtype,
            precision=jax.lax.Precision(self.precision), name="regressor",
        )(up1)
        return pred.astype(jnp.float32)
