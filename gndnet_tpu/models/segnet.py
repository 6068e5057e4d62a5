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

The convs themselves are XLA's native `conv_general_dilated` — measured to
be the floor on the v5e for every shipped shape.  Two rounds of hand-tiled
alternatives (im2col / 9-tap matmuls / pad8 in round 3, a VMEM-resident
banded Mosaic kernel family in round 4) lost to it at every flagship shape
and were deleted; the measurements are recorded in docs/KERNELS.md
"SegNet conv budget" and "VMEM conv post-mortem".
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from gndnet_tpu.ops.pooling import max_pool_argmax, max_unpool


class ConvBNRelu(nn.Module):
    """conv2DBatchNormRelu (reference modules/segnet.py:11-44): 3x3 conv with
    bias + BatchNorm2d(default eps 1e-5, momentum 0.1) + ReLU."""

    filters: int
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"
    bn_axis: str | None = None   # mesh axis for cross-device sync-BN

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.filters, (3, 3), padding="SAME", use_bias=True,
            dtype=self.dtype, precision=jax.lax.Precision(self.precision),
            name="conv",
        )(x)
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

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNRelu(self.filters, self.dtype, self.precision,
                       self.bn_axis, name="conv1")(x, train)
        x = ConvBNRelu(self.filters, self.dtype, self.precision,
                       self.bn_axis, name="conv2")(x, train)
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

    @nn.compact
    def __call__(self, x, idx, out_hw, train: bool = False):
        x = max_unpool(x, idx, out_hw)
        x = ConvBNRelu(self.in_filters, self.dtype, self.precision,
                       self.bn_axis, name="conv1")(x, train)
        x = ConvBNRelu(self.out_filters, self.dtype, self.precision,
                       self.bn_axis, name="conv2")(x, train)
        return x


def segnet_stage_shapes(h: int, w: int, in_channels: int):
    """(h, w, cin, cout) of every conv in SegnetGndEst's 9-conv stack."""
    h2, w2 = -(-h // 2), -(-w // 2)
    return [(h, w, in_channels, 128), (h, w, 128, 128),
            (h2, w2, 128, 256), (h2, w2, 256, 256),
            (h2, w2, 256, 256), (h2, w2, 256, 128),
            (h, w, 128, 128), (h, w, 128, 64), (h, w, 64, 1)]


class SegnetGndEst(nn.Module):
    """The full elevation head (reference modules/segnet.py:118-142):
    in->128 -> 128->256 -> unpool 256->128 -> unpool 128->64 -> 1."""

    in_channels: int = 64
    dtype: jnp.dtype = jnp.float32
    precision: str = "highest"
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        down1, idx1, hw1 = SegnetDown2(128, self.dtype, self.precision,
                                       self.bn_axis, name="down1")(x, train)
        down2, idx2, hw2 = SegnetDown2(256, self.dtype, self.precision,
                                       self.bn_axis, name="down2")(down1, train)
        up2 = SegnetUp2(256, 128, self.dtype, self.precision,
                        self.bn_axis, name="up2")(down2, idx2, hw2, train)
        up1 = SegnetUp2(128, 64, self.dtype, self.precision,
                        self.bn_axis, name="up1")(up2, idx1, hw1, train)
        pred = nn.Conv(
            1, (3, 3), padding="SAME", use_bias=True, dtype=self.dtype,
            precision=jax.lax.Precision(self.precision), name="regressor",
        )(up1)
        return pred.astype(jnp.float32)
