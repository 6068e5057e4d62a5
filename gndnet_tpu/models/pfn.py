"""Pillar Feature Net in flax.

Re-derivation of the reference PFN (modules/pointpillars.py:19-146) with the
same math: feature decoration (done by ops.pillarize), then per-point
Linear(+BatchNorm when use_norm)+ReLU and a max over the points of each
pillar.  Torch quirks preserved:

* `use_norm=True`: Linear without bias + BatchNorm1d(eps=1e-3, momentum=0.01)
  normalizing each channel over the DYNAMIC (n_actual_pillars x max_points)
  rows — padding point rows of real pillars included, empty pillar slots
  excluded — exactly the reference's BatchNorm1d over its dynamically-sized
  pillar tensor (pointpillars.py:55); the divisor is a traced scalar.
* `use_norm=False` (every shipped config): Linear with bias; padding rows are
  zero pre-linear so they contribute relu(bias) to the pillar max
  (pointpillars.py:58 maxes over all rows).
* non-last layers emit units//2 channels concatenated with the broadcast max
  (pointpillars.py:37-39, 60-65).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class PFNLayer(nn.Module):
    out_channels: int
    use_norm: bool = True
    last_layer: bool = False
    precision: str = "highest"
    bn_axis: str | None = None

    @property
    def units(self) -> int:
        return self.out_channels if self.last_layer else self.out_channels // 2

    def setup(self):
        self.linear = nn.Dense(self.units, use_bias=not self.use_norm,
                               precision=jax.lax.Precision(self.precision))
        if self.use_norm:
            # torch BatchNorm1d(eps=1e-3, momentum=0.01): flax momentum is the
            # running-average retention factor, i.e. 1 - torch_momentum.
            self.norm = nn.BatchNorm(momentum=0.99, epsilon=1e-3,
                                     axis_name=self.bn_axis)

    def activate_flat(self, x, train: bool = False):
        """Linear(+BN)+ReLU on an arbitrary (..., Cin) tensor.

        Used both by `__call__` on (M, P, Cin) pillars and by the fused path
        on the flat (N, Cin) decorated point stream.  With use_norm the fused
        path only supports eval mode (running stats are a pure affine map);
        training-mode batch stats would need the padded pillar tensor the
        fused path deliberately never builds.
        """
        x = self.linear(x)
        if self.use_norm:
            x = self.norm(x, use_running_average=not train)
        return nn.relu(x)

    def _bn_train_affine(self, s, q, rows):
        """Batch-stat (inv, shift) from per-channel sums with a DYNAMIC
        row-count divisor, plus the running-stat update.

        `rows` is the number of pillar-tensor rows the sums cover — the
        traced `n_actual_pillars * max_points` scalar matching torch
        BatchNorm1d on the reference's dynamic (M_actual, P, C) tensor
        (reference modules/pointpillars.py:55).  XLA's static shapes only
        constrain array extents; a traced scalar divisor is jit-legal.

        Sync-BN: with `bn_axis` set, sums AND row counts are psum'd so the
        statistics are those of the concatenated global batch even when
        per-device pillar counts differ.  Running-stat updates then go
        through the regular flax BatchNorm on a 2-row surrogate
        [mean + sqrt(var), mean - sqrt(var)] whose batch statistics equal
        the derived ones exactly — flax's own momentum/dtype semantics
        apply unchanged, and the surrogate is identical on every device so
        flax's axis_name reduction is a no-op on already-global stats.
        """
        rows = jnp.asarray(rows, jnp.float32)
        if self.bn_axis is not None:
            s = jax.lax.psum(s, self.bn_axis)
            q = jax.lax.psum(q, self.bn_axis)
            rows = jax.lax.psum(rows, self.bn_axis)
        rows = jnp.maximum(rows, 1.0)
        mean = s / rows
        var = jnp.maximum(q / rows - jnp.square(mean), 0.0)
        # running-stat update only; stop_gradient guards against the
        # d sqrt(0) = inf x zero-cotangent = NaN trap on dead channels
        sdev = jnp.sqrt(var)
        self.norm(jax.lax.stop_gradient(jnp.stack([mean + sdev, mean - sdev])),
                  use_running_average=False)
        p = self.norm.variables["params"]
        inv = p["scale"] / jnp.sqrt(var + 1e-3)
        shift = p["bias"] - mean * inv
        return inv, shift

    def activate_flat_bn_train(self, decorated_flat, total_rows):
        """Train-mode use_norm activation on the flat kept-masked point
        stream, WITHOUT materializing the (M, P, F) pillar tensor.

        The dynamic pillar tensor's BatchNorm statistics are analytically
        available from the flat stream: padding rows of real pillars are
        zeros pre-linear and the use_norm linear has NO bias (reference
        modules/pointpillars.py:33), so every pad row maps to z = 0 — it
        contributes nothing to the per-channel sums and only inflates the
        divisor.  Dropped points (rank >= cap) arrive here as zeroed rows
        too (decorate_points), so one unmasked sum/sum-of-squares over the
        flat z stream reproduces the pillar path's batch statistics exactly
        (up to float re-association).

        `total_rows` is the traced `n_actual_pillars * max_points` scalar —
        the reference's dynamic BatchNorm1d divisor (pointpillars.py:55);
        the caller derives n_actual_pillars from the per-cell occupancy
        counts (models/gndnet.py).

        Returns (acts (N, C) relu'd normalized activations, pad_floor (C,)
        — the value every padding row contributes to its pillar max).
        """
        z = self.linear(decorated_flat)                      # (N, C)
        zf = z.astype(jnp.float32)
        s = jnp.sum(zf, axis=0)
        q = jnp.sum(jnp.square(zf), axis=0)
        inv, shift = self._bn_train_affine(s, q, total_rows)
        acts = nn.relu(zf * inv + shift).astype(z.dtype)
        pad_floor = nn.relu(shift).astype(z.dtype)
        return acts, pad_floor

    def effective_affine(self):
        """Eval-mode (kernel, bias) of Linear(+folded running-stat BN).

        The affine fast path (ops.pillarize.affine_canvas) consumes the
        layer as one affine map; with use_norm the BN running stats fold in:
        y = scale*(Wx - mean)/sqrt(var+eps) + bias_bn."""
        kernel = self.linear.variables["params"]["kernel"]
        if not self.use_norm:
            return kernel, self.linear.variables["params"]["bias"]
        p = self.norm.variables["params"]
        s = self.norm.variables["batch_stats"]
        inv = p["scale"] / jnp.sqrt(s["var"] + 1e-3)
        return kernel * inv[None, :], p["bias"] - s["mean"] * inv

    def __call__(self, x, train: bool = False, pillar_mask=None):
        """x: (M, P, Cin) -> (M, 1, units) if last else (M, P, 2*units).

        `pillar_mask` (M,) bool flags real pillars.  With use_norm training
        it drives reference-exact batch statistics: sums run over valid
        pillars' rows only (padding POINT rows of real pillars are included
        — they exist in the reference's dynamic tensor too) and the divisor
        is the dynamic `n_valid * P` row count, exactly torch BatchNorm1d
        on the reference's (M_actual, P, C) tensor (modules/
        pointpillars.py:55).  Without a mask every pillar slot counts
        (static divisor — only correct when all slots are real).
        """
        if self.use_norm and train:
            z = self.linear(x).astype(jnp.float32)
            if pillar_mask is None:
                zm = z
                rows = z.shape[0] * z.shape[1]
            else:
                zm = jnp.where(pillar_mask[:, None, None], z, 0.0)
                rows = jnp.sum(pillar_mask.astype(jnp.float32)) * z.shape[1]
            s = jnp.sum(zm, axis=(0, 1))
            q = jnp.sum(jnp.square(zm), axis=(0, 1))
            inv, shift = self._bn_train_affine(s, q, rows)
            x = nn.relu(z * inv + shift).astype(x.dtype)
        else:
            x = self.activate_flat(x, train=train)
        x_max = jnp.max(x, axis=1, keepdims=True)
        if self.last_layer:
            return x_max
        x_repeat = jnp.broadcast_to(x_max, x.shape)
        return jnp.concatenate([x, x_repeat], axis=2)


class PillarFeatureNet(nn.Module):
    """Stack of PFNLayers over decorated pillar features.

    Input is the already-decorated (M, P, D) tensor (see
    ops.pillarize.decorate_pillars); output is (M, C_out) pillar features.
    Single-layer stacks (`vfe_filters: [64]`, the only shipped configuration,
    reference config/config_kittiSem.yaml:25) are also exactly expressible as
    one dense matmul over the flat point stream — the fused path exploits
    that (models/gndnet.py).
    """

    num_filters: Sequence[int] = (64,)
    use_norm: bool = False
    precision: str = "highest"
    bn_axis: str | None = None

    def setup(self):
        n = len(self.num_filters)
        self.layers = [
            PFNLayer(
                out_channels=f,
                use_norm=self.use_norm,
                last_layer=(i == n - 1),
                precision=self.precision,
                bn_axis=self.bn_axis,
                name=f"pfn_{i}",
            )
            for i, f in enumerate(self.num_filters)
        ]

    def __call__(self, decorated, train: bool = False, pillar_mask=None):
        x = decorated
        for layer in self.layers:
            x = layer(x, train=train, pillar_mask=pillar_mask)
        return jnp.squeeze(x, axis=1)
