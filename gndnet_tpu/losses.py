"""Loss functions.

Re-derivations of the reference losses with identical math:

* `smooth_l1` — torch nn.SmoothL1Loss(beta=1, reduction='mean') as used by the
  live train loop (reference: training.py:102,157).
* `spatial_smooth_loss` — mean |second derivative| over dx2/dxdy/dydx/dy2 via
  nested finite differences (reference: modules/loss_func.py:13-28).  Note it
  is second-derivative smoothness, not a Sobel filter.
* `masked_huber_loss` — mask-normalized SmoothL1 (reference:
  modules/loss_func.py:34-44; built but unused by the reference's live loop —
  kept for capability parity).
* `total_loss` — alpha * smooth_l1 + beta * spatial_smooth
  (reference: training.py:157, alpha=0.9 beta=0.1).
"""

from __future__ import annotations

import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise SmoothL1 (Huber), mean reduction; torch semantics."""
    d = jnp.abs(pred - target)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return jnp.mean(loss)


def spatial_smooth_loss(pred_map: jnp.ndarray) -> jnp.ndarray:
    """Second-derivative spatial smoothness of a (B, H, W) elevation map.

    gradient() of the reference treats axis 1 as y and axis 2 as x
    (loss_func.py:18-21); dx2/dxdy/dydx/dy2 are the four second differences,
    each reduced by mean(|.|) over the spatial axes then averaged over batch.
    """
    def gradient(p):
        d_dy = p[:, 1:] - p[:, :-1]
        d_dx = p[:, :, 1:] - p[:, :, :-1]
        return d_dx, d_dy

    dx, dy = gradient(pred_map)
    dx2, dxdy = gradient(dx)
    dydx, dy2 = gradient(dy)
    loss = (
        jnp.mean(jnp.abs(dx2), axis=(1, 2))
        + jnp.mean(jnp.abs(dxdy), axis=(1, 2))
        + jnp.mean(jnp.abs(dydx), axis=(1, 2))
        + jnp.mean(jnp.abs(dy2), axis=(1, 2))
    )
    return jnp.mean(loss)


def masked_huber_loss(pred: jnp.ndarray, target: jnp.ndarray,
                      mask: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Mask-normalized SmoothL1 over (B, H, W): per-sample sum of masked
    elementwise huber divided by the per-sample mask mass, then batch mean."""
    d = jnp.abs(pred * mask - target * mask)
    el = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    per = jnp.sum(el, axis=(1, 2)) / jnp.maximum(jnp.sum(mask, axis=(1, 2)), 1.0)
    return jnp.mean(per)


def total_loss(pred: jnp.ndarray, labels: jnp.ndarray,
               alpha: float = 0.9, beta: float = 0.1) -> jnp.ndarray:
    """The live training objective (reference training.py:157)."""
    return alpha * smooth_l1(pred, labels) + beta * spatial_smooth_loss(pred)
