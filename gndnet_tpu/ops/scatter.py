"""Pillar-features -> dense pseudo-image scatter.

TPU-native replacement for the reference's per-batch-item python scatter loop
(reference: modules/pointpillars.py:168-199): one vmapped scatter over the
batch, no host loop, no silent `except IndexError` (the reference can drop an
entire sample's canvas on a bad index, pointpillars.py:190-191 — we validate
via the mask instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_pillars_to_canvas(
    pillar_feats: jax.Array,
    coors: jax.Array,
    mask: jax.Array,
    ny: int,
    nx: int,
) -> jax.Array:
    """Scatter per-pillar feature vectors onto the (ny, nx) canvas.

    Args:
      pillar_feats: (B, M, C) pillar features.
      coors: (B, M, 3) int32 zyx cell coordinates.
      mask: (B, M) bool pillar validity.
      ny, nx: canvas extents.

    Returns (B, ny, nx, C); unoccupied cells zero.

    Note: requires one pillar per 2-D cell (true when nz == 1, all shipped
    reference configs); with nz > 1, 2-D collisions would be write-order
    dependent in the reference and nondeterministic here.
    """
    b, m, c = pillar_feats.shape
    cell = coors[..., 1] * nx + coors[..., 2]           # y * nx + x
    cell = jnp.where(mask, cell, ny * nx)               # padding -> drop slot

    def one(feats, idx):
        return (
            jnp.zeros((ny * nx + 1, c), feats.dtype)
            .at[idx].set(feats, mode="drop")[: ny * nx]
            .reshape(ny, nx, c)
        )

    return jax.vmap(one)(pillar_feats, cell)
