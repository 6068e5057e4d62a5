"""2x2 max-pool with argmax + index-routed unpool, XLA-native.

The reference SegNet relies on torch's `MaxPool2d(return_indices=True)` /
`MaxUnpool2d` pair (reference: modules/segnet.py:54-61, 84-92).  XLA has no
unpool primitive; instead of flat HW indices we record the 2-bit position of
the max inside each 2x2 window (int8) and route values back with a one-hot
multiply — this stays fused, is trivially differentiable, and reproduces
torch's semantics exactly:

* floor division of odd sizes (torch pools floor(H/2) windows; the trailing
  row/col never wins and unpool leaves it zero),
* first-occurrence tie-break inside a window (row-major window order matches
  torch's flat-index ordering),
* unpool output is zero everywhere except the recorded max positions.

Layout is NHWC (TPU-native) rather than the reference's NCHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_pool_argmax(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """2x2 stride-2 max pool returning (pooled, window_argmax).

    Args:
      x: (B, H, W, C).
    Returns:
      pooled: (B, floor(H/2), floor(W/2), C)
      idx: same shape, int8 in [0, 4): row-major position of the max within
        its 2x2 window.
    """
    b, h, w, c = x.shape
    hp, wp = (h // 2) * 2, (w // 2) * 2
    xt = x[:, :hp, :wp, :].reshape(b, hp // 2, 2, wp // 2, 2, c)
    win = xt.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 4, c)
    pooled = jnp.max(win, axis=3)
    idx = jnp.argmax(win, axis=3).astype(jnp.int8)
    return pooled, idx


def max_unpool(pooled: jax.Array, idx: jax.Array, out_hw: tuple) -> jax.Array:
    """Inverse of `max_pool_argmax`: place each value at its recorded window
    position, zeros elsewhere (torch MaxUnpool2d semantics)."""
    b, h, w, c = pooled.shape
    oh, ow = out_hw
    if not (2 * h <= oh <= 2 * h + 1 and 2 * w <= ow <= 2 * w + 1):
        raise ValueError(f"output size {out_hw} incompatible with pooled {(h, w)}")
    onehot = jax.nn.one_hot(idx, 4, axis=3, dtype=pooled.dtype)  # (B,h,w,4,C)
    scattered = onehot * pooled[:, :, :, None, :]
    scattered = (
        scattered.reshape(b, h, w, 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, 2 * h, 2 * w, c)
    )
    return jnp.pad(
        scattered, ((0, 0), (0, oh - 2 * h), (0, ow - 2 * w), (0, 0))
    )
