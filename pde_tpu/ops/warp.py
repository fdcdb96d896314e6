"""Bilinear warping with NaN out-of-domain semantics.

Re-designs the reference's ``bilinInterp2``
(/root/reference/mex/source/library/imageInterpolation.c:44-140):
1-based sample coordinates, corner fetches clamp to the image edge, and
any sample whose base cell ``floor(coord-1)`` falls outside ``[0, size-1]``
produces NaN — the "missing data" sentinel every downstream solver
understands. A gather expressed in pure jnp; XLA lowers it to vector
loads, and it fuses with the derivative stencils that consume it.
"""

from __future__ import annotations

import jax.numpy as jnp


def identity_grid(h: int, w: int):
    """1-based (X, Y) meshgrid matching MATLAB ``meshgrid(1:cols,1:rows)``."""
    y, x = jnp.mgrid[1 : h + 1, 1 : w + 1]
    return x.astype(jnp.float32), y.astype(jnp.float32)


def bilinear_warp(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` (..., H, W) at 1-based coords (x, y), NaN outside.

    x, y: (H, W) float arrays (shared across leading channel dims, as in
    the reference where all frames reuse one coordinate grid).
    """
    h, w = img.shape[-2], img.shape[-1]
    x0f = jnp.floor(x - 1.0)
    y0f = jnp.floor(y - 1.0)
    valid = (x0f >= 0) & (x0f <= w - 1) & (y0f >= 0) & (y0f <= h - 1)

    xf = x - 1.0 - x0f
    yf = y - 1.0 - y0f
    x0 = jnp.clip(x0f, 0, w - 1).astype(jnp.int32)
    y0 = jnp.clip(y0f, 0, h - 1).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    w00 = (1.0 - xf) * (1.0 - yf)
    w10 = xf * (1.0 - yf)
    w01 = (1.0 - xf) * yf
    w11 = xf * yf

    out = (
        w00 * img[..., y0, x0]
        + w10 * img[..., y0, x1]
        + w01 * img[..., y1, x0]
        + w11 * img[..., y1, x1]
    )
    return jnp.where(valid, out, jnp.nan)


def warp_by_flow(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Warp ``img`` by flow (u, v): sample at (X+u, Y+v), NaN outside."""
    h, w = img.shape[-2], img.shape[-1]
    x, y = identity_grid(h, w)
    return bilinear_warp(img, x + u, y + v)
