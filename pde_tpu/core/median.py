"""Median filters: 3x3 symmetric-padded (medfilt2) and 5x5 NaN-median.

``medfilt2(X, [3 3], 'symmetric')`` post-smooths every flow/disparity
increment in the reference (FlowEminND_llin_2D_v10.m:354-355). A 9-element
median is computed branch-free by sorting the stacked neighbourhood on the
VPU — no data-dependent control flow, fuses with surrounding ops.

``nanmedfilt2`` mirrors the segmentation preprocessor
(DispSegmentation.m:659-665: ``colfilt(A, [5 5], 'sliding', @nanmedian)``),
which zero-pads the border (colfilt semantics) and takes the median over
non-NaN entries.
"""

from __future__ import annotations

import jax.numpy as jnp


def _neighbourhood(x: jnp.ndarray, k: int, mode: str, constant_values=0.0) -> jnp.ndarray:
    """Stack the k*k neighbourhood of each pixel: (..., H, W) -> (k*k, ..., H, W)."""
    p = k // 2
    pad = [(0, 0)] * (x.ndim - 2) + [(p, p), (p, p)]
    if mode == "constant":
        xp = jnp.pad(x, pad, mode="constant", constant_values=constant_values)
    else:
        xp = jnp.pad(x, pad, mode=mode)
    h, w = x.shape[-2], x.shape[-1]
    views = [
        xp[..., di : di + h, dj : dj + w]
        for di in range(k)
        for dj in range(k)
    ]
    return jnp.stack(views, axis=0)


def medfilt2_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 median with mirror ('symmetric') padding, as in medfilt2."""
    n = _neighbourhood(x, 3, "symmetric")
    return jnp.sort(n, axis=0)[4]


def nanmedfilt2(x: jnp.ndarray, k: int = 5) -> jnp.ndarray:
    """k*k sliding NaN-median with zero padding (MATLAB colfilt semantics).

    NaNs are excluded from the median; an all-NaN window returns NaN.
    """
    kk = k * k
    # colfilt zero-pads, so border windows see real zeros, not NaN padding.
    # Re-create that: pad with 0 instead, but count NaNs of the *data* only.
    # NaN -> +inf must be an explicit where: nan_to_num(nan=inf) feeds its
    # own substitution through posinf handling, yielding finite 3.4e38
    # values that corrupt the valid-count (and overflow to inf in the
    # midpoint average).
    n0 = _neighbourhood(jnp.where(jnp.isnan(x), jnp.inf, x), k,
                        "constant", constant_values=0.0)
    s0 = jnp.sort(n0, axis=0)  # data NaNs -> +inf sorted last, zero pad participates
    cnt0 = jnp.sum(jnp.isfinite(s0), axis=0)
    lo = jnp.clip((cnt0 - 1) // 2, 0, kk - 1)
    hi = jnp.clip(cnt0 // 2, 0, kk - 1)
    med = 0.5 * (
        jnp.take_along_axis(s0, lo[None], axis=0)[0]
        + jnp.take_along_axis(s0, hi[None], axis=0)[0]
    )
    return jnp.where(cnt0 == 0, jnp.nan, med)
