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


# ---------------------------------------------------------------------------
# Windowed shift-and-add warps (gather-free TPU hot path)
#
# XLA:TPU serializes arbitrary 2D gathers (~10 ns/element measured — it
# dominated the fused flow frame, BASELINE.md round 4). When the
# displacement is bounded, |floor(u)| <= r, the same bilinear sample is a
# select-sum over 2r statically shifted copies of the image: every term
# is a lane-aligned slice + fused multiply-add on the VPU, no gather at
# all. Matches bilinear_warp to float32 lerp-association noise (~3e-6)
# wherever the bound holds, including the corner-clamp and NaN
# semantics; displacements outside the window produce NaN — the engine-wide
# missing-data sentinel, so downstream solvers degrade to pure diffusion
# at such pixels exactly as they do for out-of-image samples
# (imageInterpolation.c:126-137 semantics). The window radius is a
# static model parameter (warp_window); pick it from the workload's flow
# range (coarse-to-fine warping keeps per-level magnitudes small).
# ---------------------------------------------------------------------------


def warp_x_window(img: jnp.ndarray, u: jnp.ndarray, r: int) -> jnp.ndarray:
    """x-only warp (disparity): sample (..., H, W) img at (X+u, Y).

    Exact match of ``bilinear_warp(img, X+u, Y)`` where
    ``floor(u) in [-r, r-1]``; NaN outside the window or the image."""
    h, w = img.shape[-2], img.shape[-1]
    ui = jnp.floor(u)
    uf = u - ui
    jj = jnp.arange(w, dtype=jnp.float32)[None, :]
    x0 = jj + ui  # 0-based base column of the sample
    valid = (x0 >= 0) & (x0 <= w - 1)
    win = (ui >= -r) & (ui <= r - 1)
    pad_cfg = [(0, 0)] * (img.ndim - 1) + [(r, r + 1)]
    p = jnp.pad(img, pad_cfg, mode="edge")
    acc = jnp.zeros(jnp.broadcast_shapes(img.shape, u.shape), img.dtype)
    for k in range(-r, r):
        s0 = p[..., :, k + r:k + r + w]
        s1 = p[..., :, k + r + 1:k + r + 1 + w]
        # the edge pad replicates the last column, reproducing the
        # clamped corner fetch x1 = min(x0+1, w-1)
        acc = jnp.where(ui == k, (1.0 - uf) * s0 + uf * s1, acc)
    return jnp.where(valid & win, acc, jnp.nan)


def warp_window(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                r: int) -> jnp.ndarray:
    """2D windowed warp: sample at (X+u, Y+v); exact match of
    ``warp_by_flow`` where ``floor(u), floor(v) in [-r, r-1]``; NaN
    outside the window or the image. Cost grows as (2r)^2 masked
    FMAs/pixel — still far cheaper than the serialized gather for the
    radii coarse-to-fine flows need."""
    h, w = img.shape[-2], img.shape[-1]
    ui = jnp.floor(u)
    vi = jnp.floor(v)
    uf = u - ui
    vf = v - vi
    jj = jnp.arange(w, dtype=jnp.float32)[None, :]
    ii = jnp.arange(h, dtype=jnp.float32)[:, None]
    x0 = jj + ui
    y0 = ii + vi
    valid = (x0 >= 0) & (x0 <= w - 1) & (y0 >= 0) & (y0 <= h - 1)
    win = (ui >= -r) & (ui <= r - 1) & (vi >= -r) & (vi <= r - 1)
    pad_cfg = [(0, 0)] * (img.ndim - 2) + [(r, r + 1), (r, r + 1)]
    p = jnp.pad(img, pad_cfg, mode="edge")
    acc = jnp.zeros(jnp.broadcast_shapes(img.shape, u.shape), img.dtype)
    for ky in range(-r, r):
        sel_y = vi == ky
        r0 = p[..., ky + r:ky + r + h, :]
        r1 = p[..., ky + r + 1:ky + r + 1 + h, :]
        for kx in range(-r, r):
            p00 = r0[..., :, kx + r:kx + r + w]
            p01 = r0[..., :, kx + r + 1:kx + r + 1 + w]
            p10 = r1[..., :, kx + r:kx + r + w]
            p11 = r1[..., :, kx + r + 1:kx + r + 1 + w]
            val = (1.0 - vf) * ((1.0 - uf) * p00 + uf * p01) \
                + vf * ((1.0 - uf) * p10 + uf * p11)
            acc = jnp.where(sel_y & (ui == kx), val, acc)
    return jnp.where(valid & win, acc, jnp.nan)
