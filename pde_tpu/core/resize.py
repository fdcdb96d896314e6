"""MATLAB-compatible ``imresize`` as dense matrix products (MXU-friendly).

The reference leans on IPT ``imresize`` with the 'bilinear' / 'triangle'
methods (pyramid build: FlowEminND_llin_2D_v10.m:109-110; flow upscale with
'triangle': :365-366; denoise upscale 'bilinear': TVdenoise4.m:109). MATLAB
semantics reproduced here:

* output coordinate mapping ``u = x/scale + 0.5*(1 - 1/scale)`` (1-based),
* triangle (tent) kernel of radius 1,
* antialiasing when downscaling: kernel stretched to radius ``1/scale``
  and scaled, weights renormalised ('bilinear' and 'triangle' are the same
  kernel; 'triangle' always antialiases, 'bilinear' only when scale < 1),
* out-of-range taps clamp to the edge (weights folded onto edge samples).

On TPU a resize along each axis is a small dense matmul — ideal for the
MXU — so we precompute static (out, in) weight matrices with NumPy and
contract: ``out = R @ img @ C^T``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _triangle(t):
    return np.maximum(0.0, 1.0 - np.abs(t))


def _cubic(t):
    """MATLAB imresize 'bicubic' kernel (Keys, a = -0.5), support [-2, 2]."""
    a = np.abs(t)
    a2, a3 = a * a, a * a * a
    return np.where(
        a <= 1.0,
        1.5 * a3 - 2.5 * a2 + 1.0,
        np.where(a <= 2.0, -0.5 * a3 + 2.5 * a2 - 4.0 * a + 2.0, 0.0),
    )


@functools.lru_cache(maxsize=None)
def resize_matrix(
    in_size: int, out_size: int, antialias: bool = True, kernel: str = "triangle"
) -> np.ndarray:
    """(out_size, in_size) row-stochastic resampling matrix, MATLAB imresize rules."""
    scale = out_size / in_size
    use_aa = antialias and scale < 1.0
    kscale = scale if use_aa else 1.0
    kern, base_radius = (_cubic, 2.0) if kernel == "cubic" else (_triangle, 1.0)
    radius = base_radius / kscale  # kernel radius after antialias stretching

    x = np.arange(1, out_size + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1.0 - 1.0 / scale)  # 1-based input-space centers

    left = np.floor(u - radius)
    kwidth = int(np.ceil(radius) * 2 + 2)
    idx = left[:, None] + np.arange(kwidth)[None, :]  # candidate taps (1-based)
    dist = u[:, None] - idx
    # antialias: kscale * h(kscale * t)
    w = kscale * kern(kscale * dist)
    wsum = w.sum(axis=1, keepdims=True)
    w = w / np.where(wsum == 0, 1.0, wsum)

    # fold out-of-range taps with symmetric (mirror) boundary, as MATLAB's
    # imresize does: aux = [1:n, n:-1:1]; idx = aux(mod(idx-1, 2n)+1)
    aux = np.concatenate([np.arange(in_size), np.arange(in_size - 1, -1, -1)])
    idx_fold = aux[np.mod(idx.astype(np.int64) - 1, 2 * in_size)]
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.repeat(np.arange(out_size), kwidth)
    np.add.at(mat, (rows, idx_fold.ravel()), w.ravel())
    return mat.astype(np.float32)


def imresize(
    x: jnp.ndarray,
    out_size: tuple[int, int],
    method: str = "bilinear",
) -> jnp.ndarray:
    """Resize (..., H, W) to (..., out_h, out_w) with MATLAB imresize semantics.

    method: 'bilinear'/'triangle' (triangle kernel; antialias iff
    downscaling — identical for MATLAB since 'triangle' antialiasing is a
    no-op at scale >= 1) or 'bicubic' (MATLAB's default method).
    """
    out_h, out_w = out_size
    *_, h, w = x.shape
    kernel = "cubic" if method == "bicubic" else "triangle"
    r = jnp.asarray(resize_matrix(h, out_h, True, kernel))
    c = jnp.asarray(resize_matrix(w, out_w, True, kernel))
    hp = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,...hw->...ow", r, x.astype(jnp.float32), precision=hp)
    y = jnp.einsum("pw,...ow->...op", c, y, precision=hp)
    return y


def imresize_scale(x: jnp.ndarray, scale: float, method: str = "bilinear") -> jnp.ndarray:
    """MATLAB ``imresize(x, scale)``: output size = ceil(in * scale)."""
    *_, h, w = x.shape
    return imresize(x, (int(np.ceil(h * scale)), int(np.ceil(w * scale))), method)


def imresize_nan(
    x: jnp.ndarray,
    out_size: tuple[int, int],
    method: str = "bilinear",
) -> jnp.ndarray:
    """NaN-propagating resize with MATLAB locality.

    :func:`imresize` is a dense matmul, where ``0 * NaN = NaN`` spreads a
    single NaN across the whole axis; MATLAB only propagates NaN to
    outputs whose kernel support touches it. Resize the zero-filled
    values and the NaN indicator separately, and mark outputs NaN where
    the indicator picked up any contribution.
    """
    nanmask = jnp.isnan(x)
    vals = imresize(jnp.where(nanmask, 0.0, x), out_size, method)
    touch = imresize(nanmask.astype(jnp.float32), out_size, method)
    return jnp.where(jnp.abs(touch) > 1e-6, jnp.nan, vals)
