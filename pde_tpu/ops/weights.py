"""Diffusion-weight operators (isotropic Brox 6-pt and anisotropic tensor).

Capability map to the reference:

* ``diffusion_weights_4`` — the Brox 6-point discretisation used by every
  4-neighbour solver. Flow variant sums contributions of U and V
  (FlowEminND_llin_2D_v10.m:389-433); denoise/disparity variants take the
  max over channels and zero the out-facing borders
  (TVdenoise4.m:116-153; mex/source/library/imageDiffusionWeights.c:111-163,
  whose untouched first column is the zero border).
* ``tensor_diffusion_weights_8`` — the 8-neighbour anisotropic diffusion
  tensor with quantile-adaptive lambda
  (FlowEminAD_llin_2D_v10.m:416-488, TVdenoise8.m:119-231):
  ``T = 1/(|dI|^2 + 2*lambda) * [[dy^2+lambda, -dx*dy], [-dx*dy, dx^2+lambda]]``
  discretised onto W/NW/N/NE/E/SE/S/SW stencil weights by averaging tensor
  entries with the respective neighbour.

Neighbour averaging uses MATLAB ``circshift`` wrap-around semantics
(``jnp.roll``): the wrapped values land only on the 1-px border ring, but
the line-implicit solvers (ALR/PCG) DO include border pixels as unknowns,
so replicate-vs-wrap there is a measurable parity error (~0.05 px mean
flow EPE against the reference, caught by the flow_ad golden suite). The
zero-border variants (DdiffWeights / TVdenoise) are wrap-indifferent —
every wrapped position is zeroed.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from pde_tpu.core.conv import imfilter_replicate


def _cs_w(x):  # value of the west neighbour, wrapping (circshift [0 1])
    return jnp.roll(x, 1, axis=-1)


def _cs_e(x):
    return jnp.roll(x, -1, axis=-1)


def _cs_n(x):
    return jnp.roll(x, 1, axis=-2)


def _cs_s(x):
    return jnp.roll(x, -1, axis=-2)

_CDIFF = np.array([0.25, 0.0, -0.25], dtype=np.float32)


def _central_diffs(f: jnp.ndarray):
    """0.25*(prev - next) central differences, replicate borders."""
    fver = imfilter_replicate(f, _CDIFF[:, None])  # along rows (vertical)
    fhor = imfilter_replicate(f, _CDIFF[None, :])  # along cols (horizontal)
    return fver, fhor


def diffusion_weights_4(
    fields: jnp.ndarray,
    eps: float = 1e-5,
    combine: str = "sum",
    zero_borders: bool = False,
):
    """Brox 6-pt diffusion weights (wW, wN, wE, wS) from (C, H, W) fields.

    combine='sum': add squared differences over the field axis (flow U,V).
    combine='max': max over the field axis (denoise / disparity channels).
    zero_borders: zero the out-facing edge of each directional weight.
    Returns four (H, W) arrays.
    """
    if fields.ndim == 2:
        fields = fields[None]
    fver, fhor = _central_diffs(fields)

    def sq(d, g):
        return d * d + g * g

    ww = sq(_cs_w(fields) - fields, fver + _cs_w(fver))
    we = sq(_cs_e(fields) - fields, fver + _cs_e(fver))
    wn = sq(_cs_n(fields) - fields, fhor + _cs_n(fhor))
    ws = sq(_cs_s(fields) - fields, fhor + _cs_s(fhor))

    red = jnp.sum if combine == "sum" else jnp.max
    ww, we, wn, ws = (red(w, axis=0) for w in (ww, we, wn, ws))

    ww, we, wn, ws = (1.0 / jnp.sqrt(w + eps) for w in (ww, we, wn, ws))

    if zero_borders:
        ww = ww.at[:, 0].set(0.0)
        we = we.at[:, -1].set(0.0)
        wn = wn.at[0, :].set(0.0)
        ws = ws.at[-1, :].set(0.0)
    return ww, wn, we, ws


_S2 = math.sqrt(2.0)
# Alvarez derivative operators; the reference applies them with
# imfilter(..., 'conv') i.e. flipped, so we store the rot180'd kernels and
# correlate (FlowEminAD_llin_2D_v10.m:430-445).
ALVAREZ_DX = np.array(
    [[-1.0, 0.0, 1.0], [-_S2, 0.0, _S2], [-1.0, 0.0, 1.0]], dtype=np.float32
) / (4.0 + math.sqrt(8.0))
ALVAREZ_DY = np.array(
    [[-1.0, -_S2, -1.0], [0.0, 0.0, 0.0], [1.0, _S2, 1.0]], dtype=np.float32
) / (4.0 + math.sqrt(8.0))
SOBEL_DX = np.array(
    [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], dtype=np.float32
) / 8.0
SOBEL_DY = SOBEL_DX.T


def _quantile_nonzero(nrm, quantile: float):
    """MATLAB-style adaptive lambda: the ``round(nnz*q)``-th smallest of
    the NON-ZERO entries (FlowEminAD_llin_2D_v10.m:462-471) — an exact
    order statistic, no interpolation.

    On CPU this is the literal sort+index. On TPU a full-image sort per
    outer iteration is the expensive way to get one order statistic, so
    the k-th smallest is found by bitwise bisection over the float's
    int32 bit pattern (monotone for non-negative floats): 31 masked
    count-reductions, each a cheap fused pass — and the result is
    bit-identical to the sorted one (it IS the k-th order statistic).
    """
    flat = nrm.ravel()
    n = flat.shape[0]
    nz = jnp.sum(flat > 0)
    # 0-based rank among ALL entries (zeros occupy the first n-nz ranks)
    k = (n - nz) + jnp.round(nz.astype(jnp.float32) * quantile).astype(jnp.int32) - 1
    k = jnp.clip(k, 0, n - 1)
    if jax.default_backend() in ("cpu",):
        val = jnp.sort(flat)[k]
    else:
        xi = jax.lax.bitcast_convert_type(flat, jnp.int32)

        def body(b, cand):
            trial = cand | (jnp.int32(1) << b)
            cnt = jnp.sum(xi < trial)
            return jnp.where(cnt <= k, trial, cand)

        # descending bit loop (fori_loop counts up; map i -> 30-i)
        cand = jax.lax.fori_loop(
            0, 31, lambda i, c: body(jnp.int32(30 - i), c), jnp.int32(0))
        val = jax.lax.bitcast_convert_type(cand, jnp.float32)
    return jnp.where(nz > 0, val, 1.0)


def tensor_diffusion_weights_8(
    fields: jnp.ndarray,
    quantile: float = 0.9,
    operator: str = "alvarez",
    zero_borders: bool = False,
):
    """Anisotropic 8-neighbour stencil weights (W, NW, N, NE, E, SE, S, SW).

    fields: (C, H, W) or (H, W); for multi-channel input the channel with
    the largest gradient norm drives the tensor at each pixel
    (FlowEminAD_llin_2D_v10.m:448-457). lambda is the ``quantile``-th value
    of the sorted non-zero gradient norms (:462-471); computed with a
    traced gather so the whole op stays jittable.
    """
    if fields.ndim == 2:
        fields = fields[None]
    dx = imfilter_replicate(fields, ALVAREZ_DX if operator == "alvarez" else SOBEL_DX)
    dy = imfilter_replicate(fields, ALVAREZ_DY if operator == "alvarez" else SOBEL_DY)

    norm = dx * dx + dy * dy
    amax = jnp.argmax(norm, axis=0)
    max_dx = jnp.take_along_axis(dx, amax[None], axis=0)[0]
    max_dy = jnp.take_along_axis(dy, amax[None], axis=0)[0]
    nrm = max_dx * max_dx + max_dy * max_dy

    lam = _quantile_nonzero(nrm, quantile)

    multip = 1.0 / (nrm + 2.0 * lam)
    dyy = multip * (max_dy * max_dy + lam)
    dxx = multip * (max_dx * max_dx + lam)
    dxy = -multip * (max_dx * max_dy)

    w_ = 0.5 * (dyy + _cs_w(dyy))
    nw = 0.25 * (dxy + _cs_n(_cs_w(dxy)))
    n_ = 0.5 * (dxx + _cs_n(dxx))
    ne = -0.25 * (dxy + _cs_n(_cs_e(dxy)))
    e_ = 0.5 * (dyy + _cs_e(dyy))
    se = 0.25 * (dxy + _cs_s(_cs_e(dxy)))
    s_ = 0.5 * (dxx + _cs_s(dxx))
    sw = -0.25 * (dxy + _cs_s(_cs_w(dxy)))

    if zero_borders:
        w_ = w_.at[:, 0].set(0.0)
        e_ = e_.at[:, -1].set(0.0)
        n_ = n_.at[0, :].set(0.0)
        s_ = s_.at[-1, :].set(0.0)
        nw = nw.at[:, 0].set(0.0).at[0, :].set(0.0)
        ne = ne.at[:, -1].set(0.0).at[0, :].set(0.0)
        sw = sw.at[:, 0].set(0.0).at[-1, :].set(0.0)
        se = se.at[:, -1].set(0.0).at[-1, :].set(0.0)
    return w_, nw, n_, ne, e_, se, s_, sw
