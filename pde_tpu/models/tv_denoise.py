"""Total-variation denoising, 4- and 8-neighbour (TVdenoise4/8.m).

Lagged-diffusivity TV restoration with L1 data term:

    PsiData = 1/sqrt((u - f)^2 + eps)
    TRACE   = PsiData + alpha * Σ w_k
    B       = PsiData * f
    u      <- SOR/ALR sweeps of  u+ = (B + Σ w_k u_k) / TRACE

run coarse-to-fine over a partial pyramid (down to ``scl`` of the original
size). The 4-neighbour variant uses Brox weights with max-over-channels
and zeroed borders (TVdenoise4.m:80-153); the 8-neighbour variant uses the
anisotropic diffusion tensor stencil (TVdenoise8.m:80-100, weights
:119-231). Per-level bodies are jitted whole — the reference's
MEX-call-per-outer-iteration boundary disappears.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from pde_tpu.config import with_overrides
from pde_tpu.core.conv import imfilter_replicate, gaussian_kernel_2d
from pde_tpu.core.resize import imresize, imresize_scale
from pde_tpu.core.pyramid import pyramid_scales
from pde_tpu.ops.weights import diffusion_weights_4, tensor_diffusion_weights_8
from pde_tpu.kernels.dispatch import sor_pde4, sor_pde8
from pde_tpu.solvers.krylov import pcg_pde4, pcg_pde8

_EPS_D = float(np.finfo(np.float64).eps)  # MATLAB `eps`


@dataclasses.dataclass(frozen=True)
class TVDenoise4Params:
    """Defaults from TVdenoise4.m:36-44."""

    alpha: float = 5.0
    omega: float = 1.75
    outer_iter: int = 10
    inner_iter: int = 5
    solver: int = 1  # TPU-native default (red-black kernel path)
    scl: float = 0.5
    scl_factor: float = 0.75


@dataclasses.dataclass(frozen=True)
class TVDenoise8Params:
    """Defaults from TVdenoise8.m:36-44."""

    alpha: float = 500.0
    omega: float = 1.75
    outer_iter: int = 20
    inner_iter: int = 4
    solver: int = 1  # TPU-native default (red-black kernel path)
    scl: float = 0.75
    scl_factor: float = 0.75
    quantile: float = 0.5  # ADdiffWeights default (TVdenoise8.m:147)
    operator: str = "alvarez"


def _partial_pyramid(img, scl, scl_factor, gsize, gsigma, smooth_last=True):
    """Pyramid that stops once a level is <= ceil(orig * scl) in either dim.

    Follows TVdenoise4.m:50-78: each retained level is smoothed after its
    child is created from the *unsmoothed* parent; ``smooth_last=False``
    reproduces the TVdenoise8.m:72 typo where the coarsest level stays
    unsmoothed.
    """
    g = gaussian_kernel_2d(gsize, gsigma)
    h, w = img.shape[-2:]
    ds_h, ds_w = int(np.ceil(h * scl)), int(np.ceil(w * scl))
    raw = [img]
    while True:
        nxt = imresize_scale(raw[-1], scl_factor, "bilinear")
        raw.append(nxt)
        if nxt.shape[-2] <= ds_h or nxt.shape[-1] <= ds_w:
            break
    out = [imfilter_replicate(x, g) for x in raw]
    if not smooth_last:
        out[-1] = raw[-1]
    return out


@partial(jax.jit, static_argnames=("omega", "outer_iter", "inner_iter", "solver"))
def _tv4_level(iout, f, alpha, omega, outer_iter, inner_iter, solver):
    def body(_, u):
        psi = 1.0 / jnp.sqrt((u - f) ** 2 + _EPS_D)
        ww, wn, we, ws = diffusion_weights_4(u, eps=1e-5, combine="max", zero_borders=True)
        trace = psi + alpha * (ww + wn + we + ws)
        b = psi * f
        solve = pcg_pde4 if solver == 2 else sor_pde4
        return solve(u, trace, b, alpha * ww, alpha * wn, alpha * we, alpha * ws,
                     inner_iter, omega)

    return lax.fori_loop(0, outer_iter + 1, body, iout)


@partial(jax.jit, static_argnames=("params",))
def tv_denoise4_fused(img, params: TVDenoise4Params | None = None):
    """Whole-image fused TV-4 denoise: pyramid + every outer iteration in
    ONE device program (cf. flow_nd_fused)."""
    return tv_denoise4(img, params)


@partial(jax.jit, static_argnames=("params",))
def tv_denoise8_fused(img, params: TVDenoise8Params | None = None):
    """Whole-image fused TV-8 denoise (one device program)."""
    return tv_denoise8(img, params)


def tv_denoise4(img, params: TVDenoise4Params | None = None, **overrides):
    """TV denoise (4-neighbour). img: (C, H, W) or (H, W) float32."""
    p = with_overrides(params or TVDenoise4Params(), **overrides)
    x = jnp.asarray(img, dtype=jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    levels = _partial_pyramid(x, p.scl, p.scl_factor, 7, 2.0)
    iout = levels[-1]
    for lvl in range(len(levels) - 1, -1, -1):
        iout = _tv4_level(iout, levels[lvl], p.alpha, p.omega,
                          p.outer_iter, p.inner_iter, p.solver)
        if lvl > 0:
            iout = imresize(iout, levels[lvl - 1].shape[-2:], "bilinear")
    return iout[0] if squeeze else iout


@partial(jax.jit, static_argnames=("omega", "outer_iter", "inner_iter", "solver", "operator"))
def _tv8_level(iout, f, alpha, omega, quantile, outer_iter, inner_iter, solver, operator):
    def body(_, u):
        w_, nw, n_, ne, e_, se, s_, sw = tensor_diffusion_weights_8(
            u, quantile=quantile, operator=operator, zero_borders=True
        )
        psi = 1.0 / jnp.sqrt((u - f) ** 2 + _EPS_D)
        trace = psi + alpha * (w_ + nw + n_ + ne + e_ + se + s_ + sw)
        b = psi * f
        solve = pcg_pde8 if solver == 2 else sor_pde8
        return solve(
            u, trace, b,
            alpha * w_, alpha * nw, alpha * n_, alpha * ne,
            alpha * e_, alpha * se, alpha * s_, alpha * sw,
            inner_iter, omega,
        )

    return lax.fori_loop(0, outer_iter + 1, body, iout)


def tv_denoise8(img, params: TVDenoise8Params | None = None, **overrides):
    """TV denoise (8-neighbour anisotropic). img: (C, H, W) or (H, W)."""
    p = with_overrides(params or TVDenoise8Params(), **overrides)
    x = jnp.asarray(img, dtype=jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    levels = _partial_pyramid(x, p.scl, p.scl_factor, 5, 1.25, smooth_last=False)
    iout = levels[-1]
    for lvl in range(len(levels) - 1, -1, -1):
        iout = _tv8_level(iout, levels[lvl], p.alpha, p.omega, p.quantile,
                          p.outer_iter, p.inner_iter, p.solver, p.operator)
        if lvl > 0:
            iout = imresize(iout, levels[lvl - 1].shape[-2:], "bilinear")
    return iout[0] if squeeze else iout
