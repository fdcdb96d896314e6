"""Horn&Schunck + gradient-constancy optical flow, early linearisation.

Re-designs FlowEminHS_elin_2D_v10.m: coarse-to-fine pyramid (factor 0.75,
stop at <=20 px), per-level combined brightness+gradient constancy
tensors from 5-tap Simoncelli-style kernels applied to the *temporal
average* image ``Ist = 0.55*(It0+It1)`` (:133-149), one elin4 relaxation
per level with constant diffusion weight ``alpha * channels``
(:116, :169-183), then median-filter + bicubic upscale (:188-191 —
imresize with no Method defaults to bicubic in MATLAB).

The whole per-level pipeline (derivatives -> tensors -> 20 SOR sweeps)
compiles into one fused XLA program per pyramid shape.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pde_tpu.config import with_overrides
from pde_tpu.core.conv import separable_filter
from pde_tpu.core.median import medfilt2_3x3
from pde_tpu.core.pyramid import build_pyramid
from pde_tpu.core.resize import imresize
from pde_tpu.ops.derivatives import SMOOTHER5, FST_DERIVATOR5, SND_DERIVATOR5
from pde_tpu.kernels.dispatch import sor_flow_elin4
from pde_tpu.solvers.krylov import pcg_flow_elin4


@dataclasses.dataclass(frozen=True)
class FlowHSParams:
    """Defaults from FlowEminHS_elin_2D_v10.m:53-62."""

    alpha: float = 0.2
    omega: float = 1.9
    iter: int = 20
    b1: float = 0.25
    b2: float = 0.75
    scl_factor: float = 0.75
    # stays on the line-implicit PCG: the HS system is diffusion-
    # dominated/near-singular and pointwise relaxation converges too
    # slowly at any practical sweep count (33% AEE at iter=200)
    solver: int = 2
    scales: int = 10**9


@partial(jax.jit, static_argnames=("omega", "iters", "solver"))
def _hs_level(u, v, it0, it1, alpha_w, b1, b2, omega, iters, solver):
    ist = (it0 + it1) * 0.55
    idt = it0 - it1

    def dx(img, der):
        return separable_filter(separable_filter(img, SMOOTHER5, None), None, der)

    def dy(img, der):
        return separable_filter(separable_filter(img, None, SMOOTHER5), der, None)

    idx = dx(ist, FST_DERIVATOR5)
    idy = dy(ist, FST_DERIVATOR5)
    idxx = dx(ist, SND_DERIVATOR5)
    idyy = dy(ist, SND_DERIVATOR5)
    idxy = separable_filter(
        separable_filter(ist, None, FST_DERIVATOR5), FST_DERIVATOR5, None
    )
    idxt = dx(it0, FST_DERIVATOR5) - dx(it1, FST_DERIVATOR5)
    idyt = dy(it0, FST_DERIVATOR5) - dy(it1, FST_DERIVATOR5)

    m = b1 * idy * idx + b2 * idxy * (idxx + idyy)
    cu = b1 * idt * idx + b2 * (idxt * idxx + idyt * idxy)
    cv = b1 * idt * idy + b2 * (idxt * idxy + idyt * idyy)
    du = b1 * idx * idx + b2 * (idxx * idxx + idxy * idxy)
    dv = b1 * idy * idy + b2 * (idxy * idxy + idyy * idyy)

    # sum over channels
    m, cu, cv, du, dv = (jnp.sum(t, axis=0) for t in (m, cu, cv, du, dv))

    w = jnp.full(u.shape, alpha_w, dtype=u.dtype)
    solve = pcg_flow_elin4 if solver == 2 else sor_flow_elin4
    return solve(u, v, m, cu, cv, du, dv, w, w, w, w, iters, omega)


def flow_hs(it0, it1, params: FlowHSParams | None = None, **overrides):
    """it0, it1: (C, H, W) or (H, W) uint8-range images. Returns (U, V)."""
    p = with_overrides(params or FlowHSParams(), **overrides)
    a = jnp.asarray(it0, dtype=jnp.float32) / 255.0
    b = jnp.asarray(it1, dtype=jnp.float32) / 255.0
    if a.ndim == 2:
        a, b = a[None], b[None]
    channels = a.shape[0]

    levels = build_pyramid([a, b], p.scl_factor, 20, 5, 1.25, p.scales)
    n = len(levels)
    u = v = None
    for lvl in range(n - 1, -1, -1):
        l0, l1 = levels[lvl]
        h, w = l0.shape[-2:]
        if u is None:
            u = jnp.zeros((h, w), dtype=jnp.float32)
            v = jnp.zeros((h, w), dtype=jnp.float32)
        u, v = _hs_level(u, v, l0, l1, p.alpha * channels, p.b1, p.b2, p.omega,
                         p.iter, p.solver)
        if lvl > 0:
            nh, nw = levels[lvl - 1][0].shape[-2:]
            u = imresize(medfilt2_3x3(u / p.scl_factor), (nh, nw), "bicubic")
            v = imresize(medfilt2_3x3(v / p.scl_factor), (nh, nw), "bicubic")
    return u, v
