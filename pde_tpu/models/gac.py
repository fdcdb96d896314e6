"""Geodesic / geometric active contours (GAC_v10a.m, GAC_v10b.m).

Two Caselles models evolved with semi-implicit AOS steps:

* model "a" (1993, balloon force):
      PHI_t = |grad PHI| div(g grad PHI / |grad PHI|) + c * g * |grad PHI|
  data term is the upwinded balloon force ``c * g * |grad PHI|_UW`` with
  the Rouy-Tourin switch on the sign of c (GAC_v10a.m:93-99);
* model "b" (1997, convection):
      PHI_t = ... + grad g . grad PHI
  data term is the upwinded convection ``max(0,gdx)*D+x + min(0,gdx)*D-x
  + ...`` (GAC_v10b.m:85-92).

Both share: initial signed-distance reinit (T=10 -> 40 Euler steps),
7x7 sigma=2.5 Gaussian image smoothing, stopping function
``g = 1/(1 + |grad I|^2 / lambda)`` with lambda auto-set to the 0.7
quantile of the squared gradient (:69-75), harmonic-averaging diffusivity
``Diff = |grad PHI| / g`` (:108), and one embedded reinit(0.25) step after
every AOS update (AC_AOS_4_2d, levelsetSolvers.c:179).

The reference redraws the contour every iteration (imagesc/drawnow); here
the whole evolution is one jitted ``lax.fori_loop`` and observability is a
host callback the caller may attach outside the hot loop.
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
from pde_tpu.core.grid import shift_w, shift_e, shift_n, shift_s
from pde_tpu.solvers.aos import ac_aos_step
from pde_tpu.solvers.reinit import reinit

_EPS_D = float(np.finfo(np.float64).eps)  # MATLAB `eps`
_CDX = np.array([-0.5, 0.0, 0.5], dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class GACParams:
    """Defaults from GAC_v10a.m:35-44 / GAC_v10b.m:36-43."""

    tau: float = 0.25
    c: float = -0.1  # balloon force (model "a" only)
    lam: float = -1.0  # lambda; negative => 0.7-quantile auto
    ITER: int = 100
    SMOOTH: float = 100.0


def _stopping_function(img, lam):
    """g = 1/(1 + |grad I|^2 / lambda), max-over-channel derivatives."""
    if img.ndim == 2:
        img = img[None]
    g7 = gaussian_kernel_2d(7, 2.5)
    smooth = imfilter_replicate(img, g7)
    idx = jnp.max(imfilter_replicate(smooth, _CDX[None, :]), axis=0)
    idy = jnp.max(imfilter_replicate(smooth, _CDX[:, None]), axis=0)
    igrad = idx * idx + idy * idy
    if lam < 0:
        # Y(round(0.7*numel)) of the sorted values, 1-based (GAC_v10a.m:71-74)
        flat = jnp.sort(igrad.ravel())
        lam = flat[jnp.clip(jnp.round(0.7 * flat.shape[0]).astype(jnp.int32) - 1, 0, None)]
        # robustness beyond the reference: a mostly-flat image puts the
        # 0.7-quantile at 0 and the reference's g = 1/(1+Igrad/0) NaNs out;
        # floor lambda so flat regions get g=1 (no edge, free propagation)
        lam = jnp.maximum(lam, _EPS_D)
    return 1.0 / (1.0 + igrad / lam)


def _phi_grad(phi):
    pdx = 0.5 * (shift_e(phi) - shift_w(phi))
    pdy = 0.5 * (shift_s(phi) - shift_n(phi))
    return jnp.sqrt(pdx * pdx + pdy * pdy + _EPS_D)


def _ac_update(phi, data, g, tau, nu):
    grad_phi = _phi_grad(phi)
    diff = grad_phi / g
    phi = ac_aos_step(phi, data, grad_phi, diff, tau, nu)
    return reinit(phi, steps=1)  # embedded reinit(PHI, 0.25)


@partial(jax.jit, static_argnames=("iters",))
def _gac_a_evolve(phi, g, c, tau, nu, iters: int):
    def body(_, p):
        fx = shift_e(p) - p  # forward diffs ([0 -1 1])
        bx = p - shift_w(p)  # backward diffs ([-1 1 0])
        fy = shift_s(p) - p
        by = p - shift_n(p)
        shrink = jnp.sqrt(
            jnp.maximum(bx, 0.0) ** 2 + jnp.minimum(fx, 0.0) ** 2
            + jnp.maximum(by, 0.0) ** 2 + jnp.minimum(fy, 0.0) ** 2
        )
        grow = jnp.sqrt(
            jnp.minimum(bx, 0.0) ** 2 + jnp.maximum(fx, 0.0) ** 2
            + jnp.minimum(by, 0.0) ** 2 + jnp.maximum(fy, 0.0) ** 2
        )
        grad_uw = jnp.where(c <= 0.0, shrink, grow)
        data = c * g * grad_uw
        return _ac_update(p, data, g, tau, nu)

    return lax.fori_loop(0, iters, body, phi)


@partial(jax.jit, static_argnames=("iters",))
def _gac_b_evolve(phi, g, tau, nu, iters: int):
    gdx = imfilter_replicate(g, _CDX[None, :])
    gdy = imfilter_replicate(g, _CDX[:, None])

    def body(_, p):
        # the reference builds the upwind convection differences with
        # circshift (GAC_v10b.m:89-92) — WRAP-around at the image border,
        # unlike every other stencil in the library; kept verbatim for
        # golden parity (the border effect is attenuated by the small
        # boundary gdx/gdy and the AOS damping)
        data = (
            jnp.maximum(gdx, 0.0) * (jnp.roll(p, -1, axis=-1) - p)
            + jnp.minimum(gdx, 0.0) * (p - jnp.roll(p, 1, axis=-1))
            + jnp.maximum(gdy, 0.0) * (jnp.roll(p, -1, axis=-2) - p)
            + jnp.minimum(gdy, 0.0) * (p - jnp.roll(p, 1, axis=-2))
        )
        return _ac_update(p, data, g, tau, nu)

    return lax.fori_loop(0, iters, body, phi)


@partial(jax.jit, static_argnames=("params",))
def gac_a_fused(img, phi, params: GACParams | None = None):
    """Fused GAC model "a": initial reinit + stopping function + the full
    evolution in ONE device program (cf. flow_nd_fused)."""
    return gac_a(img, phi, params)


@partial(jax.jit, static_argnames=("params",))
def gac_b_fused(img, phi, params: GACParams | None = None):
    """Fused GAC model "b" (one device program)."""
    return gac_b(img, phi, params)


def _chunked_evolve(evolve, phi, total: int, collect, collect_every: int):
    """Run ``total`` AOS steps; when ``collect`` is given, break the
    evolution into ``collect_every``-step jitted chunks and append the
    intermediate level sets — the engine's answer to the reference's
    per-iteration ``imagesc``/``drawnow`` (GAC_v10a.m:117): observability
    lives BETWEEN device programs, never inside the hot loop."""
    if collect is None:
        return evolve(phi, iters=total)
    done = 0
    while done < total:
        k = min(collect_every, total - done)
        phi = evolve(phi, iters=k)
        collect.append(phi)
        done += k
    return phi


def gac_a(img, phi, params: GACParams | None = None, collect=None,
          collect_every: int = 10, **overrides):
    """Caselles-1993 GAC with balloon force. img: (C, H, W) or (H, W);
    phi: initial level set (H, W), >0 inside. Returns evolved PHI.

    collect: optional list — intermediate PHI every ``collect_every``
    steps is appended (evolving-contour observability)."""
    p = with_overrides(params or GACParams(), **overrides)
    phi = reinit(jnp.asarray(phi, jnp.float32), steps=40)
    g = _stopping_function(jnp.asarray(img, jnp.float32), p.lam)
    return _chunked_evolve(
        partial(_gac_a_evolve, g=g, c=p.c, tau=p.tau, nu=p.SMOOTH),
        phi, p.ITER, collect, collect_every)


def gac_b(img, phi, params: GACParams | None = None, collect=None,
          collect_every: int = 10, **overrides):
    """Caselles-1997 GAC with convection term grad(g).grad(PHI)."""
    p = with_overrides(params or GACParams(), **overrides)
    phi = reinit(jnp.asarray(phi, jnp.float32), steps=40)
    g = _stopping_function(jnp.asarray(img, jnp.float32), p.lam)
    return _chunked_evolve(
        partial(_gac_b_evolve, g=g, tau=p.tau, nu=p.SMOOTH),
        phi, p.ITER, collect, collect_every)
