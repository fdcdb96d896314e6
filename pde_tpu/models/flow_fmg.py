"""Early-linearisation optical flow solved by FAS full multigrid
(FlowEminNDFASFMG_elin_2D_v10.m).

The only reference driver with a residual / LHS operator split:

* factor-2 pyramid via separable ``[1 4 6 4 1]/16`` binomial low-pass +
  decimation, stop <= 10 px (:103-118); initial 5x5 sigma=1 Gaussian;
* per-level constancy tensors precomputed once from ``Ist =
  0.55*(It0+It1)/255`` and temporal/first/second Simoncelli-kernel
  derivative stacks, combined with b1 (brightness) / b2 (gradient)
  weights (:123-150);
* FMG outer loop coarse->fine; at each level ``FAS_CYCLE`` recurses
  (cycle_index 1 = V-cycle, 2 = W-cycle):
    - presmooth (firstLoop x {gd update, Brox weights, `iter` SOR/ALR
      sweeps}) + a residual-only pass (:367-464),
    - restrict residual & solution (full-weighting 3x3 * scl_factor,
      decimate) (:211-217),
    - coarse RHS ``fu = (RUres + A(Ures))/gd`` with gd rebuilt from the
      restricted solution (:228-251),
    - recurse, then coarse-grid correction
      ``U += bilinear_upsample((Uc - Ures)/scl_factor)`` (:256-257),
    - postsmooth;
* inter-level flow upscale by ``1/scl_factor`` (:179-182, MATLAB default
  ``imresize`` method = bicubic; matched exactly).

Input stays in the 0-255 domain (:70-72); the temporal and mixed
derivative kernels carry the /255 scaling instead (:88-90).

The recursion depth is static (pyramid shapes are Python metadata), so
every cycle unrolls into one jittable program per level count.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pde_tpu.config import with_overrides
from pde_tpu.core.conv import (
    imfilter_replicate,
    separable_filter,
    gaussian_kernel_2d,
    binomial5,
)
from pde_tpu.core.resize import imresize
from pde_tpu.ops.derivatives import SMOOTHER5, FST_DERIVATOR5, SND_DERIVATOR5
from pde_tpu.ops.weights import diffusion_weights_4
from pde_tpu.kernels.dispatch import sor_flow_elin4
from pde_tpu.solvers.sor import residuals_elin4, lhs_elin4
from pde_tpu.solvers.krylov import pcg_flow_elin4

# full-weighting restriction stencil (FlowEminNDFASFMG_elin_2D_v10.m:198)
_FW = np.array([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]], dtype=np.float32) / 16.0


@dataclasses.dataclass(frozen=True)
class FlowFMGParams:
    """Defaults from FlowEminNDFASFMG_elin_2D_v10.m:53-66."""

    alpha: float = 0.035
    omega: float = 1.9
    firstLoop: int = 4
    iter: int = 4
    b1: float = 0.03
    b2: float = 0.97
    scl_factor: float = 0.5
    # stays on the line-implicit PCG smoother: the FAS trajectory is
    # smoother-sensitive (4.7% vs the ALR golden with red-black)
    solver: int = 2
    cycle_index: int = 1
    scales: int = 10**9


def _decimate(x):
    return x[..., ::2, ::2]


def _restrict(x, scl_factor):
    """Full-weighting restriction: 3x3 smooth of x*scl_factor, decimate."""
    return _decimate(imfilter_replicate(x * scl_factor, _FW))


def _derivative_tensors(it0, it1, p: "FlowFMGParams"):
    """Per-level derivative stacks (FlowEminNDFASFMG_elin_2D_v10.m:123-150).

    The driver's imfilter calls use 'conv' (flipped kernels): convolution
    by the m-file's O_dx = [+.10455 +.292315 0 -.292315 -.10455] equals
    correlation by its flip, which is exactly FST_DERIVATOR5. (Round 2
    negated this and produced a globally sign-flipped flow field — caught
    by the level-by-level golden parity suite.)
    """
    o_dx = FST_DERIVATOR5  # conv by m-file O_dx == corr by FST_DERIVATOR5
    ist = (it0 + it1) * (0.55 / 255.0)
    idt = (it0 - it1) / 255.0
    idx = separable_filter(ist, SMOOTHER5, o_dx)
    idy = separable_filter(ist, o_dx, SMOOTHER5)
    idxx = separable_filter(ist, SMOOTHER5, SND_DERIVATOR5)
    idyy = separable_filter(ist, SND_DERIVATOR5, SMOOTHER5)
    idxy = separable_filter(ist, o_dx, o_dx)
    o_dx_s = o_dx / 255.0
    idxt = separable_filter(it0, SMOOTHER5, o_dx_s) - separable_filter(it1, SMOOTHER5, o_dx_s)
    idyt = separable_filter(it0, o_dx_s, SMOOTHER5) - separable_filter(it1, o_dx_s, SMOOTHER5)
    return dict(dt=idt, dx=idx, dy=idy, dxx=idxx, dyy=idyy, dxy=idxy, dxt=idxt, dyt=idyt)


def _constancy(t, p: "FlowFMGParams"):
    return dict(
        m=p.b1 * t["dy"] * t["dx"] + p.b2 * t["dxy"] * (t["dxx"] + t["dyy"]),
        cu=p.b1 * t["dt"] * t["dx"] + p.b2 * (t["dxt"] * t["dxx"] + t["dyt"] * t["dxy"]),
        cv=p.b1 * t["dt"] * t["dy"] + p.b2 * (t["dxt"] * t["dxy"] + t["dyt"] * t["dyy"]),
        du=p.b1 * t["dx"] ** 2 + p.b2 * (t["dxx"] ** 2 + t["dxy"] ** 2),
        dv=p.b1 * t["dy"] ** 2 + p.b2 * (t["dxy"] ** 2 + t["dyy"] ** 2),
    )


def _opnorm(t, u, v, p):
    return p.b1 * (t["dt"] - t["dx"] * u - t["dy"] * v) ** 2 + p.b2 * (
        (t["dxt"] - t["dxx"] * u - t["dxy"] * v) ** 2
        + (t["dyt"] - t["dxy"] * u - t["dyy"] * v) ** 2
    )


def _reduce_c(x):
    """Channel reduce (sum) — grayscale input keeps this a no-op."""
    return jnp.sum(x, axis=0) if x.ndim == 3 else x


def _smooth(u, v, t, c, cu, cv, p: "FlowFMGParams", want_residuals: bool):
    """firstLoop x {gd, Brox weights, iter sweeps}; optional residual pass
    (FlowEminNDFASFMG_elin_2D_v10.m:367-464). cu/cv may be the RHS fields
    of a coarse level (FAS) instead of the level's constancy terms."""
    nch = t["dx"].shape[0] if t["dx"].ndim == 3 else 1
    for _ in range(p.firstLoop):
        gd = 1.0 / (nch * p.alpha * jnp.sqrt(_opnorm(t, u, v, p) + 1e-5))
        ww, wn, we, ws = diffusion_weights_4(jnp.stack([u, v]), eps=1e-5, combine="sum")
        m_gd = _reduce_c(c["m"] * gd)
        cu_gd = _reduce_c(cu * gd)
        cv_gd = _reduce_c(cv * gd)
        du_gd = _reduce_c(c["du"] * gd)
        dv_gd = _reduce_c(c["dv"] * gd)
        solve = pcg_flow_elin4 if p.solver == 2 else sor_flow_elin4
        u, v = solve(u, v, m_gd, cu_gd, cv_gd, du_gd, dv_gd, ww, wn, we, ws, p.iter, p.omega)

    if not want_residuals:
        return u, v
    # residual-only pass: gd without the channels factor (:434)
    gd = 1.0 / (p.alpha * jnp.sqrt(_opnorm(t, u, v, p) + 1e-5))
    ww, wn, we, ws = diffusion_weights_4(jnp.stack([u, v]), eps=1e-5, combine="sum")
    ru, rv = residuals_elin4(
        u, v, _reduce_c(c["m"] * gd), _reduce_c(cu * gd), _reduce_c(cv * gd),
        _reduce_c(c["du"] * gd), _reduce_c(c["dv"] * gd), ww, wn, we, ws,
    )
    return u, v, ru, rv


def _fas_cycle(u, v, tensors, consts, cu, cv, lvl, n_levels, p: "FlowFMGParams",
               mesh=None, shard_min: int = 64):
    """FAS V/W cycle (FlowEminNDFASFMG_elin_2D_v10.m:193-273). lvl indexes
    fine->coarse; recursion is unrolled (static depth).

    mesh: optional ("ty", "tx") device mesh — fields stay spatially
    sharded while min(H, W) >= shard_min and are regathered (replicated)
    below it, the multigrid coarse-level consolidation of SURVEY 2.3."""
    if mesh is not None:
        from pde_tpu.parallel.model import constrain_level
        u = constrain_level(u, mesh, shard_min)
        v = constrain_level(v, mesh, shard_min)
    t, c = tensors[lvl], consts[lvl]
    if lvl == n_levels - 1:
        return _smooth(u, v, t, c, cu, cv, p, want_residuals=False)

    tc, cc = tensors[lvl + 1], consts[lvl + 1]
    for _ in range(p.cycle_index):
        u, v, ru, rv = _smooth(u, v, t, c, cu, cv, p, want_residuals=True)

        ru_res = _restrict(ru, p.scl_factor)
        rv_res = _restrict(rv, p.scl_factor)
        u_res = _restrict(u, p.scl_factor)
        v_res = _restrict(v, p.scl_factor)
        if mesh is not None:
            from pde_tpu.parallel.model import constrain_level
            ru_res = constrain_level(ru_res, mesh, shard_min)
            rv_res = constrain_level(rv_res, mesh, shard_min)
            u_res = constrain_level(u_res, mesh, shard_min)
            v_res = constrain_level(v_res, mesh, shard_min)

        gd = 1.0 / (p.alpha * jnp.sqrt(_opnorm(tc, u_res, v_res, p) + 1e-5))
        ww, wn, we, ws = diffusion_weights_4(jnp.stack([u_res, v_res]), eps=1e-5, combine="sum")
        au, av = lhs_elin4(
            u_res, v_res, _reduce_c(cc["m"] * gd),
            _reduce_c(cc["du"] * gd), _reduce_c(cc["dv"] * gd), ww, wn, we, ws,
        )
        fu = (ru_res + au) / gd
        fv = (rv_res + av) / gd

        uc, vc = _fas_cycle(u_res, v_res, tensors, consts, fu, fv, lvl + 1,
                            n_levels, p, mesh, shard_min)

        shape = u.shape[-2:]
        u = u + imresize((uc - u_res) / p.scl_factor, shape, "bilinear")
        v = v + imresize((vc - v_res) / p.scl_factor, shape, "bilinear")

    u, v = _smooth(u, v, t, c, cu, cv, p, want_residuals=False)
    return u, v


@partial(jax.jit, static_argnames=("params",))
def flow_fmg_fused(it0, it1, params: FlowFMGParams | None = None):
    """Whole-frame fused FAS-FMG: pyramid, tensors and every FAS cycle
    trace into ONE device program (cf. flow_nd_fused)."""
    return flow_fmg(it0, it1, params)


def flow_fmg(it0, it1, params: FlowFMGParams | None = None,
             collect: list | None = None, mesh=None, shard_min: int = 64,
             **overrides):
    """FAS-FMG early-linearisation flow. it0/it1: (H, W) or (C, H, W)
    uint8-range images. Returns (U, V) float32 (H, W).

    collect: optional list; (U, V) after each top-level FAS cycle is
    appended coarsest-first for level-by-level golden parity.
    mesh: optional ("ty", "tx") jax Mesh — fine FAS levels run spatially
    sharded, coarse levels (< shard_min px) regather to replicated."""
    p = with_overrides(params or FlowFMGParams(), **overrides)
    a = jnp.asarray(it0, dtype=jnp.float32)
    b = jnp.asarray(it1, dtype=jnp.float32)
    if a.ndim == 2:
        a, b = a[None], b[None]

    g = gaussian_kernel_2d(5, 1.0)
    lv0 = (imfilter_replicate(a, g), imfilter_replicate(b, g))
    levels = [lv0]
    while len(levels) < p.scales:
        pa, pb = levels[-1]
        na = _decimate(separable_filter(pa, binomial5, binomial5))
        nb = _decimate(separable_filter(pb, binomial5, binomial5))
        levels.append((na, nb))
        if na.shape[-2] <= 10 or na.shape[-1] <= 10:
            break

    tensors = [_derivative_tensors(l0, l1, p) for l0, l1 in levels]
    consts = [_constancy(t, p) for t in tensors]
    n = len(levels)

    cycle = jax.jit(partial(_fas_cycle, n_levels=n, p=p, mesh=mesh,
                            shard_min=shard_min), static_argnames=("lvl",))

    u = v = None
    for lvl in range(n - 1, -1, -1):
        h, w = levels[lvl][0].shape[-2:]
        if u is None:
            u = jnp.zeros((h, w), jnp.float32)
            v = jnp.zeros((h, w), jnp.float32)
        u, v = cycle(u, v, tensors, consts, consts[lvl]["cu"], consts[lvl]["cv"], lvl=lvl)
        if collect is not None:
            collect.append((u, v))
        if lvl > 0:
            nh, nw = levels[lvl - 1][0].shape[-2:]
            # MATLAB imresize default method (bicubic), :179-182
            u = imresize(u / p.scl_factor, (nh, nw), "bicubic")
            v = imresize(v / p.scl_factor, (nh, nw), "bicubic")
    return u, v
