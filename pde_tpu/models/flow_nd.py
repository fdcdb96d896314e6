"""Late-linearisation (Brox-style warping) optical flow with isotropic
nonlinear diffusion — the reference's flagship driver
(FlowEminND_llin_2D_v10.m).

Pipeline per pyramid level (factor 0.75, stop <= 20 px):

  firstLoop (warping fixed point, x4):
    warp constancy images by (U, V)           -> NaN outside the domain
    5-tap Simoncelli derivative tensors M/Cu/Cv/Du/Dv per channel
    secondLoop (robust-weight fixed point, x4):
      gD = b/(alpha*sqrt(residual^2 + 1e-5))  per constancy term
      Brox 6-pt diffusion weights of (U+dU, V+dV)
      nansum-reduce channel tensors, 4 SOR/ALR sweeps for (dU, dV)
    U <- medfilt3x3(U + dU)  (symmetric padding)
  upscale by 1/0.75 with the 'triangle' kernel, flow values scaled

Constancy terms: fst in {'rgb','grad'}, snd in {'none','rgb','gradmag'}
(:134-166); 'gradmag' uses second-order derivative tensors (:253-258).
Optional spatial prior (Us, Vs) adds a third data term (:171-190,
:302-316). Everything inside a level is one jitted program; the reference
crossed the MATLAB<->MEX boundary ~160 times per image pair.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from pde_tpu.config import with_overrides
from pde_tpu.core.median import medfilt2_3x3
from pde_tpu.core.pyramid import build_pyramid
from pde_tpu.core.resize import imresize
from pde_tpu.ops.derivatives import fst_derivatives5, snd_derivatives5, rgb2grad
from pde_tpu.ops.warp import warp_by_flow
from pde_tpu.ops.weights import diffusion_weights_4
from pde_tpu.kernels.dispatch import sor_flow_llin4
from pde_tpu.solvers.krylov import pcg_flow_llin4


@dataclasses.dataclass(frozen=True)
class FlowNDParams:
    """Defaults from FlowEminND_llin_2D_v10.m:53-67."""

    alpha: float = 0.0420
    omega: float = 1.9
    gammaS: float = 0.01
    firstLoop: int = 4
    secondLoop: int = 4
    iter: int = 4
    b1: float = 1.4843
    b2: float = 0.2915
    scl_factor: float = 0.75
    # TPU-native default: the Pallas-dispatched red-black path (solver=1)
    # relaxes the same border-inclusive system as the reference's
    # default ALR and lands within 1.5% AEE of the sequential-ALR
    # golden at the reference iter=4 (tests/test_golden.py); solver=2
    # selects the line-implicit PCG (reference-trajectory parity).
    solver: int = 1
    scales: int = 10**9
    # windowed shift-add warp radius (gather-free TPU hot path,
    # ops/warp.warp_window). 0 = exact gather warp. With radius r the
    # warp is exact for |flow| < r; beyond it the sample becomes NaN
    # (missing data), the same fallback as out-of-image warps.
    warp_window: int = 0


def _fst_tensors(i_t0, i_t1w):
    idt, idx, idy = fst_derivatives5(i_t0, i_t1w)
    return dict(
        m=idy * idx, cu=idt * idx, cv=idt * idy, du=idx * idx, dv=idy * idy,
        dt=idt, dx=idx, dy=idy,
    )


def _snd_tensors(i_t0, i_t1w):
    idxt, idyt, idxx, idyy, idxy = snd_derivatives5(i_t0, i_t1w)
    return dict(
        m=idxy * (idxx + idyy),
        cu=idxt * idxx + idyt * idxy,
        cv=idxt * idxy + idyt * idyy,
        du=idxx * idxx + idxy * idxy,
        dv=idxy * idxy + idyy * idyy,
        dxt=idxt, dyt=idyt, dxx=idxx, dyy=idyy, dxy=idxy,
    )


def _nd_level(u, v, i1t0, i1t1, i2t0, i2t1, us_ap, vs_ap, as_diff, p: "FlowNDParams",
              snd_is_gradmag: bool):
    """One pyramid level of the warping flow. i2* may be None ('none' term);
    us_ap/vs_ap may be None (no spatial prior)."""
    has_snd = i2t1 is not None
    has_us = us_ap is not None
    has_vs = vs_ap is not None

    if p.warp_window > 0:
        from pde_tpu.ops.warp import warp_window as _ww

        warp = partial(_ww, r=p.warp_window)
    else:
        warp = warp_by_flow

    for _first in range(p.firstLoop):
        i1t1w = warp(i1t1, u, v)
        t1 = _fst_tensors(i1t0, i1t1w)
        if has_snd:
            i2t1w = warp(i2t1, u, v)
            t2 = _snd_tensors(i2t0, i2t1w) if snd_is_gradmag else _fst_tensors(i2t0, i2t1w)

        du = jnp.zeros_like(u)
        dv = jnp.zeros_like(v)

        for _second in range(p.secondLoop):
            op1 = (t1["dt"] - t1["dx"] * du - t1["dy"] * dv) ** 2
            gd1 = p.b1 / (p.alpha * jnp.sqrt(op1 + 1e-5))
            parts_m = [t1["m"] * gd1]
            parts_cu = [t1["cu"] * gd1]
            parts_cv = [t1["cv"] * gd1]
            parts_du = [t1["du"] * gd1]
            parts_dv = [t1["dv"] * gd1]
            if has_snd:
                if snd_is_gradmag:
                    op2 = (t2["dxt"] - t2["dxx"] * du - t2["dxy"] * dv) ** 2 + (
                        t2["dyt"] - t2["dxy"] * du - t2["dyy"] * dv
                    ) ** 2
                else:
                    op2 = (t2["dt"] - t2["dx"] * du - t2["dy"] * dv) ** 2
                gd2 = p.b2 / (p.alpha * jnp.sqrt(op2 + 1e-5))
                parts_m.append(t2["m"] * gd2)
                parts_cu.append(t2["cu"] * gd2)
                parts_cv.append(t2["cv"] * gd2)
                parts_du.append(t2["du"] * gd2)
                parts_dv.append(t2["dv"] * gd2)
            if has_us:
                ap_norm = (us_ap - u - du) ** 2
                gsu = p.gammaS / (p.alpha * (1.0 + ap_norm / as_diff**2))
                parts_cu.append(((us_ap - u) * gsu)[None])
                parts_du.append(gsu[None])
            if has_vs:
                ap_norm = (vs_ap - v - dv) ** 2
                gsv = p.gammaS / (p.alpha * (1.0 + ap_norm / as_diff**2))
                parts_cv.append(((vs_ap - v) * gsv)[None])
                parts_dv.append(gsv[None])

            def nsum(parts):
                return sum(jnp.nansum(x, axis=0) for x in parts)

            m_gd, cu_gd, cv_gd, du_gd, dv_gd = (
                nsum(parts) for parts in (parts_m, parts_cu, parts_cv, parts_du, parts_dv)
            )

            ww, wn, we, ws = diffusion_weights_4(
                jnp.stack([u + du, v + dv]), eps=1e-5, combine="sum"
            )
            solve = pcg_flow_llin4 if p.solver == 2 else sor_flow_llin4
            du, dv = solve(u, v, du, dv, m_gd, cu_gd, cv_gd, du_gd, dv_gd,
                           ww, wn, we, ws, p.iter, p.omega)

        u = medfilt2_3x3(u + du)
        v = medfilt2_3x3(v + dv)
    return u, v


@partial(jax.jit, static_argnames=("fst_term", "snd_term", "params"))
def flow_nd_fused(it0, it1, fst_term: str = "grad", snd_term: str = "gradmag",
                  params: FlowNDParams | None = None):
    """Whole-frame fused variant: the ENTIRE coarse-to-fine solve —
    pyramid build, per-level warping loops, upscales — traces into ONE
    device program, so a frame costs a single dispatch (the reference
    crossed the MATLAB<->MEX boundary ~160 times per pair,
    FlowEminND_llin_2D_v10.m:332-348; the per-level path still costs
    ~30 dispatches, which dominates wall-clock through a high-latency
    link). Shapes/params are static; reuse one (H, W) signature to reuse
    the compiled program."""
    return flow_nd(it0, it1, fst_term, snd_term, params)


@partial(jax.jit, static_argnames=("fst_term", "snd_term", "params"))
def flow_nd_sequence(frames, fst_term: str = "grad", snd_term: str = "gradmag",
                     params: FlowNDParams | None = None):
    """Flow for a whole video clip in ONE device dispatch.

    frames: (T, H, W) or (T, C, H, W) uint8-range. Returns (U, V) of
    shape (T-1, H, W) — the flow of each consecutive pair. The per-pair
    solve is the full coarse-to-fine pipeline (identical to
    ``flow_nd``), iterated on-device with ``lax.scan`` so a length-T
    clip costs one dispatch — the production path for sequences, and
    the tunnel-free way to measure marginal per-frame throughput."""
    a = jnp.asarray(frames, dtype=jnp.float32)

    def pair(_, ab):
        u, v = flow_nd(ab[0], ab[1], fst_term, snd_term, params)
        return None, (u, v)

    _, (us, vs) = lax.scan(pair, None, (a[:-1], a[1:]))
    return us, vs


def flow_nd(it0, it1, fst_term: str = "grad", snd_term: str = "gradmag",
            params: FlowNDParams | None = None, us=None, vs=None,
            collect: list | None = None, mesh=None, shard_min: int = 64,
            **overrides):
    """Warping flow. it0/it1: (C, H, W) or (H, W) uint8-range images.

    us/vs: optional spatial prior flow fields (H, W) (param.Us/Vs).
    Returns (U, V) float32 (H, W). collect: optional list; per-level
    (U, V) appended coarsest-first for level-by-level golden parity.
    mesh: optional ("ty", "tx") jax Mesh — every pyramid level runs
    under GSPMD spatial sharding (XLA places the stencil/warp/median
    collectives); levels smaller than ``shard_min`` px replicate.
    """
    p = with_overrides(params or FlowNDParams(), **overrides)
    fst_term = fst_term.lower()
    snd_term = snd_term.lower()
    a = jnp.asarray(it0, dtype=jnp.float32) / 255.0
    b = jnp.asarray(it1, dtype=jnp.float32) / 255.0
    if a.ndim == 2:
        a, b = a[None], b[None]

    levels = build_pyramid([a, b], p.scl_factor, 20, 5, 1.25, p.scales)
    n = len(levels)

    # constancy-term images per level
    def fst_img(img):
        return rgb2grad(img) if fst_term == "grad" else img

    def snd_img(img):
        return None if snd_term == "none" else img

    # spatial prior pyramid: flow scaled by scl_factor at each level (:176)
    us_lv = vs_lv = [None] * n
    if us is not None:
        cur = jnp.nan_to_num(jnp.asarray(us, dtype=jnp.float32))
        us_lv = [cur]
        for lvl in range(1, n):
            cur = imresize(cur * p.scl_factor, levels[lvl][0].shape[-2:], "bilinear")
            us_lv.append(cur)
    if vs is not None:
        cur = jnp.nan_to_num(jnp.asarray(vs, dtype=jnp.float32))
        vs_lv = [cur]
        for lvl in range(1, n):
            cur = imresize(cur * p.scl_factor, levels[lvl][0].shape[-2:], "bilinear")
            vs_lv.append(cur)

    level_fn = jax.jit(
        partial(_nd_level, p=p, snd_is_gradmag=(snd_term == "gradmag")),
        static_argnames=(),
    )

    u = v = None
    for lvl in range(n - 1, -1, -1):
        l0, l1 = levels[lvl]
        h, w = l0.shape[-2:]
        if u is None:
            u = us_lv[lvl] if us_lv[lvl] is not None else jnp.zeros((h, w), jnp.float32)
            v = vs_lv[lvl] if vs_lv[lvl] is not None else jnp.zeros((h, w), jnp.float32)
        as_diff = 2.0 * (1.0 / p.scl_factor) ** (-(lvl))  # ASdiff at this level (:197)
        args = [u, v, fst_img(l0), fst_img(l1), snd_img(l0), snd_img(l1),
                us_lv[lvl], vs_lv[lvl]]
        if mesh is not None:
            from pde_tpu.parallel.model import place_level

            args = [place_level(x, mesh, shard_min) for x in args]
        u, v = level_fn(*args, as_diff)
        if collect is not None:
            collect.append((u, v))
        if lvl > 0:
            nh, nw = levels[lvl - 1][0].shape[-2:]
            u = imresize(u / p.scl_factor, (nh, nw), "triangle")
            v = imresize(v / p.scl_factor, (nh, nw), "triangle")
    return u, v
