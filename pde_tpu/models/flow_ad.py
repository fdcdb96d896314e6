"""Late-linearisation optical flow with anisotropic (tensor) diffusion
(FlowEminAD_llin_2D_v10.m).

Same warping skeleton as :mod:`pde_tpu.models.flow_nd`, but the smoothness
term is an 8-neighbour stencil built from a 2x2 diffusion tensor with
quantile-adaptive lambda (ADdiffWeights, FlowEminAD_llin_2D_v10.m:416-488):

* ``diffusion='image'`` — tensor from the (smoothed) image at each level,
  computed once per level (:334-340);
* ``diffusion='flow'``  — tensor from the scalar field ``U+dU+V+dV``,
  recomputed every secondLoop iteration (:342-346).

Defaults from :55-72 (quantile 0.9, alpha 0.0420, b1/b2 1.4843/0.2915).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from pde_tpu.config import with_overrides
from pde_tpu.core.median import medfilt2_3x3
from pde_tpu.core.pyramid import build_pyramid
from pde_tpu.core.resize import imresize
from pde_tpu.models.flow_nd import _fst_tensors, _snd_tensors
from pde_tpu.ops.derivatives import rgb2grad
from pde_tpu.ops.warp import warp_by_flow
from pde_tpu.ops.weights import tensor_diffusion_weights_8
from pde_tpu.kernels.dispatch import sor_flow_llin8
from pde_tpu.solvers.krylov import pcg_flow_llin8


@dataclasses.dataclass(frozen=True)
class FlowADParams:
    """Defaults from FlowEminAD_llin_2D_v10.m:55-72."""

    quantile: float = 0.9
    diffusion: str = "image"
    alpha: float = 0.0420
    omega: float = 1.9
    gammaS: float = 0.01
    firstLoop: int = 4
    secondLoop: int = 4
    iter: int = 4
    b1: float = 1.4843
    b2: float = 0.2915
    scl_factor: float = 0.75
    # TPU-native default (see FlowNDParams.solver note)
    solver: int = 1
    scales: int = 10**9


def _ad_level(u, v, it0, i1t0, i1t1, i2t0, i2t1, us_ap, vs_ap, as_diff,
              p: "FlowADParams", snd_is_gradmag: bool):
    """One pyramid level. it0 is the raw (smoothed) image driving the
    'image' diffusion tensor; i1*/i2* are the constancy-term stacks."""
    has_snd = i2t1 is not None
    has_us = us_ap is not None
    has_vs = vs_ap is not None
    image_diff = p.diffusion.lower() == "image"

    if image_diff:
        w8 = tensor_diffusion_weights_8(it0, quantile=p.quantile)

    for _first in range(p.firstLoop):
        i1t1w = warp_by_flow(i1t1, u, v)
        t1 = _fst_tensors(i1t0, i1t1w)
        if has_snd:
            i2t1w = warp_by_flow(i2t1, u, v)
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

            if not image_diff:
                w8 = tensor_diffusion_weights_8(u + du + v + dv, quantile=p.quantile)

            solve = pcg_flow_llin8 if p.solver == 2 else sor_flow_llin8
            du, dv = solve(u, v, du, dv, m_gd, cu_gd, cv_gd, du_gd, dv_gd,
                           *w8, p.iter, p.omega)

        u = medfilt2_3x3(u + du)
        v = medfilt2_3x3(v + dv)
    return u, v


@partial(jax.jit, static_argnames=("fst_term", "snd_term", "params"))
def flow_ad_fused(it0, it1, fst_term: str = "grad", snd_term: str = "gradmag",
                  params: FlowADParams | None = None):
    """Whole-frame fused AD flow: the entire coarse-to-fine solve is ONE
    device program (cf. flow_nd_fused)."""
    return flow_ad(it0, it1, fst_term, snd_term, params)


def flow_ad(it0, it1, fst_term: str = "grad", snd_term: str = "gradmag",
            params: FlowADParams | None = None, us=None, vs=None,
            collect: list | None = None, **overrides):
    """Anisotropic-diffusion warping flow. it0/it1: (C, H, W) or (H, W)
    uint8-range images. Returns (U, V) float32 (H, W).

    collect: optional list; per-level (U, V) appended coarsest-first
    (before upscaling) for level-by-level golden parity."""
    p = with_overrides(params or FlowADParams(), **overrides)
    fst_term = fst_term.lower()
    snd_term = snd_term.lower()
    a = jnp.asarray(it0, dtype=jnp.float32) / 255.0
    b = jnp.asarray(it1, dtype=jnp.float32) / 255.0
    if a.ndim == 2:
        a, b = a[None], b[None]

    levels = build_pyramid([a, b], p.scl_factor, 20, 5, 1.25, p.scales)
    n = len(levels)

    def fst_img(img):
        return rgb2grad(img) if fst_term == "grad" else img

    def snd_img(img):
        return None if snd_term == "none" else img

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

    level_fn = jax.jit(partial(_ad_level, p=p, snd_is_gradmag=(snd_term == "gradmag")))

    u = v = None
    for lvl in range(n - 1, -1, -1):
        l0, l1 = levels[lvl]
        h, w = l0.shape[-2:]
        if u is None:
            u = us_lv[lvl] if us_lv[lvl] is not None else jnp.zeros((h, w), jnp.float32)
            v = vs_lv[lvl] if vs_lv[lvl] is not None else jnp.zeros((h, w), jnp.float32)
        as_diff = 2.0 * (1.0 / p.scl_factor) ** (-(lvl))
        u, v = level_fn(
            u, v, l0, fst_img(l0), fst_img(l1), snd_img(l0), snd_img(l1),
            us_lv[lvl], vs_lv[lvl], as_diff,
        )
        if collect is not None:
            collect.append((u, v))
        if lvl > 0:
            nh, nw = levels[lvl - 1][0].shape[-2:]
            u = imresize(u / p.scl_factor, (nh, nw), "triangle")
            v = imresize(v / p.scl_factor, (nh, nw), "triangle")
    return u, v
