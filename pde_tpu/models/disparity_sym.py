"""Symmetric (left<->right coupled) stereo disparity
(DispEminND_llin_sym_2D.m).

Estimates both disparity fields at once: each firstLoop iteration warps
*both* images and *both* disparity fields (:139-146 — image warps via the
NaN-filling bilinear kernel, field warps via interp2 whose out-of-domain
result is also NaN), builds brightness+gradient data tensors in both
directions (:172-180) and a robust symmetry term

    Snorm_k = (dU_k + Udt_k + Udx_j * dU_k)^2
    gSYM_k  = (channels*beta/alpha) / (1 + Snorm_k / srDiff^2)   (:206-214)

whose contributions *subtract* from Cu and *add* to Du (:223-226), then
relaxes the coupled pair. The pair decouples inside the solve (coupling
enters only through the Cu/Du assembly), so both fields batch into one
vmapped scalar relaxation.

Defaults from :50-64 (beta=0.4, b1=0.25, b2=0.72, alpha=0.035). The
driver runs on the raw 0-255 image domain (no /255 — :86-88 passes the
input straight into the pyramid); runme.m:28's extra 'grad'/'gradmag'
args are silently swallowed by setParameters and have no effect.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from pde_tpu.config import with_overrides
from pde_tpu.core.conv import separable_filter
from pde_tpu.core.median import medfilt2_3x3
from pde_tpu.core.pyramid import build_pyramid
from pde_tpu.core.resize import imresize
from pde_tpu.models.disparity import warp_x
from pde_tpu.ops.derivatives import fst_derivatives5, snd_derivatives5, SMOOTHER5, FST_DERIVATOR5
from pde_tpu.ops.weights import diffusion_weights_4
from pde_tpu.kernels.dispatch import sor_disp_llin_sym4
from pde_tpu.solvers.krylov import pcg_disp_llin4


@dataclasses.dataclass(frozen=True)
class DisparitySymParams:
    """Defaults from DispEminND_llin_sym_2D.m:50-64."""

    alpha: float = 0.035
    beta: float = 0.4
    omega: float = 1.9
    firstLoop: int = 3
    secondLoop: int = 4
    iter: int = 4
    b1: float = 0.25
    b2: float = 0.72
    scales: int = 10**9
    scl_factor: float = 0.75
    # TPU-native default (see FlowNDParams.solver note)
    solver: int = 1


def _flow_dx(u):
    """Simoncelli x-derivative of a disparity field (vertical prefilter +
    horizontal derivator; the reference's 'conv' flag flips the kernel,
    matching our stored FST_DERIVATOR5 under correlation) (:162-166)."""
    return separable_filter(u, SMOOTHER5, FST_DERIVATOR5)


def _data_tensors(it0, it1w, p):
    """CuD/DuD in one warp direction (:172-176), per-channel."""
    idt, idx, _ = fst_derivatives5(it0, it1w)
    idxt, idyt, idxx, _, idxy = snd_derivatives5(it0, it1w)
    cud = p.b1 * idt * idx + p.b2 * (idxt * idxx + idyt * idxy)
    dud = p.b1 * idx * idx + p.b2 * (idxx * idxx + idxy * idxy)
    return cud, dud, dict(dt=idt, dx=idx, dxt=idxt, dyt=idyt, dxx=idxx, dxy=idxy)


def _sym_level(u0, u1, it0, it1, sr_diff, p: "DisparitySymParams"):
    nch = it0.shape[0]
    for _first in range(p.firstLoop):
        it0w = warp_x(it0, u1)
        it1w = warp_x(it1, u0)
        u0w = warp_x(u0, u1)
        u1w = warp_x(u1, u0)

        cud0, dud0, t0 = _data_tensors(it0, it1w, p)
        cud1, dud1, t1 = _data_tensors(it1, it0w, p)

        udt0 = 0.5 * (u0 + u1w)
        udx1 = _flow_dx(u1w)
        udt1 = 0.5 * (u1 + u0w)
        udx0 = _flow_dx(u0w)
        cus0 = udt0 * (1.0 + udx1)
        dus0 = 1.0 + 2.0 * udx1 + udx1 * udx1
        cus1 = udt1 * (1.0 + udx0)
        dus1 = 1.0 + 2.0 * udx0 + udx0 * udx0

        du0 = jnp.zeros_like(u0)
        du1 = jnp.zeros_like(u1)

        for _second in range(p.secondLoop):
            opn0 = p.b1 * (t0["dt"] - t0["dx"] * du0) ** 2 + p.b2 * (
                (t0["dxt"] - t0["dxx"] * du0) ** 2 + (t0["dyt"] - t0["dxy"] * du0) ** 2
            )
            gd0 = 1.0 / (p.alpha * jnp.sqrt(opn0 + 1e-5))
            opn1 = p.b1 * (t1["dt"] - t1["dx"] * du1) ** 2 + p.b2 * (
                (t1["dxt"] - t1["dxx"] * du1) ** 2 + (t1["dyt"] - t1["dxy"] * du1) ** 2
            )
            gd1 = 1.0 / (p.alpha * jnp.sqrt(opn1 + 1e-5))

            snorm0 = (du0 + udt0 + udx1 * du0) ** 2
            snorm1 = (du1 + udt1 + udx0 * du1) ** 2
            gsym0 = (nch * p.beta / p.alpha) / (1.0 + snorm0 / sr_diff**2)
            gsym1 = (nch * p.beta / p.alpha) / (1.0 + snorm1 / sr_diff**2)

            # plain sums: NaN (out-of-domain) propagates -> pure-diffusion
            # fallback in the solver (:223-226)
            cug0 = jnp.sum(gd0 * cud0, axis=0) - gsym0 * cus0
            dug0 = jnp.sum(gd0 * dud0, axis=0) + gsym0 * dus0
            cug1 = jnp.sum(gd1 * cud1, axis=0) - gsym1 * cus1
            dug1 = jnp.sum(gd1 * dud1, axis=0) + gsym1 * dus1

            w0 = diffusion_weights_4(u0 + du0, eps=1e-5, combine="max", zero_borders=True)
            w1 = diffusion_weights_4(u1 + du1, eps=1e-5, combine="max", zero_borders=True)

            if p.solver == 2:
                # both fields' sweeps are independent given the tensors:
                # batch them through the scalar ALR (cf. GS_ALR_SOR_llinsym4_2d)
                pack = lambda a, b: jnp.stack([a, b])  # noqa: E731
                out = jax.vmap(
                    lambda uu, dd, cc, DD, a, b_, c, d: pcg_disp_llin4(
                        uu, dd, cc, DD, a, b_, c, d, p.iter, p.omega
                    )
                )(
                    pack(u0, u1), pack(du0, du1), pack(cug0, cug1), pack(dug0, dug1),
                    pack(w0[0], w1[0]), pack(w0[1], w1[1]), pack(w0[2], w1[2]), pack(w0[3], w1[3]),
                )
                du0, du1 = out[0], out[1]
            else:
                du0, du1 = sor_disp_llin_sym4(
                    u0, du0, cug0, dug0, *w0,
                    u1, du1, cug1, dug1, *w1,
                    p.iter, p.omega,
                )

        u0 = medfilt2_3x3(u0 + du0)
        u1 = medfilt2_3x3(u1 + du1)
    return u0, u1


def disparity_sym_fused(il, ir, params: DisparitySymParams | None = None):
    """Whole-frame fused symmetric disparity: one device program
    (cf. flow_nd_fused). Routed through jax.jit with static params."""
    return _disparity_sym_fused_impl(il, ir, params)


@partial(jax.jit, static_argnames=("params",))
def _disparity_sym_fused_impl(il, ir, params):
    return disparity_sym(il, ir, params)


def disparity_sym(il, ir, params: DisparitySymParams | None = None,
                  collect: list | None = None, **overrides):
    """Symmetric disparity. il/ir: (C, H, W) or (H, W) uint8-range images.

    Returns U of shape (2, H, W): U[0] left->right, U[1] right->left
    (the reference's U(:,:,1) / U(:,:,2)). collect: optional list of
    per-level (U0, U1), coarsest first.
    """
    p = with_overrides(params or DisparitySymParams(), **overrides)
    a = jnp.asarray(il, dtype=jnp.float32)
    b = jnp.asarray(ir, dtype=jnp.float32)
    if a.ndim == 2:
        a, b = a[None], b[None]

    # 3x3 sigma=1 Gaussian inter-level smoothing, stop <= 10 px (:81-104)
    levels = build_pyramid([a, b], p.scl_factor, 10, 3, 1.0, p.scales)
    n = len(levels)

    level_fn = jax.jit(partial(_sym_level, p=p))

    u0 = u1 = None
    for lvl in range(n - 1, -1, -1):
        l0, l1 = levels[lvl]
        h, w = l0.shape[-2:]
        if u0 is None:
            u0 = jnp.zeros((h, w), jnp.float32)
            u1 = jnp.zeros((h, w), jnp.float32)
        sr_diff = 2.0 * (1.0 / p.scl_factor) ** (-(lvl))  # srDiff (:126)
        u0, u1 = level_fn(u0, u1, l0, l1, sr_diff)
        if collect is not None:
            collect.append((u0, u1))
        if lvl > 0:
            nh, nw = levels[lvl - 1][0].shape[-2:]
            u0 = imresize(u0 / p.scl_factor, (nh, nw), "bilinear")
            u1 = imresize(u1 / p.scl_factor, (nh, nw), "bilinear")
    return jnp.stack([u0, u1])
