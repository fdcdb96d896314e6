"""Red-black SOR relaxation — the TPU-native smoother family.

The reference relaxes lexicographically (pointwise Gauss-Seidel, e.g.
opticalflowSolvers.c:504-680) — inherently sequential. Here every sweep is
two vectorised half-grid updates over the red/black checkerboard: color 0
reads the latest color-1 values and vice versa, which preserves the
Gauss-Seidel character (same smoothing factor class for 5-point stencils)
while mapping perfectly onto the 8x128 VPU. Each sweep ends with the same
1-px replicated border fill the reference performs
(opticalflowSolvers.c:156-179).

Numerics preserved exactly per pixel update:

* elin4  — ``U+ = (Σ w_k U_k − M·V + Cu) / (Σw + Du)``
  (opticalflowSolvers.c:41-186); NaN Cu ⇒ drop data term, NaN Du ⇒ drop
  from divisor.
* llin4  — solves the increment ``dU`` against frozen ``U``:
  diffusion term ``Σ w_k (dU_k + U_k − U_c)`` (opticalflowSolvers.c:563-580).
* llin8  — 8-neighbour variant (opticalflowSolvers.c:1487-).
* pde4/8 — diagonal form ``X+ = (B + Σ w_k X_k)/TRACE``
  (pdeSolvers.c:44-268); NaN TRACE ⇒ pure diffusion.
* disparity llin4 and the symmetric coupled pair
  (disparitySolvers.c:41-153, 301-454).

All solvers take and return (H, W) float32 fields (leading batch dims OK
where noted) and run a static number of sweeps under ``lax.fori_loop``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from pde_tpu.core.grid import (
    shift_w,
    shift_e,
    shift_n,
    shift_s,
    replicate_border,
    checkerboard,
)


def _interior_color_masks(h: int, w: int):
    inter = jnp.zeros((h, w), dtype=bool).at[1:-1, 1:-1].set(True)
    return checkerboard(h, w, 0) & inter, checkerboard(h, w, 1) & inter


def _edge_zeroed(weights, eight: bool):
    """Zero the out-facing weights so border pixels solve one-sided
    stencils (the ALR line-system convention)."""
    from pde_tpu.solvers.tdma import _edge_zero, _zero_diag_borders

    if not eight:
        ww, wn, we, ws = weights
        return (
            _edge_zero(ww, -1, "first"),
            _edge_zero(wn, -2, "first"),
            _edge_zero(we, -1, "last"),
            _edge_zero(ws, -2, "last"),
        )
    ww, wnw, wn, wne, we, wse, ws, wsw = weights
    ww = _edge_zero(ww, -1, "first")
    we = _edge_zero(we, -1, "last")
    wn = _edge_zero(wn, -2, "first")
    ws = _edge_zero(ws, -2, "last")
    wnw, wne, wse, wsw = _zero_diag_borders(wnw, wne, wse, wsw)
    return ww, wnw, wn, wne, we, wse, ws, wsw


def _nbr_sum4(x, ww, wn, we, ws):
    return shift_w(x) * ww + shift_e(x) * we + shift_n(x) * wn + shift_s(x) * ws


def _nbr_sum8(x, ww, wnw, wn, wne, we, wse, ws, wsw):
    return (
        shift_w(x) * ww
        + shift_e(x) * we
        + shift_n(x) * wn
        + shift_s(x) * ws
        + shift_n(shift_w(x)) * wnw
        + shift_n(shift_e(x)) * wne
        + shift_s(shift_w(x)) * wsw
        + shift_s(shift_e(x)) * wse
    )


# ---------------------------------------------------------------------------
# Generic coupled-pair relaxation core (flow elin/llin share this shape)
# ---------------------------------------------------------------------------


def _flow_sor(u, v, du, dv, m, cu, cv, du_c, dv_c, weights, iters, omega, *, late, eight=False):
    """Shared core. late=False solves (u,v) in place (elin, du/dv ignored);
    late=True solves increments (du,dv) against frozen (u,v).

    Border convention: the coupled flow solvers relax the SAME
    border-inclusive system as the reference's default ALR and our PCG —
    out-facing weights zeroed, every pixel (borders included) updated
    with its one-sided stencil (westColumn_llin4 etc.,
    opticalflowSolvers.c:2415-2640). The C *pointwise* kernel's
    interior-only update + border replication is deliberately NOT
    reproduced: red-black over the replicate system converges to a
    different fixed point than the reference's shipped default, while
    this formulation reaches the ALR answer (flow_nd vs the sequential-
    ALR golden: 0.6% AEE at omega=1.9, iter=8)."""
    h, w = m.shape[-2:]
    mask0 = checkerboard(h, w, 0)
    mask1 = checkerboard(h, w, 1)
    weights = _edge_zeroed(weights, eight)

    wsum = sum(weights)
    cu_nan = jnp.isnan(cu)
    cv_nan = jnp.isnan(cv)
    m0 = jnp.nan_to_num(m)
    cu0 = jnp.nan_to_num(cu)
    cv0 = jnp.nan_to_num(cv)
    inv_u = 1.0 / (wsum + jnp.where(jnp.isnan(du_c), 0.0, jnp.nan_to_num(du_c)))
    inv_v = 1.0 / (wsum + jnp.where(jnp.isnan(dv_c), 0.0, jnp.nan_to_num(dv_c)))

    nbr = _nbr_sum8 if eight else _nbr_sum4

    if late:
        def diff_term(df, f):
            # Σ w_k (df_k + f_k - f_c): fold -f_c through the weight sum
            return nbr(df + f, *weights) - f * wsum
    else:
        def diff_term(df, f):
            # early lin.: the relaxed field itself is the unknown
            return nbr(df, *weights)

    def half(fu, fv, other_u, other_v, mask):
        # fu/fv are the fields being relaxed (U,V for elin; dU,dV for llin);
        # other_* are the frozen base fields for llin (unused for elin).
        # Coupling order matches the C pointwise kernel: the u-field
        # updates first, the v-field then uses the REFRESHED u
        # (opticalflowSolvers.c:129-152 updates U then V per pixel) —
        # Jacobi coupling here is unstable at omega=1.9.
        su = diff_term(fu, other_u)
        sv = diff_term(fv, other_v)
        num_u = jnp.where(cu_nan, su, su + cu0 - m0 * fv)
        new_u = jnp.where(mask, (1.0 - omega) * fu + omega * num_u * inv_u, fu)
        num_v = jnp.where(cv_nan, sv, sv + cv0 - m0 * new_u)
        new_v = jnp.where(mask, (1.0 - omega) * fv + omega * num_v * inv_v, fv)
        return new_u, new_v

    if late:
        def body(_, state):
            fu, fv = state
            fu, fv = half(fu, fv, u, v, mask0)
            fu, fv = half(fu, fv, u, v, mask1)
            return fu, fv

        return lax.fori_loop(0, iters, body, (du, dv))
    else:
        def body(_, state):
            fu, fv = state
            fu, fv = half(fu, fv, None, None, mask0)
            fu, fv = half(fu, fv, None, None, mask1)
            return fu, fv

        return lax.fori_loop(0, iters, body, (u, v))


@partial(jax.jit, static_argnames=("iters",))
def sor_flow_elin4(u, v, m, cu, cv, duc, dvc, ww, wn, we, ws, iters: int, omega: float):
    """Early-linearisation 4-neighbour flow SOR (cf. GS_SOR_elin4_2d)."""
    return _flow_sor(u, v, None, None, m, cu, cv, duc, dvc, (ww, wn, we, ws), iters, omega, late=False)


@partial(jax.jit, static_argnames=("iters",))
def sor_flow_llin4(u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws, iters: int, omega: float):
    """Late-linearisation 4-neighbour flow SOR (cf. GS_SOR_llin4_2d)."""
    return _flow_sor(u, v, du, dv, m, cu, cv, duc, dvc, (ww, wn, we, ws), iters, omega, late=True)


@partial(jax.jit, static_argnames=("iters",))
def sor_flow_llin8(u, v, du, dv, m, cu, cv, duc, dvc,
                   ww, wnw, wn, wne, we, wse, ws, wsw, iters: int, omega: float):
    """Late-linearisation 8-neighbour (anisotropic) flow SOR (cf. GS_SOR_llin8_2d)."""
    return _flow_sor(
        u, v, du, dv, m, cu, cv, duc, dvc,
        (ww, wnw, wn, wne, we, wse, ws, wsw), iters, omega, late=True, eight=True,
    )


# ---------------------------------------------------------------------------
# Scalar (disparity) solvers
# ---------------------------------------------------------------------------


def _scalar_llin_sor(u, du, cu, duc, weights, iters, omega):
    h, w = u.shape[-2:]
    mask0, mask1 = _interior_color_masks(h, w)
    wsum = sum(weights)
    cu_nan = jnp.isnan(cu)
    cu0 = jnp.nan_to_num(cu)
    inv = 1.0 / (wsum + jnp.where(jnp.isnan(duc), 0.0, jnp.nan_to_num(duc)))

    def half(df, mask):
        s = _nbr_sum4(df + u, *weights) - u * wsum
        num = jnp.where(cu_nan, s, s + cu0)
        return jnp.where(mask, (1.0 - omega) * df + omega * num * inv, df)

    def body(_, df):
        df = half(df, mask0)
        df = half(df, mask1)
        return replicate_border(df)

    return lax.fori_loop(0, iters, body, du)


@partial(jax.jit, static_argnames=("iters",))
def sor_disp_llin4(u, du, cu, duc, ww, wn, we, ws, iters: int, omega: float):
    """Scalar late-lin. disparity SOR (cf. disparitySolvers.c GS_SOR_llin4_2d)."""
    return _scalar_llin_sor(u, du, cu, duc, (ww, wn, we, ws), iters, omega)


@partial(jax.jit, static_argnames=("iters",))
def sor_disp_llin_sym4(
    u0, du0, cu0, duc0, ww0, wn0, we0, ws0,
    u1, du1, cu1, duc1, ww1, wn1, we1, ws1,
    iters: int, omega: float,
):
    """Coupled left/right disparity pair (cf. GS_SOR_llinsym4_2d).

    The two relaxations are algebraically independent per sweep (coupling
    enters through the Cu/Du tensors built by the driver), so they batch
    into one vmapped scalar solve.
    """
    u = jnp.stack([u0, u1])
    du = jnp.stack([du0, du1])
    cu = jnp.stack([cu0, cu1])
    duc = jnp.stack([duc0, duc1])
    ws_ = tuple(jnp.stack([a, b]) for a, b in ((ww0, ww1), (wn0, wn1), (we0, we1), (ws0, ws1)))
    out = jax.vmap(
        lambda u_, du_, cu_, duc_, a, b, c, d: _scalar_llin_sor(
            u_, du_, cu_, duc_, (a, b, c, d), iters, omega
        )
    )(u, du, cu, duc, *ws_)
    return out[0], out[1]


# ---------------------------------------------------------------------------
# Diagonal-form PDE solvers (denoising / diffusion)
# ---------------------------------------------------------------------------


def _pde_sor(x, trace, b, weights, iters, omega, eight):
    h, w = x.shape[-2:]
    mask0, mask1 = _interior_color_masks(h, w)
    nbr = _nbr_sum8 if eight else _nbr_sum4
    wsum = sum(weights)
    tr_nan = jnp.isnan(trace)
    inv = jnp.where(tr_nan, 1.0 / wsum, 1.0 / jnp.nan_to_num(trace, nan=1.0))
    b_eff = jnp.where(tr_nan, 0.0, b)

    def half(xc, mask):
        new = (b_eff + nbr(xc, *weights)) * inv
        return jnp.where(mask, (1.0 - omega) * xc + omega * new, xc)

    def body(_, xc):
        xc = half(xc, mask0)
        xc = half(xc, mask1)
        return replicate_border(xc)

    return lax.fori_loop(0, iters, body, x)


@partial(jax.jit, static_argnames=("iters",))
def sor_pde4(x, trace, b, ww, wn, we, ws, iters: int, omega: float):
    """Diagonal-form 4-neighbour SOR: X+ = (B + Σ wX)/TRACE (cf. GS_SOR_4_2d).

    Leading channel/frame dims broadcast (the reference loops frames).
    """
    return _pde_sor(x, trace, b, (ww, wn, we, ws), iters, omega, eight=False)


@partial(jax.jit, static_argnames=("iters",))
def sor_pde8(x, trace, b, ww, wnw, wn, wne, we, wse, ws, wsw, iters: int, omega: float):
    """Diagonal-form 8-neighbour SOR (cf. GS_SOR_8_2d)."""
    return _pde_sor(x, trace, b, (ww, wnw, wn, wne, we, wse, ws, wsw), iters, omega, eight=True)


# ---------------------------------------------------------------------------
# Residual / LHS operators (multigrid building blocks)
# ---------------------------------------------------------------------------


@jax.jit
def residuals_elin4(u, v, m, cu, cv, duc, dvc, ww, wn, we, ws):
    """r = b − A·x for the elin4 system (cf. Residuals_elin4_2d,
    opticalflowSolvers.c:269-385), border-replicated."""
    wsum = ww + wn + we + ws
    su = _nbr_sum4(u, ww, wn, we, ws)
    sv = _nbr_sum4(v, ww, wn, we, ws)
    ru_data = jnp.nan_to_num(cu) - jnp.nan_to_num(m) * v + su - (jnp.nan_to_num(duc) + wsum) * u
    rv_data = jnp.nan_to_num(cv) - jnp.nan_to_num(m) * u + sv - (jnp.nan_to_num(dvc) + wsum) * v
    ru = jnp.where(jnp.isnan(cu), su - wsum * u, ru_data)
    rv = jnp.where(jnp.isnan(cv), sv - wsum * v, rv_data)
    return replicate_border(ru), replicate_border(rv)


@jax.jit
def residuals_llin4(u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws):
    """r = b − A·x for the late-linearisation flow system at the increment
    state (dU, dV) — the optional RU/RV outputs of the reference gateway
    (Oflow_sor_llin4_2d.c:384-385 → Residuals_llin4_2d,
    opticalflowSolvers.c:766-918). Diffusion term Σ w_k (dU_k + U_k − U_c);
    NaN Cu/Cv drops both the data term and the Du/Dv diagonal
    contribution. Border-replicated. The gateway evaluates this at the
    *input* increments (pre-relaxation residual)."""
    wsum = ww + wn + we + ws
    nu = _nbr_sum4(du + u, ww, wn, we, ws) - u * wsum
    nv = _nbr_sum4(dv + v, ww, wn, we, ws) - v * wsum
    m0 = jnp.nan_to_num(m)
    ru_data = jnp.nan_to_num(cu) - m0 * dv + nu - (jnp.nan_to_num(duc) + wsum) * du
    rv_data = jnp.nan_to_num(cv) - m0 * du + nv - (jnp.nan_to_num(dvc) + wsum) * dv
    ru = jnp.where(jnp.isnan(cu), nu - wsum * du, ru_data)
    rv = jnp.where(jnp.isnan(cv), nv - wsum * dv, rv_data)
    return replicate_border(ru), replicate_border(rv)


@jax.jit
def residuals_disp_llin4(u, du, cu, duc, ww, wn, we, ws):
    """Scalar late-linearisation residual — the optional RU output of
    Disp_sor_llin4_2d (disparitySolvers.c Residuals_llin4_2d:218-300)."""
    wsum = ww + wn + we + ws
    nu = _nbr_sum4(du + u, ww, wn, we, ws) - u * wsum
    r_data = jnp.nan_to_num(cu) + nu - (jnp.nan_to_num(duc) + wsum) * du
    r = jnp.where(jnp.isnan(cu), nu - wsum * du, r_data)
    return replicate_border(r)


@jax.jit
def lhs_llin4(u, v, du, dv, m, duc, dvc, ww, wn, we, ws):
    """A·x for the late-linearisation system at increment state (dU, dV)
    (cf. LHS_llin4_2d, opticalflowSolvers.c:923-1045, compiled as the
    Oflow_lhs_llin4_2d gateway): AU = M·dV − Σ w_k (dU_k + U_k − U_c)
    + (Du + Σw)·dU; NaN Du/Dv drops both the coupling and the data
    diagonal. Border-replicated. Unused by the shipped reference drivers
    (buildAll.m:6 compiles it but nothing calls it) — provided for
    completeness parity and as the matvec for a future llin multigrid."""
    wsum = ww + wn + we + ws
    nu = _nbr_sum4(du + u, ww, wn, we, ws) - u * wsum
    nv = _nbr_sum4(dv + v, ww, wn, we, ws) - v * wsum
    m0 = jnp.nan_to_num(m)
    au_data = m0 * dv - nu + (jnp.nan_to_num(duc) + wsum) * du
    av_data = m0 * du - nv + (jnp.nan_to_num(dvc) + wsum) * dv
    au = jnp.where(jnp.isnan(duc), -nu + wsum * du, au_data)
    av = jnp.where(jnp.isnan(dvc), -nv + wsum * dv, av_data)
    return replicate_border(au), replicate_border(av)


@jax.jit
def lhs_elin4(u, v, m, duc, dvc, ww, wn, we, ws):
    """A·x for the elin4 system (cf. LHS_elin4_2d,
    opticalflowSolvers.c:387-496), border-replicated."""
    wsum = ww + wn + we + ws
    su = _nbr_sum4(u, ww, wn, we, ws)
    sv = _nbr_sum4(v, ww, wn, we, ws)
    au_data = jnp.nan_to_num(m) * v - su + (jnp.nan_to_num(duc) + wsum) * u
    av_data = jnp.nan_to_num(m) * u - sv + (jnp.nan_to_num(dvc) + wsum) * v
    au = jnp.where(jnp.isnan(duc), -su + wsum * u, au_data)
    av = jnp.where(jnp.isnan(dvc), -sv + wsum * v, av_data)
    return replicate_border(au), replicate_border(av)
