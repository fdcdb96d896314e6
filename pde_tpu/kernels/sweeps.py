"""Sweep bodies for the tiled Pallas relaxation engine.

Each factory returns ``(prepare_fn, sweep_fn)`` for ``tiled_relax``:
``prepare_fn`` folds the NaN missing-data protocol into masked
coefficients once per stripe; ``sweep_fn`` is one full red-black SOR
sweep (two half-grid updates + global border replication), numerically
identical to the corresponding global solver in ``solvers/sor.py`` and to
the reference C kernels cited there (opticalflowSolvers.c:504-680,
disparitySolvers.c:41-153, pdeSolvers.c:44-268).

Factories are lru_cached so the returned closures are stable objects —
``tiled_relax`` passes them as jit static arguments.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp


def _nbr4(x, ww, wn, we, ws, aux):
    return (aux.shift_w(x) * ww + aux.shift_e(x) * we
            + aux.shift_n(x) * wn + aux.shift_s(x) * ws)


def _nbr8(x, ww, wnw, wn, wne, we, wse, ws, wsw, aux):
    return (
        aux.shift_w(x) * ww + aux.shift_e(x) * we
        + aux.shift_n(x) * wn + aux.shift_s(x) * ws
        + aux.shift_n(aux.shift_w(x)) * wnw
        + aux.shift_n(aux.shift_e(x)) * wne
        + aux.shift_s(aux.shift_w(x)) * wsw
        + aux.shift_s(aux.shift_e(x)) * wse
    )


def _fold_data_nan(c, dc, weights_sum):
    """NaN data term => pure diffusion at that pixel (the reference's
    isnan(C/D) fallback): mask Cu/M contributions and drop Du from the
    divisor."""
    c_nan = jnp.isnan(c)
    c0 = jnp.nan_to_num(c)
    inv = 1.0 / (weights_sum + jnp.where(jnp.isnan(dc), 0.0, jnp.nan_to_num(dc)))
    return c_nan, c0, inv


def _zero_edges4(ww, wn, we, ws, aux):
    z = jnp.zeros((), ww.dtype)
    return (jnp.where(aux.edge_w, z, ww), jnp.where(aux.edge_n, z, wn),
            jnp.where(aux.edge_e, z, we), jnp.where(aux.edge_s, z, ws))


def _zero_edges8(ws8, aux):
    ww, wnw, wn, wne, we, wse, ws, wsw = ws8
    z = jnp.zeros((), ww.dtype)
    ww, wn, we, ws = _zero_edges4(ww, wn, we, ws, aux)
    wnw = jnp.where(aux.edge_n | aux.edge_w, z, wnw)
    wne = jnp.where(aux.edge_n | aux.edge_e, z, wne)
    wse = jnp.where(aux.edge_s | aux.edge_e, z, wse)
    wsw = jnp.where(aux.edge_s | aux.edge_w, z, wsw)
    return ww, wnw, wn, wne, we, wse, ws, wsw


@lru_cache(maxsize=None)
def flow_llin4_sweep(omega: float):
    """Coupled (dU, dV) late-linearisation 4-neighbour flow sweep.

    fields = [du, dv | u, v, m, cu, cv, duc, dvc, ww, wn, we, ws].
    """

    def prepare(const, aux):
        u, v, m, cu, cv, duc, dvc, ww, wn, we, ws = const
        # border-solving convention (solvers/sor.py): out-facing weights
        # zeroed at the GLOBAL image edges, all real pixels relaxed
        ww, wn, we, ws = _zero_edges4(ww, wn, we, ws, aux)
        wsum = ww + wn + we + ws
        cu_nan, cu0, inv_u = _fold_data_nan(cu, duc, wsum)
        cv_nan, cv0, inv_v = _fold_data_nan(cv, dvc, wsum)
        m0 = jnp.nan_to_num(m)
        return [u, v, m0, cu_nan, cu0, inv_u, cv_nan, cv0, inv_v,
                ww, wn, we, ws, wsum]

    def sweep(mut, const, aux):
        du, dv = mut
        (u, v, m0, cu_nan, cu0, inv_u, cv_nan, cv0, inv_v,
         ww, wn, we, ws, wsum) = const

        def half(fu, fv, mask):
            # v uses the refreshed u (GS coupling, cf. solvers/sor.py)
            su = _nbr4(fu + u, ww, wn, we, ws, aux) - u * wsum
            sv = _nbr4(fv + v, ww, wn, we, ws, aux) - v * wsum
            num_u = jnp.where(cu_nan, su, su + cu0 - m0 * fv)
            nu = jnp.where(mask, (1.0 - omega) * fu + omega * num_u * inv_u, fu)
            num_v = jnp.where(cv_nan, sv, sv + cv0 - m0 * nu)
            nv = jnp.where(mask, (1.0 - omega) * fv + omega * num_v * inv_v, fv)
            return nu, nv

        du, dv = half(du, dv, aux.maskf0)
        du, dv = half(du, dv, aux.maskf1)
        return [du, dv]

    return prepare, sweep


@lru_cache(maxsize=None)
def flow_llin8_sweep(omega: float):
    """Coupled (dU, dV) 8-neighbour (anisotropic tensor) flow sweep.

    fields = [du, dv | u, v, m, cu, cv, duc, dvc,
              ww, wnw, wn, wne, we, wse, ws, wsw].
    """

    def prepare(const, aux):
        u, v, m, cu, cv, duc, dvc, *ws8 = const
        ws8 = list(_zero_edges8(ws8, aux))
        wsum = sum(ws8)
        cu_nan, cu0, inv_u = _fold_data_nan(cu, duc, wsum)
        cv_nan, cv0, inv_v = _fold_data_nan(cv, dvc, wsum)
        m0 = jnp.nan_to_num(m)
        return [u, v, m0, cu_nan, cu0, inv_u, cv_nan, cv0, inv_v, wsum] + ws8

    def sweep(mut, const, aux):
        du, dv = mut
        (u, v, m0, cu_nan, cu0, inv_u, cv_nan, cv0, inv_v, wsum, *ws8) = const

        def half(fu, fv, mask):
            # v uses the refreshed u (GS coupling, cf. solvers/sor.py)
            su = _nbr8(fu + u, *ws8, aux) - u * wsum
            sv = _nbr8(fv + v, *ws8, aux) - v * wsum
            num_u = jnp.where(cu_nan, su, su + cu0 - m0 * fv)
            nu = jnp.where(mask, (1.0 - omega) * fu + omega * num_u * inv_u, fu)
            num_v = jnp.where(cv_nan, sv, sv + cv0 - m0 * nu)
            nv = jnp.where(mask, (1.0 - omega) * fv + omega * num_v * inv_v, fv)
            return nu, nv

        du, dv = half(du, dv, aux.maskf0)
        du, dv = half(du, dv, aux.maskf1)
        return [du, dv]

    return prepare, sweep


@lru_cache(maxsize=None)
def disp_llin4_sweep(omega: float):
    """Scalar late-linearisation disparity sweep.

    fields = [du | u, cu, duc, ww, wn, we, ws].
    """

    def prepare(const, aux):
        u, cu, duc, ww, wn, we, ws = const
        wsum = ww + wn + we + ws
        cu_nan, cu0, inv = _fold_data_nan(cu, duc, wsum)
        return [u, cu_nan, cu0, inv, ww, wn, we, ws, wsum]

    def sweep(mut, const, aux):
        (du,) = mut
        u, cu_nan, cu0, inv, ww, wn, we, ws, wsum = const

        def half(df, mask):
            s = _nbr4(df + u, ww, wn, we, ws, aux) - u * wsum
            num = jnp.where(cu_nan, s, s + cu0)
            return jnp.where(mask, (1.0 - omega) * df + omega * num * inv, df)

        du = half(du, aux.mask0)
        du = half(du, aux.mask1)
        return [aux.border(du)]

    return prepare, sweep


@lru_cache(maxsize=None)
def pde4_sweep(omega: float):
    """Diagonal-form 4-neighbour sweep X+ = (B + Σ wX)/TRACE.

    fields = [x | trace, b, ww, wn, we, ws].
    """

    def prepare(const, aux):
        trace, b, ww, wn, we, ws = const
        wsum = ww + wn + we + ws
        tr_nan = jnp.isnan(trace)
        inv = jnp.where(tr_nan, 1.0 / wsum, 1.0 / jnp.nan_to_num(trace, nan=1.0))
        b_eff = jnp.where(tr_nan, 0.0, b)
        return [inv, b_eff, ww, wn, we, ws]

    def sweep(mut, const, aux):
        (x,) = mut
        inv, b_eff, ww, wn, we, ws = const

        def half(xc, mask):
            new = (b_eff + _nbr4(xc, ww, wn, we, ws, aux)) * inv
            return jnp.where(mask, (1.0 - omega) * xc + omega * new, xc)

        x = half(x, aux.mask0)
        x = half(x, aux.mask1)
        return [aux.border(x)]

    return prepare, sweep


@lru_cache(maxsize=None)
def pde8_sweep(omega: float):
    """Diagonal-form 8-neighbour sweep.

    fields = [x | trace, b, ww, wnw, wn, wne, we, wse, ws, wsw].
    """

    def prepare(const, aux):
        trace, b, *ws8 = const
        wsum = sum(ws8)
        tr_nan = jnp.isnan(trace)
        inv = jnp.where(tr_nan, 1.0 / wsum, 1.0 / jnp.nan_to_num(trace, nan=1.0))
        b_eff = jnp.where(tr_nan, 0.0, b)
        return [inv, b_eff] + ws8

    def sweep(mut, const, aux):
        (x,) = mut
        inv, b_eff, *ws8 = const

        def half(xc, mask):
            new = (b_eff + _nbr8(xc, *ws8, aux)) * inv
            return jnp.where(mask, (1.0 - omega) * xc + omega * new, xc)

        x = half(x, aux.mask0)
        x = half(x, aux.mask1)
        return [aux.border(x)]

    return prepare, sweep


@lru_cache(maxsize=None)
def flow_elin4_sweep(omega: float):
    """Early-linearisation coupled (U, V) 4-neighbour sweep.

    fields = [u, v | m, cu, cv, duc, dvc, ww, wn, we, ws].
    """

    def prepare(const, aux):
        m, cu, cv, duc, dvc, ww, wn, we, ws = const
        ww, wn, we, ws = _zero_edges4(ww, wn, we, ws, aux)
        wsum = ww + wn + we + ws
        cu_nan, cu0, inv_u = _fold_data_nan(cu, duc, wsum)
        cv_nan, cv0, inv_v = _fold_data_nan(cv, dvc, wsum)
        m0 = jnp.nan_to_num(m)
        return [m0, cu_nan, cu0, inv_u, cv_nan, cv0, inv_v, ww, wn, we, ws]

    def sweep(mut, const, aux):
        u, v = mut
        m0, cu_nan, cu0, inv_u, cv_nan, cv0, inv_v, ww, wn, we, ws = const

        def half(fu, fv, mask):
            # v uses the refreshed u (GS coupling, cf. solvers/sor.py)
            su = _nbr4(fu, ww, wn, we, ws, aux)
            sv = _nbr4(fv, ww, wn, we, ws, aux)
            num_u = jnp.where(cu_nan, su, su + cu0 - m0 * fv)
            nu = jnp.where(mask, (1.0 - omega) * fu + omega * num_u * inv_u, fu)
            num_v = jnp.where(cv_nan, sv, sv + cv0 - m0 * nu)
            nv = jnp.where(mask, (1.0 - omega) * fv + omega * num_v * inv_v, fv)
            return nu, nv

        u, v = half(u, v, aux.maskf0)
        u, v = half(u, v, aux.maskf1)
        return [u, v]

    return prepare, sweep
