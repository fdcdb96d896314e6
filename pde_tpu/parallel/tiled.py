"""Spatially tiled stencil solvers: shard_map over a ("ty", "tx") mesh.

The reference is single-node (no distributed backend of any kind); the
TPU-native scaling axis for PDE image processing is the image plane
itself: shard (H, W) into tiles across chips, exchange 1-px halos via
``lax.ppermute`` over ICI every sweep (``halo.py``), and reduce CG dot
products with ``psum``. A leading frame/batch axis can ride a "batch"
mesh axis (the reference's OpenMP-over-frames analogue,
levelsetSolvers.c:200-324).

Correctness contract: the tiled red-black sweeps perform *exactly* the
same update as the single-chip solvers in ``solvers/sor.py`` — color-0
reads only old values, color-1 reads refreshed color-0 halos, and the
global 1-px replicated border is re-filled every sweep — verified
tile-count-invariant by tests on a virtual 8-device CPU mesh.

The tiled PCG (``tiled_pcg_flow_llin4``) runs the same CG iteration as
``solvers/krylov.py`` with halo-exchanged matvecs and psum dots; its
zebra line preconditioner solves tile-local line segments (an additive-
Schwarz block approximation of the full-image lines — the same smoother
family, a few extra CG iterations at worst, no cross-tile Thomas
dependency).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 moved shard_map out of experimental
    from jax import shard_map as _shard_map_mod  # type: ignore

    shard_map = _shard_map_mod.shard_map if hasattr(_shard_map_mod, "shard_map") else _shard_map_mod
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from pde_tpu.parallel.halo import halo_exchange
from pde_tpu.solvers.tdma import thomas_solve, _edge_zero


def _axis_or_one(name: str) -> int:
    try:
        return lax.axis_size(name)
    except NameError:
        return 1


def _halo_shifts(x, halo: int = 1):
    """Neighbour-value views of a local tile with exchanged halos.

    Returns (center==x, W, N, E, S) where each is the neighbour's value at
    every local pixel — the tiled equivalent of ``core.grid.shift_*``.
    """
    xp = halo_exchange(x, halo)
    return (
        xp[..., 1:-1, :-2],
        xp[..., :-2, 1:-1],
        xp[..., 1:-1, 2:],
        xp[..., 2:, 1:-1],
    )


def _global_masks(h: int, w: int):
    """(interior&color0, interior&color1) masks in GLOBAL coordinates."""
    nty = _axis_or_one("ty")
    ntx = _axis_or_one("tx")
    ti = lax.axis_index("ty") if nty > 1 else 0
    tj = lax.axis_index("tx") if ntx > 1 else 0
    gi = ti * h + jnp.arange(h)[:, None]
    gj = tj * w + jnp.arange(w)[None, :]
    gh, gw = nty * h, ntx * w
    inter = (gi >= 1) & (gi <= gh - 2) & (gj >= 1) & (gj <= gw - 2)
    color = (gi + gj) % 2
    return inter & (color == 0), inter & (color == 1)


def _full_masks(h: int, w: int):
    """(color0, color1) over ALL global pixels (border-solving families)."""
    nty = _axis_or_one("ty")
    ntx = _axis_or_one("tx")
    ti = lax.axis_index("ty") if nty > 1 else 0
    tj = lax.axis_index("tx") if ntx > 1 else 0
    gi = ti * h + jnp.arange(h)[:, None]
    gj = tj * w + jnp.arange(w)[None, :]
    color = (gi + gj) % 2
    return color == 0, color == 1


def _global_edge_masks(h: int, w: int):
    """(left, top, right, bottom) global-edge masks for a local tile."""
    nty = _axis_or_one("ty")
    ntx = _axis_or_one("tx")
    ti = lax.axis_index("ty") if nty > 1 else 0
    tj = lax.axis_index("tx") if ntx > 1 else 0
    gi = ti * h + jnp.arange(h)[:, None]
    gj = tj * w + jnp.arange(w)[None, :]
    gh, gw = nty * h, ntx * w
    left = jnp.broadcast_to(gj == 0, (h, w))
    right = jnp.broadcast_to(gj == gw - 1, (h, w))
    top = jnp.broadcast_to(gi == 0, (h, w))
    bot = jnp.broadcast_to(gi == gh - 1, (h, w))
    return left, top, right, bot


def _tiled_replicate_border(x):
    """Global 1-px replicated border fill (opticalflowSolvers.c:156-179):
    rows first then columns, applied only on mesh-edge tiles."""
    nty = _axis_or_one("ty")
    ntx = _axis_or_one("tx")
    ti = lax.axis_index("ty") if nty > 1 else 0
    tj = lax.axis_index("tx") if ntx > 1 else 0
    # rows: global row 0 <- row 1, row GH-1 <- row GH-2
    top = jnp.where(ti == 0, x[..., 1:2, :], x[..., :1, :])
    bot = jnp.where(ti == nty - 1, x[..., -2:-1, :], x[..., -1:, :])
    x = jnp.concatenate([top, x[..., 1:-1, :], bot], axis=-2)
    left = jnp.where(tj == 0, x[..., :, 1:2], x[..., :, :1])
    right = jnp.where(tj == ntx - 1, x[..., :, -2:-1], x[..., :, -1:])
    return jnp.concatenate([left, x[..., :, 1:-1], right], axis=-1)


# ---------------------------------------------------------------------------
# Tiled red-black SOR, late-linearised flow pair (mirrors sor._flow_sor)
# ---------------------------------------------------------------------------


def _tiled_flow_llin4_local(u, v, du, dv, m, cu, cv, duc, dvc,
                            ww, wn, we, ws, iters: int, omega: float):
    h, w = u.shape[-2:]
    # border-solving convention (solvers/sor.py): all pixels relax, the
    # out-facing weights vanish on GLOBAL image edges only
    mask0, mask1 = _full_masks(h, w)
    ww, wn, we, ws = _tile_edge_zeroed4(ww, wn, we, ws)
    wsum = ww + wn + we + ws
    cu_nan = jnp.isnan(cu)
    cv_nan = jnp.isnan(cv)
    m0 = jnp.nan_to_num(m)
    cu0 = jnp.nan_to_num(cu)
    cv0 = jnp.nan_to_num(cv)
    inv_u = 1.0 / (wsum + jnp.where(jnp.isnan(duc), 0.0, jnp.nan_to_num(duc)))
    inv_v = 1.0 / (wsum + jnp.where(jnp.isnan(dvc), 0.0, jnp.nan_to_num(dvc)))

    def diff_term(df_plus_f, f):
        dw, dn, de, ds = _halo_shifts(df_plus_f)
        return (ww * dw + wn * dn + we * de + ws * ds) - f * wsum

    def half(fu, fv, mask):
        # v uses the refreshed u (GS coupling, cf. solvers/sor.py)
        su = diff_term(fu + u, u)
        sv = diff_term(fv + v, v)
        num_u = jnp.where(cu_nan, su, su + cu0 - m0 * fv)
        new_u = jnp.where(mask, (1.0 - omega) * fu + omega * num_u * inv_u, fu)
        num_v = jnp.where(cv_nan, sv, sv + cv0 - m0 * new_u)
        new_v = jnp.where(mask, (1.0 - omega) * fv + omega * num_v * inv_v, fv)
        return new_u, new_v

    def body(_, state):
        fu, fv = state
        fu, fv = half(fu, fv, mask0)
        fu, fv = half(fu, fv, mask1)
        return fu, fv

    return lax.fori_loop(0, iters, body, (du, dv))


def tiled_sor_flow_llin4(mesh: Mesh, u, v, du, dv, m, cu, cv, duc, dvc,
                         ww, wn, we, ws, iters: int, omega: float):
    """Tiled drop-in for ``sor_flow_llin4``: same update, (H, W) sharded
    over mesh axes ("ty", "tx")."""
    spec = P("ty", "tx")
    fn = shard_map(
        partial(_tiled_flow_llin4_local, iters=iters, omega=omega),
        mesh=mesh,
        in_specs=(spec,) * 13,
        out_specs=(spec, spec),
    )
    return jax.jit(fn)(u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws)


# ---------------------------------------------------------------------------
# Tiled PCG, late-linearised flow pair (mirrors krylov._flow_pcg)
# ---------------------------------------------------------------------------


def _tile_edge_zeroed4(ww, wn, we, ws):
    """Zero weights on GLOBAL image edges only (tile-interior edges keep
    their weights; neighbour values arrive via halo exchange)."""
    nty = _axis_or_one("ty")
    ntx = _axis_or_one("tx")
    ti = lax.axis_index("ty") if nty > 1 else 0
    tj = lax.axis_index("tx") if ntx > 1 else 0
    ww = jnp.where(tj == 0, _edge_zero(ww, -1, "first"), ww)
    we = jnp.where(tj == ntx - 1, _edge_zero(we, -1, "last"), we)
    wn = jnp.where(ti == 0, _edge_zero(wn, -2, "first"), wn)
    ws = jnp.where(ti == nty - 1, _edge_zero(ws, -2, "last"), ws)
    return ww, wn, we, ws


def _tiled_flow_pcg_local(u, v, du0, dv0, m, cu, cv, duc, dvc,
                          ww, wn, we, ws, iters: int):
    ww, wn, we, ws = _tile_edge_zeroed4(ww, wn, we, ws)
    wsum = ww + wn + we + ws
    valid_u = ~jnp.isnan(cu)
    valid_v = ~jnp.isnan(cv)
    d_u = jnp.where(valid_u, jnp.nan_to_num(duc), 0.0)
    d_v = jnp.where(valid_v, jnp.nan_to_num(dvc), 0.0)
    m_eff = jnp.where(valid_u & valid_v, jnp.nan_to_num(m), 0.0)
    diag_u = wsum + d_u
    diag_v = wsum + d_v

    def nbr(x):
        xw, xn, xe, xs = _halo_shifts(x)
        return ww * xw + wn * xn + we * xe + ws * xs

    b_u = (nbr(u) - wsum * u) + jnp.where(valid_u, jnp.nan_to_num(cu), 0.0)
    b_v = (nbr(v) - wsum * v) + jnp.where(valid_v, jnp.nan_to_num(cv), 0.0)

    def apply_a(x):
        xu, xv = x
        return (diag_u * xu - nbr(xu) + m_eff * xv,
                diag_v * xv - nbr(xv) + m_eff * xu)

    # tile-local zebra-ADI preconditioner (additive Schwarz across tiles:
    # line solves stop at tile boundaries; the edge-zeroing of the LINE
    # system is per-tile, keeping the preconditioner SPD)
    h, w = u.shape[-2:]
    col_par = jnp.arange(w)[None, :] % 2
    row_par = (jnp.arange(h) % 2)[:, None]
    wn_t = _edge_zero(wn, -2, "first")
    ws_t = _edge_zero(ws, -2, "last")
    ww_t = _edge_zero(ww, -1, "first")
    we_t = _edge_zero(we, -1, "last")

    def line_pass(z, rhs, diag, parity, vertical):
        if vertical:
            d = rhs + ww_t * jnp.pad(z, ((0, 0), (1, 0)))[:, :-1] \
                + we_t * jnp.pad(z, ((0, 0), (0, 1)))[:, 1:]
            sol = thomas_solve(-wn_t, diag, -ws_t, d, axis=-2)
            sel = col_par == parity
        else:
            d = rhs + wn_t * jnp.pad(z, ((1, 0), (0, 0)))[:-1, :] \
                + ws_t * jnp.pad(z, ((0, 1), (0, 0)))[1:, :]
            sol = thomas_solve(-ww_t, diag, -we_t, d, axis=-1)
            sel = row_par == parity
        return jnp.where(sel, sol, z)

    def precond(r):
        ru, rv = r
        zu = jnp.zeros_like(ru)
        zv = jnp.zeros_like(rv)
        steps = [(0, p, True) for p in (0, 1)] + [(1, p, True) for p in (0, 1)]
        steps += [(0, p, False) for p in (0, 1)] + [(1, p, False) for p in (0, 1)]
        for k, p, vert in steps + list(reversed(steps)):
            if k == 0:
                zu = line_pass(zu, ru - m_eff * zv, diag_u, p, vert)
            else:
                zv = line_pass(zv, rv - m_eff * zu, diag_v, p, vert)
        return zu, zv

    def pdot(a, b):
        local = sum(jnp.vdot(x, y) for x, y in zip(a, b))
        for ax in ("ty", "tx"):
            if _axis_or_one(ax) > 1:
                local = lax.psum(local, ax)
        return local

    x = (du0, dv0)
    r = tuple(bb - aa for bb, aa in zip((b_u, b_v), apply_a(x)))
    z = precond(r)
    rz = pdot(r, z)

    def body(_, state):
        x, r, p, rz = state
        ap = apply_a(p)
        pap = pdot(p, ap)
        alpha = jnp.where(pap > 0, rz / jnp.where(pap == 0, 1.0, pap), 0.0)
        x = tuple(xx + alpha * pp for xx, pp in zip(x, p))
        r = tuple(rr - alpha * aa for rr, aa in zip(r, ap))
        z = precond(r)
        rz_new = pdot(r, z)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0)
        p = tuple(zz + beta * pp for zz, pp in zip(z, p))
        return x, r, p, rz_new

    x, _, _, _ = lax.fori_loop(0, iters, body, (x, r, z, rz))
    return x


def tiled_pcg_flow_llin4(mesh: Mesh, u, v, du, dv, m, cu, cv, duc, dvc,
                         ww, wn, we, ws, iters: int, omega: float = 1.9):
    """Tiled drop-in for ``pcg_flow_llin4`` over a ("ty", "tx") mesh."""
    del omega
    spec = P("ty", "tx")
    fn = shard_map(
        partial(_tiled_flow_pcg_local, iters=iters),
        mesh=mesh,
        in_specs=(spec,) * 13,
        out_specs=(spec, spec),
    )
    return jax.jit(fn)(u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws)


# ---------------------------------------------------------------------------
# Generic tiled red-black relaxation: any kernels/sweeps.py factory
# ---------------------------------------------------------------------------


def _tiled_shift(dr: int, dc: int):
    """Neighbour-value shift with cross-tile halo exchange (the tiled
    equivalent of core.grid.shift_*; global edges replicate)."""

    def shift(x):
        xp = halo_exchange(x, 1)
        h, w = x.shape[-2:]
        return xp[..., 1 + dr:1 + dr + h, 1 + dc:1 + dc + w]

    return shift


def _tiled_sweep_aux(h: int, w: int):
    """SweepAux (kernels/sweeps.py contract) for a shard_map tile body."""
    from pde_tpu.kernels.tiled import SweepAux

    mask0, mask1 = _global_masks(h, w)
    maskf0, maskf1 = _full_masks(h, w)
    left, top, right, bot = _global_edge_masks(h, w)
    return SweepAux(
        mask0=mask0,
        mask1=mask1,
        border=_tiled_replicate_border,
        maskf0=maskf0,
        maskf1=maskf1,
        edge_w=left,
        edge_n=top,
        edge_e=right,
        edge_s=bot,
        shift_w=_tiled_shift(0, -1),
        shift_n=_tiled_shift(-1, 0),
        shift_e=_tiled_shift(0, 1),
        shift_s=_tiled_shift(1, 0),
    )


def tiled_relax_sharded(mesh: Mesh, sweep_factory, fields, n_mut: int,
                        iters: int, omega: float):
    """Run ``iters`` global red-black sweeps of any ``kernels/sweeps.py``
    factory with (H, W) fields sharded over mesh axes ("ty", "tx").

    Identical numerics to the single-chip solvers: each sweep's halo
    exchange delivers refreshed opposite-color neighbours, and the global
    1-px replicated border is re-filled on mesh-edge tiles
    (opticalflowSolvers.c:156-179). Returns the n_mut relaxed fields."""
    prepare, sweep = sweep_factory(float(omega))

    def local(*fs):
        mut = list(fs[:n_mut])
        const = list(fs[n_mut:])
        h, w = mut[0].shape[-2:]
        aux = _tiled_sweep_aux(h, w)
        if prepare is not None:
            const = prepare(const, aux)

        def body(_, state):
            return tuple(sweep(list(state), const, aux))

        return lax.fori_loop(0, iters, body, tuple(mut))

    spec = P("ty", "tx")
    fn = shard_map(local, mesh=mesh, in_specs=(spec,) * len(fields),
                   out_specs=(spec,) * n_mut)
    return jax.jit(fn)(*fields)


def tiled_sor_flow_elin4(mesh, u, v, m, cu, cv, duc, dvc, ww, wn, we, ws,
                         iters: int, omega: float):
    from pde_tpu.kernels import sweeps
    return tiled_relax_sharded(
        mesh, sweeps.flow_elin4_sweep,
        (u, v, m, cu, cv, duc, dvc, ww, wn, we, ws), 2, iters, omega)


def tiled_sor_flow_llin8(mesh, u, v, du, dv, m, cu, cv, duc, dvc,
                         ww, wnw, wn, wne, we, wse, ws, wsw,
                         iters: int, omega: float):
    from pde_tpu.kernels import sweeps
    return tiled_relax_sharded(
        mesh, sweeps.flow_llin8_sweep,
        (du, dv, u, v, m, cu, cv, duc, dvc,
         ww, wnw, wn, wne, we, wse, ws, wsw), 2, iters, omega)


def tiled_sor_disp_llin4(mesh, u, du, cu, duc, ww, wn, we, ws,
                         iters: int, omega: float):
    from pde_tpu.kernels import sweeps
    return tiled_relax_sharded(
        mesh, sweeps.disp_llin4_sweep,
        (du, u, cu, duc, ww, wn, we, ws), 1, iters, omega)[0]


def tiled_sor_pde4(mesh, x, trace, b, ww, wn, we, ws,
                   iters: int, omega: float):
    from pde_tpu.kernels import sweeps
    return tiled_relax_sharded(
        mesh, sweeps.pde4_sweep,
        (x, trace, b, ww, wn, we, ws), 1, iters, omega)[0]
