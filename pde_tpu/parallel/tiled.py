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


# ---------------------------------------------------------------------------
# Tiled red-black SOR, late-linearised flow pair
# ---------------------------------------------------------------------------


def tiled_sor_flow_llin4(mesh: Mesh, u, v, du, dv, m, cu, cv, duc, dvc,
                         ww, wn, we, ws, iters: int, omega: float,
                         comm: bool = True):
    """Tiled drop-in for ``sor_flow_llin4``: same update, (H, W) sharded
    over mesh axes ("ty", "tx"). Runs through the temporally-blocked
    generic engine (halo exchanged once per k sweeps). comm=False is the
    benchmark-only communication-free floor (see tiled_relax_sharded)."""
    from pde_tpu.kernels import sweeps

    du2, dv2 = tiled_relax_sharded(
        mesh, sweeps.flow_llin4_sweep,
        (du, dv, u, v, m, cu, cv, duc, dvc, ww, wn, we, ws), 2, iters, omega,
        comm=comm)
    return du2, dv2


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
#
# Temporal blocking (same trick as the single-chip stripe engine,
# kernels/tiled.py): one red-black sweep has dependency radius 2, so
# exchanging a 2k-px halo once buys k *exact* local sweeps before the
# next exchange — collective count drops from 2 per sweep (every
# half-sweep refreshed the 1-px ring) to 1 per k sweeps. Halo pixels
# that lie inside the image are relaxed like real pixels and grow stale
# from the outside in; the cropped tile interior is bitwise-identical
# to the globally swept result while 2*sweeps <= halo.
# ---------------------------------------------------------------------------


RB_RADIUS = 2  # dependency radius (px) of one full red-black sweep


def _ext_sweep_aux(h: int, w: int, halo: int):
    """SweepAux for a halo-extended (h+2*halo, w+2*halo) local tile.

    Masks/edges are in GLOBAL real coordinates (off-image extended rows
    of mesh-edge tiles are excluded and stay frozen); shifts are plain
    local edge-replicating shifts — out-facing weights are zeroed at the
    global edges by each sweep's prepare_fn, so whatever a global-edge
    pixel's shift reads outside the image is multiplied by zero."""
    from pde_tpu.kernels.tiled import SweepAux

    nty = _axis_or_one("ty")
    ntx = _axis_or_one("tx")
    ti = lax.axis_index("ty") if nty > 1 else 0
    tj = lax.axis_index("tx") if ntx > 1 else 0
    gi = ti * h + jnp.arange(-halo, h + halo)[:, None]
    gj = tj * w + jnp.arange(-halo, w + halo)[None, :]
    gh, gw = nty * h, ntx * w
    hi, wi = h + 2 * halo, w + 2 * halo
    in_img = (gi >= 0) & (gi < gh) & (gj >= 0) & (gj < gw)
    inter = (gi >= 1) & (gi <= gh - 2) & (gj >= 1) & (gj <= gw - 2)
    par = (gi + gj) % 2
    top = jnp.broadcast_to((gi == 0) & in_img, (hi, wi))
    bot = jnp.broadcast_to((gi == gh - 1) & in_img, (hi, wi))
    left = jnp.broadcast_to((gj == 0) & in_img, (hi, wi))
    right = jnp.broadcast_to((gj == gw - 1) & in_img, (hi, wi))

    def border(x):
        x = jnp.where(top, _shift_s_local(x), jnp.where(bot, _shift_n_local(x), x))
        return jnp.where(left, _shift_e_local(x), jnp.where(right, _shift_w_local(x), x))

    return SweepAux(
        mask0=inter & (par == 0), mask1=inter & (par == 1), border=border,
        maskf0=in_img & (par == 0), maskf1=in_img & (par == 1),
        edge_w=left, edge_n=top, edge_e=right, edge_s=bot,
    )


def _shift_w_local(x):
    return jnp.concatenate([x[..., :, :1], x[..., :, :-1]], axis=-1)


def _shift_e_local(x):
    return jnp.concatenate([x[..., :, 1:], x[..., :, -1:]], axis=-1)


def _shift_n_local(x):
    return jnp.concatenate([x[..., :1, :], x[..., :-1, :]], axis=-2)


def _shift_s_local(x):
    return jnp.concatenate([x[..., 1:, :], x[..., -1:, :]], axis=-2)


def tiled_relax_sharded(mesh: Mesh, sweep_factory, fields, n_mut: int,
                        iters: int, omega: float, k: int = 4,
                        comm: bool = True):
    """Run ``iters`` global red-black sweeps of any ``kernels/sweeps.py``
    factory with (H, W) fields sharded over mesh axes ("ty", "tx").

    Identical numerics to the single-chip solvers; the global 1-px
    replicated border is re-filled on mesh-edge tiles
    (opticalflowSolvers.c:156-179). Halos are exchanged once per ``k``
    sweeps (2k-px wide, see module note); pass k=1 for the classic
    per-sweep exchange. Returns the n_mut relaxed fields.

    comm=False replaces the halo exchange with a local replicate-pad of
    identical shape/arithmetic (halo.halo_local) — WRONG at tile seams,
    benchmark-only: it measures the communication-free floor."""
    prepare, sweep = sweep_factory(float(omega))
    from pde_tpu.parallel.halo import halo_local

    exchange = halo_exchange if comm else halo_local

    def local(*fs):
        mut = list(fs[:n_mut])
        const = list(fs[n_mut:])
        h, w = mut[0].shape[-2:]
        # halo cannot exceed the tile (ppermute moves one step per call)
        k_eff = max(1, min(k, iters, h // RB_RADIUS, w // RB_RADIUS))

        def chunk(mut, kc: int):
            halo = RB_RADIUS * kc
            aux = _ext_sweep_aux(h, w, halo)
            ext = [exchange(x, halo) for x in mut]
            cst = [exchange(x, halo) for x in const]
            if prepare is not None:
                cst = prepare(cst, aux)

            def body(_, state):
                return tuple(sweep(list(state), cst, aux))

            out = lax.fori_loop(0, kc, body, tuple(ext))
            return [x[..., halo:halo + h, halo:halo + w] for x in out]

        n_full, rem = divmod(iters, k_eff)
        for _ in range(n_full):
            mut = chunk(mut, k_eff)
        if rem:
            mut = chunk(mut, rem)
        return tuple(mut)

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
