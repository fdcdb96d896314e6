"""Batched tridiagonal (Thomas) solves and zebra alternating-line relaxation.

The reference's ALR ("solver=2") relaxes whole rows/columns with a Thomas
solve, sweeping lines sequentially (block Gauss-Seidel,
opticalflowSolvers.c:1763-3913). On TPU we solve *all* lines of one
parity simultaneously — the scan runs along the line while the other
image axis rides the 128-wide vector lanes — and recover the
Gauss-Seidel character with zebra (even-lines-then-odd-lines) ordering.
Mathematically the same smoother family; iteration counts are the tunable
that absorbs the (small) convergence-constant difference.

Line-system coefficients mirror middleColumn_llin4
(opticalflowSolvers.c:2528-2640): diag ``Σw (+ data)``, off-diags
``-wN/-wS`` (one-sided at the image edge), RHS couples the perpendicular
neighbours with their current values, and the Thomas solution is
SOR-blended with the previous iterate.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from pde_tpu.core.grid import shift_w, shift_e, shift_n, shift_s


def thomas_solve(a, b, c, d, axis: int = -2):
    """Solve tridiagonal systems along ``axis``.

    a: sub-diagonal coefficient at each point (a[0] ignored),
    b: diagonal, c: super-diagonal (c[-1] ignored), d: RHS.
    All arrays share a shape; the solve runs independently over every
    other axis (those become vector lanes on the VPU).

    On a TPU backend the solve dispatches to :func:`thomas_solve_cr`
    (pure-XLA cyclic reduction); on CPU it runs the sequential
    :func:`thomas_solve_scan`. All paths agree to float32
    elimination-order noise (~2e-5 on unit-scale systems,
    tests/test_solvers.py), not bitwise.

    A VMEM-resident Pallas CR kernel exists (kernels/tdma_pallas.py,
    opt-in via PDE_TPU_PALLAS_TDMA=1) but measured SLOWER than the XLA
    CR on v5e (1.47 ms vs 0.94 ms per isolated 1024x1024 solve): XLA
    fuses the CR levels with the surrounding coefficient assembly,
    which the custom-call boundary forfeits, and Mosaic's no-reuse
    scoped-vmem stack forces narrow (DMA-latency-bound) stripes. Kept
    with tests as the starting point for a future fused line-sweep
    kernel.
    """
    if jax.default_backend() not in ("cpu",):
        if os.environ.get("PDE_TPU_PALLAS_TDMA") == "1":
            out = _thomas_pallas_maybe(a, b, c, d, axis)
            if out is not None:
                return out
        return thomas_solve_cr(a, b, c, d, axis)
    return thomas_solve_scan(a, b, c, d, axis)


def _thomas_pallas_maybe(a, b, c, d, axis: int):
    """Route to the Pallas CR kernel when the shape pays for it and the
    Pallas opt-out (kernels/dispatch.xla_solvers) is not active."""
    from pde_tpu.kernels.dispatch import pallas_active
    from pde_tpu.kernels.tdma_pallas import plan_cols, tridiag_cr_pallas

    if not pallas_active():
        return None
    length = a.shape[axis]
    n_lines = a.size // max(length, 1)
    if length < 128 or n_lines < 128:
        return None  # too small: the XLA CR is already fine
    hp = 1 << max(1, (length - 1).bit_length())
    if plan_cols(hp) is None:
        return None
    def to2d(x):
        return jnp.moveaxis(x, axis, 0).reshape(length, -1)

    shape = jnp.moveaxis(a, axis, 0).shape
    x = tridiag_cr_pallas(to2d(a), to2d(b), to2d(c), to2d(d))
    return jnp.moveaxis(x.reshape(shape), 0, axis)


def thomas_solve_cr(a, b, c, d, axis: int = -2):
    """Cyclic-reduction tridiagonal solve (TPU hot path).

    The scan recurrence is a latency chain of H dependent steps — on TPU
    each step is a (1, lanes) VPU op waiting on the previous one (~100
    Mpix-iters/s measured through the ALR solvers). Cyclic reduction
    restructures the same elimination into log2(H) *fully vectorized*
    levels: eliminate the odd rows (a rank-halving Schur complement),
    recurse on the even rows, back-substitute. ~2x the flops of Thomas,
    zero sequential chains — the classic parallel-tridiagonal trade
    (Hockney-Golub), and exactly what the VPU wants. Stable for the
    diagonally-dominant systems every caller in this engine builds
    (line diagonals are weight sums + nonneg data terms; AOS diagonals
    are 2 + nu*(Dp+Dn)).
    """
    a = jnp.moveaxis(a, axis, 0)
    b = jnp.moveaxis(b, axis, 0)
    c = jnp.moveaxis(c, axis, 0)
    d = jnp.moveaxis(d, axis, 0)
    # the a[0] / c[-1] entries are ignored by contract (may hold junk)
    zero_row = jnp.zeros_like(a[:1])
    a = jnp.concatenate([zero_row, a[1:]], 0)
    c = jnp.concatenate([c[:-1], zero_row], 0)
    x = _cr_level(a, b, c, d)
    return jnp.moveaxis(x, 0, axis)


def _cr_level(a, b, c, d):
    h = a.shape[0]
    if h == 1:
        return d / b
    if h == 2:
        # [[b0, c0], [a1, b1]] direct 2x2 solve
        det = b[0] * b[1] - c[0] * a[1]
        x0 = (d[0] * b[1] - c[0] * d[1]) / det
        x1 = (b[0] * d[1] - d[0] * a[1]) / det
        return jnp.stack([x0, x1], 0)
    if h % 2 == 1:
        # append an identity row (x_pad = 0, decoupled)
        a = jnp.concatenate([a, jnp.zeros_like(a[:1])], 0)
        b = jnp.concatenate([b, jnp.ones_like(b[:1])], 0)
        c = jnp.concatenate([c, jnp.zeros_like(c[:1])], 0)
        d = jnp.concatenate([d, jnp.zeros_like(d[:1])], 0)
        return _cr_level(a, b, c, d)[:h]

    ae, be, ce, de = a[0::2], b[0::2], c[0::2], d[0::2]
    ao, bo, co, do_ = a[1::2], b[1::2], c[1::2], d[1::2]
    # odd neighbours of even row 2j: previous = 2j-1 (odd j-1), next = 2j+1
    bprev = jnp.concatenate([jnp.ones_like(bo[:1]), bo[:-1]], 0)
    cprev = jnp.concatenate([jnp.zeros_like(co[:1]), co[:-1]], 0)
    dprev = jnp.concatenate([jnp.zeros_like(do_[:1]), do_[:-1]], 0)
    aprev = jnp.concatenate([jnp.zeros_like(ao[:1]), ao[:-1]], 0)
    alpha = ae / bprev          # ae[0] == 0 -> alpha[0] == 0
    gamma = ce / bo
    a2 = -alpha * aprev
    c2 = -gamma * co
    b2 = be - alpha * cprev - gamma * ao
    d2 = de - alpha * dprev - gamma * do_
    xe = _cr_level(a2, b2, c2, d2)
    # back-substitute the odd rows from their even neighbours
    xnext = jnp.concatenate([xe[1:], jnp.zeros_like(xe[:1])], 0)
    xo = (do_ - ao * xe - co * xnext) / bo
    return jnp.stack([xe, xo], 1).reshape((-1,) + xe.shape[1:])


class TridiagFactor:
    """Opaque reusable elimination of a tridiagonal (a, b, c).

    The zebra/ADI solvers apply the SAME line systems to many right-hand
    sides (every CG iteration, every ALR sweep: the coefficients are
    fixed for the whole solver call, only the RHS changes). Factoring
    once and replaying only the d-pass removes ~2/3 of the flops and all
    of the divides from the hot path — the classic "factorize once,
    solve many" restructure, applied to cyclic reduction on TPU and to
    the Thomas scan on CPU. Same elimination order as thomas_solve_cr /
    thomas_solve_scan (the CR path trades per-solve divides for
    precomputed reciprocals: ~1 ulp relative difference).
    """

    __slots__ = ("method", "levels", "base", "axis_len", "cp", "denom", "a")

    def __init__(self, method):
        self.method = method
        self.levels = []
        self.base = None


def tridiag_factor(a, b, c, axis: int = -2, method: str | None = None):
    """Precompute the elimination of tridiagonal systems along ``axis``.

    Same contract as :func:`thomas_solve` (a[0]/c[-1] ignored, systems
    independent over the other axes); returns a :class:`TridiagFactor`
    consumed by :func:`tridiag_solve`. Dispatches like thomas_solve:
    cyclic reduction off-CPU, sequential Thomas scan on CPU (``method``
    in {"cr", "scan"} overrides, used by tests).
    """
    a = jnp.moveaxis(a, axis, 0)
    b = jnp.moveaxis(b, axis, 0)
    c = jnp.moveaxis(c, axis, 0)
    zero_row = jnp.zeros_like(a[:1])
    a = jnp.concatenate([zero_row, a[1:]], 0)
    c = jnp.concatenate([c[:-1], zero_row], 0)
    if method is None:
        method = "scan" if jax.default_backend() == "cpu" else "cr"
    if method == "cr":
        fac = TridiagFactor("cr")
        while a.shape[0] > 2:
            h = a.shape[0]
            if h % 2 == 1:
                a = jnp.concatenate([a, jnp.zeros_like(a[:1])], 0)
                b = jnp.concatenate([b, jnp.ones_like(b[:1])], 0)
                c = jnp.concatenate([c, jnp.zeros_like(c[:1])], 0)
                fac.levels.append(("pad", h))
                continue
            ae, be, ce = a[0::2], b[0::2], c[0::2]
            ao, bo, co = a[1::2], b[1::2], c[1::2]
            bprev = jnp.concatenate([jnp.ones_like(bo[:1]), bo[:-1]], 0)
            cprev = jnp.concatenate([jnp.zeros_like(co[:1]), co[:-1]], 0)
            aprev = jnp.concatenate([jnp.zeros_like(ao[:1]), ao[:-1]], 0)
            alpha = ae / bprev
            gamma = ce / bo
            a2 = -alpha * aprev
            c2 = -gamma * co
            b2 = be - alpha * cprev - gamma * ao
            fac.levels.append(("reduce", alpha, gamma, ao, co, 1.0 / bo))
            a, b, c = a2, b2, c2
        if a.shape[0] == 1:
            fac.base = ("b1", 1.0 / b)
        else:
            det = b[0] * b[1] - c[0] * a[1]
            fac.base = ("b2", b[0], b[1], a[1], c[0], 1.0 / det)
        return fac

    fac = TridiagFactor("scan")

    def fwd(cp_prev, inp):
        a_i, b_i, c_i = inp
        denom = 1.0 / (b_i - cp_prev * a_i)
        cp = c_i * denom
        return cp, (cp, denom)

    _, (cp, denom) = lax.scan(fwd, jnp.zeros_like(b[0]), (a, b, c))
    fac.cp, fac.denom, fac.a = cp, denom, a
    return fac


def tridiag_solve(fac: TridiagFactor, d, axis: int = -2):
    """Solve with a precomputed :func:`tridiag_factor` for a new RHS."""
    d = jnp.moveaxis(d, axis, 0)
    if fac.method == "cr":
        stack = []
        for lvl in fac.levels:
            if lvl[0] == "pad":
                d = jnp.concatenate([d, jnp.zeros_like(d[:1])], 0)
                stack.append(("pad", lvl[1]))
                continue
            _, alpha, gamma, ao, co, inv_bo = lvl
            de, do_ = d[0::2], d[1::2]
            dprev = jnp.concatenate([jnp.zeros_like(do_[:1]), do_[:-1]], 0)
            stack.append(("reduce", do_, ao, co, inv_bo))
            d = de - alpha * dprev - gamma * do_
        kind = fac.base[0]
        if kind == "b1":
            x = d * fac.base[1]
        else:
            _, b0, b1, a1, c0, inv_det = fac.base
            x0 = (d[0] * b1 - c0 * d[1]) * inv_det
            x1 = (b0 * d[1] - d[0] * a1) * inv_det
            x = jnp.stack([x0, x1], 0)
        for lvl in reversed(stack):
            if lvl[0] == "pad":
                x = x[: lvl[1]]
                continue
            _, do_, ao, co, inv_bo = lvl
            xnext = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], 0)
            xo = (do_ - ao * x - co * xnext) * inv_bo
            x = jnp.stack([x, xo], 1).reshape((-1,) + x.shape[1:])
        return jnp.moveaxis(x, 0, axis)

    def dfwd(dp_prev, inp):
        a_i, denom_i, d_i = inp
        dp = (d_i - dp_prev * a_i) * denom_i
        return dp, dp

    _, dp = lax.scan(dfwd, jnp.zeros_like(d[0]), (fac.a, fac.denom, d))

    def bwd(x_next, inp):
        cp_i, dp_i = inp
        x = dp_i - cp_i * x_next
        return x, x

    _, xs = lax.scan(bwd, jnp.zeros_like(d[0]), (fac.cp, dp), reverse=True)
    return jnp.moveaxis(xs, 0, axis)


def slice_lines(x, parity: int, vertical: bool):
    """The lines of one zebra parity: columns ``parity::2`` (vertical
    solves) or rows ``parity::2`` (horizontal)."""
    return x[..., parity::2] if vertical else x[..., parity::2, :]


def scatter_lines(x, val, parity: int, vertical: bool):
    """Write ``val`` back into the parity lines of ``x``."""
    if vertical:
        return x.at[..., parity::2].set(val)
    return x.at[..., parity::2, :].set(val)


def line_factors(a, b, c, vertical: bool):
    """Per-parity factors for zebra line solves.

    A zebra half-pass only keeps the solution on lines of one parity —
    solving the other half is pure waste. Factor the two half-width
    line systems once; every sweep then slices its RHS to the parity
    lines, replays the d-pass, and scatters back (identical per-line
    arithmetic to the full-width solve: lines are independent systems).
    """
    axis = -2 if vertical else -1
    return tuple(
        tridiag_factor(
            slice_lines(a, p, vertical),
            slice_lines(b, p, vertical),
            slice_lines(c, p, vertical),
            axis=axis,
        )
        for p in (0, 1)
    )


def line_solve(facs, d_full, parity: int, vertical: bool):
    """Solve the parity lines given full-field RHS ``d_full``."""
    axis = -2 if vertical else -1
    return tridiag_solve(facs[parity], slice_lines(d_full, parity, vertical),
                         axis=axis)


def thomas_solve_scan(a, b, c, d, axis: int = -2):
    """Reference lax.scan implementation (used on CPU and as the Pallas
    kernel's parity oracle in tests)."""
    a = jnp.moveaxis(a, axis, 0)
    b = jnp.moveaxis(b, axis, 0)
    c = jnp.moveaxis(c, axis, 0)
    d = jnp.moveaxis(d, axis, 0)

    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        a_i, b_i, c_i, d_i = inp
        denom = 1.0 / (b_i - cp_prev * a_i)
        cp = c_i * denom
        dp = (d_i - dp_prev * a_i) * denom
        return (cp, dp), (cp, dp)

    zeros = jnp.zeros_like(b[0])
    _, (cp, dp) = lax.scan(fwd, (zeros, zeros), (a, b, c, d))

    def bwd(x_next, inp):
        cp_i, dp_i = inp
        x = dp_i - cp_i * x_next
        return x, x

    _, xs = lax.scan(bwd, zeros, (cp, dp), reverse=True)
    return jnp.moveaxis(xs, 0, axis)


def _edge_zero(w, axis, side):
    """Zero the first/last slice along axis (one-sided line ends)."""
    idx = [slice(None)] * w.ndim
    idx[axis] = 0 if side == "first" else -1
    return w.at[tuple(idx)].set(0.0)


class _LlinPlan:
    """Loop-invariant pieces of one field's llin zebra relaxation.

    All four weights are edge-zeroed as in the reference's line routines:
    the west/east/north/south specialisations drop the out-facing term
    from both the diagonal and the RHS (e.g. westColumn_llin4,
    opticalflowSolvers.c:2415-2520: b = wS+wE at the NW corner). The
    line diagonal ``Σw + data``, the base-field flux ``Σ w_z (f_z − f)``,
    the masked data RHS, and the tridiagonal factorisations are all
    fixed for the whole solver call — only the increment lag changes per
    sweep, so each zebra half-pass replays just the RHS d-pass on the
    parity lines (:func:`line_factors`).
    """

    __slots__ = ("w4", "base", "mu", "fv", "fh", "omega")

    def __init__(self, f, cuf, ducf, m0, w4_edge, wsum, omega, extra_b=0.0):
        ww_l, wn_l, we_l, ws_l = w4_edge
        self.w4 = w4_edge
        self.omega = omega
        valid = ~jnp.isnan(cuf)
        b = wsum + jnp.where(valid, jnp.nan_to_num(ducf), 0.0) + extra_b
        flux = (
            ww_l * (shift_w(f) - f)
            + wn_l * (shift_n(f) - f)
            + we_l * (shift_e(f) - f)
            + ws_l * (shift_s(f) - f)
        )
        self.base = flux + jnp.where(valid, jnp.nan_to_num(cuf), 0.0)
        self.mu = None if m0 is None else jnp.where(valid, m0, 0.0)
        self.fv = line_factors(-wn_l, b, -ws_l, True)
        self.fh = line_factors(-ww_l, b, -we_l, False)

    def rhs_lag(self, df, vertical):
        ww_l, wn_l, we_l, ws_l = self.w4
        if vertical:
            return ww_l * shift_w(df) + we_l * shift_e(df)
        return wn_l * shift_n(df) + ws_l * shift_s(df)

    def sweep(self, df, other, parity, vertical, extra=0.0):
        d = self.base + self.rhs_lag(df, vertical) + extra
        if self.mu is not None:
            d = d - self.mu * other
        x = line_solve(self.fv if vertical else self.fh, d, parity, vertical)
        blended = self.omega * x + (1.0 - self.omega) * slice_lines(df, parity, vertical)
        return scatter_lines(df, blended, parity, vertical)


def _edge_zeroed_w4(ww, wn, we, ws):
    ww_l = _edge_zero(ww, -1, "first")
    wn_l = _edge_zero(wn, -2, "first")
    we_l = _edge_zero(we, -1, "last")
    ws_l = _edge_zero(ws, -2, "last")
    return (ww_l, wn_l, we_l, ws_l), ww_l + wn_l + we_l + ws_l


@partial(jax.jit, static_argnames=("iters",))
def alr_flow_llin4(u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws, iters: int, omega: float):
    """Zebra ALR for the late-linearised flow pair (cf. GS_ALR_SOR_llin4_2d).

    Sweep order mirrors the reference (opticalflowSolvers.c:238-257):
    U columns, V columns, V rows, U rows.
    """
    m0 = jnp.nan_to_num(m)
    w4, wsum = _edge_zeroed_w4(ww, wn, we, ws)
    pu = _LlinPlan(u, cu, duc, m0, w4, wsum, omega)
    pv = _LlinPlan(v, cv, dvc, m0, w4, wsum, omega)

    def body(_, state):
        du_, dv_ = state
        for par in (0, 1):
            du_ = pu.sweep(du_, dv_, par, True)
        for par in (0, 1):
            dv_ = pv.sweep(dv_, du_, par, True)
        for par in (0, 1):
            dv_ = pv.sweep(dv_, du_, par, False)
        for par in (0, 1):
            du_ = pu.sweep(du_, dv_, par, False)
        return du_, dv_

    return lax.fori_loop(0, iters, body, (du, dv))


def _zero_diag_borders(wnw, wne, wse, wsw):
    """Diagonal weights vanish wherever the diagonal neighbour is off-image."""
    wnw = _edge_zero(_edge_zero(wnw, -2, "first"), -1, "first")
    wne = _edge_zero(_edge_zero(wne, -2, "first"), -1, "last")
    wse = _edge_zero(_edge_zero(wse, -2, "last"), -1, "last")
    wsw = _edge_zero(_edge_zero(wsw, -2, "last"), -1, "first")
    return wnw, wne, wse, wsw


def _diag_flux_fn(wnw_l, wne_l, wse_l, wsw_l):
    def dflux(x):
        return (
            wnw_l * shift_n(shift_w(x))
            + wne_l * shift_n(shift_e(x))
            + wse_l * shift_s(shift_e(x))
            + wsw_l * shift_s(shift_w(x))
        )

    return dflux


@partial(jax.jit, static_argnames=("iters",))
def alr_flow_llin8(u, v, du, dv, m, cu, cv, duc, dvc,
                   ww, wnw, wn, wne, we, wse, ws, wsw, iters: int, omega: float):
    """Zebra ALR for the 8-neighbour (anisotropic) flow pair
    (cf. GS_ALR_SOR_llin8_2d, opticalflowSolvers.c:1677-). Same sweep order
    as the 4-neighbour variant: U cols, V cols, V rows, U rows. Column
    solves keep N/S on the tridiagonal; W/E and the four diagonals couple
    through the RHS with their current values (the reference's llin8 line
    routines, opticalflowSolvers.c:3100-3913, do the same with
    lexicographic lag instead of zebra lag)."""
    m0 = jnp.nan_to_num(m)
    w4, wsum4 = _edge_zeroed_w4(ww, wn, we, ws)
    wnw_l, wne_l, wse_l, wsw_l = _zero_diag_borders(wnw, wne, wse, wsw)
    dsum = wnw_l + wne_l + wse_l + wsw_l
    dflux = _diag_flux_fn(wnw_l, wne_l, wse_l, wsw_l)

    def diag_base(f):
        # f-part of the lagged diagonal coupling: Σ w_d (f_d − f)
        return dflux(f) - dsum * f

    pu = _LlinPlan(u, cu, duc, m0, w4, wsum4, omega, extra_b=dsum)
    pv = _LlinPlan(v, cv, dvc, m0, w4, wsum4, omega, extra_b=dsum)
    pu.base = pu.base + diag_base(u)
    pv.base = pv.base + diag_base(v)

    def body(_, state):
        du_, dv_ = state
        for par in (0, 1):
            du_ = pu.sweep(du_, dv_, par, True, extra=dflux(du_))
        for par in (0, 1):
            dv_ = pv.sweep(dv_, du_, par, True, extra=dflux(dv_))
        for par in (0, 1):
            dv_ = pv.sweep(dv_, du_, par, False, extra=dflux(dv_))
        for par in (0, 1):
            du_ = pu.sweep(du_, dv_, par, False, extra=dflux(du_))
        return du_, dv_

    return lax.fori_loop(0, iters, body, (du, dv))


@partial(jax.jit, static_argnames=("iters",))
def alr_pde8(x, trace, b, ww, wnw, wn, wne, we, wse, ws, wsw, iters: int, omega: float):
    """Zebra ALR for the 8-neighbour diagonal form (cf. GS_ALR_SOR_8_2d,
    pdeSolvers.c:344-408): lines keep N/S (or W/E) on the tridiagonal,
    all other neighbours couple through the RHS."""
    tr_nan = jnp.isnan(trace)
    (ww_l, wn_l, we_l, ws_l), wsum4 = _edge_zeroed_w4(ww, wn, we, ws)
    wnw_l, wne_l, wse_l, wsw_l = _zero_diag_borders(wnw, wne, wse, wsw)
    wsum = wsum4 + wnw_l + wne_l + wse_l + wsw_l
    diag = jnp.where(tr_nan, wsum, jnp.nan_to_num(trace, nan=1.0))
    b_eff = jnp.where(tr_nan, 0.0, b)
    dflux = _diag_flux_fn(wnw_l, wne_l, wse_l, wsw_l)
    fv = line_factors(-wn_l, diag, -ws_l, True)
    fh = line_factors(-ww_l, diag, -we_l, False)

    def vpass(xc, parity):
        d = b_eff + ww_l * shift_w(xc) + we_l * shift_e(xc) + dflux(xc)
        sol = line_solve(fv, d, parity, True)
        blended = omega * sol + (1.0 - omega) * slice_lines(xc, parity, True)
        return scatter_lines(xc, blended, parity, True)

    def hpass(xc, parity):
        d = b_eff + wn_l * shift_n(xc) + ws_l * shift_s(xc) + dflux(xc)
        sol = line_solve(fh, d, parity, False)
        blended = omega * sol + (1.0 - omega) * slice_lines(xc, parity, False)
        return scatter_lines(xc, blended, parity, False)

    def body(_, xc):
        xc = vpass(xc, 0)
        xc = vpass(xc, 1)
        xc = hpass(xc, 0)
        xc = hpass(xc, 1)
        return xc

    return lax.fori_loop(0, iters, body, x)


@partial(jax.jit, static_argnames=("iters",))
def alr_flow_elin4(u, v, m, cu, cv, duc, dvc, ww, wn, we, ws, iters: int, omega: float):
    """Zebra ALR for the early-linearised pair (cf. GS_ALR_SOR_elin4_2d).

    Early linearisation solves U directly: expressed through the llin core
    with a zero base field so ``shift(f)-f`` vanishes and ``df`` is U.
    """
    zero = jnp.zeros_like(u)
    m0 = jnp.nan_to_num(m)
    w4, wsum = _edge_zeroed_w4(ww, wn, we, ws)
    pu = _LlinPlan(zero, cu, duc, m0, w4, wsum, omega)
    pv = _LlinPlan(zero, cv, dvc, m0, w4, wsum, omega)

    def body(_, state):
        u_, v_ = state
        for par in (0, 1):
            u_ = pu.sweep(u_, v_, par, True)
        for par in (0, 1):
            v_ = pv.sweep(v_, u_, par, True)
        for par in (0, 1):
            v_ = pv.sweep(v_, u_, par, False)
        for par in (0, 1):
            u_ = pu.sweep(u_, v_, par, False)
        return u_, v_

    return lax.fori_loop(0, iters, body, (u, v))


@partial(jax.jit, static_argnames=("iters",))
def alr_disp_llin4(u, du, cu, duc, ww, wn, we, ws, iters: int, omega: float):
    """Zebra ALR for the scalar disparity increment (cf. disparitySolvers.c
    GS_ALR_SOR_llin4_2d:154-217: columns then rows)."""
    w4, wsum = _edge_zeroed_w4(ww, wn, we, ws)
    pu = _LlinPlan(u, cu, duc, None, w4, wsum, omega)

    def body(_, du_):
        for par in (0, 1):
            du_ = pu.sweep(du_, None, par, True)
        for par in (0, 1):
            du_ = pu.sweep(du_, None, par, False)
        return du_

    return lax.fori_loop(0, iters, body, du)


@partial(jax.jit, static_argnames=("iters",))
def alr_pde4(x, trace, b, ww, wn, we, ws, iters: int, omega: float):
    """Zebra ALR for the diagonal form (cf. GS_ALR_SOR_4_2d): lines use
    diag TRACE, off-diag -wN/-wS (or -wW/-wE), RHS B + perpendicular flux."""
    tr_nan = jnp.isnan(trace)
    (ww_l, wn_l, we_l, ws_l), wsum = _edge_zeroed_w4(ww, wn, we, ws)
    # NaN TRACE -> pure diffusion: diag = edge-zeroed weight sum, B dropped
    # (TDMA_wcolumn_ALR_4, pdeSolvers.c:442-501)
    diag = jnp.where(tr_nan, wsum, jnp.nan_to_num(trace, nan=1.0))
    b_eff = jnp.where(tr_nan, 0.0, b)
    fv = line_factors(-wn_l, diag, -ws_l, True)
    fh = line_factors(-ww_l, diag, -we_l, False)

    def vpass(xc, parity):
        d = b_eff + ww_l * shift_w(xc) + we_l * shift_e(xc)
        sol = line_solve(fv, d, parity, True)
        blended = omega * sol + (1.0 - omega) * slice_lines(xc, parity, True)
        return scatter_lines(xc, blended, parity, True)

    def hpass(xc, parity):
        d = b_eff + wn_l * shift_n(xc) + ws_l * shift_s(xc)
        sol = line_solve(fh, d, parity, False)
        blended = omega * sol + (1.0 - omega) * slice_lines(xc, parity, False)
        return scatter_lines(xc, blended, parity, False)

    def body(_, xc):
        xc = vpass(xc, 0)
        xc = vpass(xc, 1)
        xc = hpass(xc, 0)
        xc = hpass(xc, 1)
        return xc

    return lax.fori_loop(0, iters, body, x)
