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


def _line_pass_llin(f, df, other_rhs, cu, duc, ww, wn, we, ws, omega, parity, vertical):
    """One zebra half-pass of the llin4 line relaxation for one field.

    f: frozen base field (U); df: current increment; other_rhs: Cu - M*dV
    style data RHS (with NaN where data invalid); returns updated df.
    """
    h, w = f.shape[-2:]
    # all four weights are edge-zeroed in the reference's line routines:
    # west/east/north/south specialisations drop the out-facing term from
    # both the diagonal and the RHS (e.g. westColumn_llin4,
    # opticalflowSolvers.c:2415-2520: b = wS+wE at the NW corner).
    wn_l = _edge_zero(wn, -2, "first")
    ws_l = _edge_zero(ws, -2, "last")
    ww_l = _edge_zero(ww, -1, "first")
    we_l = _edge_zero(we, -1, "last")
    b = wn_l + ws_l + ww_l + we_l
    if vertical:
        # solve along rows (axis -2); perpendicular neighbours are W/E
        perp = ww_l * (shift_w(f) - f + shift_w(df)) + we_l * (shift_e(f) - f + shift_e(df))
        along = wn_l * (shift_n(f) - f) + ws_l * (shift_s(f) - f)
        a, c = -wn_l, -ws_l
        axis = -2
        lines = jnp.arange(w)[None, :] % 2
    else:
        perp = wn_l * (shift_n(f) - f + shift_n(df)) + ws_l * (shift_s(f) - f + shift_s(df))
        along = ww_l * (shift_w(f) - f) + we_l * (shift_e(f) - f)
        a, c = -ww_l, -we_l
        axis = -1
        lines = (jnp.arange(h) % 2)[:, None]

    valid = ~jnp.isnan(cu)
    b = b + jnp.where(valid, jnp.nan_to_num(duc), 0.0)
    d = perp + along + jnp.where(valid, jnp.nan_to_num(other_rhs), 0.0)
    x = thomas_solve(a, b, c, d, axis=axis)
    blended = omega * x + (1.0 - omega) * df
    return jnp.where(lines == parity, blended, df)


@partial(jax.jit, static_argnames=("iters",))
def alr_flow_llin4(u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws, iters: int, omega: float):
    """Zebra ALR for the late-linearised flow pair (cf. GS_ALR_SOR_llin4_2d).

    Sweep order mirrors the reference (opticalflowSolvers.c:238-257):
    U columns, V columns, V rows, U rows.
    """
    m0 = jnp.nan_to_num(m)

    def body(_, state):
        du_, dv_ = state
        for par in (0, 1):
            du_ = _line_pass_llin(u, du_, cu - m0 * dv_, cu, duc, ww, wn, we, ws, omega, par, True)
        for par in (0, 1):
            dv_ = _line_pass_llin(v, dv_, cv - m0 * du_, cv, dvc, ww, wn, we, ws, omega, par, True)
        for par in (0, 1):
            dv_ = _line_pass_llin(v, dv_, cv - m0 * du_, cv, dvc, ww, wn, we, ws, omega, par, False)
        for par in (0, 1):
            du_ = _line_pass_llin(u, du_, cu - m0 * dv_, cu, duc, ww, wn, we, ws, omega, par, False)
        return du_, dv_

    return lax.fori_loop(0, iters, body, (du, dv))


def _zero_diag_borders(wnw, wne, wse, wsw):
    """Diagonal weights vanish wherever the diagonal neighbour is off-image."""
    wnw = _edge_zero(_edge_zero(wnw, -2, "first"), -1, "first")
    wne = _edge_zero(_edge_zero(wne, -2, "first"), -1, "last")
    wse = _edge_zero(_edge_zero(wse, -2, "last"), -1, "last")
    wsw = _edge_zero(_edge_zero(wsw, -2, "last"), -1, "first")
    return wnw, wne, wse, wsw


def _line_pass_llin8(f, df, other_rhs, cu, duc,
                     ww, wnw, wn, wne, we, wse, ws, wsw, omega, parity, vertical):
    """One zebra half-pass of the 8-neighbour llin line relaxation.

    Column solves keep N/S on the tridiagonal; W/E and the four diagonals
    couple through the RHS with their current values (the reference's
    llin8 line routines, opticalflowSolvers.c:3100-3913, do the same with
    lexicographic lag instead of zebra lag).
    """
    h, w = f.shape[-2:]
    wn_l = _edge_zero(wn, -2, "first")
    ws_l = _edge_zero(ws, -2, "last")
    ww_l = _edge_zero(ww, -1, "first")
    we_l = _edge_zero(we, -1, "last")
    wnw_l, wne_l, wse_l, wsw_l = _zero_diag_borders(wnw, wne, wse, wsw)
    b = wn_l + ws_l + ww_l + we_l + wnw_l + wne_l + wse_l + wsw_l

    def lagged(shift_fn, wgt):
        return wgt * (shift_fn(f) - f + shift_fn(df))

    def along(shift_fn, wgt):
        return wgt * (shift_fn(f) - f)

    diag = (
        lagged(lambda x: shift_n(shift_w(x)), wnw_l)
        + lagged(lambda x: shift_n(shift_e(x)), wne_l)
        + lagged(lambda x: shift_s(shift_e(x)), wse_l)
        + lagged(lambda x: shift_s(shift_w(x)), wsw_l)
    )
    if vertical:
        perp = lagged(shift_w, ww_l) + lagged(shift_e, we_l)
        line = along(shift_n, wn_l) + along(shift_s, ws_l)
        a, c = -wn_l, -ws_l
        axis = -2
        lines = jnp.arange(w)[None, :] % 2
    else:
        perp = lagged(shift_n, wn_l) + lagged(shift_s, ws_l)
        line = along(shift_w, ww_l) + along(shift_e, we_l)
        a, c = -ww_l, -we_l
        axis = -1
        lines = (jnp.arange(h) % 2)[:, None]

    valid = ~jnp.isnan(cu)
    b = b + jnp.where(valid, jnp.nan_to_num(duc), 0.0)
    d = perp + line + diag + jnp.where(valid, jnp.nan_to_num(other_rhs), 0.0)
    x = thomas_solve(a, b, c, d, axis=axis)
    blended = omega * x + (1.0 - omega) * df
    return jnp.where(lines == parity, blended, df)


@partial(jax.jit, static_argnames=("iters",))
def alr_flow_llin8(u, v, du, dv, m, cu, cv, duc, dvc,
                   ww, wnw, wn, wne, we, wse, ws, wsw, iters: int, omega: float):
    """Zebra ALR for the 8-neighbour (anisotropic) flow pair
    (cf. GS_ALR_SOR_llin8_2d, opticalflowSolvers.c:1677-). Same sweep order
    as the 4-neighbour variant: U cols, V cols, V rows, U rows."""
    m0 = jnp.nan_to_num(m)
    w8 = (ww, wnw, wn, wne, we, wse, ws, wsw)

    def body(_, state):
        du_, dv_ = state
        for par in (0, 1):
            du_ = _line_pass_llin8(u, du_, cu - m0 * dv_, cu, duc, *w8, omega, par, True)
        for par in (0, 1):
            dv_ = _line_pass_llin8(v, dv_, cv - m0 * du_, cv, dvc, *w8, omega, par, True)
        for par in (0, 1):
            dv_ = _line_pass_llin8(v, dv_, cv - m0 * du_, cv, dvc, *w8, omega, par, False)
        for par in (0, 1):
            du_ = _line_pass_llin8(u, du_, cu - m0 * dv_, cu, duc, *w8, omega, par, False)
        return du_, dv_

    return lax.fori_loop(0, iters, body, (du, dv))


@partial(jax.jit, static_argnames=("iters",))
def alr_pde8(x, trace, b, ww, wnw, wn, wne, we, wse, ws, wsw, iters: int, omega: float):
    """Zebra ALR for the 8-neighbour diagonal form (cf. GS_ALR_SOR_8_2d,
    pdeSolvers.c:344-408): lines keep N/S (or W/E) on the tridiagonal,
    all other neighbours couple through the RHS."""
    tr_nan = jnp.isnan(trace)
    h, w = x.shape[-2:]
    col_par = jnp.arange(w)[None, :] % 2
    row_par = (jnp.arange(h) % 2)[:, None]

    wn_l = _edge_zero(wn, -2, "first")
    ws_l = _edge_zero(ws, -2, "last")
    ww_l = _edge_zero(ww, -1, "first")
    we_l = _edge_zero(we, -1, "last")
    wnw_l, wne_l, wse_l, wsw_l = _zero_diag_borders(wnw, wne, wse, wsw)
    wsum = wn_l + ws_l + ww_l + we_l + wnw_l + wne_l + wse_l + wsw_l
    diag = jnp.where(tr_nan, wsum, jnp.nan_to_num(trace, nan=1.0))
    b_eff = jnp.where(tr_nan, 0.0, b)

    def diag_flux(xc):
        return (
            wnw_l * shift_n(shift_w(xc))
            + wne_l * shift_n(shift_e(xc))
            + wse_l * shift_s(shift_e(xc))
            + wsw_l * shift_s(shift_w(xc))
        )

    def vpass(xc, parity):
        d = b_eff + ww_l * shift_w(xc) + we_l * shift_e(xc) + diag_flux(xc)
        sol = thomas_solve(-wn_l, diag, -ws_l, d, axis=-2)
        blended = omega * sol + (1.0 - omega) * xc
        return jnp.where(col_par == parity, blended, xc)

    def hpass(xc, parity):
        d = b_eff + wn_l * shift_n(xc) + ws_l * shift_s(xc) + diag_flux(xc)
        sol = thomas_solve(-ww_l, diag, -we_l, d, axis=-1)
        blended = omega * sol + (1.0 - omega) * xc
        return jnp.where(row_par == parity, blended, xc)

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

    def body(_, state):
        u_, v_ = state
        for par in (0, 1):
            u_ = _line_pass_llin(zero, u_, cu - m0 * v_, cu, duc, ww, wn, we, ws, omega, par, True)
        for par in (0, 1):
            v_ = _line_pass_llin(zero, v_, cv - m0 * u_, cv, dvc, ww, wn, we, ws, omega, par, True)
        for par in (0, 1):
            v_ = _line_pass_llin(zero, v_, cv - m0 * u_, cv, dvc, ww, wn, we, ws, omega, par, False)
        for par in (0, 1):
            u_ = _line_pass_llin(zero, u_, cu - m0 * v_, cu, duc, ww, wn, we, ws, omega, par, False)
        return u_, v_

    return lax.fori_loop(0, iters, body, (u, v))


@partial(jax.jit, static_argnames=("iters",))
def alr_disp_llin4(u, du, cu, duc, ww, wn, we, ws, iters: int, omega: float):
    """Zebra ALR for the scalar disparity increment (cf. disparitySolvers.c
    GS_ALR_SOR_llin4_2d:154-217: columns then rows)."""

    def body(_, du_):
        for par in (0, 1):
            du_ = _line_pass_llin(u, du_, cu, cu, duc, ww, wn, we, ws, omega, par, True)
        for par in (0, 1):
            du_ = _line_pass_llin(u, du_, cu, cu, duc, ww, wn, we, ws, omega, par, False)
        return du_

    return lax.fori_loop(0, iters, body, du)


@partial(jax.jit, static_argnames=("iters",))
def alr_pde4(x, trace, b, ww, wn, we, ws, iters: int, omega: float):
    """Zebra ALR for the diagonal form (cf. GS_ALR_SOR_4_2d): lines use
    diag TRACE, off-diag -wN/-wS (or -wW/-wE), RHS B + perpendicular flux."""
    tr_nan = jnp.isnan(trace)
    h, w = x.shape[-2:]
    col_par = jnp.arange(w)[None, :] % 2
    row_par = (jnp.arange(h) % 2)[:, None]

    wn_l = _edge_zero(wn, -2, "first")
    ws_l = _edge_zero(ws, -2, "last")
    ww_l = _edge_zero(ww, -1, "first")
    we_l = _edge_zero(we, -1, "last")
    # NaN TRACE -> pure diffusion: diag = edge-zeroed weight sum, B dropped
    # (TDMA_wcolumn_ALR_4, pdeSolvers.c:442-501)
    diag = jnp.where(tr_nan, wn_l + ws_l + ww_l + we_l, jnp.nan_to_num(trace, nan=1.0))
    b_eff = jnp.where(tr_nan, 0.0, b)

    def vpass(xc, parity):
        d = b_eff + ww_l * shift_w(xc) + we_l * shift_e(xc)
        sol = thomas_solve(-wn_l, diag, -ws_l, d, axis=-2)
        blended = omega * sol + (1.0 - omega) * xc
        return jnp.where(col_par == parity, blended, xc)

    def hpass(xc, parity):
        d = b_eff + wn_l * shift_n(xc) + ws_l * shift_s(xc)
        sol = thomas_solve(-ww_l, diag, -we_l, d, axis=-1)
        blended = omega * sol + (1.0 - omega) * xc
        return jnp.where(row_par == parity, blended, xc)

    def body(_, xc):
        xc = vpass(xc, 0)
        xc = vpass(xc, 1)
        xc = hpass(xc, 0)
        xc = hpass(xc, 1)
        return xc

    return lax.fori_loop(0, iters, body, x)
