"""Solver correctness: fixed points vs direct linear solves, NaN semantics."""

import numpy as np
import jax.numpy as jnp

from pde_tpu.solvers.sor import (
    sor_pde4,
    sor_flow_elin4,
    sor_flow_llin4,
    sor_disp_llin4,
    residuals_elin4,
    lhs_elin4,
)
from pde_tpu.solvers.tdma import thomas_solve, alr_pde4, alr_flow_llin4
from pde_tpu.solvers.aos import cv_aos_step, ac_aos_step
from pde_tpu.solvers.reinit import reinit


def test_thomas_matches_dense(rng):
    n = 12
    a = rng.random(n).astype(np.float32) * 0.3
    c = rng.random(n).astype(np.float32) * 0.3
    b = 1.0 + a + c
    d = rng.standard_normal(n).astype(np.float32)
    A = np.diag(b) + np.diag(a[1:], -1) + np.diag(c[:-1], 1)
    want = np.linalg.solve(A, d)
    got = np.asarray(
        thomas_solve(
            jnp.asarray(a)[:, None], jnp.asarray(b)[:, None],
            jnp.asarray(c)[:, None], jnp.asarray(d)[:, None], axis=0,
        )
    )[:, 0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_thomas_batched_axes(rng):
    a = rng.random((6, 7)).astype(np.float32) * 0.2
    c = rng.random((6, 7)).astype(np.float32) * 0.2
    b = 1.0 + a + c
    d = rng.standard_normal((6, 7)).astype(np.float32)
    # axis -1 solve == transpose of axis -2 solve on transposed inputs
    x1 = np.asarray(thomas_solve(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d), axis=-1))
    x2 = np.asarray(
        thomas_solve(jnp.asarray(a.T), jnp.asarray(b.T), jnp.asarray(c.T), jnp.asarray(d.T), axis=-2)
    ).T
    np.testing.assert_allclose(x1, x2, rtol=1e-5)


def test_sor_pde4_fixed_point(rng):
    h, w = 10, 11
    x0 = jnp.zeros((h, w), dtype=jnp.float32)
    f = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    ww = wn = we = ws = jnp.ones((h, w), dtype=jnp.float32)
    trace = 1.0 + 4.0  # psi=1, alpha=1
    trace = jnp.full((h, w), 5.0)
    b = f
    out = sor_pde4(x0, trace, b, ww, wn, we, ws, 400, 1.75)
    o = np.asarray(out)
    # interior satisfies x = (B + Σ x_nbr)/TRACE
    lhs = 5.0 * o[1:-1, 1:-1]
    rhs = np.asarray(f)[1:-1, 1:-1] + o[:-2, 1:-1] + o[2:, 1:-1] + o[1:-1, :-2] + o[1:-1, 2:]
    np.testing.assert_allclose(lhs, rhs, atol=2e-4)
    # borders replicated
    np.testing.assert_allclose(o[0, 1:-1], o[1, 1:-1], atol=1e-6)


def test_sor_pde4_nan_trace_pure_diffusion():
    h, w = 8, 8
    x0 = jnp.zeros((h, w), dtype=jnp.float32)
    trace = jnp.full((h, w), jnp.nan)
    b = jnp.full((h, w), 100.0)  # must be ignored
    one = jnp.ones((h, w), dtype=jnp.float32)
    out = sor_pde4(x0, trace, b, one, one, one, one, 50, 1.0)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_alr_pde4_stationary_solution(rng):
    """At convergence the zebra ALR solution satisfies the full sparse
    system TRACE*x - Σ w_z x_nbr = B at *every* pixel (line systems use
    edge-zeroed weights, cf. TDMA_wcolumn_ALR_4, pdeSolvers.c:409-520)."""
    h, w = 9, 13
    x0 = jnp.zeros((h, w), dtype=jnp.float32)
    f = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    # border-zeroed weights as the denoise driver produces
    ww = jnp.ones((h, w)).at[:, 0].set(0.0)
    we = jnp.ones((h, w)).at[:, -1].set(0.0)
    wn = jnp.ones((h, w)).at[0, :].set(0.0)
    ws = jnp.ones((h, w)).at[-1, :].set(0.0)
    trace = 1.0 + (ww + wn + we + ws)
    x = np.asarray(alr_pde4(x0, trace, f, ww, wn, we, ws, 200, 1.3))
    xp = np.pad(x, 1, mode="edge")
    nbr = (
        np.asarray(ww) * xp[1:-1, :-2]
        + np.asarray(we) * xp[1:-1, 2:]
        + np.asarray(wn) * xp[:-2, 1:-1]
        + np.asarray(ws) * xp[2:, 1:-1]
    )
    resid = np.asarray(trace) * x - nbr - np.asarray(f)
    assert np.abs(resid).max() < 2e-3


def test_flow_elin4_solves_linear_system(rng):
    """On a small grid, run many sweeps and check the stationarity equations."""
    h, w = 8, 9
    u = jnp.zeros((h, w), dtype=jnp.float32)
    v = jnp.zeros((h, w), dtype=jnp.float32)
    m = jnp.asarray(0.1 * rng.standard_normal((h, w)).astype(np.float32))
    cu = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    du = jnp.full((h, w), 2.0)
    dv = jnp.full((h, w), 2.0)
    one = jnp.ones((h, w), dtype=jnp.float32)
    uo, vo = sor_flow_elin4(u, v, m, cu, cv, du, dv, one, one, one, one, 500, 1.9)
    uo_n, vo_n = np.asarray(uo), np.asarray(vo)
    i = np.s_[1:-1, 1:-1]
    nbr_u = uo_n[:-2, 1:-1] + uo_n[2:, 1:-1] + uo_n[1:-1, :-2] + uo_n[1:-1, 2:]
    want_u = (nbr_u - np.asarray(m)[i] * vo_n[i] + np.asarray(cu)[i]) / (4.0 + 2.0)
    np.testing.assert_allclose(uo_n[i], want_u, atol=3e-4)


def test_flow_llin4_zero_data_keeps_zero_increment():
    h, w = 8, 8
    z = jnp.zeros((h, w), dtype=jnp.float32)
    one = jnp.ones((h, w), dtype=jnp.float32)
    u = jnp.asarray(np.linspace(0, 1, h * w, dtype=np.float32).reshape(h, w)) * 0
    du, dv = sor_flow_llin4(u, u, z, z, z, z, z, one, one, one, one, one, one, 10, 1.9)
    np.testing.assert_allclose(np.asarray(du), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dv), 0.0, atol=1e-6)


def test_flow_llin4_nan_data_means_pure_diffusion(rng):
    h, w = 8, 8
    z = jnp.zeros((h, w), dtype=jnp.float32)
    one = jnp.ones((h, w), dtype=jnp.float32)
    nan = jnp.full((h, w), jnp.nan)
    u = jnp.zeros((h, w), dtype=jnp.float32)
    du, dv = sor_flow_llin4(u, u, z, z, nan, nan, nan, nan, nan, one, one, one, one, 30, 1.9)
    assert np.isfinite(np.asarray(du)).all()
    np.testing.assert_allclose(np.asarray(du), 0.0, atol=1e-6)


def test_alr_flow_llin4_stationary_solution(rng):
    """ALR fixed point satisfies the coupled llin4 equations with
    edge-zeroed weights at every pixel (westColumn_llin4 etc. drop the
    out-facing terms, opticalflowSolvers.c:2415-2520)."""
    h, w = 9, 10
    z = jnp.zeros((h, w), dtype=jnp.float32)
    one = jnp.ones((h, w), dtype=jnp.float32)
    u = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32) * 0.1)
    v = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32) * 0.1)
    m = jnp.asarray(0.05 * rng.standard_normal((h, w)).astype(np.float32))
    cu = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    duc = jnp.full((h, w), 1.5)
    du, dv = alr_flow_llin4(u, v, z, z, m, cu, cv, duc, duc, one, one, one, one, 200, 1.2)
    du, dv = np.asarray(du), np.asarray(dv)
    un, vn = np.asarray(u), np.asarray(v)

    wz = {}
    for name in ("ww", "wn", "we", "ws"):
        wz[name] = np.ones((h, w), dtype=np.float32)
    wz["ww"][:, 0] = 0
    wz["we"][:, -1] = 0
    wz["wn"][0, :] = 0
    wz["ws"][-1, :] = 0

    def stat_resid(df, f_base, c, other_df):
        dfp = np.pad(df, 1, mode="edge")
        fp = np.pad(f_base, 1, mode="edge")
        s = (
            wz["ww"] * (dfp[1:-1, :-2] + fp[1:-1, :-2] - f_base)
            + wz["we"] * (dfp[1:-1, 2:] + fp[1:-1, 2:] - f_base)
            + wz["wn"] * (dfp[:-2, 1:-1] + fp[:-2, 1:-1] - f_base)
            + wz["ws"] * (dfp[2:, 1:-1] + fp[2:, 1:-1] - f_base)
        )
        wsum = wz["ww"] + wz["we"] + wz["wn"] + wz["ws"]
        return (wsum + 1.5) * df - (s + np.asarray(c) - np.asarray(m) * other_df)

    # edge pixels' padded neighbours coincide with themselves under the
    # edge-zeroed weights, so the residual check is exact everywhere
    ru = stat_resid(du, un, cu, dv)
    rv = stat_resid(dv, vn, cv, du)
    assert np.abs(ru).max() < 2e-3
    assert np.abs(rv).max() < 2e-3


def test_disp_llin4_fixed_point(rng):
    h, w = 8, 9
    z = jnp.zeros((h, w), dtype=jnp.float32)
    one = jnp.ones((h, w), dtype=jnp.float32)
    u = z
    cu = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    duc = jnp.full((h, w), 2.0)
    du = sor_disp_llin4(u, z, cu, duc, one, one, one, one, 500, 1.9)
    d = np.asarray(du)
    i = np.s_[1:-1, 1:-1]
    nbr = d[:-2, 1:-1] + d[2:, 1:-1] + d[1:-1, :-2] + d[1:-1, 2:]
    np.testing.assert_allclose(d[i], (nbr + np.asarray(cu)[i]) / 6.0, atol=3e-4)


def test_residual_lhs_consistency(rng):
    """r = b - A x: check Residuals == Cu - M.. - LHS for elin4."""
    h, w = 10, 10
    u = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    m = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    cu = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    duc = jnp.abs(jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)))
    dvc = jnp.abs(jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)))
    one = jnp.ones((h, w), dtype=jnp.float32)
    ru, rv = residuals_elin4(u, v, m, cu, cv, duc, dvc, one, one, one, one)
    au, av = lhs_elin4(u, v, m, duc, dvc, one, one, one, one)
    i = np.s_[1:-1, 1:-1]
    np.testing.assert_allclose(
        np.asarray(ru)[i], (np.asarray(cu) - np.asarray(au))[i], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(rv)[i], (np.asarray(cv) - np.asarray(av))[i], atol=1e-4
    )


def test_residuals_llin4_matches_literal_oracle(rng):
    """RU/RV of the llin gateway (Residuals_llin4_2d,
    opticalflowSolvers.c:766-918): literal NumPy port, incl. the NaN-Cu
    drop of data term + diagonal and the border replication."""
    from pde_tpu.solvers.sor import residuals_llin4, residuals_disp_llin4

    h, w = 9, 11
    f = lambda: rng.standard_normal((h, w)).astype(np.float32)
    u, v, du, dv, m, cu, cv = f(), f(), f(), f(), f(), f(), f()
    duc, dvc = np.abs(f()), np.abs(f())
    ww, wn, we, ws = np.abs(f()), np.abs(f()), np.abs(f()), np.abs(f())
    cu[2, 3] = np.nan  # NaN data term at one pixel

    def oracle(u_, du_, c_, diag_, mdv):
        ru = np.zeros((h, w), np.float32)
        for i in range(1, h - 1):
            for j in range(1, w - 1):
                nb = (
                    ww[i, j] * (du_[i, j - 1] + u_[i, j - 1] - u_[i, j])
                    + we[i, j] * (du_[i, j + 1] + u_[i, j + 1] - u_[i, j])
                    + wn[i, j] * (du_[i - 1, j] + u_[i - 1, j] - u_[i, j])
                    + ws[i, j] * (du_[i + 1, j] + u_[i + 1, j] - u_[i, j])
                )
                wsum = ww[i, j] + we[i, j] + wn[i, j] + ws[i, j]
                if not np.isnan(c_[i, j]):
                    ru[i, j] = (c_[i, j] - mdv[i, j] + nb
                                - (diag_[i, j] + wsum) * du_[i, j])
                else:
                    ru[i, j] = nb - wsum * du_[i, j]
        ru[0, :] = ru[1, :]
        ru[-1, :] = ru[-2, :]
        ru[:, 0] = ru[:, 1]
        ru[:, -1] = ru[:, -2]
        return ru

    ru, rv = residuals_llin4(*map(jnp.asarray,
                                  (u, v, du, dv, m, cu, cv, duc, dvc,
                                   ww, wn, we, ws)))
    np.testing.assert_allclose(np.asarray(ru), oracle(u, du, cu, duc, m * dv),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rv), oracle(v, dv, cv, dvc, m * du),
                               atol=1e-5)

    r = residuals_disp_llin4(*map(jnp.asarray,
                                  (u, du, cu, duc, ww, wn, we, ws)))
    np.testing.assert_allclose(np.asarray(r),
                               oracle(u, du, cu, duc, np.zeros((h, w))),
                               atol=1e-5)


def test_cv_aos_identity_without_forcing():
    """With DATA=0 and uniform diffusivity, AOS preserves a linear PHI
    approximately (the implicit diffusion of a linear fn is itself)."""
    h, w = 12, 12
    phi = jnp.asarray(np.linspace(-2, 2, h)[:, None] * np.ones((1, w)), dtype=jnp.float32)
    zero = jnp.zeros((h, w), dtype=jnp.float32)
    one = jnp.ones((h, w), dtype=jnp.float32)
    out = cv_aos_step(phi, zero, one, one, 0.25, 1.0)
    np.testing.assert_allclose(np.asarray(out)[2:-2, 2:-2], np.asarray(phi)[2:-2, 2:-2], atol=1e-3)


def test_cv_aos_clamps():
    h, w = 8, 8
    phi = jnp.full((h, w), 4.9)
    data = jnp.full((h, w), 100.0)
    one = jnp.ones((h, w), dtype=jnp.float32)
    out = cv_aos_step(phi, data, one, one, 0.25, 1.0)
    assert np.asarray(out).max() <= 5.0 + 1e-6


def test_cv_aos_freeze_zero_diffusivity():
    h, w = 8, 8
    phi = jnp.asarray(np.random.default_rng(0).standard_normal((h, w)).astype(np.float32))
    diff = jnp.zeros((h, w), dtype=jnp.float32)
    one = jnp.ones((h, w), dtype=jnp.float32)
    out = cv_aos_step(phi, one, one, diff, 0.25, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(phi), atol=1e-6)


def test_ac_aos_step_runs():
    h, w = 10, 10
    yy, xx = np.mgrid[:h, :w]
    phi = jnp.asarray(((xx - 5) ** 2 + (yy - 5) ** 2) ** 0.5 - 3, dtype=jnp.float32)
    one = jnp.ones((h, w), dtype=jnp.float32)
    out = ac_aos_step(phi, one * 0.1, one, one, 0.25, 1.0)
    assert np.isfinite(np.asarray(out)).all()


def test_reinit_preserves_signed_distance():
    """A true signed-distance function is (nearly) a fixed point."""
    h, w = 24, 24
    yy, xx = np.mgrid[:h, :w]
    sdf = np.sqrt((xx - 12.0) ** 2 + (yy - 12.0) ** 2) - 6.0
    out = np.asarray(reinit(jnp.asarray(sdf, dtype=jnp.float32), steps=8))
    # zero level set should barely move: compare signs near the circle
    band = np.abs(sdf) > 1.0
    np.testing.assert_array_equal(np.sign(out[band]), np.sign(sdf[band]))
    # gradient magnitude stays ~1 in a band
    gy, gx = np.gradient(out)
    g = np.sqrt(gx**2 + gy**2)
    inner = np.abs(sdf) < 4
    assert np.abs(g[inner] - 1.0).mean() < 0.12


def test_reinit_restores_distance_property():
    """Start from a steep function with the same zero set; reinit should
    flatten |grad| toward 1."""
    h, w = 24, 24
    yy, xx = np.mgrid[:h, :w]
    sdf = np.sqrt((xx - 12.0) ** 2 + (yy - 12.0) ** 2) - 6.0
    steep = 3.0 * sdf
    out = np.asarray(reinit(jnp.asarray(steep, dtype=jnp.float32), steps=40))
    gy, gx = np.gradient(out)
    g = np.sqrt(gx**2 + gy**2)
    inner = np.abs(sdf) < 4
    assert np.abs(g[inner] - 1.0).mean() < 0.15


def test_tridiag_factor_solve_matches_scan(rng):
    """Factored replay (both methods) == direct Thomas scan; parity-line
    solves == the corresponding lines of the full solve (the zebra fast
    path reuses one factorisation across every sweep and parity)."""
    from pde_tpu.solvers.tdma import (line_factors, line_solve, slice_lines,
                                      thomas_solve_scan, tridiag_factor,
                                      tridiag_solve)

    for h in (7, 8, 64):
        w = 13
        a = -rng.random((h, w)).astype(np.float32)
        c = -rng.random((h, w)).astype(np.float32)
        b = (2.5 + np.abs(a) + np.abs(c)).astype(np.float32)
        d = rng.standard_normal((h, w)).astype(np.float32)
        ref = np.asarray(thomas_solve_scan(*map(jnp.asarray, (a, b, c, d)), axis=-2))
        for method in ("scan", "cr"):
            fac = tridiag_factor(*map(jnp.asarray, (a, b, c)), axis=-2,
                                 method=method)
            got = np.asarray(tridiag_solve(fac, jnp.asarray(d), axis=-2))
            np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)

    h, w = 21, 34
    a = -rng.random((h, w)).astype(np.float32)
    c = -rng.random((h, w)).astype(np.float32)
    b = (2.5 + np.abs(a) + np.abs(c)).astype(np.float32)
    d = rng.standard_normal((h, w)).astype(np.float32)
    for vertical, axis in ((True, -2), (False, -1)):
        ref = np.asarray(thomas_solve_scan(*map(jnp.asarray, (a, b, c, d)), axis=axis))
        facs = line_factors(*map(jnp.asarray, (a, b, c)), vertical)
        for p in (0, 1):
            got = np.asarray(line_solve(facs, jnp.asarray(d), p, vertical))
            want = np.asarray(slice_lines(jnp.asarray(ref), p, vertical))
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_lhs_llin4_consistent_with_residuals(rng):
    """r = b − A·x at the increment state: residuals_llin4 must equal
    where(valid, Cu, 0) − lhs_llin4 pointwise (interior), for both valid
    and NaN data pixels (LHS_llin4_2d vs Residuals_llin4_2d,
    opticalflowSolvers.c:923-1045 / :766-918)."""
    from pde_tpu.solvers.sor import lhs_llin4, residuals_llin4

    h, w = 12, 14
    mk = lambda: jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    u, v, du, dv, m = mk(), mk(), mk(), mk(), mk() * 0.1
    cu, cv = mk(), mk()
    duc = jnp.abs(mk()) + 0.2
    dvc = jnp.abs(mk()) + 0.2
    nanmask = rng.random((h, w)) < 0.2
    cu = jnp.where(jnp.asarray(nanmask), jnp.nan, cu)
    duc = jnp.where(jnp.asarray(nanmask), jnp.nan, duc)
    ww, wn, we, ws = (jnp.abs(mk()) for _ in range(4))

    ru, rv = residuals_llin4(u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws)
    au, av = lhs_llin4(u, v, du, dv, m, duc, dvc, ww, wn, we, ws)
    want_u = np.where(nanmask, 0.0, np.nan_to_num(np.asarray(cu))) - np.asarray(au)
    want_v = np.asarray(cv) - np.asarray(av)
    np.testing.assert_allclose(np.asarray(ru)[1:-1, 1:-1], want_u[1:-1, 1:-1],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rv)[1:-1, 1:-1], want_v[1:-1, 1:-1],
                               rtol=1e-4, atol=1e-5)
