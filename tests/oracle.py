"""NumPy oracles: literal ports of the reference numerics for parity tests.

Each function re-states the cited MATLAB/C lines in NumPy with the same
sweep orders and border conventions, so engine results can be checked for
*algorithmic* parity (same linear systems, same fixed points) without
MATLAB. These run on tiny grids only — they are O(iters * H * W) Python.
"""

from __future__ import annotations

import numpy as np


def gs_sor_elin4(u, v, m, cu, cv, du, dv, ww, wn, we, ws, iters, omega):
    """Pointwise Gauss-Seidel SOR, early-lin flow pair.

    Literal port of GS_SOR_elin4_2d (opticalflowSolvers.c:41-186):
    lexicographic sweep over interior, NaN-guarded data terms, then
    1-px border replication (rows first, then columns) every sweep.
    """
    u = u.copy().astype(np.float64)
    v = v.copy().astype(np.float64)
    h, w = u.shape
    for _ in range(iters):
        for j in range(1, w - 1):
            for i in range(1, h - 1):
                wsum = ww[i, j] + wn[i, j] + we[i, j] + ws[i, j]
                nb_u = (ww[i, j] * u[i, j - 1] + we[i, j] * u[i, j + 1]
                        + wn[i, j] * u[i - 1, j] + ws[i, j] * u[i + 1, j])
                nb_v = (ww[i, j] * v[i, j - 1] + we[i, j] * v[i, j + 1]
                        + wn[i, j] * v[i - 1, j] + ws[i, j] * v[i + 1, j])
                if np.isnan(cu[i, j]):
                    new_u = nb_u / wsum
                else:
                    new_u = (nb_u - m[i, j] * v[i, j] + cu[i, j]) / (wsum + du[i, j])
                u[i, j] = (1 - omega) * u[i, j] + omega * new_u
                if np.isnan(cv[i, j]):
                    new_v = nb_v / wsum
                else:
                    new_v = (nb_v - m[i, j] * u[i, j] + cv[i, j]) / (wsum + dv[i, j])
                v[i, j] = (1 - omega) * v[i, j] + omega * new_v
        for f in (u, v):
            f[0, :] = f[1, :]
            f[-1, :] = f[-2, :]
            f[:, 0] = f[:, 1]
            f[:, -1] = f[:, -2]
    return u.astype(np.float32), v.astype(np.float32)


def gs_sor_llin4(u, v, du_f, dv_f, m, cu, cv, duc, dvc, ww, wn, we, ws, iters, omega):
    """Pointwise GS-SOR, late-lin increment pair (GS_SOR_llin4_2d,
    opticalflowSolvers.c:504-680)."""
    df = du_f.copy().astype(np.float64)
    dg = dv_f.copy().astype(np.float64)
    h, w = df.shape
    for _ in range(iters):
        for j in range(1, w - 1):
            for i in range(1, h - 1):
                wsum = ww[i, j] + wn[i, j] + we[i, j] + ws[i, j]
                diff_u = (ww[i, j] * (df[i, j - 1] + u[i, j - 1] - u[i, j])
                          + we[i, j] * (df[i, j + 1] + u[i, j + 1] - u[i, j])
                          + wn[i, j] * (df[i - 1, j] + u[i - 1, j] - u[i, j])
                          + ws[i, j] * (df[i + 1, j] + u[i + 1, j] - u[i, j]))
                diff_v = (ww[i, j] * (dg[i, j - 1] + v[i, j - 1] - v[i, j])
                          + we[i, j] * (dg[i, j + 1] + v[i, j + 1] - v[i, j])
                          + wn[i, j] * (dg[i - 1, j] + v[i - 1, j] - v[i, j])
                          + ws[i, j] * (dg[i + 1, j] + v[i + 1, j] - v[i, j]))
                if np.isnan(cu[i, j]):
                    new_u = diff_u / wsum
                else:
                    new_u = (diff_u - m[i, j] * dg[i, j] + cu[i, j]) / (wsum + duc[i, j])
                df[i, j] = (1 - omega) * df[i, j] + omega * new_u
                if np.isnan(cv[i, j]):
                    new_v = diff_v / wsum
                else:
                    new_v = (diff_v - m[i, j] * df[i, j] + cv[i, j]) / (wsum + dvc[i, j])
                dg[i, j] = (1 - omega) * dg[i, j] + omega * new_v
        for f in (df, dg):
            f[0, :] = f[1, :]
            f[-1, :] = f[-2, :]
            f[:, 0] = f[:, 1]
            f[:, -1] = f[:, -2]
    return df.astype(np.float32), dg.astype(np.float32)


def gs_sor_pde4(x, trace, b, ww, wn, we, ws, iters, omega):
    """Pointwise GS-SOR diagonal form (GS_SOR_4_2d, pdeSolvers.c:44-146)."""
    x = x.copy().astype(np.float64)
    h, w = x.shape
    for _ in range(iters):
        for j in range(1, w - 1):
            for i in range(1, h - 1):
                nb = (ww[i, j] * x[i, j - 1] + we[i, j] * x[i, j + 1]
                      + wn[i, j] * x[i - 1, j] + ws[i, j] * x[i + 1, j])
                if np.isnan(trace[i, j]):
                    wsum = ww[i, j] + wn[i, j] + we[i, j] + ws[i, j]
                    new = nb / wsum
                else:
                    new = (b[i, j] + nb) / trace[i, j]
                x[i, j] = (1 - omega) * x[i, j] + omega * new
        x[0, :] = x[1, :]
        x[-1, :] = x[-2, :]
        x[:, 0] = x[:, 1]
        x[:, -1] = x[:, -2]
    return x.astype(np.float32)


def dense_solve_elin4(m, cu, cv, du, dv, ww, wn, we, ws):
    """Direct dense solve of the elin4 stationary system on the interior
    with replicated borders — the exact fixed point the relaxations chase.

    Interior equation (opticalflowSolvers.c:129-152):
        (sum_w + Du) U + M V - sum_k w_k U_k = Cu
        (sum_w + Dv) V + M U - sum_k w_k V_k = Cv
    Border pixels are eliminated via replication (border = interior nbr).
    """
    h, w = m.shape
    n = h * w

    def idx(i, j):
        return i * w + j

    # map every border pixel to its replicated interior source
    src = np.arange(n).reshape(h, w)
    ii = np.clip(np.arange(h), 1, h - 2)
    jj = np.clip(np.arange(w), 1, w - 2)
    src = src[np.ix_(ii, jj)]
    srcmap = np.zeros((h, w), dtype=int)
    for i in range(h):
        for j in range(w):
            srcmap[i, j] = idx(min(max(i, 1), h - 2), min(max(j, 1), w - 2))

    a = np.zeros((2 * n, 2 * n))
    rhs = np.zeros(2 * n)
    for i in range(1, h - 1):
        for j in range(1, w - 1):
            p = idx(i, j)
            wsum = ww[i, j] + wn[i, j] + we[i, j] + ws[i, j]
            a[p, p] += wsum + du[i, j]
            a[p, n + p] += m[i, j]
            a[n + p, n + p] += wsum + dv[i, j]
            a[n + p, p] += m[i, j]
            for (wk, ni, nj) in ((ww[i, j], i, j - 1), (we[i, j], i, j + 1),
                                 (wn[i, j], i - 1, j), (ws[i, j], i + 1, j)):
                q = srcmap[ni, nj]
                a[p, q] -= wk
                a[n + p, n + q] -= wk
            rhs[p] = cu[i, j]
            rhs[n + p] = cv[i, j]
    # border rows: identity to replicated source
    for i in range(h):
        for j in range(w):
            if 1 <= i < h - 1 and 1 <= j < w - 1:
                continue
            p = idx(i, j)
            q = srcmap[i, j]
            a[p, p] = 1.0
            a[p, q] -= 1.0
            a[n + p, n + p] = 1.0
            a[n + p, n + q] -= 1.0
    sol = np.linalg.solve(a, rhs)
    return sol[:n].reshape(h, w), sol[n:].reshape(h, w)
