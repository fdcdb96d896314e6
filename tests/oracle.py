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


# ---------------------------------------------------------------------------
# Full-pipeline oracles (literal reference ports over tiny inputs)
# ---------------------------------------------------------------------------


def _fspecial_gaussian(shape, sigma):
    """MATLAB fspecial('gaussian', shape, sigma)."""
    m, n = [(s - 1) / 2 for s in shape]
    y, x = np.ogrid[-m:m + 1, -n:n + 1]
    h = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    return h / h.sum()


def _imfilter_rep(x, k):
    import scipy.ndimage as ndi

    return ndi.correlate(x, k, mode="nearest")


def _imresize_np(x, out_shape, kernel="triangle"):
    from pde_tpu.core.resize import resize_matrix

    r = resize_matrix(x.shape[0], out_shape[0], True, kernel).astype(np.float64)
    c = resize_matrix(x.shape[1], out_shape[1], True, kernel).astype(np.float64)
    return r @ x @ c.T


def _tv_diff_weights(d):
    """TVdenoise4.m DiffWeights (:116-153), single channel."""
    import scipy.ndimage as ndi

    cd = np.array([0.25, 0.0, -0.25])
    dver = ndi.correlate1d(d, cd, axis=0, mode="nearest")
    dhor = ndi.correlate1d(d, cd, axis=1, mode="nearest")

    def cs(a, sh):
        return np.roll(a, sh, axis=(0, 1))

    ww = (cs(d, (0, 1)) - d) ** 2 + (dver + cs(dver, (0, 1))) ** 2
    we = (cs(d, (0, -1)) - d) ** 2 + (dver + cs(dver, (0, -1))) ** 2
    wn = (cs(d, (1, 0)) - d) ** 2 + (dhor + cs(dhor, (1, 0))) ** 2
    ws = (cs(d, (-1, 0)) - d) ** 2 + (dhor + cs(dhor, (-1, 0))) ** 2
    ww, wn, we, ws = [1.0 / np.sqrt(w + 1e-5) for w in (ww, wn, we, ws)]
    ww[:, 0] = 0
    we[:, -1] = 0
    wn[0, :] = 0
    ws[-1, :] = 0
    return ww, wn, we, ws


def tv_denoise4_oracle(img, alpha=5.0, omega=1.75, outer=10, inner=5,
                       scl=0.5, scl_factor=0.75):
    """Literal port of TVdenoise4.m (pyramid :50-78, loop :80-111)."""
    img = img.astype(np.float64)
    g = _fspecial_gaussian((7, 7), 2.0)
    ds_r = int(np.ceil(img.shape[0] * scl))
    ds_c = int(np.ceil(img.shape[1] * scl))
    levels = [img]
    raw = img
    while True:
        nxt = _imresize_np(raw, (int(np.ceil(raw.shape[0] * scl_factor)),
                                 int(np.ceil(raw.shape[1] * scl_factor))))
        levels[-1] = _imfilter_rep(levels[-1], g)
        levels.append(nxt)
        raw = nxt
        if nxt.shape[0] <= ds_r or nxt.shape[1] <= ds_c:
            levels[-1] = _imfilter_rep(levels[-1], g)
            break
    iout = levels[-1]
    eps = np.finfo(np.float64).eps
    for lvl in range(len(levels) - 1, -1, -1):
        f = levels[lvl]
        for _ in range(outer + 1):
            psi = 1.0 / np.sqrt((iout - f) ** 2 + eps)
            ww, wn, we, ws = _tv_diff_weights(iout)
            trace = psi + alpha * (ww + wn + we + ws)
            b = psi * f
            iout = gs_sor_pde4(iout.astype(np.float32),
                               trace.astype(np.float32), b.astype(np.float32),
                               alpha * ww, alpha * wn, alpha * we, alpha * ws,
                               inner, omega).astype(np.float64)
        if lvl > 0:
            iout = _imresize_np(iout, levels[lvl - 1].shape)
    return iout.astype(np.float32)


def seq_alr_elin4(u, v, m, cu, cv, du, dv, ww, wn, we, ws, iters, omega):
    """Literal sequential ALR solver=2 (GS_ALR_SOR_elin4_2d,
    opticalflowSolvers.c:196-262 + line routines :1763-2230): line Thomas
    solves with one-sided edge stencils, sweeping U cols W->E, V cols,
    V rows N->S, U rows, SOR-blended with omega. Vectorised per line via
    scipy solve_banded (fast enough for real-image goldens)."""
    from scipy.linalg import solve_banded

    u = u.astype(np.float64).copy()
    v = v.astype(np.float64).copy()
    h, w = u.shape
    wwz = ww.copy(); wwz[:, 0] = 0
    wez = we.copy(); wez[:, -1] = 0
    wnz = wn.copy(); wnz[0, :] = 0
    wsz = ws.copy(); wsz[-1, :] = 0

    def col_solve(f, other, c_, d_, j):
        b = wnz[:, j] + wsz[:, j] + wwz[:, j] + wez[:, j]
        rhs = np.zeros(h)
        if j > 0:
            rhs += wwz[:, j] * f[:, j - 1]
        if j < w - 1:
            rhs += wez[:, j] * f[:, j + 1]
        valid = ~np.isnan(c_[:, j])
        b = b + np.where(valid, d_[:, j], 0)
        rhs = rhs + np.where(valid, c_[:, j] - m[:, j] * other[:, j], 0)
        ab = np.zeros((3, h))
        ab[0, 1:] = -wsz[:-1, j]
        ab[1] = b
        ab[2, :-1] = -wnz[1:, j]
        x = solve_banded((1, 1), ab, rhs)
        f[:, j] = omega * x + (1 - omega) * f[:, j]

    def row_solve(f, other, c_, d_, i):
        b = wnz[i, :] + wsz[i, :] + wwz[i, :] + wez[i, :]
        rhs = np.zeros(w)
        if i > 0:
            rhs += wnz[i, :] * f[i - 1, :]
        if i < h - 1:
            rhs += wsz[i, :] * f[i + 1, :]
        valid = ~np.isnan(c_[i, :])
        b = b + np.where(valid, d_[i, :], 0)
        rhs = rhs + np.where(valid, c_[i, :] - m[i, :] * other[i, :], 0)
        ab = np.zeros((3, w))
        ab[0, 1:] = -wez[i, :-1]
        ab[1] = b
        ab[2, :-1] = -wwz[i, 1:]
        x = solve_banded((1, 1), ab, rhs)
        f[i, :] = omega * x + (1 - omega) * f[i, :]

    for _ in range(iters):
        for j in range(w):
            col_solve(u, v, cu, du, j)
        for j in range(w):
            col_solve(v, u, cv, dv, j)
        for i in range(h):
            row_solve(v, u, cv, dv, i)
        for i in range(h):
            row_solve(u, v, cu, du, i)
    return u.astype(np.float32), v.astype(np.float32)


_HS_PRE = np.array([0.037659, 0.249724, 0.439911, 0.249724, 0.037659])
_HS_DX = np.array([0.104550, 0.292315, 0.0, -0.292315, -0.104550])
_HS_DXX = np.array([0.232905, 0.002668, -0.471147, 0.002668, 0.232905])


def _conv1(x, k, axis):
    """imfilter(..., 'replicate', 'conv') along one axis."""
    import scipy.ndimage as ndi

    return ndi.convolve1d(x, k, axis=axis, mode="nearest")


def flow_hs_oracle(it0, it1, alpha=0.2, omega=1.9, iters=20, b1=0.25, b2=0.75,
                   scl_factor=0.75, solver=1):
    """Literal port of FlowEminHS_elin_2D_v10.m (single channel):
    pyramid :88-110, derivative stack :133-149, tensors :154-158,
    elin4 solve :169-183, medfilt+bicubic upscale :188-191."""
    import scipy.ndimage as ndi

    it0 = it0.astype(np.float64) / 255.0
    it1 = it1.astype(np.float64) / 255.0
    g = _fspecial_gaussian((5, 5), 1.25)
    i0, i1 = [it0], [it1]
    while True:
        n0 = _imresize_np(i0[-1], (int(np.ceil(i0[-1].shape[0] * scl_factor)),
                                   int(np.ceil(i0[-1].shape[1] * scl_factor))))
        n1 = _imresize_np(i1[-1], n0.shape)
        i0[-1] = _imfilter_rep(i0[-1], g)
        i1[-1] = _imfilter_rep(i1[-1], g)
        i0.append(n0)
        i1.append(n1)
        if n0.shape[0] <= 20 or n0.shape[1] <= 20:
            i0[-1] = _imfilter_rep(i0[-1], g)
            i1[-1] = _imfilter_rep(i1[-1], g)
            break
    u = v = None
    for scl in range(len(i0) - 1, -1, -1):
        t0, t1 = i0[scl], i1[scl]
        h, w = t0.shape
        wgt = alpha * np.ones((h, w))
        if u is None:
            u = np.zeros((h, w))
            v = np.zeros((h, w))
        ist = (t0 + t1) * 0.55
        idt = t0 - t1
        idx = _conv1(_conv1(ist, _HS_PRE, 0), _HS_DX, 1)
        idy = _conv1(_conv1(ist, _HS_PRE, 1), _HS_DX, 0)
        idxx = _conv1(_conv1(ist, _HS_PRE, 0), _HS_DXX, 1)
        idyy = _conv1(_conv1(ist, _HS_PRE, 1), _HS_DXX, 0)
        idxy = _conv1(_conv1(ist, _HS_DX, 1), _HS_DX, 0)
        idxt = _conv1(_conv1(idt, _HS_PRE, 0), _HS_DX, 1)
        idyt = _conv1(_conv1(idt, _HS_PRE, 1), _HS_DX, 0)
        m = b1 * idy * idx + b2 * idxy * (idxx + idyy)
        cu = b1 * idt * idx + b2 * (idxt * idxx + idyt * idxy)
        cv = b1 * idt * idy + b2 * (idxt * idxy + idyt * idyy)
        du = b1 * idx * idx + b2 * (idxx * idxx + idxy * idxy)
        dv = b1 * idy * idy + b2 * (idxy * idxy + idyy * idyy)
        if solver == 1:
            u, v = gs_sor_elin4(u.astype(np.float32), v.astype(np.float32),
                                m, cu, cv, du, dv, wgt, wgt, wgt, wgt, iters, omega)
        else:
            u, v = seq_alr_elin4(u, v, m, cu, cv, du, dv,
                                 wgt, wgt, wgt, wgt, iters, omega)
        u = u.astype(np.float64)
        v = v.astype(np.float64)
        if scl > 0:
            # imresize with no Method defaults to bicubic (HS driver :188-191)
            u = _imresize_np(ndi.median_filter(u / scl_factor, size=3, mode="reflect"),
                             i0[scl - 1].shape, kernel="cubic")
            v = _imresize_np(ndi.median_filter(v / scl_factor, size=3, mode="reflect"),
                             i0[scl - 1].shape, kernel="cubic")
    return u.astype(np.float32), v.astype(np.float32)


# ---------------------------------------------------------------------------
# FlowEminND_llin_2D_v10 oracle (full warping pipeline)
# ---------------------------------------------------------------------------


def _bilin_interp_nan(img, x, y):
    """BilinInterp_2d semantics (imageInterpolation.c:44-140): bilinear at
    1-based (x, y); out-of-domain -> NaN; corner fetches edge-clamped."""
    h, w = img.shape
    oob = (x < 1) | (x > w) | (y < 1) | (y > h)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    fx = x - x0
    fy = y - y0
    x0c = np.clip(x0 - 1, 0, w - 1)
    x1c = np.clip(x0, 0, w - 1)
    y0c = np.clip(y0 - 1, 0, h - 1)
    y1c = np.clip(y0, 0, h - 1)
    v00 = img[y0c, x0c]
    v01 = img[y0c, x1c]
    v10 = img[y1c, x0c]
    v11 = img[y1c, x1c]
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    return np.where(oob, np.nan, out)


_SM5 = np.array([0.037659, 0.249724, 0.439911, 0.249724, 0.037659])
_FD5 = np.array([-0.104550, -0.292315, 0.0, 0.292315, 0.104550])
_SD5 = np.array([0.232905, 0.002668, -0.471147, 0.002668, 0.232905])


def _corr1(x, k, axis):
    import scipy.ndimage as ndi

    return ndi.correlate1d(x, k, axis=axis, mode="nearest")


def _fst5(it0, it1w):
    idt = 0.5 * (it0 - it1w)
    idx = _corr1(_corr1(it1w, _SM5, 0), _FD5, 1)
    idy = _corr1(_corr1(it1w, _SM5, 1), _FD5, 0)
    return idt, idx, idy


def _snd5(it0, it1w):
    def dx(i):
        return _corr1(_corr1(i, _SM5, 0), _FD5, 1)

    def dy(i):
        return _corr1(_corr1(i, _SM5, 1), _FD5, 0)

    idxt = 0.5 * (dx(it0) - dx(it1w))
    idyt = 0.5 * (dy(it0) - dy(it1w))
    idxx = _corr1(_corr1(it1w, _SM5, 0), _SD5, 1)
    idyy = _corr1(_corr1(it1w, _SM5, 1), _SD5, 0)
    idxy = _corr1(_corr1(it1w, _FD5, 1), _FD5, 0)
    return idxt, idyt, idxx, idyy, idxy


def _rgb2grad_np(chans):
    """Driver-local rgb2grad (FlowEminND:374-384): [1 0 -1] correlations."""
    odx = np.array([1.0, 0.0, -1.0])
    out = []
    for c in chans:
        out.append(_corr1(c, odx, 1))
        out.append(_corr1(c, odx, 0))
    return out


def _op_diff_weights(u, v):
    """OPdiffWeights (FlowEminND:389-433), circshift semantics."""
    cd = np.array([0.25, 0.0, -0.25])
    uver = _corr1(u, cd, 0)
    vver = _corr1(v, cd, 0)
    uhor = _corr1(u, cd, 1)
    vhor = _corr1(v, cd, 1)

    def cs(a, sh):
        return np.roll(a, sh, axis=(0, 1))

    ww = (cs(u, (0, 1)) - u) ** 2 + (uver + cs(uver, (0, 1))) ** 2 \
        + (cs(v, (0, 1)) - v) ** 2 + (vver + cs(vver, (0, 1))) ** 2
    we = (cs(u, (0, -1)) - u) ** 2 + (uver + cs(uver, (0, -1))) ** 2 \
        + (cs(v, (0, -1)) - v) ** 2 + (vver + cs(vver, (0, -1))) ** 2
    wn = (cs(u, (1, 0)) - u) ** 2 + (uhor + cs(uhor, (1, 0))) ** 2 \
        + (cs(v, (1, 0)) - v) ** 2 + (vhor + cs(vhor, (1, 0))) ** 2
    ws = (cs(u, (-1, 0)) - u) ** 2 + (uhor + cs(uhor, (-1, 0))) ** 2 \
        + (cs(v, (-1, 0)) - v) ** 2 + (vhor + cs(vhor, (-1, 0))) ** 2
    return tuple(1.0 / np.sqrt(w + 1e-5) for w in (ww, wn, we, ws))


def seq_alr_llin4(u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws, iters, omega):
    """Sequential ALR for the late-lin increment pair (GS_ALR_SOR_llin4_2d
    + westColumn_llin4 etc., opticalflowSolvers.c:690,2415-2640)."""
    from scipy.linalg import solve_banded

    du = du.astype(np.float64).copy()
    dv = dv.astype(np.float64).copy()
    h, w = du.shape
    wwz = ww.copy(); wwz[:, 0] = 0
    wez = we.copy(); wez[:, -1] = 0
    wnz = wn.copy(); wnz[0, :] = 0
    wsz = ws.copy(); wsz[-1, :] = 0

    def col_solve(df, f_base, other_df, other_base, c_, d_, j, for_u):
        b = wnz[:, j] + wsz[:, j] + wwz[:, j] + wez[:, j]
        rhs = np.zeros(h)
        # perpendicular (W/E) lagged terms: w*(df_nbr + f_nbr - f_c)
        if j > 0:
            rhs += wwz[:, j] * (df[:, j - 1] + f_base[:, j - 1] - f_base[:, j])
        if j < w - 1:
            rhs += wez[:, j] * (df[:, j + 1] + f_base[:, j + 1] - f_base[:, j])
        # along-line base differences w*(f_nbr - f_c)
        along = np.zeros(h)
        along[1:] += wnz[1:, j] * (f_base[:-1, j] - f_base[1:, j])
        along[:-1] += wsz[:-1, j] * (f_base[1:, j] - f_base[:-1, j])
        rhs += along
        valid = ~np.isnan(c_[:, j])
        b = b + np.where(valid, np.nan_to_num(d_[:, j]), 0)
        rhs = rhs + np.where(valid,
                             np.nan_to_num(c_[:, j]) - np.nan_to_num(m[:, j]) * other_df[:, j], 0)
        ab = np.zeros((3, h)); ab[0, 1:] = -wsz[:-1, j]; ab[1] = b; ab[2, :-1] = -wnz[1:, j]
        x = solve_banded((1, 1), ab, rhs)
        df[:, j] = omega * x + (1 - omega) * df[:, j]

    def row_solve(df, f_base, other_df, c_, d_, i):
        b = wnz[i, :] + wsz[i, :] + wwz[i, :] + wez[i, :]
        rhs = np.zeros(w)
        if i > 0:
            rhs += wnz[i, :] * (df[i - 1, :] + f_base[i - 1, :] - f_base[i, :])
        if i < h - 1:
            rhs += wsz[i, :] * (df[i + 1, :] + f_base[i + 1, :] - f_base[i, :])
        along = np.zeros(w)
        along[1:] += wwz[i, 1:] * (f_base[i, :-1] - f_base[i, 1:])
        along[:-1] += wez[i, :-1] * (f_base[i, 1:] - f_base[i, :-1])
        rhs += along
        valid = ~np.isnan(c_[i, :])
        b = b + np.where(valid, np.nan_to_num(d_[i, :]), 0)
        rhs = rhs + np.where(valid,
                             np.nan_to_num(c_[i, :]) - np.nan_to_num(m[i, :]) * other_df[i, :], 0)
        ab = np.zeros((3, w)); ab[0, 1:] = -wez[i, :-1]; ab[1] = b; ab[2, :-1] = -wwz[i, 1:]
        x = solve_banded((1, 1), ab, rhs)
        df[i, :] = omega * x + (1 - omega) * df[i, :]

    for _ in range(iters):
        for j in range(w):
            col_solve(du, u, dv, v, cu, duc, j, True)
        for j in range(w):
            col_solve(dv, v, du, u, cv, dvc, j, False)
        for i in range(h):
            row_solve(dv, v, du, cv, dvc, i)
        for i in range(h):
            row_solve(du, u, dv, cu, duc, i)
    return du.astype(np.float32), dv.astype(np.float32)


def flow_nd_oracle(it0, it1, fst_term="grad", snd_term="gradmag",
                   alpha=0.0420, omega=1.9, first_loop=4, second_loop=4,
                   iters=4, b1=1.4843, b2=0.2915, scl_factor=0.75, solver=2):
    """Literal port of FlowEminND_llin_2D_v10.m (no spatial prior).

    it0/it1: (H, W) or (C, H, W) in [0, 255]. Returns (U, V)."""
    import scipy.ndimage as ndi

    it0 = np.asarray(it0, np.float64) / 255.0
    it1 = np.asarray(it1, np.float64) / 255.0
    if it0.ndim == 2:
        it0, it1 = it0[None], it1[None]
    g = _fspecial_gaussian((5, 5), 1.25)

    def smooth(chans):
        return [_imfilter_rep(c, g) for c in chans]

    lv0 = [list(it0)]
    lv1 = [list(it1)]
    while True:
        nh = int(np.ceil(lv0[-1][0].shape[0] * scl_factor))
        nw = int(np.ceil(lv0[-1][0].shape[1] * scl_factor))
        n0 = [_imresize_np(c, (nh, nw)) for c in lv0[-1]]
        n1 = [_imresize_np(c, (nh, nw)) for c in lv1[-1]]
        lv0[-1] = smooth(lv0[-1])
        lv1[-1] = smooth(lv1[-1])
        lv0.append(n0)
        lv1.append(n1)
        if nh <= 20 or nw <= 20:
            lv0[-1] = smooth(lv0[-1])
            lv1[-1] = smooth(lv1[-1])
            break

    def fst_imgs(chans):
        return _rgb2grad_np(chans) if fst_term == "grad" else chans

    def snd_imgs(chans):
        return None if snd_term == "none" else chans

    u = v = None
    n = len(lv0)
    for scl in range(n - 1, -1, -1):
        i1t0 = fst_imgs(lv0[scl])
        i1t1 = fst_imgs(lv1[scl])
        i2t0 = snd_imgs(lv0[scl])
        i2t1 = snd_imgs(lv1[scl])
        h, w = i1t0[0].shape
        if u is None:
            u = np.zeros((h, w))
            v = np.zeros((h, w))
        yy, xx = np.mgrid[1:h + 1, 1:w + 1].astype(np.float64)
        for _first in range(first_loop):
            i1t1w = [_bilin_interp_nan(c, xx + u, yy + v) for c in i1t1]
            t1 = [_fst5(a, b) for a, b in zip(i1t0, i1t1w)]
            if i2t1 is not None:
                i2t1w = [_bilin_interp_nan(c, xx + u, yy + v) for c in i2t1]
                if snd_term == "gradmag":
                    t2 = [_snd5(a, b) for a, b in zip(i2t0, i2t1w)]
                else:
                    t2 = [_fst5(a, b) for a, b in zip(i2t0, i2t1w)]
            du = np.zeros((h, w))
            dv = np.zeros((h, w))
            for _second in range(second_loop):
                parts_m, parts_cu, parts_cv, parts_du, parts_dv = [], [], [], [], []
                for (idt, idx, idy) in t1:
                    opn = (idt - idx * du - idy * dv) ** 2
                    gd1 = b1 / (alpha * np.sqrt(opn + 1e-5))
                    parts_m.append(idy * idx * gd1)
                    parts_cu.append(idt * idx * gd1)
                    parts_cv.append(idt * idy * gd1)
                    parts_du.append(idx * idx * gd1)
                    parts_dv.append(idy * idy * gd1)
                if i2t1 is not None:
                    for tt in t2:
                        if snd_term == "gradmag":
                            idxt, idyt, idxx, idyy, idxy = tt
                            opn = (idxt - idxx * du - idxy * dv) ** 2 \
                                + (idyt - idxy * du - idyy * dv) ** 2
                            gd2 = b2 / (alpha * np.sqrt(opn + 1e-5))
                            parts_m.append(idxy * (idxx + idyy) * gd2)
                            parts_cu.append((idxt * idxx + idyt * idxy) * gd2)
                            parts_cv.append((idxt * idxy + idyt * idyy) * gd2)
                            parts_du.append((idxx * idxx + idxy * idxy) * gd2)
                            parts_dv.append((idxy * idxy + idyy * idyy) * gd2)
                        else:
                            idt, idx, idy = tt
                            opn = (idt - idx * du - idy * dv) ** 2
                            gd2 = b2 / (alpha * np.sqrt(opn + 1e-5))
                            parts_m.append(idy * idx * gd2)
                            parts_cu.append(idt * idx * gd2)
                            parts_cv.append(idt * idy * gd2)
                            parts_du.append(idx * idx * gd2)
                            parts_dv.append(idy * idy * gd2)

                def nsum(parts):
                    return np.nansum(np.stack(parts), axis=0)

                m_gd = nsum(parts_m)
                cu_gd = nsum(parts_cu)
                cv_gd = nsum(parts_cv)
                du_gd = nsum(parts_du)
                dv_gd = nsum(parts_dv)
                ww, wn, we, ws = _op_diff_weights(u + du, v + dv)
                if solver == 2:
                    du, dv = seq_alr_llin4(u, v, du, dv, m_gd, cu_gd, cv_gd,
                                           du_gd, dv_gd, ww, wn, we, ws,
                                           iters, omega)
                else:
                    du, dv = gs_sor_llin4(u, v, du, dv, m_gd, cu_gd, cv_gd,
                                          du_gd, dv_gd, ww, wn, we, ws,
                                          iters, omega)
                du = du.astype(np.float64)
                dv = dv.astype(np.float64)
            u = ndi.median_filter(u + du, size=3, mode="reflect")
            v = ndi.median_filter(v + dv, size=3, mode="reflect")
        if scl > 0:
            nh, nw = lv0[scl - 1][0].shape
            u = _imresize_np(u / scl_factor, (nh, nw))
            v = _imresize_np(v / scl_factor, (nh, nw))
    return u.astype(np.float32), v.astype(np.float32)


# ---------------------------------------------------------------------------
# Disparity (DispEminND_llin_2D.m + disparitySolvers.c) — literal ports
# ---------------------------------------------------------------------------


def _ddiff_weights_np(d, eps=1e-5):
    """DdiffWeights semantics (mex/source/DdiffWeights.c ->
    imageDiffusionWeights.c): Brox 6-point weights of a (possibly
    multi-channel) field with max-over-channels combination and the
    missing-neighbour border entries left at zero (Calc_wW writes only
    columns j>=1, etc.).

    d: (H, W) or (C, H, W). Returns (wW, wN, wE, wS)."""
    d = np.asarray(d, np.float64)
    if d.ndim == 2:
        d = d[None]

    def ver(x):  # 0.25*(north - south), ends clamped (Dver)
        out = np.empty_like(x)
        out[1:-1] = 0.25 * (x[:-2] - x[2:])
        out[0] = 0.25 * (x[0] - x[1])
        out[-1] = 0.25 * (x[-2] - x[-1])
        return out

    def hor(x):  # 0.25*(west - east), ends clamped (Dhor)
        return ver(x.T).T

    h, w = d.shape[1:]
    tw = np.zeros((4,) + d.shape)
    for k, dk in enumerate(d):
        v, hzn = ver(dk), hor(dk)
        tw[0, k, :, 1:] = (dk[:, 1:] - dk[:, :-1]) ** 2 + (v[:, 1:] + v[:, :-1]) ** 2
        tw[1, k, 1:, :] = (dk[1:, :] - dk[:-1, :]) ** 2 + (hzn[1:, :] + hzn[:-1, :]) ** 2
        tw[2, k, :, :-1] = (dk[:, :-1] - dk[:, 1:]) ** 2 + (v[:, :-1] + v[:, 1:]) ** 2
        tw[3, k, :-1, :] = (dk[:-1, :] - dk[1:, :]) ** 2 + (hzn[:-1, :] + hzn[1:, :]) ** 2
    tw = tw.max(axis=1)
    ww, wn, we, ws = (1.0 / np.sqrt(t + eps) for t in tw)
    ww[:, 0] = 0.0
    wn[0, :] = 0.0
    we[:, -1] = 0.0
    ws[-1, :] = 0.0
    return ww, wn, we, ws


def gs_sor_disp_llin4(u, du, cu, duc, ww, wn, we, ws, iters, omega):
    """Pointwise scalar late-lin GS-SOR (disparitySolvers.c:41-153):
    lexicographic interior sweep + border replication each iteration."""
    u = np.asarray(u, np.float64)
    du = np.asarray(du, np.float64).copy()
    h, w = u.shape
    valid = ~np.isnan(cu)
    dividend = np.where(valid, np.nan_to_num(cu), 0.0)
    div = 1.0 / (np.where(valid, np.nan_to_num(duc), 0.0) + ww + wn + we + ws)
    for _ in range(iters):
        for j in range(1, w - 1):
            for i in range(1, h - 1):
                wneigh = ((u[i, j + 1] + du[i, j + 1] - u[i, j]) * we[i, j]
                          + (u[i, j - 1] + du[i, j - 1] - u[i, j]) * ww[i, j]
                          + (u[i + 1, j] + du[i + 1, j] - u[i, j]) * ws[i, j]
                          + (u[i - 1, j] + du[i - 1, j] - u[i, j]) * wn[i, j])
                du[i, j] = ((1 - omega) * du[i, j]
                            + omega * (wneigh + dividend[i, j]) * div[i, j])
        du[0, :] = du[1, :]
        du[-1, :] = du[-2, :]
        du[:, 0] = du[:, 1]
        du[:, -1] = du[:, -2]
    return du.astype(np.float32)


def seq_alr_disp_llin4(u, du, cu, duc, ww, wn, we, ws, iters, omega):
    """Sequential scalar ALR (GS_ALR_SOR_llin4_2d, disparitySolvers.c:154-217
    + westColumn4/middleColumn4/... :1376-2050): per iteration all columns
    west->east then all rows north->south; each line solved exactly by the
    Thomas algorithm (boundary lines included, missing neighbours dropped),
    then over-relaxed dU <- (1-w)*dU + w*x."""
    from scipy.linalg import solve_banded

    u = np.asarray(u, np.float64)
    du = np.asarray(du, np.float64).copy()
    h, w = u.shape
    wwz = ww.copy(); wwz[:, 0] = 0
    wez = we.copy(); wez[:, -1] = 0
    wnz = wn.copy(); wnz[0, :] = 0
    wsz = ws.copy(); wsz[-1, :] = 0
    valid = ~np.isnan(cu)
    b_data = np.where(valid, np.nan_to_num(duc), 0.0)
    d_data = np.where(valid, np.nan_to_num(cu), 0.0)

    def col_solve(j):
        b = wnz[:, j] + wsz[:, j] + wwz[:, j] + wez[:, j] + b_data[:, j]
        rhs = d_data[:, j].copy()
        if j > 0:
            rhs += wwz[:, j] * (u[:, j - 1] - u[:, j] + du[:, j - 1])
        if j < w - 1:
            rhs += wez[:, j] * (u[:, j + 1] - u[:, j] + du[:, j + 1])
        rhs[1:] += wnz[1:, j] * (u[:-1, j] - u[1:, j])
        rhs[:-1] += wsz[:-1, j] * (u[1:, j] - u[:-1, j])
        ab = np.zeros((3, h))
        ab[0, 1:] = -wsz[:-1, j]
        ab[1] = b
        ab[2, :-1] = -wnz[1:, j]
        x = solve_banded((1, 1), ab, rhs)
        du[:, j] = omega * x + (1 - omega) * du[:, j]

    def row_solve(i):
        b = wnz[i, :] + wsz[i, :] + wwz[i, :] + wez[i, :] + b_data[i, :]
        rhs = d_data[i, :].copy()
        if i > 0:
            rhs += wnz[i, :] * (u[i - 1, :] - u[i, :] + du[i - 1, :])
        if i < h - 1:
            rhs += wsz[i, :] * (u[i + 1, :] - u[i, :] + du[i + 1, :])
        rhs[1:] += wwz[i, 1:] * (u[i, :-1] - u[i, 1:])
        rhs[:-1] += wez[i, :-1] * (u[i, 1:] - u[i, :-1])
        ab = np.zeros((3, w))
        ab[0, 1:] = -wez[i, :-1]
        ab[1] = b
        ab[2, :-1] = -wwz[i, 1:]
        x = solve_banded((1, 1), ab, rhs)
        du[i, :] = omega * x + (1 - omega) * du[i, :]

    for _ in range(iters):
        for j in range(w):
            col_solve(j)
        for i in range(h):
            row_solve(i)
    return du.astype(np.float32)


def disp_nd_oracle(il, ir, fst_term="grad", snd_term="gradmag",
                   alpha=0.042, gamma_s=0.005, omega=1.9, first_loop=4,
                   second_loop=6, iters=4, b1=1.48, b2=0.29,
                   scl_factor=0.75, solver=2, us=None, collect=None):
    """Literal port of DispEminND_llin_2D.m (defaults :52-66).

    il/ir: (H, W) or (C, H, W) in [0, 255]. Returns U (negative for a
    left-of-right camera pair). ``collect``: optional list; per-level U
    fields are appended (coarsest first) for intermediate parity checks."""
    import scipy.ndimage as ndi

    il = np.asarray(il, np.float64) / 255.0
    ir = np.asarray(ir, np.float64) / 255.0
    if il.ndim == 2:
        il, ir = il[None], ir[None]
    g = _fspecial_gaussian((5, 5), 1.25)

    def smooth(chans):
        return [_imfilter_rep(c, g) for c in chans]

    lv0, lv1 = [list(il)], [list(ir)]
    while True:
        nh = int(np.ceil(lv0[-1][0].shape[0] * scl_factor))
        nw = int(np.ceil(lv0[-1][0].shape[1] * scl_factor))
        n0 = [_imresize_np(c, (nh, nw)) for c in lv0[-1]]
        n1 = [_imresize_np(c, (nh, nw)) for c in lv1[-1]]
        lv0[-1] = smooth(lv0[-1])
        lv1[-1] = smooth(lv1[-1])
        lv0.append(n0)
        lv1.append(n1)
        if nh <= 10 or nw <= 10:
            lv0[-1] = smooth(lv0[-1])
            lv1[-1] = smooth(lv1[-1])
            break

    def fst_imgs(chans):
        return _rgb2grad_np(chans) if fst_term == "grad" else chans

    def snd_imgs(chans):
        return None if snd_term == "none" else chans

    us_lv = None
    u = None
    if us is not None:
        cur = np.nan_to_num(np.asarray(us, np.float64))
        us_lv = [cur]
        for scl in range(1, len(lv0)):
            cur = _imresize_np(cur * scl_factor, lv0[scl][0].shape, "bilinear")
            us_lv.append(cur)
        u = us_lv[-1]

    n = len(lv0)
    for scl in range(n - 1, -1, -1):
        as_diff = 1.75 * (1.0 / scl_factor) ** (-scl)
        i1t0, i1t1 = fst_imgs(lv0[scl]), fst_imgs(lv1[scl])
        i2t0, i2t1 = snd_imgs(lv0[scl]), snd_imgs(lv1[scl])
        h, w = i1t0[0].shape
        if u is None:
            u = np.zeros((h, w))
        yy, xx = np.mgrid[1:h + 1, 1:w + 1].astype(np.float64)
        for _first in range(first_loop):
            i1t1w = [_bilin_interp_nan(c, xx + u, yy) for c in i1t1]
            t1 = [_fst5(a, b) for a, b in zip(i1t0, i1t1w)]
            if i2t1 is not None:
                i2t1w = [_bilin_interp_nan(c, xx + u, yy) for c in i2t1]
                t2 = ([_snd5(a, b) for a, b in zip(i2t0, i2t1w)]
                      if snd_term == "gradmag"
                      else [_fst5(a, b) for a, b in zip(i2t0, i2t1w)])
            du = np.zeros((h, w))
            for _second in range(second_loop):
                parts_cu, parts_du = [], []
                for (idt, idx, _idy) in t1:
                    gd1 = b1 / (alpha * np.sqrt((idt - idx * du) ** 2 + 1e-5))
                    parts_cu.append(idt * idx * gd1)
                    parts_du.append(idx * idx * gd1)
                if i2t1 is not None:
                    for tt in t2:
                        if snd_term == "gradmag":
                            idxt, idyt, idxx, _idyy, idxy = tt
                            opn = (idxt - idxx * du) ** 2 + (idyt - idxy * du) ** 2
                            gd2 = b2 / (alpha * np.sqrt(opn + 1e-5))
                            parts_cu.append((idxt * idxx + idyt * idxy) * gd2)
                            parts_du.append((idxx * idxx + idxy * idxy) * gd2)
                        else:
                            idt, idx, _idy = tt
                            gd2 = b2 / (alpha * np.sqrt((idt - idx * du) ** 2 + 1e-5))
                            parts_cu.append(idt * idx * gd2)
                            parts_du.append(idx * idx * gd2)
                if us_lv is not None:
                    ap_norm = (us_lv[scl] - u - du) ** 2
                    gs = gamma_s / alpha * np.exp(-ap_norm / as_diff**2)
                    parts_cu.append((us_lv[scl] - u) * gs)
                    parts_du.append(np.ones_like(gs) * gs)
                # plain sum (DispEminND:291-292): NaN propagates
                cu_gd = np.sum(np.stack(parts_cu), axis=0)
                du_gd = np.sum(np.stack(parts_du), axis=0)
                ww, wn, we, ws = _ddiff_weights_np(u + du)
                if solver == 2:
                    du = seq_alr_disp_llin4(u, du, cu_gd, du_gd,
                                            ww, wn, we, ws, iters, omega)
                else:
                    du = gs_sor_disp_llin4(u, du, cu_gd, du_gd,
                                           ww, wn, we, ws, iters, omega)
                du = du.astype(np.float64)
            u = ndi.median_filter(u + du, size=3, mode="reflect")
        if collect is not None:
            collect.append(u.astype(np.float32))
        if scl > 0:
            nh, nw = lv0[scl - 1][0].shape
            u = _imresize_np(u / scl_factor, (nh, nw), "bilinear")
    return u.astype(np.float32)


# ---------------------------------------------------------------------------
# Anisotropic-diffusion flow (FlowEminAD_llin_2D_v10.m) — literal ports
# ---------------------------------------------------------------------------


def _ad_diff_weights_np(d, quantile=0.9, zero_borders=False, round_eps=False):
    """ADdiffWeights (FlowEminAD_llin_2D_v10.m:416-488): Alvarez 3x3
    derivators (imfilter 'conv'), max-gradient channel selection, adaptive
    lambda at the given quantile of nonzero |grad|^2, diffusion-tensor
    stencil via circshift averaging. d: (H, W) or (C, H, W)."""
    import scipy.ndimage as ndi

    d = np.asarray(d, np.float64)
    if d.ndim == 2:
        d = d[None]
    r8 = np.sqrt(8.0)
    o_dx = np.array([[1, 0, -1], [r8 / 2, 0, -r8 / 2], [1, 0, -1]]) / (4 + r8)
    o_dy = o_dx.T.copy()
    # imfilter(..., 'conv') = convolution: flip the kernel for correlate
    dx = np.stack([ndi.correlate(c, o_dx[::-1, ::-1], mode="nearest") for c in d])
    dy = np.stack([ndi.correlate(c, o_dy[::-1, ::-1], mode="nearest") for c in d])
    norm = dx**2 + dy**2
    idx = norm.argmax(axis=0)
    take = np.take_along_axis
    max_dx = take(dx, idx[None], 0)[0]
    max_dy = take(dy, idx[None], 0)[0]
    norm_max = max_dx**2 + max_dy**2

    nz = np.sort(norm_max.ravel()[norm_max.ravel() != 0])
    if nz.size:
        # MATLAB: sorted(round(numel*q)), 1-based; TVdenoise8.m:200 adds
        # +eps inside the round
        q = nz.size * quantile + (np.finfo(np.float64).eps if round_eps else 0.0)
        lam = nz[min(max(int(np.floor(q + 0.5)) - 1, 0), nz.size - 1)]
    else:
        lam = 1.0
    mult = 1.0 / (norm_max + 2 * lam)
    dyy = mult * (max_dy**2 + lam)
    dxx = mult * (max_dx**2 + lam)
    dxy = -mult * (max_dx * max_dy)

    def cs(a, sh):
        return np.roll(a, sh, axis=(0, 1))

    w = 0.5 * (dyy + cs(dyy, (0, 1)))
    nw = 0.25 * (dxy + cs(dxy, (1, 1)))
    n_ = 0.5 * (dxx + cs(dxx, (1, 0)))
    ne = -0.25 * (dxy + cs(dxy, (1, -1)))
    e = 0.5 * (dyy + cs(dyy, (0, -1)))
    se = 0.25 * (dxy + cs(dxy, (-1, -1)))
    s = 0.5 * (dxx + cs(dxx, (-1, 0)))
    sw = -0.25 * (dxy + cs(dxy, (-1, 1)))
    if zero_borders:  # TVdenoise8.m:213-220
        w[:, 0] = 0.0
        nw[:, 0] = 0.0
        nw[0, :] = 0.0
        n_[0, :] = 0.0
        ne[:, -1] = 0.0
        ne[0, :] = 0.0
        e[:, -1] = 0.0
        se[:, -1] = 0.0
        se[-1, :] = 0.0
        s[-1, :] = 0.0
        sw[-1, :] = 0.0
        sw[:, 0] = 0.0
    return w, nw, n_, ne, e, se, s, sw


def gs_sor_pde8(x, trace, b, ww, wnw, wn, wne, we, wse, ws, wsw, iters, omega):
    """Pointwise lexicographic GS-SOR, diagonal form, 8-neighbour
    (GS_SOR_8_2d, pdeSolvers.c:153-268): interior sweep with NaN-TRACE
    pure-diffusion fallback, then 1-px border replication each sweep
    (rows first, then columns incl. corners)."""
    x = x.astype(np.float32).copy()
    h, w = x.shape
    tr_nan = np.isnan(trace)
    wsum8 = ww + wnw + wn + wne + we + wse + ws + wsw
    inv_tr = np.where(tr_nan, 1.0 / wsum8, 1.0 / np.where(tr_nan, 1.0, trace))
    b_eff = np.where(tr_nan, 0.0, b).astype(np.float32)
    for _ in range(iters):
        for j in range(1, w - 1):
            for i in range(1, h - 1):
                nb = (x[i, j + 1] * we[i, j] + x[i, j - 1] * ww[i, j]
                      + x[i + 1, j] * ws[i, j] + x[i - 1, j] * wn[i, j]
                      + x[i + 1, j - 1] * wsw[i, j] + x[i - 1, j - 1] * wnw[i, j]
                      + x[i + 1, j + 1] * wse[i, j] + x[i - 1, j + 1] * wne[i, j])
                x[i, j] = ((1.0 - omega) * x[i, j]
                           + omega * (b_eff[i, j] + nb) * inv_tr[i, j])
        x[0, :] = x[1, :]
        x[-1, :] = x[-2, :]
        x[:, 0] = x[:, 1]
        x[:, -1] = x[:, -2]
    return x


def tv_denoise8_oracle(img, alpha=500.0, omega=1.75, outer=20, inner=4,
                       scl=0.75, scl_factor=0.75, quantile=0.5):
    """Literal port of TVdenoise8.m (pyramid :55-75 with the coarsest
    level left unsmoothed — the Itin typo at :72 — and the anisotropic
    tensor weights with zeroed borders :119-231), single channel."""
    img = img.astype(np.float64)
    g = _fspecial_gaussian((5, 5), 1.25)
    ds_r = int(np.ceil(img.shape[0] * scl))
    ds_c = int(np.ceil(img.shape[1] * scl))
    levels = [img]
    raw = img
    while True:
        nxt = _imresize_np(raw, (int(np.ceil(raw.shape[0] * scl_factor)),
                                 int(np.ceil(raw.shape[1] * scl_factor))))
        levels[-1] = _imfilter_rep(levels[-1], g)
        levels.append(nxt)
        raw = nxt
        if nxt.shape[0] <= ds_r or nxt.shape[1] <= ds_c:
            break  # coarsest level NOT smoothed (Itin typo, TVdenoise8.m:72)
    iout = levels[-1]
    eps = np.finfo(np.float64).eps
    for lvl in range(len(levels) - 1, -1, -1):
        f = levels[lvl]
        for _ in range(outer + 1):
            w8 = _ad_diff_weights_np(iout, quantile=quantile,
                                     zero_borders=True, round_eps=True)
            psi = 1.0 / np.sqrt((iout - f) ** 2 + eps)
            trace = psi + alpha * np.sum(w8, axis=0)
            b = psi * f
            iout = gs_sor_pde8(
                iout.astype(np.float32), trace.astype(np.float32),
                b.astype(np.float32),
                *[(alpha * wx).astype(np.float32) for wx in w8],
                inner, omega).astype(np.float64)
        if lvl > 0:
            iout = _imresize_np(iout, levels[lvl - 1].shape)
    return iout.astype(np.float32)


def seq_alr_llin8(u, v, du, dv, m, cu, cv, duc, dvc, w8, iters, omega):
    """Sequential ALR for the 8-neighbour late-lin pair (GS_ALR_SOR_llin8_2d
    + middleColumn_llin8 etc., opticalflowSolvers.c:1677-1760): per
    iteration U cols, V cols, V rows, U rows; intra-line neighbours
    implicit (Thomas), cross-line (incl. diagonals) lagged with their
    current dU; data terms gated on isnan(Cu)."""
    from scipy.linalg import solve_banded

    ww, wnw, wn, wne, we, wse, ws, wsw = [x.astype(np.float64) for x in w8]
    du = du.astype(np.float64).copy()
    dv = dv.astype(np.float64).copy()
    h, w = du.shape
    # zero the weights whose neighbour falls outside (border lines solve
    # one-sided systems in the C code)
    for arr, sl in ((ww, np.s_[:, 0]), (we, np.s_[:, -1]),
                    (wn, np.s_[0, :]), (ws, np.s_[-1, :]),
                    (wnw, np.s_[:, 0]), (wnw, np.s_[0, :]),
                    (wne, np.s_[:, -1]), (wne, np.s_[0, :]),
                    (wsw, np.s_[:, 0]), (wsw, np.s_[-1, :]),
                    (wse, np.s_[:, -1]), (wse, np.s_[-1, :])):
        arr[sl] = 0
    wsum = ww + wnw + wn + wne + we + wse + ws + wsw

    def cross_col(df, f, j):
        """Explicit terms for column j: W/E/NW/NE/SW/SE with dU, base diffs."""
        rhs = np.zeros(h)
        if j > 0:
            rhs += ww[:, j] * (f[:, j - 1] - f[:, j] + df[:, j - 1])
            rhs[1:] += wnw[1:, j] * (f[:-1, j - 1] - f[1:, j] + df[:-1, j - 1])
            rhs[:-1] += wsw[:-1, j] * (f[1:, j - 1] - f[:-1, j] + df[1:, j - 1])
        if j < w - 1:
            rhs += we[:, j] * (f[:, j + 1] - f[:, j] + df[:, j + 1])
            rhs[1:] += wne[1:, j] * (f[:-1, j + 1] - f[1:, j] + df[:-1, j + 1])
            rhs[:-1] += wse[:-1, j] * (f[1:, j + 1] - f[:-1, j] + df[1:, j + 1])
        rhs[1:] += wn[1:, j] * (f[:-1, j] - f[1:, j])
        rhs[:-1] += ws[:-1, j] * (f[1:, j] - f[:-1, j])
        return rhs

    def cross_row(df, f, i):
        rhs = np.zeros(w)
        if i > 0:
            rhs += wn[i, :] * (f[i - 1, :] - f[i, :] + df[i - 1, :])
            rhs[1:] += wnw[i, 1:] * (f[i - 1, :-1] - f[i, 1:] + df[i - 1, :-1])
            rhs[:-1] += wne[i, :-1] * (f[i - 1, 1:] - f[i, :-1] + df[i - 1, 1:])
        if i < h - 1:
            rhs += ws[i, :] * (f[i + 1, :] - f[i, :] + df[i + 1, :])
            rhs[1:] += wsw[i, 1:] * (f[i + 1, :-1] - f[i, 1:] + df[i + 1, :-1])
            rhs[:-1] += wse[i, :-1] * (f[i + 1, 1:] - f[i, :-1] + df[i + 1, 1:])
        rhs[1:] += ww[i, 1:] * (f[i, :-1] - f[i, 1:])
        rhs[:-1] += we[i, :-1] * (f[i, 1:] - f[i, :-1])
        return rhs

    def col_solve(df, f, other_df, c_, d_, j):
        valid = ~np.isnan(c_[:, j])
        b = wsum[:, j] + np.where(valid, np.nan_to_num(d_[:, j]), 0)
        rhs = cross_col(df, f, j) + np.where(
            valid,
            np.nan_to_num(c_[:, j]) - np.nan_to_num(m[:, j]) * other_df[:, j], 0)
        ab = np.zeros((3, h))
        ab[0, 1:] = -ws[:-1, j]
        ab[1] = b
        ab[2, :-1] = -wn[1:, j]
        x = solve_banded((1, 1), ab, rhs)
        df[:, j] = omega * x + (1 - omega) * df[:, j]

    def row_solve(df, f, other_df, c_, d_, i):
        valid = ~np.isnan(c_[i, :])
        b = wsum[i, :] + np.where(valid, np.nan_to_num(d_[i, :]), 0)
        rhs = cross_row(df, f, i) + np.where(
            valid,
            np.nan_to_num(c_[i, :]) - np.nan_to_num(m[i, :]) * other_df[i, :], 0)
        ab = np.zeros((3, w))
        ab[0, 1:] = -we[i, :-1]
        ab[1] = b
        ab[2, :-1] = -ww[i, 1:]
        x = solve_banded((1, 1), ab, rhs)
        df[i, :] = omega * x + (1 - omega) * df[i, :]

    for _ in range(iters):
        for j in range(w):
            col_solve(du, u, dv, cu, duc, j)
        for j in range(w):
            col_solve(dv, v, du, cv, dvc, j)
        for i in range(h):
            row_solve(dv, v, du, cv, dvc, i)
        for i in range(h):
            row_solve(du, u, dv, cu, duc, i)
    return du.astype(np.float32), dv.astype(np.float32)


def flow_ad_oracle(it0, it1, fst_term="grad", snd_term="gradmag",
                   diffusion="image", quantile=0.9, alpha=0.0420, omega=1.9,
                   first_loop=4, second_loop=4, iters=4, b1=1.4843,
                   b2=0.2915, scl_factor=0.75, collect=None):
    """Literal port of FlowEminAD_llin_2D_v10.m (defaults :55-72, no
    spatial prior). Returns (U, V); ``collect`` gathers per-level fields."""
    import scipy.ndimage as ndi

    it0 = np.asarray(it0, np.float64) / 255.0
    it1 = np.asarray(it1, np.float64) / 255.0
    if it0.ndim == 2:
        it0, it1 = it0[None], it1[None]
    g = _fspecial_gaussian((5, 5), 1.25)

    def smooth(chans):
        return [_imfilter_rep(c, g) for c in chans]

    lv0, lv1 = [list(it0)], [list(it1)]
    while True:
        nh = int(np.ceil(lv0[-1][0].shape[0] * scl_factor))
        nw = int(np.ceil(lv0[-1][0].shape[1] * scl_factor))
        n0 = [_imresize_np(c, (nh, nw)) for c in lv0[-1]]
        n1 = [_imresize_np(c, (nh, nw)) for c in lv1[-1]]
        lv0[-1] = smooth(lv0[-1])
        lv1[-1] = smooth(lv1[-1])
        lv0.append(n0)
        lv1.append(n1)
        if nh <= 20 or nw <= 20:   # FlowEminAD:122 stop <= 20 px
            lv0[-1] = smooth(lv0[-1])
            lv1[-1] = smooth(lv1[-1])
            break

    def fst_imgs(chans):
        return _rgb2grad_np(chans) if fst_term == "grad" else chans

    u = v = None
    n = len(lv0)
    for scl in range(n - 1, -1, -1):
        i1t0, i1t1 = fst_imgs(lv0[scl]), fst_imgs(lv1[scl])
        i2t0, i2t1 = ((None, None) if snd_term == "none"
                      else (lv0[scl], lv1[scl]))
        h, w = i1t0[0].shape
        if u is None:
            u = np.zeros((h, w))
            v = np.zeros((h, w))
        if diffusion == "image":
            w8 = _ad_diff_weights_np(np.stack(lv0[scl]), quantile)
        yy, xx = np.mgrid[1:h + 1, 1:w + 1].astype(np.float64)
        for _first in range(first_loop):
            i1t1w = [_bilin_interp_nan(c, xx + u, yy + v) for c in i1t1]
            t1 = [_fst5(a, b) for a, b in zip(i1t0, i1t1w)]
            if i2t1 is not None:
                i2t1w = [_bilin_interp_nan(c, xx + u, yy + v) for c in i2t1]
                t2 = ([_snd5(a, b) for a, b in zip(i2t0, i2t1w)]
                      if snd_term == "gradmag"
                      else [_fst5(a, b) for a, b in zip(i2t0, i2t1w)])
            du = np.zeros((h, w))
            dv = np.zeros((h, w))
            for _second in range(second_loop):
                pm, pcu, pcv, pdu, pdv = [], [], [], [], []
                for (idt, idx, idy) in t1:
                    gd = b1 / (alpha * np.sqrt((idt - idx * du - idy * dv) ** 2 + 1e-5))
                    pm.append(idy * idx * gd)
                    pcu.append(idt * idx * gd)
                    pcv.append(idt * idy * gd)
                    pdu.append(idx * idx * gd)
                    pdv.append(idy * idy * gd)
                if i2t1 is not None:
                    for tt in t2:
                        if snd_term == "gradmag":
                            idxt, idyt, idxx, idyy, idxy = tt
                            opn = (idxt - idxx * du - idxy * dv) ** 2 \
                                + (idyt - idxy * du - idyy * dv) ** 2
                            gd = b2 / (alpha * np.sqrt(opn + 1e-5))
                            pm.append(idxy * (idxx + idyy) * gd)
                            pcu.append((idxt * idxx + idyt * idxy) * gd)
                            pcv.append((idxt * idxy + idyt * idyy) * gd)
                            pdu.append((idxx * idxx + idxy * idxy) * gd)
                            pdv.append((idxy * idxy + idyy * idyy) * gd)
                        else:
                            idt, idx, idy = tt
                            gd = b2 / (alpha * np.sqrt((idt - idx * du - idy * dv) ** 2 + 1e-5))
                            pm.append(idy * idx * gd)
                            pcu.append(idt * idx * gd)
                            pcv.append(idt * idy * gd)
                            pdu.append(idx * idx * gd)
                            pdv.append(idy * idy * gd)
                if diffusion == "flow":
                    w8 = _ad_diff_weights_np(u + du + v + dv, quantile)

                def nsum(parts):
                    return np.nansum(np.stack(parts), axis=0)

                m = nsum(pm)
                du, dv = seq_alr_llin8(u, v, du, dv, m, nsum(pcu), nsum(pcv),
                                       nsum(pdu), nsum(pdv), w8, iters, omega)
                du = du.astype(np.float64)
                dv = dv.astype(np.float64)
            u = ndi.median_filter(u + du, size=3, mode="reflect")
            v = ndi.median_filter(v + dv, size=3, mode="reflect")
        if collect is not None:
            collect.append((u.astype(np.float32), v.astype(np.float32)))
        if scl > 0:
            nh, nw = lv0[scl - 1][0].shape
            u = _imresize_np(u / scl_factor, (nh, nw))
            v = _imresize_np(v / scl_factor, (nh, nw))
    return u.astype(np.float32), v.astype(np.float32)


# ---------------------------------------------------------------------------
# FAS full-multigrid flow (FlowEminNDFASFMG_elin_2D_v10.m) — literal port
# ---------------------------------------------------------------------------


def _conv_rep(x, k):
    """imfilter(..., 'replicate', 'conv'): true convolution."""
    import scipy.ndimage as ndi

    return ndi.correlate(x, np.flip(k), mode="nearest")


def _residuals_elin4_np(u, v, m, cu, cv, duc, dvc, ww, wn, we, ws):
    """Residuals_elin4_2d (opticalflowSolvers.c:269-385): r = b - A x on
    the interior, 1-px border replication."""
    def nbr(x):
        xp = np.pad(x, 1, mode="edge")
        return (ww * xp[1:-1, :-2] + we * xp[1:-1, 2:]
                + wn * xp[:-2, 1:-1] + ws * xp[2:, 1:-1])

    wsum = ww + wn + we + ws
    ru = cu - m * v + nbr(u) - (duc + wsum) * u
    rv = cv - m * u + nbr(v) - (dvc + wsum) * v

    def rep(x):
        x = x.copy()
        x[0, :] = x[1, :]; x[-1, :] = x[-2, :]
        x[:, 0] = x[:, 1]; x[:, -1] = x[:, -2]
        return x

    return rep(ru), rep(rv)


def _lhs_elin4_np(u, v, m, duc, dvc, ww, wn, we, ws):
    """LHS_elin4_2d (opticalflowSolvers.c:387-503): A x, border-replicated."""
    def nbr(x):
        xp = np.pad(x, 1, mode="edge")
        return (ww * xp[1:-1, :-2] + we * xp[1:-1, 2:]
                + wn * xp[:-2, 1:-1] + ws * xp[2:, 1:-1])

    wsum = ww + wn + we + ws
    au = m * v - nbr(u) + (duc + wsum) * u
    av = m * u - nbr(v) + (dvc + wsum) * v

    def rep(x):
        x = x.copy()
        x[0, :] = x[1, :]; x[-1, :] = x[-2, :]
        x[:, 0] = x[:, 1]; x[:, -1] = x[:, -2]
        return x

    return rep(au), rep(av)


_FW = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float64) / 16.0


def _restrict(x, scl_factor):
    return _conv_rep(x * scl_factor, _FW)[::2, ::2]


def flow_fmg_oracle(it0, it1, alpha=0.035, omega=1.9, first_loop=4, iters=4,
                    b1=0.03, b2=0.97, scl_factor=0.5, cycle_index=1,
                    solver=2, collect=None):
    """Literal port of FlowEminNDFASFMG_elin_2D_v10.m, single channel
    (the Yosemite demo, runme.m:90). Input in [0, 255]. ``collect``
    gathers (U, V) after each top-level FAS cycle, coarsest first."""
    import scipy.ndimage as ndi

    it0 = np.asarray(it0, np.float64)
    it1 = np.asarray(it1, np.float64)
    assert it0.ndim == 2, "oracle supports the single-channel demo"

    pre = np.array([0.037659, 0.249724, 0.439911, 0.249724, 0.037659])
    o_dx = np.array([0.104550, 0.292315, 0.0, -0.292315, -0.104550])
    o_dxx = np.array([0.232905, 0.002668, -0.471147, 0.002668, 0.232905])

    def conv_h(x, k):
        return _conv_rep(x, k[None, :])

    def conv_v(x, k):
        return _conv_rep(x, k[:, None])

    g = _fspecial_gaussian((5, 5), 1.0)
    lv0 = [_conv_rep(it0, g)]
    lv1 = [_conv_rep(it1, g)]
    while True:
        n0 = conv_v(conv_h(lv0[-1], np.array([1, 4, 6, 4, 1]) / 16.0),
                    np.array([1, 4, 6, 4, 1]) / 16.0)[::2, ::2]
        n1 = conv_v(conv_h(lv1[-1], np.array([1, 4, 6, 4, 1]) / 16.0),
                    np.array([1, 4, 6, 4, 1]) / 16.0)[::2, ::2]
        lv0.append(n0)
        lv1.append(n1)
        if n0.shape[0] <= 10 or n0.shape[1] <= 10:
            break
    n = len(lv0)

    T = []  # per-level tensors
    for a, b in zip(lv0, lv1):
        ist = (a + b) * 0.55 / 255.0
        idt = (a - b) / 255.0
        idx = conv_h(conv_v(ist, pre), o_dx)
        idy = conv_v(conv_h(ist, pre), o_dx)
        idxx = conv_h(conv_v(ist, pre), o_dxx)
        idyy = conv_v(conv_h(ist, pre), o_dxx)
        idxy = conv_v(conv_h(ist, o_dx), o_dx)
        idxt = (conv_h(conv_v(a, pre), o_dx / 255.0)
                - conv_h(conv_v(b, pre), o_dx / 255.0))
        idyt = (conv_v(conv_h(a, pre), o_dx / 255.0)
                - conv_v(conv_h(b, pre), o_dx / 255.0))
        T.append(dict(
            idt=idt, idx=idx, idy=idy, idxx=idxx, idyy=idyy, idxy=idxy,
            idxt=idxt, idyt=idyt,
            m=b1 * idy * idx + b2 * idxy * (idxx + idyy),
            cu=b1 * idt * idx + b2 * (idxt * idxx + idyt * idxy),
            cv=b1 * idt * idy + b2 * (idxt * idxy + idyt * idyy),
            du=b1 * idx * idx + b2 * (idxx * idxx + idxy * idxy),
            dv=b1 * idy * idy + b2 * (idxy * idxy + idyy * idyy),
        ))

    def opnorm(t, u, v):
        return (b1 * (t["idt"] - t["idx"] * u - t["idy"] * v) ** 2
                + b2 * ((t["idxt"] - t["idxx"] * u - t["idxy"] * v) ** 2
                        + (t["idyt"] - t["idxy"] * u - t["idyy"] * v) ** 2))

    def smooth(u, v, t, cu, cv, want_res):
        for _ in range(first_loop):
            gd = 1.0 / (alpha * np.sqrt(opnorm(t, u, v) + 1e-5))
            ww, wn, we, ws = _op_diff_weights(u, v)
            args = (t["m"] * gd, cu * gd, cv * gd, t["du"] * gd, t["dv"] * gd,
                    ww, wn, we, ws)
            if solver == 2:
                u, v = seq_alr_elin4(u, v, *args, iters, omega)
            else:
                u, v = gs_sor_elin4(u, v, *args, iters, omega)
            u, v = u.astype(np.float64), v.astype(np.float64)
        if not want_res:
            return u, v, None, None
        gd = 1.0 / (alpha * np.sqrt(opnorm(t, u, v) + 1e-5))
        ww, wn, we, ws = _op_diff_weights(u, v)
        ru, rv = _residuals_elin4_np(u, v, t["m"] * gd, cu * gd, cv * gd,
                                     t["du"] * gd, t["dv"] * gd, ww, wn, we, ws)
        return u, v, ru, rv

    def fas_cycle(u, v, cu, cv, scl):
        if scl == n - 1:
            u, v, _, _ = smooth(u, v, T[scl], cu, cv, False)
            return u, v
        for _ in range(cycle_index):
            u, v, ru, rv = smooth(u, v, T[scl], cu, cv, True)
            ru_res = _restrict(ru, scl_factor)
            rv_res = _restrict(rv, scl_factor)
            u_res = _restrict(u, scl_factor)
            v_res = _restrict(v, scl_factor)
            tc = T[scl + 1]
            gd = 1.0 / (alpha * np.sqrt(opnorm(tc, u_res, v_res) + 1e-5))
            ww, wn, we, ws = _op_diff_weights(u_res, v_res)
            au, av = _lhs_elin4_np(u_res, v_res, tc["m"] * gd,
                                   tc["du"] * gd, tc["dv"] * gd,
                                   ww, wn, we, ws)
            fu = (ru_res + au) / gd
            fv = (rv_res + av) / gd
            uc, vc = fas_cycle(u_res.copy(), v_res.copy(), fu, fv, scl + 1)
            u = u + _imresize_np((uc - u_res) / scl_factor, u.shape, "bilinear")
            v = v + _imresize_np((vc - v_res) / scl_factor, v.shape, "bilinear")
        # postsmoothing (once, after all cycle_index passes — the MATLAB
        # 'if ~isempty(Uc)' block sits outside the ci loop, :269-272)
        u, v, _, _ = smooth(u, v, T[scl], cu, cv, False)
        return u, v

    u = v = None
    for scl in range(n - 1, -1, -1):
        if u is None:
            u = np.zeros(lv0[scl].shape)
            v = np.zeros(lv0[scl].shape)
        u, v = fas_cycle(u, v, T[scl]["cu"], T[scl]["cv"], scl)
        if collect is not None:
            collect.append((u.astype(np.float32), v.astype(np.float32)))
        if scl > 0:
            # MATLAB default imresize method = bicubic (antialias only on
            # downscale, so plain bicubic here)
            u = _imresize_np(u / scl_factor, lv0[scl - 1].shape, "cubic")
            v = _imresize_np(v / scl_factor, lv0[scl - 1].shape, "cubic")
    return u.astype(np.float32), v.astype(np.float32)


# ---------------------------------------------------------------------------
# Symmetric disparity (DispEminND_llin_sym_2D.m) — literal port
# ---------------------------------------------------------------------------


def disp_sym_oracle(il, ir, alpha=0.035, beta=0.4, omega=1.9, first_loop=3,
                    second_loop=4, iters=4, b1=0.25, b2=0.72,
                    scl_factor=0.75, collect=None):
    """Literal port of DispEminND_llin_sym_2D.m (defaults :50-64).

    Raw 0-255 domain (no /255). Returns (U0, U1). The coupled solver's
    two relaxations are independent given the Cu/Du tensors
    (GS_ALR_SOR_llinsym4_2d, disparitySolvers.c:462-552), so each side is
    the scalar ALR. ``collect`` gathers per-level (U0, U1)."""
    import scipy.ndimage as ndi

    il = np.asarray(il, np.float64)
    ir = np.asarray(ir, np.float64)
    if il.ndim == 2:
        il, ir = il[None], ir[None]
    g = _fspecial_gaussian((3, 3), 1.0)

    def smooth(chans):
        return [_imfilter_rep(c, g) for c in chans]

    lv0, lv1 = [list(il)], [list(ir)]
    while True:
        nh = int(np.ceil(lv0[-1][0].shape[0] * scl_factor))
        nw = int(np.ceil(lv0[-1][0].shape[1] * scl_factor))
        n0 = [_imresize_np(c, (nh, nw)) for c in lv0[-1]]
        n1 = [_imresize_np(c, (nh, nw)) for c in lv1[-1]]
        lv0[-1] = smooth(lv0[-1])
        lv1[-1] = smooth(lv1[-1])
        lv0.append(n0)
        lv1.append(n1)
        if nh <= 10 or nw <= 10:
            lv0[-1] = smooth(lv0[-1])
            lv1[-1] = smooth(lv1[-1])
            break

    def flow_dx(u):
        # conv(conv(U, prefilter'), O_dx): vertical smooth + horiz derive,
        # true convolution (kernels symmetric/antisymmetric: equals
        # correlation by _SM5 and _FD5)
        return _corr1(_corr1(u, _SM5, 0), _FD5, 1)

    n = len(lv0)
    u0 = u1 = None
    for scl in range(n - 1, -1, -1):
        i0, i1 = lv0[scl], lv1[scl]
        nch = len(i0)
        h, w = i0[0].shape
        if u0 is None:
            u0 = np.zeros((h, w))
            u1 = np.zeros((h, w))
        sr_diff = 2.0 * (1.0 / scl_factor) ** (-scl)
        yy, xx = np.mgrid[1:h + 1, 1:w + 1].astype(np.float64)
        for _first in range(first_loop):
            it0w = [_bilin_interp_nan(c, xx + u1, yy) for c in i0]
            it1w = [_bilin_interp_nan(c, xx + u0, yy) for c in i1]
            u0w = _bilin_interp_nan(u0, xx + u1, yy)
            u1w = _bilin_interp_nan(u1, xx + u0, yy)

            t0 = [_fst5(a, b) for a, b in zip(i0, it1w)]
            s0 = [_snd5(a, b) for a, b in zip(i0, it1w)]
            t1 = [_fst5(a, b) for a, b in zip(i1, it0w)]
            s1 = [_snd5(a, b) for a, b in zip(i1, it0w)]

            udt0 = 0.5 * (u0 + u1w)
            udx1 = flow_dx(u1w)
            udt1 = 0.5 * (u1 + u0w)
            udx0 = flow_dx(u0w)
            cus0 = udt0 * (1 + udx1)
            dus0 = 1 + 2 * udx1 + udx1**2
            cus1 = udt1 * (1 + udx0)
            dus1 = 1 + 2 * udx0 + udx0**2

            cud0 = [b1 * ft[0] * ft[1] + b2 * (st[0] * st[2] + st[1] * st[4])
                    for ft, st in zip(t0, s0)]
            dud0 = [b1 * ft[1] ** 2 + b2 * (st[2] ** 2 + st[4] ** 2)
                    for ft, st in zip(t0, s0)]
            cud1 = [b1 * ft[0] * ft[1] + b2 * (st[0] * st[2] + st[1] * st[4])
                    for ft, st in zip(t1, s1)]
            dud1 = [b1 * ft[1] ** 2 + b2 * (st[2] ** 2 + st[4] ** 2)
                    for ft, st in zip(t1, s1)]

            du0 = np.zeros((h, w))
            du1 = np.zeros((h, w))
            for _second in range(second_loop):
                def gd(ts, ss, du):
                    return [1.0 / (alpha * np.sqrt(
                        b1 * (ft[0] - ft[1] * du) ** 2
                        + b2 * ((st[0] - st[2] * du) ** 2
                                + (st[1] - st[4] * du) ** 2) + 1e-5))
                        for ft, st in zip(ts, ss)]

                gd0 = gd(t0, s0, du0)
                gd1 = gd(t1, s1, du1)
                gsym0 = (nch * beta / alpha) / (1 + (du0 + udt0 + udx1 * du0) ** 2 / sr_diff**2)
                gsym1 = (nch * beta / alpha) / (1 + (du1 + udt1 + udx0 * du1) ** 2 / sr_diff**2)

                ww0, wn0, we0, ws0 = _ddiff_weights_np(u0 + du0)
                ww1, wn1, we1, ws1 = _ddiff_weights_np(u1 + du1)

                cug0 = np.sum([g_ * c for g_, c in zip(gd0, cud0)], axis=0) - gsym0 * cus0
                dug0 = np.sum([g_ * d for g_, d in zip(gd0, dud0)], axis=0) + gsym0 * dus0
                cug1 = np.sum([g_ * c for g_, c in zip(gd1, cud1)], axis=0) - gsym1 * cus1
                dug1 = np.sum([g_ * d for g_, d in zip(gd1, dud1)], axis=0) + gsym1 * dus1

                du0 = seq_alr_disp_llin4(u0, du0, cug0, dug0,
                                         ww0, wn0, we0, ws0, iters, omega).astype(np.float64)
                du1 = seq_alr_disp_llin4(u1, du1, cug1, dug1,
                                         ww1, wn1, we1, ws1, iters, omega).astype(np.float64)
            u0 = ndi.median_filter(u0 + du0, size=3, mode="reflect")
            u1 = ndi.median_filter(u1 + du1, size=3, mode="reflect")
        if collect is not None:
            collect.append((u0.astype(np.float32), u1.astype(np.float32)))
        if scl > 0:
            nh, nw = lv0[scl - 1][0].shape
            u0 = _imresize_np(u0 / scl_factor, (nh, nw), "bilinear")
            u1 = _imresize_np(u1 / scl_factor, (nh, nw), "bilinear")
    return u0.astype(np.float32), u1.astype(np.float32)


# ---------------------------------------------------------------------------
# Geodesic active contours (GAC_v10a.m / GAC_v10b.m + levelsetSolvers.c)
# ---------------------------------------------------------------------------


def _reinit_np(phi, steps):
    """reinit, levelsetSolvers.c:969-1118 (plain-C path): explicit Euler
    dt=0.25 of PHI_t + S(PHI)(|grad PHI| - 1) = 0, Peng blurred sign
    (:1280-1303), Rouy-Tourin Godunov upwind with one-sided differences
    zeroed at the image edge (:1311-1388), central differences with
    replicate ends for the sign's gradient (:880-961)."""
    phi = phi.astype(np.float32).copy()
    flt_eps = np.float32(np.finfo(np.float32).eps)
    for _ in range(steps):
        px = np.empty_like(phi)
        py = np.empty_like(phi)
        px[:, 1:-1] = 0.5 * (phi[:, 2:] - phi[:, :-2])
        px[:, 0] = 0.5 * (phi[:, 1] - phi[:, 0])
        px[:, -1] = 0.5 * (phi[:, -1] - phi[:, -2])
        py[1:-1, :] = 0.5 * (phi[2:, :] - phi[:-2, :])
        py[0, :] = 0.5 * (phi[1, :] - phi[0, :])
        py[-1, :] = 0.5 * (phi[-1, :] - phi[-2, :])
        s = phi / np.sqrt(phi * phi + np.sqrt(px * px + py * py) + flt_eps)

        fd_x = np.zeros_like(phi)
        bd_x = np.zeros_like(phi)
        fd_y = np.zeros_like(phi)
        bd_y = np.zeros_like(phi)
        fd_x[:, :-1] = phi[:, 1:] - phi[:, :-1]
        bd_x[:, 1:] = phi[:, 1:] - phi[:, :-1]
        fd_y[:-1, :] = phi[1:, :] - phi[:-1, :]
        bd_y[1:, :] = phi[1:, :] - phi[:-1, :]

        def rt(bd, fd):
            pos = s > 0.0
            return np.where(
                pos,
                np.maximum(np.maximum(bd, 0.0) ** 2, np.minimum(fd, 0.0) ** 2),
                np.maximum(np.minimum(bd, 0.0) ** 2, np.maximum(fd, 0.0) ** 2),
            )

        gx2 = rt(bd_x, fd_x)
        gy2 = rt(bd_y, fd_y)
        phi = phi + np.float32(0.25) * (s - s * np.sqrt(gx2 + gy2))
    return phi


def _thomas_np(a, b, c, d):
    """Vectorised Thomas solve along the LAST axis (forward sweep
    cp/dp + backsubstitution, AC_TDMA_column4, levelsetSolvers.c:705-…)."""
    n = d.shape[-1]
    cp = np.zeros_like(d)
    dp = np.zeros_like(d)
    cp[..., 0] = c[..., 0] / b[..., 0]
    dp[..., 0] = d[..., 0] / b[..., 0]
    for i in range(1, n):
        div = 1.0 / (b[..., i] - cp[..., i - 1] * a[..., i])
        cp[..., i] = c[..., i] * div
        dp[..., i] = (d[..., i] - dp[..., i - 1] * a[..., i]) * div
    x = np.zeros_like(d)
    x[..., -1] = dp[..., -1]
    for i in range(n - 2, -1, -1):
        x[..., i] = dp[..., i] - cp[..., i] * x[..., i + 1]
    return x


def _aos_ac_np(phi, data, grad, diff, tau, nu):
    """AC_AOS_4_2d (levelsetSolvers.c:145-181): u+ = x_v + x_h, each pass
    solving (2 + nu*(Dp+Dn)) x - nu*Dp x_prev - nu*Dn x_next = PHI + tau*D
    with harmonic-averaged Dn = 2*tau*G/(Diff_i + Diff_next) (0 when the
    sum <= 0), followed by one reinit(0.25) Euler step (:179)."""
    rhs = phi + tau * data

    def pass_along(axis):
        p = np.moveaxis(rhs, axis, -1)
        g = np.moveaxis(grad, axis, -1)
        df = np.moveaxis(diff, axis, -1)
        nxt = np.concatenate([df[..., 1:], df[..., -1:]], axis=-1)
        prv = np.concatenate([df[..., :1], df[..., :-1]], axis=-1)
        sn = df + nxt
        sp = df + prv
        dn = np.where(sn > 0.0, 2.0 * tau * g / np.where(sn > 0.0, sn, 1.0), 0.0)
        dp_ = np.where(sp > 0.0, 2.0 * tau * g / np.where(sp > 0.0, sp, 1.0), 0.0)
        dn[..., -1] = 0.0
        dp_[..., 0] = 0.0
        x = _thomas_np(-nu * dp_, 2.0 + nu * (dn + dp_), -nu * dn, p)
        return np.moveaxis(x, -1, axis)

    out = pass_along(0) + pass_along(1)
    out = np.where(diff == 0.0, phi, out)
    return _reinit_np(out, 1)


def gac_oracle(img, phi0, model="a", tau=0.25, c=-0.1, lam=-1.0,
               iters=100, nu=100.0, collect=None):
    """GAC_v10a.m / GAC_v10b.m literal port. img: (C, H, W) in [0, 1];
    phi0: (H, W) initial mask (>0 inside)."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[None]
    phi = _reinit_np(np.asarray(phi0, np.float32), 40)

    g7 = _fspecial_gaussian((7, 7), 2.5)
    odx = np.array([[-0.5, 0.0, 0.5]], np.float32)
    sm = np.stack([_imfilter_rep(ch, g7) for ch in img])
    idx = np.max(np.stack([_imfilter_rep(ch, odx) for ch in sm]), axis=0)
    idy = np.max(np.stack([_imfilter_rep(ch, odx.T) for ch in sm]), axis=0)
    igrad = idx * idx + idy * idy
    if lam < 0:
        flat = np.sort(igrad.ravel())
        lam = flat[int(np.floor(0.7 * flat.size + 0.5)) - 1]  # MATLAB round, 1-based
    g = 1.0 / (1.0 + igrad / lam)
    if model == "b":
        gdx = _imfilter_rep(g, odx)
        gdy = _imfilter_rep(g, odx.T)

    eps_d = np.finfo(np.float64).eps
    for _ in range(iters):
        px = _imfilter_rep(phi, odx)
        py = _imfilter_rep(phi, odx.T)
        if model == "a":
            fd_x = np.zeros_like(phi)
            bd_x = np.zeros_like(phi)
            fd_y = np.zeros_like(phi)
            bd_y = np.zeros_like(phi)
            # imfilter(PHI, [0 -1 1], 'replicate') etc. (GAC_v10a.m:88-92)
            fd_x[:, :-1] = phi[:, 1:] - phi[:, :-1]
            bd_x[:, 1:] = phi[:, 1:] - phi[:, :-1]
            fd_y[:-1, :] = phi[1:, :] - phi[:-1, :]
            bd_y[1:, :] = phi[1:, :] - phi[:-1, :]
            if c <= 0:
                guw = np.sqrt(np.maximum(bd_x, 0) ** 2 + np.minimum(fd_x, 0) ** 2
                              + np.maximum(bd_y, 0) ** 2 + np.minimum(fd_y, 0) ** 2)
            else:
                guw = np.sqrt(np.minimum(bd_x, 0) ** 2 + np.maximum(fd_x, 0) ** 2
                              + np.minimum(bd_y, 0) ** 2 + np.maximum(fd_y, 0) ** 2)
            data = c * g * guw
        else:
            # circshift-based (WRAP) upwind convection (GAC_v10b.m:89-92)
            data = (np.maximum(gdx, 0) * (np.roll(phi, -1, axis=1) - phi)
                    + np.minimum(gdx, 0) * (phi - np.roll(phi, 1, axis=1))
                    + np.maximum(gdy, 0) * (np.roll(phi, -1, axis=0) - phi)
                    + np.minimum(gdy, 0) * (phi - np.roll(phi, 1, axis=0)))
        grad_phi = np.sqrt(px * px + py * py + eps_d).astype(np.float32)
        diff = grad_phi / g
        phi = _aos_ac_np(phi.astype(np.float32), data.astype(np.float32),
                         grad_phi, diff.astype(np.float32),
                         np.float32(tau), np.float32(nu))
        if collect is not None:
            collect.append(phi.copy())
    return phi
