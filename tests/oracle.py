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
