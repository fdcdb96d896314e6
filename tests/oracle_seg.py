"""Literal NumPy port of the reference's disparity-map segmentation
pipeline — the statistical-parity oracle SURVEY.md §7.3 #5 prescribes.

Ports, line-for-line where practical:
* ``generateSeeds``        — /root/reference/matlab/segmentation/DispSegmentation.m:203-443
* ``regionCompetition``    — DispSegmentation.m:448-654 ('inverse' strategy,
                             the orchestration default :112-142)
* the RANSAC surface search — ransac.c:31-220 + SurfaceEquation.c:223-423
  (libc rand() becomes numpy Generator draws; parity is statistical)
* the Chan-Vese AOS solve  — CV_AOSOMP_4_2d, levelsetSolvers.c:103-297
  (harmonic averaging, +-5 clamp, zero-diffusivity freeze)

Like tests/oracle.py this is deliberate test APPARATUS: a faithful NumPy
twin used only to compare the engine's segment statistics (count,
coverage, residual quantiles) against the reference algorithm's on the
same inputs. Engine code lives in pde_tpu/ and shares nothing with it.
"""

from __future__ import annotations

import numpy as np

from oracle import _imresize_np, _thomas_np

_EPS = float(np.finfo(np.float64).eps)


# ---------------------------------------------------------------------------
# CV AOS (levelsetSolvers.c CV_TDMA_Column4 semantics)
# ---------------------------------------------------------------------------


def cv_aos_np(phi, data, dh, grad_phi, tau, nu):
    """One Chan-Vese AOS step: rhs = PHI + tau*DH*DATA; each directional
    implicit solve clamped to [-5, 5]; Diff==0 pixels frozen."""
    rhs = phi + tau * dh * data

    def pass_along(axis):
        p = np.moveaxis(rhs, axis, -1)
        g = np.moveaxis(dh, axis, -1)
        df = np.moveaxis(grad_phi, axis, -1)
        nxt = np.concatenate([df[..., 1:], df[..., -1:]], axis=-1)
        prv = np.concatenate([df[..., :1], df[..., :-1]], axis=-1)
        sn = df + nxt
        sp = df + prv
        dn = np.where(sn > 0.0, 2.0 * tau * g / np.where(sn > 0.0, sn, 1.0), 0.0)
        dp_ = np.where(sp > 0.0, 2.0 * tau * g / np.where(sp > 0.0, sp, 1.0), 0.0)
        dn[..., -1] = 0.0
        dp_[..., 0] = 0.0
        x = _thomas_np(-nu * dp_, 2.0 + nu * (dn + dp_), -nu * dn, p)
        return np.clip(np.moveaxis(x, -1, axis), -5.0, 5.0)

    out = np.clip(pass_along(0) + pass_along(1), -5.0, 5.0)
    return np.where(grad_phi == 0.0, phi, out)


# ---------------------------------------------------------------------------
# RANSAC surface search (ransac.c / SurfaceEquation.c)
# ---------------------------------------------------------------------------


def _features(h, w, order):
    y, x = np.mgrid[1:h + 1, 1:w + 1].astype(np.float64)
    if order == 1:
        return np.stack([x, y, np.ones_like(x)], axis=-1)
    return np.stack([x * x, y * y, x * y, x, y, np.ones_like(x)], axis=-1)


def ransac_np(rng, vals, mask, order, err_thr, cset, iters, warm=None):
    """Returns (model (k,), distD (H, W) squared residuals).

    Mirrors ransac.c: k+1-point minimal least squares per hypothesis,
    licit when inliers >= round(cset * n_data), smallest inlier error
    among licit wins, best-inlier fallback otherwise, optional warm-start
    model competing first (ransac.c:109-211)."""
    h, w = vals.shape
    feats = _features(h, w, order)
    k = feats.shape[-1]
    fm = feats[mask]
    dm = vals[mask]
    n_data = dm.size
    min_set = np.floor(cset * n_data + 0.5)
    thr2 = err_thr * err_thr

    best = None  # (licit, -count, err_sum) lexicographic cost
    best_model = np.zeros(k)

    def score(model):
        err = (fm @ model - dm) ** 2
        inl = err <= thr2
        return inl.sum(), err[inl].sum()

    cands = []
    if warm is not None and np.any(warm != 0.0) and np.isfinite(warm).all():
        cands.append(np.asarray(warm, np.float64))
    for _ in range(iters):
        idx = rng.integers(0, n_data, size=k + 1)
        a = fm[idx]
        b = dm[idx]
        model, *_ = np.linalg.lstsq(a, b, rcond=None)
        cands.append(model)

    for model in cands:
        count, err_sum = score(model)
        licit = count >= min_set
        key = (0 if licit else 1, err_sum if licit else -count)
        if best is None or key < best:
            best = key
            best_model = model
    dist_d = (feats @ best_model - vals) ** 2
    return best_model, dist_d


# ---------------------------------------------------------------------------
# generateSeeds (DispSegmentation.m:203-443)
# ---------------------------------------------------------------------------


def _grad_np(phi):
    import scipy.ndimage as ndi

    o = np.array([-0.5, 0.0, 0.5])
    dx = ndi.correlate1d(phi, o, axis=1, mode="nearest")
    dy = ndi.correlate1d(phi, o, axis=0, mode="nearest")
    return np.sqrt(dx * dx + dy * dy)


def _biggest_component(mask):
    import scipy.ndimage as ndi

    lab, n = ndi.label(mask)
    if n == 0:
        return np.zeros_like(mask)
    sizes = ndi.sum_labels(np.ones_like(mask, np.float64), lab,
                           index=np.arange(1, n + 1))
    return lab == (1 + int(np.argmax(sizes)))


def generate_seeds_np(d_levels, pyramid, order, sigma_lim, cset_vect,
                      iterations, aa0, seeds, rng, ransac_first=2000,
                      ransac_rest=100, gamma0=0.01, tau=1.0):
    """Returns (phi list at level 0, model list)."""
    n_levels = max(pyramid)
    shapes = [d_levels[i].shape for i in range(n_levels)]
    h0, w0 = shapes[0]
    phi_init = -np.ones((h0, w0))
    phi_init[1:h0 - 1:5, 1:w0 - 1:5] = 1.0  # PHIinitial(2:5:end-1,...) :238
    aa = [np.asarray(aa0, np.float64)]
    phi_out, models_out = [], []
    gamma = gamma0
    sig_empty = False

    for _seed in range(seeds):
        if not sig_empty:
            aa = [aa[0]]
            for i in range(1, n_levels):
                aa.append(_imresize_np(aa[i - 1], shapes[i], "cubic"))
        sig_empty = False
        min_cov = float(sigma_lim)
        phi = phi_init.copy()
        h1eq = None
        dist_d = None
        h1 = None

        for cscl in range(len(pyramid) - 1):
            scl = pyramid[cscl] - 1
            h, w = shapes[scl]
            gamma_scl = gamma * (h * w) ** 0.7
            include = aa[scl] > 0.05
            if cscl == 0:
                phi = np.where(include, phi, -1.0)

            if cscl == round(len(pyramid) / 2) - 1:  # sanity pass :282-298
                big = _biggest_component(phi > 0)
                phi = np.where(big, 5.0, -5.0)

            for it in range(iterations):
                riter = ransac_first if (it == 0 and cscl == 0) else ransac_rest
                rcons = (cset_vect[min(it, len(cset_vect) - 1)]
                         if cscl == 0 else cset_vect[-1])
                h1 = phi >= 0.0
                if h1.sum() < 20:
                    sig_empty = True
                    break
                h1eq, dist_d = ransac_np(rng, d_levels[scl], h1, order,
                                         0.7, rcons, riter, warm=h1eq)
                cov = max(dist_d[h1].sum() / h1.sum(), min_cov)
                norm = 1.0 / np.sqrt(2.0 * np.pi * cov)
                p1 = norm * np.exp(-dist_d / (2.0 * cov))
                p0 = norm - p1
                data = np.log((p1 + _EPS) / (p0 + _EPS))
                data = np.where(include, data, -2.0)
                dh = 1.0 / (np.pi * (1.0 + phi * phi))
                phi = cv_aos_np(phi, data, dh, _grad_np(phi), tau, gamma_scl)

            if sig_empty:
                gamma *= 0.8
                break

            if cscl == round(len(pyramid) / 2) - 1 and dist_d is not None:
                min_cov = dist_d[h1].sum() / max(h1.sum(), 1)  # :408-412

            nxt = pyramid[cscl + 1]
            if nxt != -1:
                phi = _imresize_np(phi, shapes[nxt - 1], "cubic")

        if not sig_empty:
            phi_out.append(phi)
            models_out.append(h1eq)
            aa[0] = ((phi < 0) & (aa[0] > 0)).astype(np.float64)

    return phi_out, models_out


# ---------------------------------------------------------------------------
# regionCompetition, 'inverse' strategy (DispSegmentation.m:448-654)
# ---------------------------------------------------------------------------


def region_competition_np(d_levels, pyramid, order, sigma_lim, cset,
                          iterations, srem_thr, phi_in, rng,
                          gamma_coef=0.001, tau=1.0):
    n_levels = max(pyramid)
    shapes = [d_levels[i].shape for i in range(n_levels)]
    phi = np.stack(phi_in)  # (S, H, W) at level 0
    min_cov = float(sigma_lim)
    surfaces = None

    for cscl in range(len(pyramid) - 1):
        scl = pyramid[cscl] - 1
        h, w = shapes[scl]
        gamma = gamma_coef * (h * w) ** 0.7
        phi = np.stack([_imresize_np(p, (h, w), "cubic") for p in phi]) \
            if (cscl > 0 or phi.shape[-2:] != (h, w)) else phi
        s = phi.shape[0]
        surfaces = np.zeros((s, 3 if order == 1 else 6))
        data = dh = grad = None
        recalc = False

        for it in range(iterations):
            h1 = phi >= 0.0
            sizes = h1.sum(axis=(1, 2))
            keep = sizes >= srem_thr * h * w
            if not keep.all():  # small-segment purge :505-529
                phi = phi[keep]
                surfaces = surfaces[keep]
                s = phi.shape[0]
                if s == 0:
                    return [], np.zeros((0, surfaces.shape[1]))
                h1 = phi >= 0.0
                recalc = True
            if it % 2 == 0 or recalc:  # mod(iter,2), 1-based :531
                dh = 1.0 / (np.pi * (1.0 + phi * phi))
                dh = np.maximum(dh, 0.06)  # :535-536
                grad = np.stack([_grad_np(p) for p in phi])
                p_lik = np.zeros_like(phi)
                norms = np.zeros(s)
                for si in range(s):
                    surfaces[si], dist_d = ransac_np(
                        rng, d_levels[scl], h1[si], order, 1.0, cset, 10,
                        warm=surfaces[si] if np.any(surfaces[si]) else None)
                    cov = max(dist_d[h1[si]].sum() / max(h1[si].sum(), 1),
                              min_cov)
                    norms[si] = 1.0 / np.sqrt(2.0 * np.pi * cov)
                    p_lik[si] = norms[si] * np.exp(-dist_d / (2.0 * cov))
                ptemp = np.where(h1, p_lik, 0.0)
                wc = np.zeros_like(phi)
                for si in range(s):  # 'inverse' :610-618
                    others = np.delete(ptemp, si, axis=0)
                    other_max = others.max(axis=0) if others.shape[0] else 0.0
                    wc[si] = np.maximum(norms[si] - p_lik[si], other_max)
                data = np.log((p_lik + _EPS) / (wc + _EPS))
                recalc = False
            phi = np.stack([
                cv_aos_np(phi[si], data[si], dh[si], grad[si], tau, gamma)
                for si in range(phi.shape[0])
            ])

    return [p for p in phi], surfaces


# ---------------------------------------------------------------------------
# Full dense pipeline (DispSegmentation.m:55-198 orchestration)
# ---------------------------------------------------------------------------


def build_pyramid_np(din, scl_factor=0.7, gen_scl=0.2, rc_scl=0.4):
    """Dense dual pyramid vectors (:66-91): down-then-up + [-1]."""
    d0 = np.nan_to_num(np.asarray(din, np.float64))
    d_levels = [d0]
    h0, w0 = d0.shape
    seed_pyr, comp_pyr = [1], [1]
    min_scl = min(gen_scl, rc_scl)
    while True:
        prev = d_levels[-1]
        nh = int(np.ceil(prev.shape[0] * scl_factor))
        nw = int(np.ceil(prev.shape[1] * scl_factor))
        d_levels.append(_imresize_np(prev, (nh, nw), "cubic"))
        scl = len(d_levels)
        if nh >= h0 * gen_scl and nw >= w0 * gen_scl:
            seed_pyr.append(scl)
        if nh >= h0 * rc_scl and nw >= w0 * rc_scl:
            comp_pyr.append(scl)
        if nh < h0 * min_scl or nw < w0 * min_scl:
            break
    seed_pyr = seed_pyr + list(range(seed_pyr[-1], 0, -1)) + [-1]
    comp_pyr = comp_pyr + list(range(comp_pyr[-1], 0, -1)) + [-1]
    return d_levels, seed_pyr, comp_pyr


def disp_segmentation_np(din, seeds=4, seed_iterations=20, rc_iterations=30,
                         rc_iterations2=20, ransac_first=2000,
                         ransac_rest=100, srem_thr=0.002, polyorder=1,
                         sigma_lim=0.7, rng=None):
    """Dense pipeline: seeds -> compete -> seeds in uncovered -> compete
    (DispSegmentation.m:96-145). Returns (phi (S,H,W), sparam (S,k))."""
    rng = rng or np.random.default_rng(0)
    d_levels, seed_pyr, comp_pyr = build_pyramid_np(din)
    cset_vect = [0.1 + 0.6 / 10 * i for i in range(11)]
    aa0 = np.ones(d_levels[0].shape)

    phi_list, models = generate_seeds_np(
        d_levels, seed_pyr, polyorder, sigma_lim, cset_vect,
        seed_iterations, aa0, seeds, rng, ransac_first, ransac_rest)
    if seeds != 1 and phi_list:
        phi_list, sparam = region_competition_np(
            d_levels, comp_pyr, polyorder, 1.5, 0.7, rc_iterations,
            srem_thr, phi_list, rng)
        if phi_list:
            covered = (np.stack(phi_list) > 0).sum(axis=0) == 0
        else:
            covered = aa0.astype(bool)
        new_list, _ = generate_seeds_np(
            d_levels, comp_pyr, polyorder, 1.2, cset_vect,
            seed_iterations, covered.astype(np.float64), seeds, rng,
            ransac_first, ransac_rest)
        phi_list = phi_list + new_list
        if phi_list:
            phi_list, sparam = region_competition_np(
                d_levels, comp_pyr, polyorder, 1.5, 0.7, rc_iterations2,
                srem_thr, phi_list, rng)
    k = 3 if polyorder == 1 else 6
    if not phi_list:
        return np.zeros((0,) + d_levels[0].shape), np.zeros((0, k))
    return np.stack(phi_list), np.asarray(sparam).reshape(-1, k)
