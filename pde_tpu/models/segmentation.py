"""Level-set disparity segmentation: Chan-Vese active regions + RANSAC
polynomial surfaces (dense: DispSegmentation.m; sparse: NaN-holed maps,
DispSegmentationSparse.m).

Pipeline (dense, DispSegmentation.m:96-145):

1. ``generateSeeds`` — grow one seed at a time over a "there and back"
   pyramid (fine->coarse->fine, :66-91): per stage x iteration, RANSAC-fit
   a plane/quadric to the current segment (SurfaceEquation MEX ->
   ``ops.ransac.ransac_surface``), convert squared surface distance into a
   Gaussian log-likelihood-ratio DATA term (:365-374), and take one
   semi-implicit Chan-Vese AOS step (CV_solver_2d -> ``solvers.aos``).
   A mid-pyramid sanity pass keeps only the biggest connected component
   (:282-298 -> ``ops.components``). Seeds that collapse (<20 px) shrink
   gamma by 0.8 and are skipped (:330-335, :402-405).
2. ``regionCompetition`` — all segments compete: per segment RANSAC refit
   + likelihood (recomputed every 2nd iteration, :531), a competition
   DATA term by strategy ('surface' / 'greedy' / 'inverse', :590-618),
   one CV AOS step on the whole segment stack (frames dim = batch), and
   small-segment removal (:505-529; removal resets every warm start).
3. Orchestration: seeds -> competition('inverse') -> more seeds in the
   uncovered area -> competition again (:99-143); a warm-start ``phi``
   input re-segments instead (:147-180).

TPU mapping: each iteration's heavy math (vmapped RANSAC over segments +
hypotheses, likelihoods, AOS tridiagonal batch) is one jitted program per
(stage-shape, segment-count); the seed/stage/iteration loops stay on the
host because segment births/deaths resize the stack (the reference
mutates cell arrays the same way). ``jax.random`` replaces libc
``rand()``/``srand(time)`` (ransac.c:230-234) — parity is statistical.

Sparse deltas (DispSegmentationSparse.m): 5x5 NaN-median prefilter at
every pyramid level (:63,76), NaN->1000 sentinel before fitting
(:284,500), variance over inlier distances < 100 only (:418-420,
:598-600), polyorder default 2, scl_factor 0.75, gen/rc_scl 0.55, seed
gamma 0.005 (:226) and competition gamma 0.005*(rows*cols)^0.7 (:495).

The small-segment filter at the end of the reference's generateSeeds
(:636-645 dense) inspects ``PHI{1}`` — the *working level-set*, not the
accumulated ``PHIout`` stack — so it never removes anything; we reproduce
that behaviour (no removal) for parity.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pde_tpu.config import with_overrides
from pde_tpu.core.median import nanmedfilt2
from pde_tpu.core.resize import imresize, imresize_nan
from pde_tpu.ops.ransac import ransac_surface, surface_features
from pde_tpu.ops.components import biggest_component_mask
from pde_tpu.solvers.aos import cv_aos_step

_EPS = float(np.finfo(np.float64).eps)
_CDX = np.array([-0.5, 0.0, 0.5], dtype=np.float32)  # O_dx = [-1 0 1]*0.5


@dataclasses.dataclass(frozen=True)
class DispSegParams:
    """Dense defaults: DispSegmentation.m:40-53; sparse: Sparse.m:42-55."""

    tau: float = 1.0
    srem_thr: float = 0.002
    polyorder: int = 1
    seeds: int = 15
    scl_factor: float = 0.7
    gen_scl: float = 0.2
    rc_scl: float = 0.4
    ransac_min_cset: float = 0.1
    ransac_max_cset: float = 0.7
    ransac_cset_cycles: int = 10
    varLim: float = 0.7  # sparse variant exposes this (Sparse.m:46)
    rng_seed: int = 0
    # loop counts of the hard-wired orchestration calls
    # (DispSegmentation.m:103-143); exposed so tests can shrink them
    seed_iterations: int = 20
    rc_iterations: int = 30
    rc_iterations2: int = 20
    ransac_first: int = 2000
    ransac_rest: int = 100


def sparse_defaults() -> DispSegParams:
    return DispSegParams(polyorder=2, scl_factor=0.75, gen_scl=0.55, rc_scl=0.55)


def _grad_mag(phi):
    """|grad PHI| by the [-0.5 0 0.5] correlation with replicate borders."""
    from pde_tpu.core.conv import imfilter_replicate

    dx = imfilter_replicate(phi, _CDX[None, :])
    dy = imfilter_replicate(phi, _CDX[:, None])
    return jnp.sqrt(dx * dx + dy * dy)


def _delta_heaviside(phi, floor=None):
    dh = 1.0 / (np.pi * (1.0 + phi * phi))
    if floor is not None:
        dh = jnp.maximum(dh, floor)
    return dh


# ---------------------------------------------------------------------------
# generateSeeds (DispSegmentation.m:203-443)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("riter", "order", "inlier_lt_100"))
def _seed_iter(key, phi, d, d_fit, include, h1eq, min_cov, gamma_scl, rcons, tau,
               riter: int, order: int, inlier_lt_100: bool):
    """One seed-growth iteration: RANSAC fit + likelihood DATA + CV step.

    The reference aborts a seed when its support drops under 20 px
    (SIG_emptysegment, DispSegmentation.m:332-335); here that check is a
    traced ``alive`` gate — a dead seed's state passes through unchanged,
    so the host only needs ONE device sync per pyramid stage (on the
    returned flag) instead of one per iteration."""
    h, w = d.shape
    feats = surface_features(h, w, order)
    h1 = phi >= 0.0
    alive = jnp.sum(h1) >= 20
    model, dist_d = ransac_surface(key, d_fit, h1, feats, 0.7, rcons, riter,
                                   model_in=h1eq)
    h1sum = jnp.sum(h1)
    if inlier_lt_100:
        inl = h1 & (dist_d < 100.0)
        cov = jnp.sum(jnp.where(inl, dist_d, 0.0)) / jnp.maximum(jnp.sum(inl), 1)
    else:
        cov = jnp.sum(jnp.where(h1, dist_d, 0.0)) / jnp.maximum(h1sum, 1)
    cov_raw = cov  # pre-floor variance: the mid-pyramid minCOV reset
    # (:408-412) uses the unfloored value
    cov = jnp.maximum(cov, min_cov)
    norm = 1.0 / jnp.sqrt(2.0 * np.pi * cov)
    p1 = norm * jnp.exp(-dist_d / (2.0 * cov))
    p0 = norm - p1
    data = jnp.log((p1 + _EPS) / (p0 + _EPS))
    data = jnp.where(include, data, -2.0)
    dh = _delta_heaviside(phi)
    grad = _grad_mag(phi)
    phi_new = cv_aos_step(phi, data, dh, grad, tau, gamma_scl)
    phi = jnp.where(alive, phi_new, phi)
    model = jnp.where(alive, model, h1eq)
    return phi, model, cov_raw, alive


@partial(jax.jit, static_argnames=("shapes",))
def _aa_chain(aa0, shapes):
    """Pyramid of a mask/stack by successive bicubic downscales, as one
    device program (the reference's per-level imresize loop, :66-91)."""
    out = [aa0]
    for s in shapes:
        out.append(imresize(out[-1], s, "bicubic"))
    return tuple(out)


@partial(jax.jit, static_argnames=("riter0", "riter", "n_iters", "order",
                                   "inlier_lt_100", "peel", "mask_init",
                                   "bigcomp", "adjust_cov", "next_shape"))
def _seed_stage(key, phi, d, d_fit, include, h1eq, min_cov, dead, gamma_scl,
                rcons_vec, tau, riter0: int, riter: int, n_iters: int,
                order: int, inlier_lt_100: bool, peel: bool,
                mask_init: bool, bigcomp: bool, adjust_cov: bool,
                next_shape):
    """One pyramid stage of seed growth as ONE device program.

    Rolls the reference's per-stage iteration loop
    (DispSegmentation.m:300-394) into a lax.fori_loop so the host
    dispatches once per stage instead of once per iteration — through a
    remote-dispatch link (or any host), per-call overhead would
    otherwise dominate this small-field pipeline. Folded in, under
    static flags, are the stage's host-side epilogue/prologue steps so
    the whole seed runs sync-free: the coarsest-stage seed-mask init
    (:238-244, ``mask_init``), the mid-pyramid biggest-connected-
    component pass (:282-298, ``bigcomp``), the mid-pyramid minimum-
    variance re-estimate (:408-412 dense / Sparse.m:418-425,
    ``adjust_cov`` — ``min_cov`` is carried as a device scalar), the
    post-iterations SIG_emptysegment support check (:332-335, ``dead``
    flag — a dead seed's phi passes through later stages unchanged via
    the per-iteration alive gate, reproducing the reference's break
    without a per-stage device->host sync), and the inter-stage bicubic
    upscale (``next_shape``). ``peel`` runs iteration 0 separately with
    the larger first-iteration RANSAC hypothesis count (RITER 2000 ->
    100 schedule, :308-312); ``rcons_vec`` carries the consensus-
    fraction ramp (:313-323) as data so it stays inside the rolled loop.
    """
    if mask_init:
        phi = jnp.where(include, phi, -1.0)
    if bigcomp:
        big = biggest_component_mask(phi > 0)
        phi = jnp.where(big, 5.0, -5.0)

    last_cov = jnp.float32(0.0)
    it0 = 0
    if peel:
        key, sub = jax.random.split(key)
        phi, h1eq, last_cov, _ = _seed_iter(
            sub, phi, d, d_fit, include, h1eq, min_cov, gamma_scl,
            rcons_vec[0], tau, riter=riter0, order=order,
            inlier_lt_100=inlier_lt_100)
        it0 = 1

    def body(i, carry):
        key_, phi_, h1eq_, _cov = carry
        key_, sub_ = jax.random.split(key_)
        phi_, h1eq_, cov_, _ = _seed_iter(
            sub_, phi_, d, d_fit, include, h1eq_, min_cov, gamma_scl,
            rcons_vec[i], tau, riter=riter, order=order,
            inlier_lt_100=inlier_lt_100)
        return key_, phi_, h1eq_, cov_

    key, phi, h1eq, last_cov = jax.lax.fori_loop(
        it0, n_iters, body, (key, phi, h1eq, last_cov))

    dead = dead | (jnp.sum(phi >= 0.0) < 20)
    if adjust_cov:
        take = (last_cov > 0.5) if inlier_lt_100 else jnp.bool_(True)
        min_cov = jnp.where(take & ~dead, last_cov, min_cov)
    if next_shape is not None:
        phi = imresize(phi, next_shape, "bicubic")
    return key, phi, h1eq, min_cov, dead


def _generate_seeds(d_levels, d_fit_levels, pyramid, order, sigma_lim, cset_vect,
                    iterations, aa0, seeds, gamma0, tau, key,
                    ransac_first, ransac_rest, inlier_lt_100):
    """Returns (list of (H, W) phi fields, list of (k,) models, key)."""
    n_levels = max(pyramid)  # pyramid entries are 1-based level indices
    shapes = [d_levels[i].shape for i in range(n_levels)]
    h0, w0 = shapes[0]

    phi_init = -np.ones((h0, w0), np.float32)
    phi_init[1:h0 - 1:5, 1:w0 - 1:5] = 1.0  # PHIinitial(2:5:end-1) (:238-239)
    phi_init = jnp.asarray(phi_init)

    aa = [jnp.asarray(aa0, jnp.float32)]
    phi_out, models_out = [], []
    gamma = gamma0
    sig_empty = False
    mid = round(len(pyramid) / 2) - 1
    aa_shapes = tuple(shapes[1:n_levels])

    for _seed in range(seeds):
        if not sig_empty:
            aa = list(_aa_chain(aa[0], aa_shapes))
        sig_empty = False
        min_cov = jnp.float32(sigma_lim)
        dead = jnp.bool_(False)
        phi = phi_init
        h1eq = jnp.zeros((3 if order == 1 else 6,), jnp.float32)

        # the whole seed runs sync-free: one fused program per pyramid
        # stage (_seed_stage folds the mask init / bigcomp / minCOV
        # adjust / upscale epilogues), min_cov and the SIG_emptysegment
        # flag ride along on-device, ONE host sync at the end decides
        # whether the seed is recorded (:332-335 break semantics: a dead
        # seed's phi is frozen by the alive gate through the remaining
        # stages and discarded here)
        for cscl in range(len(pyramid) - 1):
            scl = pyramid[cscl] - 1  # to 0-based
            h, w = shapes[scl]
            gamma_scl = gamma * float((h * w) ** 0.7)
            include = aa[scl] > 0.05
            if cscl == 0:
                rcons_vec = jnp.asarray(
                    [cset_vect[min(it, len(cset_vect) - 1)]
                     for it in range(iterations)], jnp.float32)
            else:
                rcons_vec = jnp.full((iterations,), cset_vect[-1], jnp.float32)
            nxt = pyramid[cscl + 1]
            key, phi, h1eq, min_cov, dead = _seed_stage(
                key, phi, d_levels[scl], d_fit_levels[scl], include, h1eq,
                min_cov, dead, gamma_scl, rcons_vec, tau,
                riter0=(ransac_first if cscl == 0 else ransac_rest),
                riter=ransac_rest, n_iters=iterations, order=order,
                inlier_lt_100=inlier_lt_100, peel=(cscl == 0),
                mask_init=(cscl == 0), bigcomp=(cscl == mid),
                adjust_cov=(cscl == mid),
                next_shape=(shapes[nxt - 1] if nxt != -1 else None))

        sig_empty = bool(dead)  # the seed's single device->host sync
        if sig_empty:
            gamma = gamma * 0.8
        else:
            phi_out.append(phi)
            models_out.append(h1eq)
            aa[0] = ((phi < 0) & (aa[0] > 0)).astype(jnp.float32)

    return phi_out, models_out, key


# ---------------------------------------------------------------------------
# regionCompetition (DispSegmentation.m:448-654)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("order", "strategy", "inlier_lt_100"))
def _rc_recompute(key, phi, d, d_fit, surface, min_cov, cset, alive,
                  order: int, strategy: str, inlier_lt_100: bool):
    """Per-segment RANSAC refit + likelihoods + competition DATA term.

    phi: (S, H, W) fixed-capacity slots; alive: (S,) slot mask (purged
    segments stay in the stack but stop competing — SURVEY 7.3 #4's
    alive-mask design, replacing the reference's in-place deletion,
    DispSegmentation.m:505-529); surface: (S, k) warm starts. Returns
    (DATA, DH, gradPHI, surface, cov)."""
    s, h, w = phi.shape
    feats = surface_features(h, w, order)
    h1 = (phi >= 0.0) & alive[:, None, None]

    keys = jax.random.split(key, s)

    def fit(k_, mask, warm):
        model, dist = ransac_surface(k_, d_fit, mask, feats, 1.0,
                                     cset, 10, model_in=warm)
        return model, dist

    surface, dist_d = jax.vmap(fit, in_axes=(0, 0, 0))(keys, h1, surface)

    h1sum = jnp.maximum(jnp.sum(h1, axis=(1, 2)), 1)
    if inlier_lt_100:
        inl = h1 & (dist_d < 100.0)
        cov = jnp.sum(jnp.where(inl, dist_d, 0.0), axis=(1, 2)) / jnp.maximum(
            jnp.sum(inl, axis=(1, 2)), 1)
    else:
        cov = jnp.sum(jnp.where(h1, dist_d, 0.0), axis=(1, 2)) / h1sum
    cov = jnp.maximum(cov, min_cov)

    norm = 1.0 / jnp.sqrt(2.0 * np.pi * cov)  # (S,)
    p = norm[:, None, None] * jnp.exp(-dist_d / (2.0 * cov)[:, None, None])
    # dead slots claim nothing and contribute nothing to the competition
    p = jnp.where(alive[:, None, None], p, 0.0)
    surface = jnp.where(alive[:, None], surface, 0.0)

    dh = _delta_heaviside(phi, floor=0.06)  # (:535-536)
    grad = _grad_mag(phi)

    def others_max(q):
        # for each segment s: max over t != s of q[t]; empty set -> 0
        # (MATLAB max over an empty 3rd dim leaves the zero-initialised WC).
        # O(S*H*W) via the top-2 trick (the reference's per-segment loop,
        # DispSegmentation.m:590-618, is O(S*H*W) too): leave-one-out max
        # is the global max unless segment s IS the argmax, then the
        # runner-up.
        top1 = jnp.max(q, axis=0)
        arg1 = jnp.argmax(q, axis=0)
        is_arg = jnp.arange(s)[:, None, None] == arg1[None]
        top2 = jnp.max(jnp.where(is_arg, -jnp.inf, q), axis=0)
        out = jnp.where(is_arg, top2[None], top1[None])
        return jnp.where(jnp.isfinite(out), jnp.broadcast_to(out, (s, h, w)), 0.0)

    if strategy == "surface":
        wc = others_max(p)
    elif strategy == "greedy":
        hnotany = ~jnp.any(h1, axis=0)
        wc = others_max(p)
        wc = jnp.where(hnotany[None] & (dh > 0.02), 0.0, wc)
    else:  # 'inverse'
        ptemp = jnp.where(h1, p, 0.0)
        inv = norm[:, None, None] - p
        wc = jnp.maximum(inv, others_max(ptemp))
    data = jnp.log((p + _EPS) / (wc + _EPS))
    return data, dh, grad, surface, cov


@jax.jit
def _rc_cv_step(phi, data, dh, grad, tau, gamma, alive):
    out = cv_aos_step(phi, data, dh, grad, tau, gamma)
    return jnp.where(alive[:, None, None], out, -5.0)


@jax.jit
def _rc_purge(phi, alive, thr_px):
    """Small-segment purge (:505-529) as an alive-mask update — no
    device->host sync, no shape change."""
    sizes = jnp.sum(phi >= 0.0, axis=(1, 2))
    return alive & (sizes >= thr_px)


@partial(jax.jit, static_argnames=("n_iters", "order", "strategy",
                                   "inlier_lt_100", "next_shape"))
def _rc_stage(key, phi, d, d_fit, surface, alive, min_cov, cset, tau, gamma,
              thr_px, n_iters: int, order: int, strategy: str,
              inlier_lt_100: bool, next_shape=None):
    """One pyramid stage of region competition as ONE device program
    (the reference's per-stage loop, DispSegmentation.m:531-631, with
    the recompute-every-2-iterations optimisation as a lax.cond). One
    dispatch per stage instead of ~1.5 per iteration; the purge stays an
    on-device alive-mask update (:505-529)."""
    zeros = jnp.zeros_like(phi)

    def body(i, carry):
        key_, phi_, surface_, alive_, data, dh, grad = carry
        alive_ = _rc_purge(phi_, alive_, thr_px)
        key_, sub = jax.random.split(key_)

        def recompute(args):
            phi_c, surface_c, alive_c = args
            d2, dh2, g2, s2, _cov = _rc_recompute(
                sub, phi_c, d, d_fit, surface_c, min_cov, cset, alive_c,
                order=order, strategy=strategy, inlier_lt_100=inlier_lt_100)
            return d2, dh2, g2, s2

        data, dh, grad, surface_ = jax.lax.cond(
            i % 2 == 0, recompute,
            lambda args: (data, dh, grad, args[1]),
            (phi_, surface_, alive_))
        phi_ = _rc_cv_step(phi_, data, dh, grad, tau, gamma, alive_)
        return key_, phi_, surface_, alive_, data, dh, grad

    key, phi, surface, alive, _, _, _ = jax.lax.fori_loop(
        0, n_iters, body, (key, phi, surface, alive, zeros, zeros, zeros))
    if next_shape is not None:
        phi = imresize(phi, next_shape, "bicubic")
    return key, phi, surface, alive


def _region_competition(d_levels, d_fit_levels, pyramid, order, sigma_lim,
                        iterations, srem_thr, phi_list, strategy, key,
                        gamma_coef, tau, inlier_lt_100, cset=0.7):
    n_levels = max(pyramid)
    shapes = [d_levels[i].shape for i in range(n_levels)]

    # downscale the stack through the levels (:470-473), one program
    phi_levels = list(_aa_chain(jnp.stack(phi_list),
                                tuple(shapes[1:n_levels])))

    min_cov = float(sigma_lim)
    s = phi_levels[0].shape[0]
    surface = jnp.zeros((s, 3 if order == 1 else 6), jnp.float32)
    alive = jnp.ones((s,), bool)
    phi = None

    for cscl in range(len(pyramid) - 1):
        scl = pyramid[cscl] - 1
        h, w = shapes[scl]
        gamma = gamma_coef * float((h * w) ** 0.7)
        if phi is None:
            phi = phi_levels[scl]

        # whole stage (incl. the upscale to the next stage) in one
        # dispatch; purge on-device — a purged slot takes effect in the
        # competition DATA at the next scheduled recompute (<= 1
        # iteration later, mod(iter,2) schedule :531) instead of the
        # reference's immediate recompute, and the all-segments-gone
        # early exit (:505-529) is decided once at the end instead of
        # per stage — the cost of keeping the loop sync-free
        nxt = pyramid[cscl + 1]
        key, phi, surface, alive = _rc_stage(
            key, phi, d_levels[scl], d_fit_levels[scl], surface, alive,
            jnp.float32(min_cov), jnp.float32(cset), tau, gamma,
            jnp.float32(srem_thr * h * w), n_iters=iterations, order=order,
            strategy=strategy, inlier_lt_100=inlier_lt_100,
            next_shape=(shapes[nxt - 1] if nxt != -1 else None))

    if not bool(jnp.any(alive)):  # single host sync for the whole phase
        return [], jnp.zeros((0, 3 if order == 1 else 6)), key

    keep = np.where(np.asarray(alive))[0]
    return [phi[i] for i in keep], surface[jnp.asarray(keep)], key


# ---------------------------------------------------------------------------
# Public drivers
# ---------------------------------------------------------------------------


def _build_pyramids(din, p: DispSegParams, sparse: bool):
    d0 = jnp.asarray(din, jnp.float32)
    if sparse:
        d0 = nanmedfilt2(d0, 5)  # Sparse.m:63
    else:
        d0 = jnp.nan_to_num(d0)  # "We don't like NaNs" (:62)
    d_levels = [d0]
    h0, w0 = d0.shape
    seed_pyr, comp_pyr = [1], [1]
    min_scl = min(p.gen_scl, p.rc_scl)
    while True:
        prev = d_levels[-1]
        nh = int(np.ceil(prev.shape[0] * p.scl_factor))
        nw = int(np.ceil(prev.shape[1] * p.scl_factor))
        if sparse:
            nxt = nanmedfilt2(imresize_nan(nanmedfilt2(prev, 5), (nh, nw), "bicubic"), 5)
        else:
            nxt = imresize(prev, (nh, nw), "bicubic")
        d_levels.append(nxt)
        scl = len(d_levels)
        if nh >= h0 * p.gen_scl and nw >= w0 * p.gen_scl:
            seed_pyr.append(scl)
        if nh >= h0 * p.rc_scl and nw >= w0 * p.rc_scl:
            comp_pyr.append(scl)
        if nh < h0 * min_scl or nw < w0 * min_scl:
            break
    seed_pyr = seed_pyr + list(range(seed_pyr[-1], 0, -1)) + [-1]
    comp_pyr = comp_pyr + list(range(comp_pyr[-1], 0, -1)) + [-1]

    if sparse:
        d_fit = [jnp.where(jnp.isnan(d), 1000.0, d) for d in d_levels]
    else:
        d_fit = d_levels
    return d_levels, d_fit, seed_pyr, comp_pyr


def _number_segments(phi_stack):
    """SEG map (:190-198): overlaps -> 0, ids 1..S."""
    if phi_stack.shape[0] == 0:
        return jnp.zeros(phi_stack.shape[1:], jnp.int32)
    h1 = phi_stack > 0.0
    s = phi_stack.shape[0]
    ids = jnp.arange(1, s + 1, dtype=jnp.int32)[:, None, None]
    seg = jnp.sum(h1 * ids, axis=0).astype(jnp.int32)
    h1sum = jnp.sum(h1, axis=0)
    seg = jnp.where(h1sum >= 2, 0, seg)
    seg = jnp.where(seg > s, s + 1, seg)
    return seg


def _disp_segmentation(din, sparse: bool, params=None, phi=None, aa=None,
                       checkpoint_path=None, collect=None, **overrides):
    base = params or (sparse_defaults() if sparse else DispSegParams())
    p = with_overrides(base, **overrides)
    d_levels, d_fit, seed_pyr, comp_pyr = _build_pyramids(din, p, sparse)
    h, w = d_levels[0].shape
    aa0 = np.ones((h, w), np.float32) if aa is None else np.asarray(aa, np.float32)
    cset_vect = [
        p.ransac_min_cset
        + (p.ransac_max_cset - p.ransac_min_cset) / p.ransac_cset_cycles * i
        for i in range(p.ransac_cset_cycles + 1)
    ]
    key = jax.random.PRNGKey(p.rng_seed)
    gamma_seed = 0.005 if sparse else 0.01
    gamma_rc = 0.005 if sparse else 0.001
    il100 = sparse

    def gen(pyr, sigma_lim, n_seeds, aa_in, k):
        return _generate_seeds(
            d_levels, d_fit, pyr, p.polyorder, sigma_lim, cset_vect,
            p.seed_iterations, aa_in, n_seeds, gamma_seed, p.tau, k,
            p.ransac_first, p.ransac_rest, il100,
        )

    def compete(phi_list, sigma_lim, iters, k):
        return _region_competition(
            d_levels, d_fit, comp_pyr, p.polyorder, sigma_lim, iters,
            p.srem_thr, phi_list, "inverse", k, gamma_rc, p.tau, il100,
            cset=p.ransac_max_cset,
        )

    # phase-level checkpoint/resume for the long seeds+competition run
    # (SURVEY.md section 5: the reference has none; its warm starts —
    # param.PHI, RANSAC model_in — stay first-class here regardless).
    # The checkpoint is fingerprinted over (din, params, sparse) so a
    # stale file from a different input/config is ignored rather than
    # silently resumed, and it only applies to the cold-start pipeline:
    # a warm-start ``phi`` re-segmentation never consumes one.
    import hashlib

    fp = hashlib.sha1()
    fp.update(np.ascontiguousarray(
        np.nan_to_num(np.asarray(din, np.float32), nan=1e30)).tobytes())
    fp.update(repr((repr(p), bool(sparse))).encode())
    fp_hex = fp.hexdigest()
    fp_arr = np.frombuffer(fp_hex.encode(), dtype=np.uint8).copy()

    ck_phase = -1
    if (checkpoint_path is not None and phi is None
            and os.path.exists(checkpoint_path)):
        from pde_tpu.utils.checkpoint import load_state

        like = {"phase": 0, "phi": np.zeros((1, h, w), np.float32),
                "sparam": np.zeros((1, 3 if p.polyorder == 1 else 6),
                                   np.float32),
                "key": np.asarray(key), "fp": fp_arr}
        try:
            st = load_state(checkpoint_path, like)
            if bytes(np.asarray(st["fp"])) != fp_hex.encode():
                raise ValueError("fingerprint mismatch")
        except Exception as e:
            import warnings

            warnings.warn(
                f"ignoring checkpoint at {checkpoint_path}: {e} "
                "(different input/params or incompatible format)",
                stacklevel=3)
        else:
            ck_phase = int(st["phase"])
            phi_list = [jnp.asarray(st["phi"][i])
                        for i in range(st["phi"].shape[0])]
            sparam = jnp.asarray(st["sparam"])
            key = jnp.asarray(st["key"])

    def save_ck(phase, phi_list, sparam, key):
        if checkpoint_path is None or phi is not None:
            return
        from pde_tpu.utils.checkpoint import save_state

        save_state(checkpoint_path, {
            "phase": phase,
            "phi": np.stack([np.asarray(x) for x in phi_list])
            if phi_list else np.zeros((0, h, w), np.float32),
            "sparam": np.asarray(sparam),
            "key": np.asarray(key), "fp": fp_arr})

    def snap(name, phi_list):
        # phase-level observability (the reference's imagesc/drawnow,
        # DispSegmentation.m:395,644-645): append (phase, SEG map)
        if collect is not None:
            stack = (jnp.stack(phi_list) if phi_list
                     else jnp.zeros((0, h, w), jnp.float32))
            collect.append((name, _number_segments(stack)))

    if phi is None:
        if ck_phase < 0:
            phi_list, sparam, key = gen(seed_pyr, 0.7, p.seeds, aa0, key)
            save_ck(0, phi_list, sparam, key)
        snap("seeds", phi_list)
        if p.seeds != 1 and phi_list:
            if ck_phase < 1:
                phi_list, sparam, key = compete(phi_list, 1.5,
                                                p.rc_iterations, key)
                save_ck(1, phi_list, sparam, key)
            snap("competition1", phi_list)
            if ck_phase < 2:
                if phi_list:
                    covered = np.asarray(
                        jnp.sum(jnp.stack(phi_list) > 0, axis=0) == 0,
                        np.float32)
                else:
                    covered = aa0
                new_list, _, key = gen(comp_pyr, 1.2, p.seeds, covered, key)
                phi_list = phi_list + new_list
                save_ck(2, phi_list, sparam, key)
            snap("seeds2", phi_list)
            if phi_list:
                phi_list, sparam, key = compete(phi_list, 1.5, p.rc_iterations2, key)
    else:
        phi_list = [jnp.asarray(phi[i], jnp.float32) for i in range(phi.shape[0])]
        phi_list, sparam, key = compete(phi_list, 1.0, p.rc_iterations2, key)
        covered = np.asarray(
            jnp.sum(jnp.stack(phi_list) > 0, axis=0) == 0, np.float32
        ) if phi_list else aa0
        new_list, _, key = gen(comp_pyr, 1.2, 1, covered, key)
        phi_list = phi_list + new_list
        if phi_list:
            phi_list, sparam, key = compete(phi_list, 2.0, p.rc_iterations2, key)

    # run completed: drop the phase checkpoint so a later call with the
    # same path starts fresh instead of resuming a finished pipeline
    # (warm-start runs own no checkpoint and leave the path untouched)
    if (checkpoint_path is not None and phi is None
            and os.path.exists(checkpoint_path)):
        try:
            os.remove(checkpoint_path)
        except OSError:
            pass

    phi_stack = (jnp.stack(phi_list) if phi_list
                 else jnp.zeros((0, h, w), jnp.float32))
    seg = _number_segments(phi_stack)
    sparam_arr = (jnp.asarray(sparam) if not isinstance(sparam, list)
                  else (jnp.stack(sparam) if sparam
                        else jnp.zeros((0, 3 if p.polyorder == 1 else 6))))
    return phi_stack, seg, sparam_arr


def disp_segmentation(din, params: DispSegParams | None = None, phi=None,
                      aa=None, checkpoint_path=None, collect=None,
                      **overrides):
    """Dense disparity-map segmentation (DispSegmentation.m).

    din: (H, W) disparity map. phi: optional (S, H, W) warm-start level
    sets (re-segmentation path, :147-180). aa: optional (H, W) allowed
    area. collect: optional list — (phase_name, SEG map) snapshots are
    appended after each pipeline phase (observability parity with the
    reference's imagesc/drawnow). Returns (PHI (S, H, W), SEG (H, W)
    int32, SParam (S, k))."""
    return _disp_segmentation(din, False, params, phi, aa,
                               checkpoint_path, collect, **overrides)


def disp_segmentation_sparse(din, params: DispSegParams | None = None,
                             phi=None, aa=None, checkpoint_path=None,
                             collect=None, **overrides):
    """Sparse (NaN-holed) disparity segmentation (DispSegmentationSparse.m)."""
    return _disp_segmentation(din, True, params, phi, aa, checkpoint_path,
                              collect, **overrides)
