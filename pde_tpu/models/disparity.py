"""Stereo disparity, late linearisation with horizontal-only warping
(DispEminND_llin_2D.m).

Same robust two-term scheme as the warping flow, restricted to a scalar
horizontal field: warp is x-only (:211-218), constancy tensors keep only
the u-components (:223-240), channel tensors combine with a plain ``sum``
so NaN (out-of-domain) pixels stay NaN and trigger the solver's
pure-diffusion fallback (:297 + disparitySolvers.c:101-114 semantics),
spatial prior uses the exp-shaped influence ``gS = γ/α·exp(-APnorm/ASdiff²)``
(:283), diffusion weights come from the disparity field itself with
zeroed borders (DdiffWeights MEX, imageDiffusionWeights.c).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from pde_tpu.config import with_overrides
from pde_tpu.core.median import medfilt2_3x3
from pde_tpu.core.pyramid import build_pyramid
from pde_tpu.core.resize import imresize
from pde_tpu.ops.derivatives import fst_derivatives5, snd_derivatives5, rgb2grad
from pde_tpu.ops.warp import bilinear_warp, identity_grid
from pde_tpu.ops.weights import diffusion_weights_4
from pde_tpu.kernels.dispatch import sor_disp_llin4
from pde_tpu.solvers.krylov import pcg_disp_llin4


@dataclasses.dataclass(frozen=True)
class DisparityParams:
    """Defaults from DispEminND_llin_2D.m:52-67."""

    alpha: float = 0.042
    gammaS: float = 0.005
    omega: float = 1.9
    firstLoop: int = 4
    secondLoop: int = 6
    iter: int = 4
    b1: float = 1.48
    b2: float = 0.29
    scales: int = 10**9
    scl_factor: float = 0.75
    # TPU-native default (see FlowNDParams.solver note); 0.5% AEE vs
    # the sequential-ALR golden at reference counts
    solver: int = 1
    # windowed shift-add warp radius (gather-free TPU hot path,
    # ops/warp.warp_x_window). 0 = exact gather warp. With radius r the
    # result is exact for |disparity| < r; beyond it the sample becomes
    # NaN (missing data), the same fallback as out-of-image warps.
    warp_window: int = 0
    # trace the first/second fixed-point loops as lax.fori_loop instead
    # of unrolling: identical numerics, ~24x smaller HLO — the shape the
    # fused whole-frame TPU programs use (see disparity_nd_fused)
    fori: bool = False


def warp_x(img, u, window: int = 0):
    if window > 0:
        from pde_tpu.ops.warp import warp_x_window

        return warp_x_window(img, u, window)
    h, w = img.shape[-2:]
    x, y = identity_grid(h, w)
    return bilinear_warp(img, x + u, y)


def _disp_first_iter(u, i1t0, i1t1, i2t0, i2t1, us_ap, as_diff,
                     p: "DisparityParams", snd_is_gradmag: bool,
                     fori: bool):
    """One warping (firstLoop) iteration: warp, derivative tensors, the
    robust-weight secondLoop fixed point, median. fori=True runs the
    secondLoop as a lax.fori_loop (one body instance in the program —
    identical numerics to the unrolled form, far smaller HLO)."""
    has_snd = i2t1 is not None
    has_us = us_ap is not None

    i1t1w = warp_x(i1t1, u, p.warp_window)
    i1dt, i1dx, _ = fst_derivatives5(i1t0, i1t1w)
    cu1 = i1dt * i1dx
    du1 = i1dx * i1dx
    t2 = None
    if has_snd:
        i2t1w = warp_x(i2t1, u, p.warp_window)
        if snd_is_gradmag:
            i2dxt, i2dyt, i2dxx, i2dyy, i2dxy = snd_derivatives5(i2t0, i2t1w)
            t2 = (i2dxt, i2dyt, i2dxx, i2dxy)
            cu2 = i2dxt * i2dxx + i2dyt * i2dxy
            du2 = i2dxx * i2dxx + i2dxy * i2dxy
        else:
            i2dt, i2dx, _ = fst_derivatives5(i2t0, i2t1w)
            t2 = (i2dt, i2dx)
            cu2 = i2dt * i2dx
            du2 = i2dx * i2dx

    def second(du_f):
        op1 = (i1dt - i1dx * du_f) ** 2
        gd1 = p.b1 / (p.alpha * jnp.sqrt(op1 + 1e-5))
        cu_parts = [cu1 * gd1]
        du_parts = [du1 * gd1]
        if has_snd:
            if snd_is_gradmag:
                i2dxt_, i2dyt_, i2dxx_, i2dxy_ = t2
                op2 = (i2dxt_ - i2dxx_ * du_f) ** 2 + (i2dyt_ - i2dxy_ * du_f) ** 2
            else:
                i2dt_, i2dx_ = t2
                op2 = (i2dt_ - i2dx_ * du_f) ** 2
            gd2 = p.b2 / (p.alpha * jnp.sqrt(op2 + 1e-5))
            cu_parts.append(cu2 * gd2)
            du_parts.append(du2 * gd2)
        if has_us:
            ap_norm = (us_ap - u - du_f) ** 2
            gs = (p.gammaS / p.alpha) * jnp.exp(-ap_norm / as_diff**2)
            cu_parts.append(((us_ap - u) * gs)[None])
            du_parts.append(gs[None])

        # plain sum over channels: NaN propagates (reference :289-293)
        cu_gd = sum(jnp.sum(x, axis=0) for x in cu_parts)
        du_gd = sum(jnp.sum(x, axis=0) for x in du_parts)

        ww, wn, we, ws = diffusion_weights_4(
            u + du_f, eps=1e-5, combine="max", zero_borders=True
        )
        solve = pcg_disp_llin4 if p.solver == 2 else sor_disp_llin4
        return solve(u, du_f, cu_gd, du_gd, ww, wn, we, ws, p.iter, p.omega)

    du_f = jnp.zeros_like(u)
    if fori:
        du_f = jax.lax.fori_loop(0, p.secondLoop,
                                 lambda _, d: second(d), du_f)
    else:
        for _second in range(p.secondLoop):
            du_f = second(du_f)
    return medfilt2_3x3(u + du_f)


def _disp_level(u, i1t0, i1t1, i2t0, i2t1, us_ap, as_diff, p: "DisparityParams",
                snd_is_gradmag: bool):
    step = partial(_disp_first_iter, i1t0=i1t0, i1t1=i1t1, i2t0=i2t0,
                   i2t1=i2t1, us_ap=us_ap, as_diff=as_diff, p=p,
                   snd_is_gradmag=snd_is_gradmag, fori=p.fori)
    if p.fori:
        return jax.lax.fori_loop(0, p.firstLoop, lambda _, uu: step(uu), u)
    for _first in range(p.firstLoop):
        u = step(u)
    return u


def disparity_nd_fused(il, ir, fst_term: str = "grad", snd_term: str = "gradmag",
                       params: DisparityParams | None = None):
    """Whole-frame fused variant: the entire coarse-to-fine disparity
    solve traces into ONE device program (cf. flow_nd_fused). Reuse one
    (H, W) signature to reuse the compiled program.

    Known issue (TPU v5e): certain whole-frame compositions of this
    4-channel gradmag pipeline crash the TPU runtime ("worker crashed /
    kernel fault"). Extensive bisection shows it is NOT our kernels:
    with the Pallas stripe solver it strikes from tiny configs
    (scales=2, firstLoop=2, secondLoop=2); dispatched to the pure-XLA
    solvers (the ``xla_solvers`` override below, kept because it is
    strictly more robust) it strikes only at some larger loop-count
    combinations — full-depth fl=4/sl=4 and fl=2/sl=5 and fl=1/sl=6
    run fine, while fl=2/sl=6 and the reference default fl=4/sl=6
    crash (non-monotone in program size: a compiler/runtime defect).
    Every affected configuration runs correctly per level
    (:func:`disparity_nd`) and fused at smaller image sizes; the fused
    flow programs (flow_nd_fused, incl. 3ch 480x640) are unaffected.

    Round-5 bisection sharpened the picture: ANY program fusing >= 2
    pyramid-level bodies of this pipeline can crash (2/4/7-way level
    splits all fault at reference counts, as do loop-structured
    lax.fori_loop forms even at counts whose unrolled programs run),
    while one-level-per-program partitions always run. Production
    callers on TPU should therefore use
    ``disparity_nd_split(..., n_parts=99)`` — one fused program per
    pyramid level, measured 115x the single-core oracle end-to-end
    through this environment's TPU tunnel (BENCH r5)."""
    if jax.default_backend() not in ("cpu",):
        import warnings

        p = params or DisparityParams()
        warnings.warn(
            "disparity_nd_fused on a TPU backend: programs fusing >=2 "
            "pyramid levels of this pipeline can crash the TPU runtime "
            f"(open XLA defect; firstLoop={p.firstLoop}, "
            f"secondLoop={p.secondLoop} — the reference defaults are a "
            "known-crashing combination). Use disparity_nd_split(..., "
            "n_parts=99) (one fused program per level) in production.",
            RuntimeWarning, stacklevel=2)
    return _disparity_nd_fused_jit(il, ir, fst_term, snd_term, params)


@partial(jax.jit, static_argnames=("fst_term", "snd_term", "params"))
def _disparity_nd_fused_jit(il, ir, fst_term, snd_term, params):
    from pde_tpu.kernels.dispatch import xla_solvers

    with xla_solvers():
        return disparity_nd(il, ir, fst_term, snd_term, params)


def _prep_pair(il, ir):
    a = jnp.asarray(il, dtype=jnp.float32) / 255.0
    b = jnp.asarray(ir, dtype=jnp.float32) / 255.0
    if a.ndim == 2:
        a, b = a[None], b[None]
    return a, b


@partial(jax.jit,
         static_argnames=("lvl_hi", "lvl_lo", "fst_term", "snd_term", "params",
                          "xla"))
def _disp_segment(a, b, u, lvl_hi: int, lvl_lo: int, fst_term: str,
                  snd_term: str, params: DisparityParams, xla: bool = True):
    """Pyramid levels ``lvl_hi .. lvl_lo`` (coarse -> fine, inclusive) as
    ONE fused device program. ``u`` is the incoming field at level
    ``lvl_hi`` (or None at the coarsest level); the result is upscaled to
    level ``lvl_lo - 1`` when ``lvl_lo > 0`` so segments chain directly.
    The pyramid is rebuilt inside the trace — XLA dead-code-eliminates
    the levels a segment does not touch. ``xla`` is part of the jit key:
    True traces the pure-XLA solvers, False the Pallas dispatch."""
    import contextlib

    from pde_tpu.kernels.dispatch import xla_solvers

    p = params
    ctx = xla_solvers() if xla else contextlib.nullcontext()
    with ctx:
        return _disp_segment_body(a, b, u, lvl_hi, lvl_lo, fst_term, snd_term, p)


def _disp_segment_body(a, b, u, lvl_hi, lvl_lo, fst_term, snd_term, p):
    levels = build_pyramid([a, b], p.scl_factor, 10, 5, 1.25, p.scales)

    def fst_img(img):
        return rgb2grad(img) if fst_term == "grad" else img

    def snd_img(img):
        return None if snd_term == "none" else img

    for lvl in range(lvl_hi, lvl_lo - 1, -1):
        l0, l1 = levels[lvl]
        h, w = l0.shape[-2:]
        if u is None:
            u = jnp.zeros((h, w), dtype=jnp.float32)
        as_diff = 1.75 * p.scl_factor**lvl
        u = _disp_level(u, fst_img(l0), fst_img(l1), snd_img(l0), snd_img(l1),
                        None, as_diff, p, snd_term == "gradmag")
        if lvl > 0:
            nh, nw = levels[lvl - 1][0].shape[-2:]
            u = imresize(u / p.scl_factor, (nh, nw), "bilinear")
    return u


def disparity_nd_split(il, ir, fst_term: str = "grad", snd_term: str = "gradmag",
                       params: DisparityParams | None = None,
                       n_parts: int = 2, xla: bool = True, **overrides):
    """Coarse-to-fine disparity as ``n_parts`` fused level-range programs
    (each one device dispatch) instead of one whole-frame program — the
    production TPU path around the XLA:TPU defect documented on
    :func:`disparity_nd_fused`. Identical numerics to :func:`disparity_nd`
    (matches DispEminND_llin_2D.m:103-326); only the program partitioning
    differs. Level ranges are split so each part holds a contiguous slice
    of the pyramid, finest levels (the expensive ones) in the last part.

    xla=True keeps the segments on the pure-XLA solvers (the known-robust
    configuration for this pipeline); xla=False dispatches the Pallas
    stripe kernels inside each segment.
    """
    from pde_tpu.core.pyramid import pyramid_scales

    p = with_overrides(params or DisparityParams(), **overrides)
    a, b = _prep_pair(il, ir)
    h, w = a.shape[-2:]
    n = min(len(pyramid_scales(h, w, p.scl_factor, 10)), p.scales)
    n_parts = max(1, min(int(n_parts), n))
    # contiguous level ranges, coarse first: [n-1 .. c1], [c1-1 .. c2], ...
    bounds = [n - 1 - round(i * n / n_parts) for i in range(1, n_parts)] + [-1]
    u = None
    hi = n - 1
    for lo_excl in bounds:
        lo = lo_excl + 1
        u = _disp_segment(a, b, u, hi, lo, fst_term, snd_term, p, xla)
        hi = lo - 1
    return u


@partial(jax.jit,
         static_argnames=("scl_exps", "next_shape", "fst_term", "snd_term",
                          "params", "xla"))
def _disp_chunk_pre(levels_slice, u, scl_exps: tuple, next_shape,
                    fst_term: str, snd_term: str, params: DisparityParams,
                    xla: bool = True):
    """Like :func:`_disp_segment` but takes PREBUILT pyramid levels for
    this chunk only (``levels_slice`` coarse -> fine, absolute level
    exponents in ``scl_exps``) instead of rebuilding the pyramid
    in-trace — isolates the level bodies from the pyramid-construction
    ops in the compiled program. ``next_shape``: upscale target after the
    chunk's finest level (None at the pyramid base)."""
    import contextlib

    from pde_tpu.kernels.dispatch import xla_solvers

    p = params
    ctx = xla_solvers() if xla else contextlib.nullcontext()

    def fst_img(img):
        return rgb2grad(img) if fst_term == "grad" else img

    def snd_img(img):
        return None if snd_term == "none" else img

    with ctx:
        for i, (l0, l1) in enumerate(levels_slice):
            h, w = l0.shape[-2:]
            if u is None:
                u = jnp.zeros((h, w), dtype=jnp.float32)
            as_diff = 1.75 * p.scl_factor ** scl_exps[i]
            u = _disp_level(u, fst_img(l0), fst_img(l1), snd_img(l0),
                            snd_img(l1), None, as_diff, p,
                            snd_term == "gradmag")
            if i < len(levels_slice) - 1:
                nh, nw = levels_slice[i + 1][0].shape[-2:]
                u = imresize(u / p.scl_factor, (nh, nw), "bilinear")
        if next_shape is not None:
            u = imresize(u / p.scl_factor, next_shape, "bilinear")
    return u


def disparity_nd_chunked(il, ir, fst_term: str = "grad",
                         snd_term: str = "gradmag",
                         params: DisparityParams | None = None,
                         chunk: int = 4, xla: bool = True, **overrides):
    """Pyramid built OUTSIDE the fused programs (host-side chain of
    small ops, exactly like :func:`disparity_nd`); the level bodies run
    fused in chunks of ``chunk`` levels per program. chunk=1 reproduces
    the known-safe per-level partitioning with the pyramid factored out."""
    p = with_overrides(params or DisparityParams(), **overrides)
    a, b = _prep_pair(il, ir)
    levels = build_pyramid([a, b], p.scl_factor, 10, 5, 1.25, p.scales)
    n = len(levels)
    u = None
    hi = n - 1
    while hi >= 0:
        lo = max(0, hi - chunk + 1)
        lv_slice = tuple((levels[l][0], levels[l][1])
                         for l in range(hi, lo - 1, -1))
        nxt = levels[lo - 1][0].shape[-2:] if lo > 0 else None
        u = _disp_chunk_pre(lv_slice, u, tuple(range(hi, lo - 1, -1)), nxt,
                            fst_term, snd_term, p, xla)
        hi = lo - 1
    return u


def disparity_nd_hybrid(il, ir, fst_term: str = "grad",
                        snd_term: str = "gradmag",
                        params: DisparityParams | None = None,
                        fused_finest: int = 5, xla: bool = True,
                        **overrides):
    """Hybrid partitioning: every coarse pyramid level is its own (tiny,
    known-safe) program; the ``fused_finest`` finest levels — where
    nearly all the arithmetic lives — run as ONE fused program. The
    dispatch count is (n_levels - fused_finest + 1) instead of the
    per-level path's n_levels, with the expensive tail fused."""
    from pde_tpu.core.pyramid import pyramid_scales

    p = with_overrides(params or DisparityParams(), **overrides)
    a, b = _prep_pair(il, ir)
    h, w = a.shape[-2:]
    n = min(len(pyramid_scales(h, w, p.scl_factor, 10)), p.scales)
    k = max(1, min(int(fused_finest), n))
    u = None
    for lvl in range(n - 1, k - 1, -1):  # coarse levels, one program each
        u = _disp_segment(a, b, u, lvl, lvl, fst_term, snd_term, p, xla)
    return _disp_segment(a, b, u, k - 1, 0, fst_term, snd_term, p, xla)


def disparity_nd(il, ir, fst_term: str = "grad", snd_term: str = "gradmag",
                 params: DisparityParams | None = None, us=None,
                 collect: list | None = None, **overrides):
    """il, ir: (C, H, W) or (H, W) uint8-range stereo pair. Returns U (H, W).

    collect: optional list; the per-level U field (coarsest first, before
    upscaling) is appended — used for level-by-level golden parity."""
    p = with_overrides(params or DisparityParams(), **overrides)
    fst_term = fst_term.lower()
    snd_term = snd_term.lower()
    a = jnp.asarray(il, dtype=jnp.float32) / 255.0
    b = jnp.asarray(ir, dtype=jnp.float32) / 255.0
    if a.ndim == 2:
        a, b = a[None], b[None]

    levels = build_pyramid([a, b], p.scl_factor, 10, 5, 1.25, p.scales)
    n = len(levels)

    def fst_img(img):
        return rgb2grad(img) if fst_term == "grad" else img

    def snd_img(img):
        return None if snd_term == "none" else img

    us_lv = [None] * n
    if us is not None:
        cur = jnp.nan_to_num(jnp.asarray(us, dtype=jnp.float32))
        us_lv = [cur]
        for lvl in range(1, n):
            cur = imresize(cur * p.scl_factor, levels[lvl][0].shape[-2:], "bilinear")
            us_lv.append(cur)

    level_fn = jax.jit(partial(_disp_level, p=p, snd_is_gradmag=(snd_term == "gradmag")))

    u = None
    for lvl in range(n - 1, -1, -1):
        l0, l1 = levels[lvl]
        h, w = l0.shape[-2:]
        if u is None:
            u = jnp.zeros((h, w), dtype=jnp.float32)
        as_diff = 1.75 * p.scl_factor**lvl  # DispEminND_llin_2D.m:186
        u = level_fn(u, fst_img(l0), fst_img(l1), snd_img(l0), snd_img(l1),
                     us_lv[lvl], as_diff)
        if collect is not None:
            collect.append(u)
        if lvl > 0:
            nh, nw = levels[lvl - 1][0].shape[-2:]
            u = imresize(u / p.scl_factor, (nh, nw), "bilinear")
    return u
