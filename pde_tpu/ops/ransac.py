"""RANSAC polynomial-surface fitting, fully vectorised for TPU.

Re-designs the reference's sequential RANSAC + LAPACK pipeline
(SurfaceEquation.c:223-423 model builder, ransac.c:31-220 search loop,
sgels fits :376-386) as one jitted program:

* all ``iters`` hypotheses are drawn at once with keyed ``jax.random``
  (the reference seeds libc ``rand`` with time(), ransac.c:230-234 —
  parity is statistical, not bitwise),
* each minimal sample (3 points for a plane, 6 for a quadric) is solved
  by a vmapped least-squares — a tiny batched matmul + solve that lives
  happily on the MXU,
* inlier counting / error sums are masked reductions over the *full*
  image grid (the segment is a boolean mask, never a dynamic gather), so
  shapes stay static,
* selection follows the reference exactly: a model is licit when its
  inlier count >= round(cset * n_data); among licit models the smallest
  inlier-error-sum wins; with no licit model the largest inlier count
  wins (best-inlier fallback, ransac.c:189-211). A warm-start model
  competes as hypothesis 0 (ransac.c:109-144).

Under ``shard_map`` the masked reductions become ``psum`` over the tile
mesh; hypothesis fitting is replicated (tiny).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def surface_features(h: int, w: int, order: int) -> jnp.ndarray:
    """(H, W, k) design features; 1-based coords as MATLAB meshgrid.

    order 1: [X, Y, 1]; order 2: [X^2, Y^2, XY, X, Y, 1]
    (DispSegmentation.m:341-359).
    """
    y, x = jnp.mgrid[1 : h + 1, 1 : w + 1]
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    one = jnp.ones_like(x)
    if order == 1:
        return jnp.stack([x, y, one], axis=-1)
    return jnp.stack([x * x, y * y, x * y, x, y, one], axis=-1)


def surface_eval(features: jnp.ndarray, model: jnp.ndarray) -> jnp.ndarray:
    """(H, W, k) @ (k,) -> (H, W) surface height."""
    return features @ model


def _norm_params(h: int, w: int):
    """Map 1-based pixel coords onto [-1, 1] (cx, sx, cy, sy)."""
    cx = (w + 1) / 2.0
    sx = max((w - 1) / 2.0, 1.0)
    cy = (h + 1) / 2.0
    sy = max((h - 1) / 2.0, 1.0)
    return cx, sx, cy, sy


def _model_to_norm(m, cx, sx, cy, sy, k: int):
    """Original-coordinate coefficients -> normalized-coordinate ones
    (substitute x = sx*u + cx, y = sy*v + cy)."""
    if k == 3:
        a, b, c = m[0], m[1], m[2]
        return jnp.stack([a * sx, b * sy, a * cx + b * cy + c])
    a, b, c, d, e, f = m[0], m[1], m[2], m[3], m[4], m[5]
    return jnp.stack([
        a * sx * sx,
        b * sy * sy,
        c * sx * sy,
        2.0 * a * sx * cx + c * sx * cy + d * sx,
        2.0 * b * sy * cy + c * sy * cx + e * sy,
        a * cx * cx + b * cy * cy + c * cx * cy + d * cx + e * cy + f,
    ])


def _model_from_norm(m, cx, sx, cy, sy, k: int):
    """Normalized-coordinate coefficients -> original 1-based pixel ones."""
    if k == 3:
        a, b, c = m[0], m[1], m[2]
        return jnp.stack([a / sx, b / sy, c - a * cx / sx - b * cy / sy])
    a, b, c, d, e, f = m[0], m[1], m[2], m[3], m[4], m[5]
    axx = a / (sx * sx)
    byy = b / (sy * sy)
    cxy = c / (sx * sy)
    dx = -2.0 * a * cx / (sx * sx) - c * cy / (sx * sy) + d / sx
    ey = -2.0 * b * cy / (sy * sy) - c * cx / (sx * sy) + e / sy
    f0 = (a * cx * cx / (sx * sx) + b * cy * cy / (sy * sy)
          + c * cx * cy / (sx * sy) - d * cx / sx - e * cy / sy + f)
    return jnp.stack([axx, byy, cxy, dx, ey, f0])


@partial(jax.jit, static_argnames=("iters",))
def ransac_surface(key, data, mask, features, err_thr, cset, iters: int, model_in=None):
    """Fit ``surface_eval(features, model) ~= data`` on ``mask`` pixels.

    data: (H, W) float32; mask: (H, W) bool (the segment H1);
    features: (H, W, k) from :func:`surface_features`;
    err_thr: inlier threshold (compared against squared residuals as
    err_thr^2, ransac.c:60); cset: consensus fraction of the masked
    pixel count; model_in: optional (k,) warm start (NaN/zeros => none,
    matching the reference's empty-model convention).

    Returns (model (k,), err (H, W) squared residuals of the winner).
    """
    h, w, k = features.shape
    n_pix = h * w
    # Fit in NORMALIZED coordinates (x, y mapped to [-1, 1]): the raw
    # quadric features (X^2 up to ~5e4 for Middlebury-sized frames) make
    # the per-hypothesis float32 least squares catastrophically
    # ill-conditioned when the sample points cluster in a small region —
    # jnp.linalg.lstsq's rcond truncation then returns models that do not
    # even interpolate their own sample, so every hypothesis scores zero
    # inliers. The reference gets away with raw coordinates only because
    # LAPACK sgels (QR, no cutoff) degrades more gracefully
    # (SurfaceEquation.c:376-386). Models are transformed back to the
    # reference's 1-based pixel coordinates on return, so SParam parity
    # is preserved exactly.
    cx, sx, cy, sy = _norm_params(h, w)
    yy, xx = jnp.mgrid[1:h + 1, 1:w + 1]
    u = ((xx - cx) / sx).astype(jnp.float32).ravel()
    v = ((yy - cy) / sy).astype(jnp.float32).ravel()
    one = jnp.ones_like(u)
    if k == 3:
        feats = jnp.stack([u, v, one], axis=-1)
    else:
        feats = jnp.stack([u * u, v * v, u * v, u, v, one], axis=-1)
    d = data.ravel()
    m = mask.ravel()
    n_data = jnp.sum(m)
    min_set = jnp.floor(cset * n_data.astype(jnp.float32) + 0.5)
    err_thr2 = err_thr * err_thr

    # --- draw all minimal sets at once (categorical over the mask) ---
    # k+1 points per hypothesis as the reference (SurfaceEquation.c:218:
    # n = dimElems[0]+1): one-point-overdetermined LS resists degenerate
    # draws better than an exactly-determined solve
    ns = k + 1
    logits = jnp.where(m, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits, shape=(iters, ns))

    a = feats[idx]  # (iters, ns, k)
    b = d[idx]  # (iters, ns)

    def solve_one(ai, bi):
        sol = jnp.linalg.lstsq(ai, bi)[0]
        return sol

    models = jax.vmap(solve_one)(a, b)  # (iters, k)

    if model_in is not None:
        warm = jnp.asarray(model_in, jnp.float32)
        has_warm = jnp.all(jnp.isfinite(warm)) & jnp.any(warm != 0.0)
        warm_n = _model_to_norm(warm, cx, sx, cy, sy, k)
        models = jnp.concatenate(
            [jnp.where(has_warm, warm_n, models[0])[None], models])

    # --- score every hypothesis with masked reductions ---
    def score(model):
        err = (feats @ model - d) ** 2
        inlier = m & (err <= err_thr2)
        count = jnp.sum(inlier)
        err_sum = jnp.sum(jnp.where(inlier, err, 0.0))
        return count, err_sum

    counts, err_sums = jax.vmap(score)(models)

    licit = counts >= min_set
    any_licit = jnp.any(licit)
    licit_cost = jnp.where(licit, err_sums, jnp.inf)
    best_licit = jnp.argmin(licit_cost)
    best_inlr = jnp.argmax(counts)
    winner = jnp.where(any_licit, best_licit, best_inlr)

    model_n = models[winner]
    err = ((feats @ model_n - d) ** 2).reshape(h, w)
    model = _model_from_norm(model_n, cx, sx, cy, sy, k)
    return model, err
