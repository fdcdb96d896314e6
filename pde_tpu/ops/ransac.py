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
    feats = features.reshape(n_pix, k)
    d = data.ravel()
    m = mask.ravel()
    n_data = jnp.sum(m)
    min_set = jnp.floor(cset * n_data.astype(jnp.float32) + 0.5)
    err_thr2 = err_thr * err_thr

    # --- draw all minimal sets at once (categorical over the mask) ---
    logits = jnp.where(m, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits, shape=(iters, k))  # (iters, k)

    a = feats[idx]  # (iters, k, k)
    b = d[idx]  # (iters, k)

    def solve_one(ai, bi):
        # exactly-determined k x k system; lstsq handles degenerate draws
        sol = jnp.linalg.lstsq(ai, bi)[0]
        return sol

    models = jax.vmap(solve_one)(a, b)  # (iters, k)

    if model_in is not None:
        warm = jnp.asarray(model_in, jnp.float32)
        has_warm = jnp.all(jnp.isfinite(warm)) & jnp.any(warm != 0.0)
        models = jnp.concatenate([jnp.where(has_warm, warm, models[0])[None], models])

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

    model = models[winner]
    err = ((feats @ model - d) ** 2).reshape(h, w)
    return model, err
