"""Coarse-to-fine image pyramids (reference pyramid-build semantics).

Flow/disparity drivers build the pyramid as: resize level k-1 by
``scl_factor`` (bilinear) to get level k, then Gaussian-smooth level k-1
*after* the resize; the final (coarsest) level is smoothed too; the loop
stops once a level's H or W drops to <= ``stop``
(FlowEminND_llin_2D_v10.m:104-127, stop=20; DispEminND_llin_2D.m:103-125,
stop=10). Note the subtle order: each retained level is smoothed, and the
resize that produces the next level reads the *unsmoothed* parent.

Pyramid shapes are static Python-side metadata; each level's arrays are
jax arrays so the per-level solve jits per shape.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pde_tpu.core.conv import imfilter_replicate, gaussian_kernel_2d
from pde_tpu.core.resize import imresize_scale


def pyramid_scales(
    h: int, w: int, scl_factor: float, stop: int, max_scales: int = 10**9
) -> list[tuple[int, int]]:
    """Static list of (H, W) per level, finest first, reference stop rule."""
    sizes = [(h, w)]
    while len(sizes) < max_scales:
        ph, pw = sizes[-1]
        nh, nw = int(np.ceil(ph * scl_factor)), int(np.ceil(pw * scl_factor))
        sizes.append((nh, nw))
        if nh <= stop or nw <= stop:
            break
    return sizes


def build_pyramid(
    imgs: list[jnp.ndarray],
    scl_factor: float,
    stop: int,
    smooth_size: int = 5,
    smooth_sigma: float = 1.25,
    max_scales: int = 10**9,
) -> list[list[jnp.ndarray]]:
    """Build pyramids for several (..., H, W) images simultaneously.

    Returns ``levels[k][i]``: level k (finest k=0) of image i. All images
    share the level geometry of the first one.
    """
    g = gaussian_kernel_2d(smooth_size, smooth_sigma)
    h, w = imgs[0].shape[-2:]
    sizes = pyramid_scales(h, w, scl_factor, stop, max_scales)
    raw = [list(imgs)]
    for _ in sizes[1:]:
        raw.append([imresize_scale(x, scl_factor, "bilinear") for x in raw[-1]])
    # smooth every retained level (incl. the coarsest) after its child is built
    levels = [[imfilter_replicate(x, g) for x in lvl] for lvl in raw]
    return levels
