"""Pure semi-implicit nonlinear diffusion (Diffusion4_v10.m).

Additive vertical+horizontal split: each outer iteration recomputes Brox
weights from the current image, then

    ver solves (2 + alpha*(wN+wS)) x - alpha*wN x_N - alpha*wS x_S = u
    hor solves the transposed system; u <- ver + hor

(Diffusion4_v10.m:45-61, TDMA :70-92). Weights have zeroed borders
(:97-128). Channels batch through the leading dim.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from pde_tpu.config import with_overrides
from pde_tpu.ops.weights import diffusion_weights_4
from pde_tpu.solvers.tdma import thomas_solve


@dataclasses.dataclass(frozen=True)
class Diffusion4Params:
    """Defaults from Diffusion4_v10.m:36-37."""

    alpha: float = 25.0
    outer_iter: int = 5


@partial(jax.jit, static_argnames=("outer_iter",))
def _diffuse(x, alpha, outer_iter):
    def body(_, u):
        # weights are max-over-channels (H, W); the solve runs per channel
        ww, wn, we, ws = diffusion_weights_4(u, eps=1e-5, combine="max", zero_borders=True)
        ww, wn, we, ws = (jnp.broadcast_to(w_, u.shape) for w_ in (ww, wn, we, ws))
        ver = thomas_solve(-alpha * wn, 2.0 + alpha * (wn + ws), -alpha * ws, u, axis=-2)
        hor = thomas_solve(-alpha * ww, 2.0 + alpha * (ww + we), -alpha * we, u, axis=-1)
        return ver + hor

    return lax.fori_loop(0, outer_iter + 1, body, x)


def diffusion4(img, params: Diffusion4Params | None = None, **overrides):
    """img: (C, H, W) or (H, W) float32 (0-255 domain, as the reference)."""
    p = with_overrides(params or Diffusion4Params(), **overrides)
    x = jnp.asarray(img, dtype=jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    out = _diffuse(x, p.alpha, p.outer_iter)
    return out[0] if squeeze else out
