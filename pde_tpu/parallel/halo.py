"""Halo exchange for spatially tiled stencil sweeps (shard_map bodies).

Ring-style neighbor ``ppermute`` of boundary strips — structurally the
same communication pattern as ring attention, but the payload is 1-2 rows
or columns of the image tile. Edge tiles get *replicated* halos (the
reference replicates 1-px borders every sweep, ``opticalflowSolvers.c:156-179``),
so a tiled sweep matches the single-chip border convention exactly.

All functions here run *inside* ``shard_map`` over a ``("ty", "tx")`` mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _shift(x, axis_name: str, up: bool, n_axis: int):
    """ppermute x one step along the named mesh axis; wraps (ring)."""
    idx = lax.axis_index(axis_name)
    if up:
        perm = [(i, (i + 1) % n_axis) for i in range(n_axis)]
    else:
        perm = [(i, (i - 1) % n_axis) for i in range(n_axis)]
    return lax.ppermute(x, axis_name, perm), idx


def halo_local(x: jnp.ndarray, halo: int = 1, **_kw) -> jnp.ndarray:
    """Communication-free stand-in for :func:`halo_exchange`: identical
    extended shape and arithmetic, but every tile replicates its OWN
    boundary strips — interior tile seams get wrong values. Benchmarking
    only: timing the same sweep with this in place of the real exchange
    isolates the collectives' cost from per-shard fixed costs
    (scripts/bench_scaling.py)."""
    x = jnp.concatenate([x[..., :halo, :], x, x[..., -halo:, :]], axis=-2)
    return jnp.concatenate([x[..., :, :halo], x, x[..., :, -halo:]], axis=-1)


def halo_exchange(x: jnp.ndarray, halo: int = 1, *, ty_axis: str = "ty",
                  tx_axis: str = "tx") -> jnp.ndarray:
    """Pad a local (..., h, w) tile with `halo` rows/cols from mesh neighbors.

    Edge tiles replicate their own boundary (matching the reference's
    replicate-border convention). Returns (..., h+2*halo, w+2*halo).
    """
    nty = lax.axis_size(ty_axis)
    ntx = lax.axis_size(tx_axis)

    # --- rows (ty axis) ---
    top_strip = x[..., :halo, :]      # my top rows -> neighbor below me? no:
    bot_strip = x[..., -halo:, :]
    if nty > 1:
        # neighbor above sends its bottom rows to me; I send mine down.
        from_above, ti = _shift(bot_strip, ty_axis, up=True, n_axis=nty)
        from_below, _ = _shift(top_strip, ty_axis, up=False, n_axis=nty)
        # replicate own border at mesh edges (no wrap semantics for PDEs)
        from_above = jnp.where(ti == 0, top_strip, from_above)
        from_below = jnp.where(ti == nty - 1, bot_strip, from_below)
    else:
        from_above, from_below = top_strip, bot_strip
    x = jnp.concatenate([from_above, x, from_below], axis=-2)

    # --- cols (tx axis) --- (strips now include the row halo)
    left_strip = x[..., :, :halo]
    right_strip = x[..., :, -halo:]
    if ntx > 1:
        from_left, tj = _shift(right_strip, tx_axis, up=True, n_axis=ntx)
        from_right, _ = _shift(left_strip, tx_axis, up=False, n_axis=ntx)
        from_left = jnp.where(tj == 0, left_strip, from_left)
        from_right = jnp.where(tj == ntx - 1, right_strip, from_right)
    else:
        from_left, from_right = left_strip, right_strip
    return jnp.concatenate([from_left, x, from_right], axis=-1)
