"""Grid primitives: neighbour shifts, border handling, checkerboards.

Conventions
-----------
Arrays are row-major ``(..., H, W)`` float32. In the reference's
column-major MATLAB layout (``pos = j*nrows + i``,
/root/reference/mex/source/library/opticalflowSolvers.c:81) the "west"
neighbour is column ``j-1`` and "north" is row ``i-1``; here that maps to

* W -> ``[..., i, j-1]``   (left)
* E -> ``[..., i, j+1]``   (right)
* N -> ``[..., i-1, j]``   (up)
* S -> ``[..., i+1, j]``   (down)

``shift_*`` return the array whose element at (i, j) is the value of the
*-neighbour, with replicate (clamp) behaviour at the image edge — matching
the reference solvers, which only ever read neighbours from interior
points and re-fill a 1-px replicated border every sweep
(opticalflowSolvers.c:156-179).
"""

from __future__ import annotations

import jax.numpy as jnp


def shift_w(x: jnp.ndarray) -> jnp.ndarray:
    """value of the west (left, j-1) neighbour; replicate at j=0."""
    return jnp.concatenate([x[..., :, :1], x[..., :, :-1]], axis=-1)


def shift_e(x: jnp.ndarray) -> jnp.ndarray:
    """value of the east (right, j+1) neighbour; replicate at j=W-1."""
    return jnp.concatenate([x[..., :, 1:], x[..., :, -1:]], axis=-1)


def shift_n(x: jnp.ndarray) -> jnp.ndarray:
    """value of the north (up, i-1) neighbour; replicate at i=0."""
    return jnp.concatenate([x[..., :1, :], x[..., :-1, :]], axis=-2)


def shift_s(x: jnp.ndarray) -> jnp.ndarray:
    """value of the south (down, i+1) neighbour; replicate at i=H-1."""
    return jnp.concatenate([x[..., 1:, :], x[..., -1:, :]], axis=-2)


def replicate_border(x: jnp.ndarray) -> jnp.ndarray:
    """Overwrite the 1-px border with its interior neighbour.

    Matches the per-sweep border fill of the reference solvers
    (opticalflowSolvers.c:156-179): first rows (N/S replicate), then
    columns (W/E replicate) — the later pass wins at corners. In the C
    code the column fill (j loop over `pos=j*nrows`) copies row 1 into
    row 0 / row H-2 into H-1 for every column FIRST, then the row fill
    copies column 1 into column 0 etc., so corners come from the column
    copy of the already-row-filled array.
    """
    # rows: row 0 <- row 1, row H-1 <- row H-2
    x = jnp.concatenate([x[..., 1:2, :], x[..., 1:-1, :], x[..., -2:-1, :]], axis=-2)
    # cols: col 0 <- col 1, col W-1 <- col W-2
    x = jnp.concatenate([x[..., :, 1:2], x[..., :, 1:-1], x[..., :, -2:-1]], axis=-1)
    return x


def interior_mask(h: int, w: int, dtype=jnp.bool_) -> jnp.ndarray:
    """True on pixels with all 4 neighbours in-bounds (the solver's update set)."""
    m = jnp.zeros((h, w), dtype=jnp.bool_)
    m = m.at[1:-1, 1:-1].set(True)
    return m.astype(dtype)


def checkerboard(h: int, w: int, parity: int = 0) -> jnp.ndarray:
    """Boolean mask of pixels with (i + j) % 2 == parity (red/black ordering)."""
    ii = jnp.arange(h)[:, None]
    jj = jnp.arange(w)[None, :]
    return ((ii + jj) % 2) == parity
