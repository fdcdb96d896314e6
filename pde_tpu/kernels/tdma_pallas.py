"""VMEM-resident cyclic-reduction tridiagonal solver (Pallas TPU).

The pure-XLA cyclic reduction (solvers/tdma.thomas_solve_cr) is already
~100x faster than a lax.scan Thomas chain, but every CR level streams
its (halved) coefficient arrays through HBM: a 1024-line solve moves
~25 full-array passes (~140 us at 1024x1024 — near memory bound for
that traffic). This kernel performs the SAME elimination with the whole
column stripe resident in VMEM: HBM traffic drops to the unavoidable
4 reads + 1 write, a ~5x reduction, and every CR level is pure VPU work
on resident data.

Layout: solves along axis -2 (rows) of (H, W) float32 arrays — the
vertical line solves of the zebra-ALR / AOS families; horizontal solves
go through a transpose at the call site (solvers/tdma.thomas_solve
handles the axis plumbing). The grid tiles W into lane-aligned column
stripes; H is padded to a power of two with identity rows (x = d/b = 0).

Same contract as thomas_solve: a[0] and c[-1] are ignored, systems must
be nonsingular after elimination (diagonally dominant in every caller).
Matches the reference's line solvers (opticalflowSolvers.c:1763-3913,
pdeSolvers.c:409-1598, levelsetSolvers.c:189-868) in the smoother role.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _cr_solve_resident(a, b, c, d):
    """Cyclic reduction on (H, C) values already in registers/VMEM.

    H must be a power of two >= 2. Same elimination as
    solvers/tdma._cr_level, expressed with reshape-based even/odd
    splits (sublane-dim reshapes lower cleanly in Mosaic).
    """
    h = a.shape[0]
    if h == 1:
        return d / b
    if h == 2:
        det = b[0] * b[1] - c[0] * a[1]
        x0 = (d[0] * b[1] - c[0] * d[1]) / det
        x1 = (b[0] * d[1] - d[0] * a[1]) / det
        return jnp.stack([x0, x1], 0)

    c_ = a.shape[-1]

    def split(x):
        r = x.reshape(h // 2, 2, c_)
        return r[:, 0, :], r[:, 1, :]

    ae, ao = split(a)
    be, bo = split(b)
    ce, co = split(c)
    de, do_ = split(d)
    # odd neighbours of even row 2j: previous odd = 2j-1, next odd = 2j+1
    bprev = jnp.concatenate([jnp.ones_like(bo[:1]), bo[:-1]], 0)
    cprev = jnp.concatenate([jnp.zeros_like(co[:1]), co[:-1]], 0)
    dprev = jnp.concatenate([jnp.zeros_like(do_[:1]), do_[:-1]], 0)
    aprev = jnp.concatenate([jnp.zeros_like(ao[:1]), ao[:-1]], 0)
    alpha = ae / bprev  # ae[0] == 0 -> alpha[0] == 0
    gamma = ce / bo
    a2 = -alpha * aprev
    c2 = -gamma * co
    b2 = be - alpha * cprev - gamma * ao
    d2 = de - alpha * dprev - gamma * do_
    xe = _cr_solve_resident(a2, b2, c2, d2)
    xnext = jnp.concatenate([xe[1:], jnp.zeros_like(xe[:1])], 0)
    xo = (do_ - ao * xe - co * xnext) / bo
    return jnp.stack([xe, xo], 1).reshape(h, c_)


def _cr_kernel(a_ref, b_ref, c_ref, d_ref, x_ref, *, hp: int):
    a = a_ref[...]
    b = b_ref[...]
    c = c_ref[...]
    d = d_ref[...]
    x_ref[...] = _cr_solve_resident(a, b, c, d)


# column-stripe width budget for the 4 coefficient blocks. Mosaic
# allocates the recursion's per-level temporaries on the scoped-vmem
# stack WITHOUT reuse (~6x the block bytes observed: 6 MiB of blocks
# compiled to a 35.6 MiB stack), so keep the blocks small
_VMEM_BUDGET = 1536 * 1024


def plan_cols(hp: int) -> int | None:
    """Lane-aligned stripe width for a padded height ``hp``."""
    max_cols = _VMEM_BUDGET // (4 * hp * 4)
    cols = max_cols // 128 * 128
    return cols if cols >= 128 else None


# Mosaic rejects the kernel above a recursion depth of 9 (h=1024 fails,
# h=512 compiles and runs) — the outer CR levels run in XLA instead:
# each halving costs ~3 extra HBM passes on the already-halved arrays,
# a small surcharge on top of the resident solve.
_MAX_KERNEL_H = 512


def _cr_reduce_once(a, b, c, d):
    """One XLA cyclic-reduction level (axis 0, even length): returns the
    half-size even-row system plus the odd-row data for back-substitution."""
    ae, be, ce, de = a[0::2], b[0::2], c[0::2], d[0::2]
    ao, bo, co, do_ = a[1::2], b[1::2], c[1::2], d[1::2]
    bprev = jnp.concatenate([jnp.ones_like(bo[:1]), bo[:-1]], 0)
    cprev = jnp.concatenate([jnp.zeros_like(co[:1]), co[:-1]], 0)
    dprev = jnp.concatenate([jnp.zeros_like(do_[:1]), do_[:-1]], 0)
    aprev = jnp.concatenate([jnp.zeros_like(ao[:1]), ao[:-1]], 0)
    alpha = ae / bprev
    gamma = ce / bo
    a2 = -alpha * aprev
    c2 = -gamma * co
    b2 = be - alpha * cprev - gamma * ao
    d2 = de - alpha * dprev - gamma * do_
    return (a2, b2, c2, d2), (ao, bo, co, do_)


def _cr_backsub_once(xe, odd):
    ao, bo, co, do_ = odd
    xnext = jnp.concatenate([xe[1:], jnp.zeros_like(xe[:1])], 0)
    xo = (do_ - ao * xe - co * xnext) / bo
    return jnp.stack([xe, xo], 1).reshape((-1,) + xe.shape[1:])


@partial(jax.jit, static_argnames=("interpret",))
def tridiag_cr_pallas(a, b, c, d, interpret: bool = False):
    """Solve tridiagonal systems along axis -2 of (H, W) float32 arrays.

    Falls back to the XLA cyclic reduction via the dispatcher in
    solvers/tdma (callers never invoke this on unplannable shapes).
    """
    h, w = a.shape[-2:]
    hp = 1 << max(1, (h - 1).bit_length())  # next power of two

    def pad(x, fill):
        return jnp.pad(x.astype(jnp.float32),
                       ((0, hp - h), (0, 0)), constant_values=fill)

    # identity padding rows: b=1, a=c=d=0 -> x=0, decoupled from the real
    # rows because c[h-1] of the last real row is ignored-by-contract and
    # zeroed here
    ap = pad(a, 0.0).at[0, :].set(0.0)
    cp = pad(c, 0.0).at[h - 1, :].set(0.0)
    bp = pad(b, 0.0).at[h:, :].set(1.0)
    dp = pad(d, 0.0)

    # outer CR levels in XLA until the kernel's depth limit
    odds = []
    while hp > _MAX_KERNEL_H:
        (ap, bp, cp, dp), odd = _cr_reduce_once(ap, bp, cp, dp)
        odds.append(odd)
        hp //= 2

    cols = plan_cols(hp)
    cols = min(cols, _round_up(w, 128))
    wp = _round_up(w, cols)

    def padw(x):
        return jnp.pad(x, ((0, 0), (0, wp - w)))

    n_stripes = wp // cols
    x = pl.pallas_call(
        partial(_cr_kernel, hp=hp),
        grid=(n_stripes,),
        in_specs=[pl.BlockSpec((hp, cols), lambda i: (0, i))] * 4,
        out_specs=pl.BlockSpec((hp, cols), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=interpret,
    )(padw(ap), padw(bp), padw(cp), padw(dp))[:, :w]
    for odd in reversed(odds):
        x = _cr_backsub_once(x, odd)
    return x[:h, :w]
