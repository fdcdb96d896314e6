"""Generic stripe-tiled, temporally-blocked Pallas relaxation engine.

The whole-problem VMEM-resident kernel (``sor_pallas.py``) only fits
pyramid levels up to ~256x256 on a 16 MiB-VMEM core. This module covers
every larger grid: the image is cut into row stripes; each grid step DMAs
one stripe (plus a halo) of every field from HBM into VMEM, runs ``k``
relaxation sweeps entirely on-chip, and DMAs the stripe interior of the
mutable fields back out.

Temporal blocking: a red-black sweep has dependency radius 2 (color-0
reads old neighbours, color-1 reads updated color-0), so a halo of
``2*k`` rows makes ``k`` on-chip sweeps bitwise-identical to ``k`` global
sweeps over the interior that is kept. HBM traffic drops from
O(sweeps * fields * H * W) on the XLA path (which also materialises
intermediates) to O(ceil(sweeps/k) * fields * H * W * (1 + 4k/S)).

The engine is solver-agnostic: callers supply ``sweep_fn(mut, const,
aux)`` — the same per-sweep update used by the global XLA solvers in
``solvers/sor.py`` (mirroring GS_SOR_*_2d, opticalflowSolvers.c /
disparitySolvers.c / pdeSolvers.c) — and the engine handles tiling,
padding, parity bookkeeping and the per-sweep 1-px global border
replication (opticalflowSolvers.c:156-179).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _shift_w(x):
    return jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)


def _shift_e(x):
    return jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)


def _shift_n(x):
    return jnp.concatenate([x[:1, :], x[:-1, :]], axis=0)


def _shift_s(x):
    return jnp.concatenate([x[1:, :], x[-1:, :]], axis=0)


class SweepAux(NamedTuple):
    """Everything a sweep body needs besides the field values.

    mask0/mask1: red/black interior masks (exclude the 1-px global border
    and any padding) — used by the replicate-border families (pde4/8,
    disparity). border(x): the global 1-px replicated border fill
    (identity outside the real image extent). maskf0/maskf1: FULL-extent
    color masks (borders included, padding excluded) — used by the
    border-solving coupled flow families (see solvers/sor.py's border
    convention note). edge_w/n/e/s: True on the global out-facing edge of
    each direction (for zeroing the corresponding weights). shifts:
    edge-replicating shift helpers.
    """

    mask0: jnp.ndarray
    mask1: jnp.ndarray
    border: Callable
    maskf0: jnp.ndarray = None
    maskf1: jnp.ndarray = None
    edge_w: jnp.ndarray = None
    edge_n: jnp.ndarray = None
    edge_e: jnp.ndarray = None
    edge_s: jnp.ndarray = None
    shift_w: Callable = _shift_w
    shift_n: Callable = _shift_n
    shift_e: Callable = _shift_e
    shift_s: Callable = _shift_s


# dependency radius (rows) of one full red-black sweep
RB_RADIUS = 2


def _make_aux(ii_real, jj, h, w):
    interior = (ii_real >= 1) & (ii_real <= h - 2) & (jj >= 1) & (jj <= w - 2)
    par = (ii_real + jj) % 2
    mask0 = interior & (par == 0)
    mask1 = interior & (par == 1)
    in_img = (ii_real >= 0) & (ii_real < h) & (jj < w)
    top = (ii_real == 0) & in_img
    bot = (ii_real == h - 1) & in_img
    left = (jj == 0) & in_img
    right = (jj == w - 1) & in_img

    def border(x):
        x = jnp.where(top, _shift_s(x), jnp.where(bot, _shift_n(x), x))
        return jnp.where(left, _shift_e(x), jnp.where(right, _shift_w(x), x))

    return SweepAux(
        mask0=mask0, mask1=mask1, border=border,
        maskf0=in_img & (par == 0), maskf1=in_img & (par == 1),
        edge_w=left, edge_n=top, edge_e=right, edge_s=bot,
    )


def _stripe_kernel(*refs, sweep_fn, prepare_fn, n_mut: int, n_fields: int,
                   k: int, halo: int, stripe: int, bs: int, wp: int,
                   h: int, w: int):
    """One grid step = one row stripe: DMA in, k sweeps, DMA out."""
    in_refs = refs[:n_fields]
    out_refs = refs[n_fields:n_fields + n_mut]
    buf = refs[n_fields + n_mut]          # VMEM (n_fields, bs, wp)
    in_sems = refs[n_fields + n_mut + 1]  # DMA sems (n_fields,)
    out_sems = refs[n_fields + n_mut + 2]  # DMA sems (n_mut,)

    i = pl.program_id(0)
    row0 = i * stripe  # start row in the halo-padded input arrays

    copies_in = [
        pltpu.make_async_copy(
            in_refs[f].at[pl.ds(row0, bs), :], buf.at[f], in_sems.at[f]
        )
        for f in range(n_fields)
    ]
    for c in copies_in:
        c.start()
    for c in copies_in:
        c.wait()

    # global REAL row index of buffer row t is  i*stripe + t - halo
    ii_real = (
        lax.broadcasted_iota(jnp.int32, (bs, wp), 0) + row0 - halo
    )
    jj = lax.broadcasted_iota(jnp.int32, (bs, wp), 1)
    aux = _make_aux(ii_real, jj, h, w)

    mut = [buf[f] for f in range(n_mut)]
    const = [buf[f] for f in range(n_mut, n_fields)]
    if prepare_fn is not None:
        const = prepare_fn(const, aux)

    def body(_, mut_state):
        return tuple(sweep_fn(list(mut_state), const, aux))

    # full unroll only for short chunks; large k would blow up program size
    mut = lax.fori_loop(0, k, body, tuple(mut), unroll=(k <= 8))

    for f in range(n_mut):
        buf[f] = mut[f]

    copies_out = [
        pltpu.make_async_copy(
            buf.at[f, pl.ds(halo, stripe), :],
            out_refs[f].at[pl.ds(row0, stripe), :],
            out_sems.at[f],
        )
        for f in range(n_mut)
    ]
    for c in copies_out:
        c.start()
    for c in copies_out:
        c.wait()


def _stripe_kernel_db(*refs, sweep_fn, prepare_fn, n_mut: int, n_fields: int,
                      k: int, halo: int, stripe: int, bs: int, wp: int,
                      h: int, w: int, n_stripes: int):
    """Double-buffered stripe step: while stripe i's sweeps run on slot
    i%2, stripe i+1's input DMA fills slot (i+1)%2 — the classic
    two-slot software pipeline (overlaps the HBM streams with compute;
    the serial kernel above pays t_dma + t_compute per stripe, this one
    max(t_dma, t_compute) + drain)."""
    in_refs = refs[:n_fields]
    out_refs = refs[n_fields:n_fields + n_mut]
    buf = refs[n_fields + n_mut]          # VMEM (2, n_fields, bs, wp)
    in_sems = refs[n_fields + n_mut + 1]  # DMA sems (2, n_fields)
    out_sems = refs[n_fields + n_mut + 2]  # DMA sems (2, n_mut)

    i = pl.program_id(0)
    slot = lax.rem(i, 2)
    nxt = lax.rem(i + 1, 2)

    def in_copies(step, s):
        row0 = step * stripe
        return [
            pltpu.make_async_copy(
                in_refs[f].at[pl.ds(row0, bs), :], buf.at[s, f],
                in_sems.at[s, f],
            )
            for f in range(n_fields)
        ]

    def out_copies(step, s):
        row0 = step * stripe
        return [
            pltpu.make_async_copy(
                buf.at[s, f, pl.ds(halo, stripe), :],
                out_refs[f].at[pl.ds(row0, stripe), :],
                out_sems.at[s, f],
            )
            for f in range(n_mut)
        ]

    @pl.when(i == 0)
    def _():
        for c in in_copies(0, slot):
            c.start()

    # prefetch stripe i+1 into the other slot; first drain the out-DMA
    # issued from that slot at step i-1 (it reads rows we are about to
    # overwrite)
    @pl.when(i + 1 < n_stripes)
    def _():
        @pl.when(i >= 1)
        def _():
            for c in out_copies(i - 1, nxt):
                c.wait()
        for c in in_copies(i + 1, nxt):
            c.start()

    for c in in_copies(i, slot):
        c.wait()

    ii_real = (
        lax.broadcasted_iota(jnp.int32, (bs, wp), 0) + i * stripe - halo
    )
    jj = lax.broadcasted_iota(jnp.int32, (bs, wp), 1)
    aux = _make_aux(ii_real, jj, h, w)

    mut = [buf[slot, f] for f in range(n_mut)]
    const = [buf[slot, f] for f in range(n_mut, n_fields)]
    if prepare_fn is not None:
        const = prepare_fn(const, aux)

    def body(_, mut_state):
        return tuple(sweep_fn(list(mut_state), const, aux))

    mut = lax.fori_loop(0, k, body, tuple(mut), unroll=(k <= 8))

    for f in range(n_mut):
        buf[slot, f] = mut[f]

    for c in out_copies(i, slot):
        c.start()

    # final step: drain every outstanding out-DMA before the kernel ends
    @pl.when(i == n_stripes - 1)
    def _():
        for c in out_copies(i, slot):
            c.wait()

        @pl.when(i >= 1)
        def _():
            for c in out_copies(i - 1, nxt):
                c.wait()


# target bytes for the stripe working set (fields only; live temporaries
# of the sweep body roughly double it — keep well under 16 MiB VMEM)
_STRIPE_BUDGET_BYTES = 6 * 1024 * 1024
# per-slot budget for the double-buffered engine (two slots resident;
# sweep-body temporaries live alongside BOTH slots, so this must stay
# well under half the serial budget — 5 MiB/slot compiled to an 18 MiB
# scoped-vmem stack and got rejected by Mosaic on v5e)
_STRIPE_BUDGET_BYTES_DB = 3 * 1024 * 1024
_MIN_STRIPE = 8


def _halo_for(k: int) -> int:
    # dependency halo, rounded up so every DMA row offset (both the
    # input stripe start and the in-buffer output slice at row `halo`)
    # stays a multiple of the f32 sublane tile (8 rows)
    return _round_up(RB_RADIUS * k, 8)


def plan_stripes(h: int, w: int, n_fields: int, sweeps: int, k_max: int = 4,
                 double_buffer: bool = False):
    """Choose (k, stripe, n_stripes) for an (h, w) problem.

    stripe is a multiple of 8 (HBM DMA row offsets must be sublane-
    aligned). Returns None when no plan fits the VMEM stripe budget.
    double_buffer=True plans for two resident buffer slots (smaller
    per-slot budget).
    """
    budget = _STRIPE_BUDGET_BYTES_DB if double_buffer else _STRIPE_BUDGET_BYTES
    wp = _round_up(max(w, 128), 128)
    k = max(1, min(k_max, sweeps))
    while k >= 1:
        halo = _halo_for(k)
        # bs = stripe + 2*halo rows; fields bytes = n_fields * bs * wp * 4
        max_bs = budget // (n_fields * wp * 4)
        stripe = (max_bs - 2 * halo) // 8 * 8
        if stripe >= max(_MIN_STRIPE, 2 * halo):
            stripe = min(stripe, _round_up(h, 8))
            return k, stripe, math.ceil(h / stripe)
        k -= 1
    return None


@partial(
    jax.jit,
    static_argnames=("sweep_fn", "prepare_fn", "n_mut", "iters", "k",
                     "stripe", "interpret", "double_buffer"),
)
def _tiled_chunks(fields, sweep_fn, prepare_fn, n_mut: int, iters: int,
                  k: int, stripe: int, interpret: bool = False,
                  double_buffer: bool = False):
    h, w = fields[0].shape
    n_fields = len(fields)
    wp = _round_up(max(w, 128), 128)
    hs = _round_up(h, stripe)
    n_stripes = hs // stripe

    def pad_hw(x, halo):
        return jnp.pad(
            x.astype(jnp.float32),
            ((halo, hs - h + halo), (0, wp - w)),
            mode="edge",
        )

    def run_chunk(mut, kc: int, const_padded, halo: int):
        bs = stripe + 2 * halo
        padded = [pad_hw(f, halo) for f in mut] + const_padded
        common = dict(
            sweep_fn=sweep_fn, prepare_fn=prepare_fn, n_mut=n_mut,
            n_fields=n_fields, k=kc, halo=halo, stripe=stripe, bs=bs,
            wp=wp, h=h, w=w,
        )
        if double_buffer:
            kern = partial(_stripe_kernel_db, n_stripes=n_stripes, **common)
            scratch = [
                pltpu.VMEM((2, n_fields, bs, wp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, n_fields)),
                pltpu.SemaphoreType.DMA((2, n_mut)),
            ]
        else:
            kern = partial(_stripe_kernel, **common)
            scratch = [
                pltpu.VMEM((n_fields, bs, wp), jnp.float32),
                pltpu.SemaphoreType.DMA((n_fields,)),
                pltpu.SemaphoreType.DMA((n_mut,)),
            ]
        out = pl.pallas_call(
            kern,
            grid=(n_stripes,),
            out_shape=tuple(
                jax.ShapeDtypeStruct((hs, wp), jnp.float32)
                for _ in range(n_mut)
            ),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_fields,
            out_specs=tuple(
                pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_mut)
            ),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*padded)
        return [o[:h, :w] for o in out]

    mut = [f.astype(jnp.float32) for f in fields[:n_mut]]
    n_full, rem = divmod(iters, k)
    if n_full:
        halo = _halo_for(k)
        const_padded = [pad_hw(f, halo) for f in fields[n_mut:]]
        if n_full == 1:
            mut = run_chunk(mut, k, const_padded, halo)
        else:
            def body(carry, _):
                return tuple(run_chunk(list(carry), k, const_padded, halo)), None

            mut_t, _ = lax.scan(body, tuple(mut), None, length=n_full)
            mut = list(mut_t)
    if rem:
        halo = _halo_for(rem)
        const_padded = [pad_hw(f, halo) for f in fields[n_mut:]]
        mut = run_chunk(mut, rem, const_padded, halo)

    return tuple(mut)


def tiled_relax(fields: Sequence[jnp.ndarray], sweep_fn, n_mut: int,
                iters: int, k_max: int = 4, prepare_fn=None,
                interpret: bool = False, plan_override=None,
                double_buffer: bool = False):
    """Run ``iters`` red-black sweeps of ``sweep_fn`` over ``fields``.

    fields[:n_mut] are the relaxed state; the rest are frozen
    coefficients (optionally pre-transformed once per stripe by
    ``prepare_fn(const, aux)``). Returns the updated mutable fields,
    identical to running the same sweeps globally. Returns None when no
    stripe plan fits.

    plan_override: optional ``(k, stripe)`` forcing a specific temporal
    block and stripe height (stripe must be a multiple of 8) — used by
    tests to exercise multi-stripe plans on small grids.

    double_buffer=True pipelines stripe i+1's input DMA under stripe i's
    sweeps (two VMEM slots; see _stripe_kernel_db). Identical numerics.
    """
    h, w = fields[0].shape
    if plan_override is not None:
        k, stripe = plan_override
    else:
        plan = plan_stripes(h, w, len(fields), iters, k_max,
                            double_buffer=double_buffer)
        if plan is None:
            return None
        k, stripe, _ = plan
    return _tiled_chunks(tuple(fields), sweep_fn, prepare_fn, n_mut, iters,
                         k, stripe, interpret, double_buffer)
