"""Model-level multi-chip execution.

Two complementary mechanisms (SURVEY.md section 2.3, multi-device row):

* ``sharded_nd_level`` — one FULL pyramid level of the flagship warping
  flow (warp -> Simoncelli derivative tensors -> robust weights -> Brox
  diffusion weights -> coupled solve, models/flow_nd._nd_level) compiled
  under GSPMD: inputs carry a ("ty", "tx") spatial NamedSharding and XLA
  inserts the halo/gather collectives for every stencil and the warp's
  cross-tile reads. This is the scaling-book recipe — annotate shardings,
  let the compiler place collectives — and covers ops (5-tap stencils,
  median, bilinear gathers) that hand-written halo exchange would have to
  special-case one by one.

* ``shard_spec_for`` / the explicit shard_map solvers in ``tiled.py`` —
  the relaxation hot loop with hand-placed 1-px ``ppermute`` halos, used
  where sweep-by-sweep communication latency dominates.

Multigrid coarse-level regather (FlowEminNDFASFMG_elin_2D_v10.m:212-217
analogue): ``flow_fmg(..., mesh=...)`` constrains every FAS level's
fields to the spatial mesh while they are large and to a fully
replicated layout once ``min(H, W) < shard_min`` — XLA materialises the
all-gather at the crossover, so tiny coarse grids solve on-replica
instead of scattering 8-pixel tiles across chips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_spec_for(mesh: Mesh, ndim: int) -> NamedSharding:
    """(..., H, W) arrays: shard the trailing image plane over (ty, tx)."""
    spec = P(*([None] * (ndim - 2) + ["ty", "tx"]))
    return NamedSharding(mesh, spec)


def constrain_level(x, mesh: Mesh | None, shard_min: int = 64):
    """Spatial sharding while the grid is large; replicated below
    ``shard_min`` (the multigrid coarse-level regather)."""
    if mesh is None or x is None:
        return x
    h, w = x.shape[-2:]
    if min(h, w) >= shard_min:
        return jax.lax.with_sharding_constraint(x, shard_spec_for(mesh, x.ndim))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*([None] * x.ndim))))


def place_level(x, mesh: Mesh | None, shard_min: int = 64):
    """Host-side counterpart of :func:`constrain_level`: ``device_put``
    with the ("ty", "tx") spatial sharding while the grid is large,
    fully replicated below ``shard_min`` (coarse pyramid levels) or when
    a dimension does not divide the mesh (device_put cannot pad)."""
    if mesh is None or x is None:
        return x
    h, w = x.shape[-2:]
    nty, ntx = mesh.shape["ty"], mesh.shape["tx"]
    if min(h, w) >= shard_min and h % nty == 0 and w % ntx == 0:
        return jax.device_put(x, shard_spec_for(mesh, x.ndim))
    return jax.device_put(x, NamedSharding(mesh, P(*([None] * x.ndim))))


def sharded_nd_level(mesh: Mesh, u, v, i1t0, i1t1, i2t0, i2t1,
                     us_ap, vs_ap, as_diff, p, snd_is_gradmag: bool):
    """One full flow_nd pyramid level under GSPMD spatial sharding.

    Arguments mirror ``models.flow_nd._nd_level``; all (H, W) /
    (C, H, W) inputs are placed with a ("ty", "tx") NamedSharding and the
    jitted level runs SPMD across the mesh. Returns (U, V) with the same
    sharding."""
    from pde_tpu.models.flow_nd import _nd_level

    def put(x):
        if x is None:
            return None
        x = jnp.asarray(x, jnp.float32)
        return jax.device_put(x, shard_spec_for(mesh, x.ndim))

    args = tuple(put(x) for x in (u, v, i1t0, i1t1, i2t0, i2t1, us_ap, vs_ap))
    fn = jax.jit(
        partial(_nd_level, p=p, snd_is_gradmag=snd_is_gradmag),
        out_shardings=(shard_spec_for(mesh, 2),) * 2,
    )
    return fn(*args, jnp.float32(as_diff))
