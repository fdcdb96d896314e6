"""Multi-chip tiling correctness on the virtual 8-device CPU mesh.

The contract: tile-sharded sweeps produce the same fields as the
single-chip solvers (exactly for red-black SOR, which is an identical
update order; to float tolerance for tiled PCG, whose tile-local line
preconditioner changes the Krylov trajectory but not the fixed point).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from pde_tpu.solvers.sor import sor_flow_llin4
from pde_tpu.solvers.krylov import pcg_flow_llin4
from pde_tpu.parallel.tiled import tiled_sor_flow_llin4, tiled_pcg_flow_llin4
from pde_tpu.parallel.mesh import make_mesh


def _problem(rng, h=32, w=48):
    f32 = np.float32
    mk = lambda s=1.0: jnp.asarray(rng.random((h, w)).astype(f32) * s)
    u, v = mk(0.2), mk(0.2)
    du = dv = jnp.zeros((h, w), jnp.float32)
    m = mk(0.05)
    cu, cv = mk(), mk()
    duc, dvc = mk() + 0.5, mk() + 0.5
    ww, wn, we, ws = mk() + 0.1, mk() + 0.1, mk() + 0.1, mk() + 0.1
    return u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws


@pytest.mark.parametrize("ty,tx", [(1, 8), (2, 4), (4, 2)])
def test_tiled_sor_matches_single_chip(rng, ty, tx):
    args = _problem(rng)
    want = sor_flow_llin4(*args, 3, 1.9)
    mesh = make_mesh(ty, tx)
    got = tiled_sor_flow_llin4(mesh, *args, 3, 1.9)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), atol=1e-5)


def test_tiled_sor_nan_data(rng):
    """NaN data pixels fall back to pure diffusion identically under tiling."""
    args = list(_problem(rng))
    cu = np.asarray(args[5]).copy()
    cu[10:20, 5:25] = np.nan
    args[5] = jnp.asarray(cu)
    want = sor_flow_llin4(*args, 2, 1.9)
    mesh = make_mesh(2, 4)
    got = tiled_sor_flow_llin4(mesh, *args, 2, 1.9)
    for g, w_ in zip(got, want):
        assert np.isfinite(np.asarray(g)).all()
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), atol=1e-5)


def test_tiled_pcg_same_fixed_point(rng):
    """Tiled PCG (Schwarz line preconditioner) converges to the single-chip
    PCG solution."""
    args = _problem(rng)
    want = pcg_flow_llin4(*args, 60, 1.9)
    mesh = make_mesh(2, 4)
    got = tiled_pcg_flow_llin4(mesh, *args, 60)
    for g, w_ in zip(got, want):
        scale = float(np.abs(np.asarray(w_)).max()) + 1e-6
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   atol=2e-3 * scale)


def test_make_mesh_single_device_degenerates():
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    assert isinstance(mesh, Mesh)
    args = _problem(np.random.default_rng(0), 16, 16)
    got = tiled_sor_flow_llin4(mesh, *args, 2, 1.9)
    want = sor_flow_llin4(*args, 2, 1.9)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), atol=1e-6)
