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


# ---------------------------------------------------------------------------
# Generic tiled wrappers (all solver families) + model-level sharding
# ---------------------------------------------------------------------------


def test_tiled_elin4_matches_single_chip(rng):
    from pde_tpu.parallel.tiled import tiled_sor_flow_elin4
    from pde_tpu.solvers.sor import sor_flow_elin4

    u, v, _, _, m, cu, cv, duc, dvc, ww, wn, we, ws = _problem(rng)
    want = sor_flow_elin4(u, v, m, cu, cv, duc, dvc, ww, wn, we, ws, 3, 1.9)
    got = tiled_sor_flow_elin4(make_mesh(2, 4), u, v, m, cu, cv, duc, dvc,
                               ww, wn, we, ws, 3, 1.9)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), atol=1e-5)


def test_tiled_llin8_matches_single_chip(rng):
    from pde_tpu.parallel.tiled import tiled_sor_flow_llin8
    from pde_tpu.solvers.sor import sor_flow_llin8

    u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws = _problem(rng)
    mk = lambda: jnp.asarray(rng.random((32, 48)).astype(np.float32) + 0.1)
    wnw, wne, wse, wsw = mk(), mk(), mk(), mk()
    w8 = (ww, wnw, wn, wne, we, wse, ws, wsw)
    want = sor_flow_llin8(u, v, du, dv, m, cu, cv, duc, dvc, *w8, 3, 1.9)
    got = tiled_sor_flow_llin8(make_mesh(2, 4), u, v, du, dv, m, cu, cv,
                               duc, dvc, *w8, 3, 1.9)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), atol=1e-5)


def test_tiled_disp_and_pde4_match_single_chip(rng):
    from pde_tpu.parallel.tiled import tiled_sor_disp_llin4, tiled_sor_pde4
    from pde_tpu.solvers.sor import sor_disp_llin4, sor_pde4

    u, _, du, _, _, cu, _, duc, _, ww, wn, we, ws = _problem(rng)
    mesh = make_mesh(2, 4)
    want = sor_disp_llin4(u, du, cu, duc, ww, wn, we, ws, 3, 1.9)
    got = tiled_sor_disp_llin4(mesh, u, du, cu, duc, ww, wn, we, ws, 3, 1.9)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    trace = duc + 1.0
    want = sor_pde4(u, trace, cu, ww, wn, we, ws, 3, 1.75)
    got = tiled_sor_pde4(mesh, u, trace, cu, ww, wn, we, ws, 3, 1.75)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_sharded_nd_level_matches_single_chip(rng):
    """A FULL flow_nd pyramid level (warp + derivatives + robust weights +
    solve) under GSPMD spatial sharding is tile-count invariant."""
    from functools import partial
    from pde_tpu.models.flow_nd import _nd_level, FlowNDParams
    from pde_tpu.parallel.model import sharded_nd_level
    from pde_tpu.parallel.mesh import make_mesh as mk_mesh

    p = FlowNDParams(firstLoop=2, secondLoop=2, iter=2)
    h, w = 32, 48
    img = lambda: jnp.asarray(rng.random((1, h, w)).astype(np.float32))
    i1t0, i1t1, i2t0, i2t1 = img(), img(), img(), img()
    u = jnp.zeros((h, w), jnp.float32)
    v = jnp.zeros((h, w), jnp.float32)

    want = jax.jit(partial(_nd_level, p=p, snd_is_gradmag=True))(
        u, v, i1t0, i1t1, i2t0, i2t1, None, None, 2.0)
    mesh = mk_mesh(2, 4)
    got = sharded_nd_level(mesh, u, v, i1t0, i1t1, i2t0, i2t1, None, None,
                           2.0, p, True)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_fmg_mesh_regather_matches_single_chip(rng):
    """flow_fmg with a device mesh (fine levels sharded, coarse levels
    regathered) must equal the single-chip result."""
    from pde_tpu.models.flow_fmg import flow_fmg
    from pde_tpu.parallel.mesh import make_mesh as mk_mesh

    a = rng.random((48, 64)).astype(np.float32) * 255.0
    b = np.roll(a, 1, axis=1)
    want_u, want_v = flow_fmg(a, b)
    mesh = mk_mesh(2, 4)
    got_u, got_v = flow_fmg(a, b, mesh=mesh, shard_min=24)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               atol=1e-4, rtol=1e-4)


def test_blocked_halo_multichunk_matches_single_chip(rng):
    """iters > k forces multiple 2k-halo chunks; k=1 must equal k=4
    (temporal blocking is exact, parallel/tiled.py module note)."""
    from pde_tpu.kernels import sweeps
    from pde_tpu.parallel.tiled import tiled_relax_sharded
    from pde_tpu.solvers.sor import sor_flow_elin4

    h, w = 24, 32
    mesh = make_mesh(2, 4)
    names = "m cu cv duc dvc ww wn we ws".split()
    f = {}
    for n in names:
        base = rng.random((h, w)) + (1.0 if n in ("duc", "dvc") else 0.1)
        f[n] = jnp.asarray(base, jnp.float32)
    u = jnp.asarray(rng.random((h, w)) * 0.2, jnp.float32)
    v = jnp.asarray(rng.random((h, w)) * 0.2, jnp.float32)
    fields = (u, v) + tuple(f[n] for n in names)

    want = sor_flow_elin4(u, v, *[f[n] for n in names], 9, 1.9)
    for k in (1, 2, 4):
        got = tiled_relax_sharded(mesh, sweeps.flow_elin4_sweep, fields,
                                  2, 9, 1.9, k=k)
        for g, wv in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                       atol=2e-6, rtol=0)


def test_checkpoint_roundtrip(tmp_path):
    from pde_tpu.utils.checkpoint import save_state, load_state

    state = {
        "u": jnp.arange(12.0).reshape(3, 4),
        "levels": [jnp.ones((2, 2)), jnp.zeros((5,))],
        "alive": np.array([True, False]),
        "iter": 7,
    }
    p = str(tmp_path / "ck.npz")
    save_state(p, state)
    got = load_state(p, state)
    assert int(got["iter"]) == 7
    np.testing.assert_array_equal(got["alive"], state["alive"])
    np.testing.assert_allclose(got["u"], np.asarray(state["u"]))
    np.testing.assert_allclose(got["levels"][0], 1.0)


def test_flow_nd_mesh_matches_single_chip(rng):
    """Full coarse-to-fine flow_nd under GSPMD spatial sharding (with
    coarse-level replication) must match the unsharded run."""
    from pde_tpu.models.flow_nd import flow_nd

    img = (rng.random((32, 48)) * 255).astype(np.float32)
    shifted = np.roll(img, 1, axis=1)
    u0, v0 = flow_nd(img, shifted, "grad", "none",
                     firstLoop=2, secondLoop=2, iter=2)
    mesh = make_mesh(2, 4)
    u1, v1 = flow_nd(img, shifted, "grad", "none", mesh=mesh, shard_min=16,
                     firstLoop=2, secondLoop=2, iter=2)
    np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-5)
