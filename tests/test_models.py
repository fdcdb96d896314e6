"""End-to-end model smoke + behaviour tests on small synthetic inputs.

Golden-field parity against the native oracle lives in test_golden.py;
these check mechanics: shapes, finiteness, and qualitative behaviour
(noise reduced, known translation recovered).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pde_tpu.models.tv_denoise import tv_denoise4, tv_denoise8
from pde_tpu.models.diffusion import diffusion4
from pde_tpu.models.flow_hs import flow_hs
from pde_tpu.models.flow_nd import flow_nd
from pde_tpu.models.disparity import disparity_nd


def _shifted_pair(rng, h=40, w=48, dx=1.0):
    """Smooth random pattern and its 1-px right-shifted copy (wrap)."""
    base = rng.random((h, w)).astype(np.float32)
    import scipy.ndimage as ndi

    base = ndi.gaussian_filter(base, 3.0) * 255.0
    shifted = np.roll(base, int(dx), axis=1)
    return base, shifted


def test_tv_denoise4_suppresses_flat_noise_and_matches_oracle(rng):
    """The reference pipeline blurs the data target at every level
    (TVdenoise4.m:66,74 smooths Iin{scl} with a 7x7 sigma=2 Gaussian), so
    plain MSE vs a sharp clean image does NOT decrease — the literal oracle
    gives MSE 0.152 vs noisy 0.039 on this input. The right checks are
    (a) noise in flat regions collapses and (b) field parity with the
    literal reference port."""
    from tests.oracle import tv_denoise4_oracle

    clean = np.zeros((32, 32), dtype=np.float32)
    clean[8:24, 8:24] = 1.0
    noisy = clean + 0.2 * rng.standard_normal((32, 32)).astype(np.float32)
    out = np.asarray(tv_denoise4(noisy, outer_iter=5, inner_iter=3, solver=1))
    assert out.shape == (32, 32)
    assert np.isfinite(out).all()
    # flat-region noise suppressed by >5x
    flat = np.s_[2:7, 2:30]
    assert out[flat].std() < 0.2 * noisy[flat].std()
    # field parity with the literal oracle (red-black vs lexicographic
    # ordering leaves a small truncation difference at finite iterations)
    ref = tv_denoise4_oracle(noisy, outer=5, inner=3)
    rng_ref = ref.max() - ref.min()
    assert np.abs(out - ref).max() < 0.2 * rng_ref
    assert np.sqrt(np.mean((out - ref) ** 2)) < 0.1 * rng_ref


def test_tv_denoise8_runs(rng):
    noisy = rng.random((24, 28)).astype(np.float32)
    out = np.asarray(tv_denoise8(noisy, outer_iter=2, inner_iter=2, solver=1))
    assert out.shape == (24, 28)
    assert np.isfinite(out).all()


def test_diffusion4_smooths(rng):
    x = (rng.random((24, 24)) * 255).astype(np.float32)
    out = np.asarray(diffusion4(x, outer_iter=2))
    assert np.isfinite(out).all()
    assert out.std() < x.std()


def test_flow_hs_recovers_translation(rng):
    """HS is diffusion-dominated: even the literal reference port needs
    ~400 solver iterations on this smooth synthetic pair to approach the
    true 1-px shift (at the default 20 it reports ~0.07). Run the engine at
    a converged iteration count and check the translation is recovered."""
    it0, it1 = _shifted_pair(rng, 48, 56, dx=1.0)
    u, v = flow_hs(it0, it1, iter=400, solver=1)
    u, v = np.asarray(u), np.asarray(v)
    inner = np.s_[8:-8, 8:-8]
    assert np.isfinite(u).all()
    assert abs(np.median(u[inner])) > 0.55
    assert abs(np.median(v[inner])) < 0.2


def test_flow_hs_matches_oracle_pointwise(rng):
    """Field parity with the literal FlowEminHS port at the reference's
    default iteration count for the pointwise solver (red-black vs
    lexicographic ordering leaves only a small truncation difference)."""
    from tests.oracle import flow_hs_oracle

    it0, it1 = _shifted_pair(rng, 48, 56, dx=1.0)
    u, v = flow_hs(it0, it1, solver=1)
    uo, vo = flow_hs_oracle(it0, it1, solver=1)
    assert np.abs(np.asarray(u) - uo).max() < 0.05
    assert np.abs(np.asarray(v) - vo).max() < 0.05


def test_flow_hs_matches_oracle_alr_converged(rng):
    """solver=2: the engine's PCG and the reference's sequential ALR-SOR
    take different mid-convergence trajectories (different algorithms for
    the same linear systems), so parity is asserted at a converged
    iteration count where both settle on the same coarse-to-fine flow."""
    from tests.oracle import flow_hs_oracle

    it0, it1 = _shifted_pair(rng, 48, 56, dx=1.0)
    u, v = flow_hs(it0, it1, solver=2, iter=200)
    uo, vo = flow_hs_oracle(it0, it1, solver=2, iters=200)
    assert np.abs(np.asarray(u) - uo).max() < 0.15
    assert np.abs(np.asarray(v) - vo).max() < 0.15


@pytest.mark.slow
def test_flow_nd_recovers_translation(rng):
    """It1 = It0 rolled right by 1 (It1(x) = It0(x-1)); the data term
    drives It1(x+U) = It0(x), so U = +1. Default loop counts; both the
    pointwise red-black and the PCG line-implicit solver must recover it."""
    it0, it1 = _shifted_pair(rng, 48, 56, dx=1.0)
    inner = np.s_[8:-8, 8:-8]
    for solver in (1, 2):
        u, v = flow_nd(it0, it1, "grad", "none", solver=solver)
        u, v = np.asarray(u), np.asarray(v)
        assert np.isfinite(u).all()
        assert abs(np.median(u[inner]) - 1.0) < 0.4, f"solver {solver}"
        assert abs(np.median(v[inner])) < 0.25, f"solver {solver}"


@pytest.mark.slow
def test_disparity_recovers_shift(rng):
    il, ir = _shifted_pair(rng, 40, 48, dx=2.0)
    inner = np.s_[8:-8, 8:-8]
    for solver in (1, 2):
        u = disparity_nd(il, ir, "grad", "none", solver=solver)
        u = np.asarray(u)
        assert np.isfinite(u).all()
        assert abs(np.median(u[inner]) - 2.0) < 0.8, f"solver {solver}"


@pytest.mark.slow
def test_flow_ad_recovers_translation(rng):
    """8-neighbour anisotropic-tensor flow (FlowEminAD_llin_2D_v10.m)."""
    from pde_tpu.models.flow_ad import flow_ad

    it0, it1 = _shifted_pair(rng, 48, 56, dx=1.0)
    inner = np.s_[8:-8, 8:-8]
    for solver in (1, 2):
        u, v = flow_ad(it0, it1, "grad", "none", solver=solver)
        u, v = np.asarray(u), np.asarray(v)
        assert np.isfinite(u).all()
        assert abs(np.median(u[inner]) - 1.0) < 0.45, f"solver {solver}"
        assert abs(np.median(v[inner])) < 0.3, f"solver {solver}"


@pytest.mark.slow
def test_flow_fmg_recovers_translation(rng):
    """FAS full-multigrid early-lin flow (FlowEminNDFASFMG_elin_2D_v10.m).
    Multigrid accelerates the diffusion-dominated solve that plain HS needs
    ~400 sweeps for; at default counts the FMG flow must reach the shift."""
    from pde_tpu.models.flow_fmg import flow_fmg

    it0, it1 = _shifted_pair(rng, 64, 64, dx=1.0)
    u, v = flow_fmg(it0, it1)
    u, v = np.asarray(u), np.asarray(v)
    inner = np.s_[10:-10, 10:-10]
    assert np.isfinite(u).all() and np.isfinite(v).all()
    # sign matters: must match the warping-flow convention (flow_nd on the
    # same pair) — a sign-insensitive check let a negated-kernel bug
    # survive round 2
    from pde_tpu.models.flow_nd import flow_nd

    und, _ = flow_nd(it0, it1, "grad", "none")
    s = float(np.sign(np.median(np.asarray(und)[inner])))
    assert np.median(u[inner]) * s > 0.4
    assert abs(np.median(v[inner])) < 0.3


@pytest.mark.slow
def test_disparity_sym_recovers_shift(rng):
    """Symmetric stereo pair: both fields should see ~the same |shift|
    with opposite signs (left->right vs right->left warping)."""
    from pde_tpu.models.disparity_sym import disparity_sym

    il, ir = _shifted_pair(rng, 40, 48, dx=2.0)
    u0, u1 = disparity_sym(il, ir, firstLoop=3, secondLoop=4, iter=4)
    u0, u1 = np.asarray(u0), np.asarray(u1)
    inner = np.s_[8:-8, 8:-8]
    assert np.isfinite(u0).all() and np.isfinite(u1).all()
    m0, m1 = np.median(u0[inner]), np.median(u1[inner])
    assert abs(m0 - 2.0) < 0.9, m0
    assert abs(m1 + 2.0) < 0.9, m1


def test_gac_shrinks_to_object(rng):
    """A contour started outside a bright disc should move toward it and
    stay a valid signed-distance-like function."""
    from pde_tpu.models.gac import gac_a, gac_b

    import scipy.ndimage as ndi

    h, w = 48, 48
    yy, xx = np.mgrid[:h, :w]
    # textured background so the auto-lambda quantile is positive, plus a
    # strong disc edge for the contour to lock onto
    img = 20.0 * rng.random((h, w)).astype(np.float32)
    disc = (xx - 24) ** 2 + (yy - 24) ** 2 < 8**2
    img[disc] += 200.0
    img = ndi.gaussian_filter(img, 1.0)
    phi0 = 18.0 - np.sqrt((xx - 24.0) ** 2 + (yy - 24.0) ** 2)  # circle r=18
    for fn in (gac_a, gac_b):
        out = np.asarray(fn(img, phi0, ITER=40))
        assert np.isfinite(out).all()
        area0 = (phi0 > 0).sum()
        area = (out > 0).sum()
        # balloon force c<0 shrinks; convection pulls to edges: both end
        # with a smaller positive region that still contains the disc center
        assert 0 < area < area0, (area, area0)
        assert out[24, 24] > 0


def test_fused_wrappers_match_per_level(rng):
    """flow_nd_fused / disparity_nd_fused / flow_fmg_fused trace the same
    computation as the per-level drivers — outputs must agree exactly."""
    from pde_tpu.models.flow_nd import flow_nd, flow_nd_fused
    from pde_tpu.models.disparity import disparity_nd, disparity_nd_fused
    from pde_tpu.models.flow_fmg import flow_fmg, flow_fmg_fused
    import jax.numpy as jnp

    img = (rng.random((40, 48)) * 255).astype(np.float32)
    shifted = np.roll(img, 1, axis=1)

    u1, v1 = flow_nd(img, shifted, "grad", "none")
    u2, v2 = flow_nd_fused(jnp.asarray(img), jnp.asarray(shifted), "grad", "none")
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-3)

    d1 = disparity_nd(img, shifted, "grad", "none")
    d2 = disparity_nd_fused(jnp.asarray(img), jnp.asarray(shifted), "grad", "none")
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-3)

    f1u, f1v = flow_fmg(img, shifted)
    f2u, f2v = flow_fmg_fused(jnp.asarray(img), jnp.asarray(shifted))
    np.testing.assert_allclose(np.asarray(f1u), np.asarray(f2u), atol=1e-3)
    np.testing.assert_allclose(np.asarray(f1v), np.asarray(f2v), atol=1e-3)


def test_flagship_oracle_parity_smoke(rng):
    """Fast-tier safety net (ADVICE r4): tiny-resolution pointwise parity
    of the flagship warping-flow and disparity models against the literal
    NumPy oracles, so a core-numerics regression cannot merge with a
    plain ``pytest`` run (the full-resolution goldens are slow-tier)."""
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from oracle import flow_nd_oracle, disp_nd_oracle

    it0, it1 = _shifted_pair(rng, 36, 44, dx=1.0)
    u, v = flow_nd(it0, it1, "grad", "none", firstLoop=2, secondLoop=2)
    uo, vo = flow_nd_oracle(np.asarray(it0, np.float64),
                            np.asarray(it1, np.float64), "grad", "none",
                            first_loop=2, second_loop=2, solver=1)
    aee = float(np.mean(np.hypot(np.asarray(u) - uo, np.asarray(v) - vo)))
    assert aee < 0.05, aee

    d = disparity_nd(it0, it1, "grad", "none", firstLoop=2, secondLoop=2)
    do = disp_nd_oracle(np.asarray(it0, np.float64),
                        np.asarray(it1, np.float64), "grad", "none",
                        first_loop=2, second_loop=2, solver=1)
    # the engine's border-inclusive red-black and the oracle's
    # interior+replicate sweep differ more at these partially-converged
    # reduced counts (full-count parity is the slow-tier golden's job);
    # the bound still catches any gross numerics regression
    err = float(np.mean(np.abs(np.asarray(d) - do)))
    assert err < 0.12, err


def test_warp_window_models_match_gather_path(rng):
    """flow_nd / disparity_nd with a windowed shift-add warp
    (warp_window=r) must reproduce the gather-warp results wherever the
    flow stays inside the window — here the true shift is 1-2 px, far
    inside r=6."""
    from pde_tpu.models.flow_nd import flow_nd
    from pde_tpu.models.disparity import disparity_nd

    img = (rng.random((40, 48)) * 255).astype(np.float32)
    shifted = np.roll(img, 1, axis=1)

    u1, v1 = flow_nd(img, shifted, "grad", "none")
    u2, v2 = flow_nd(img, shifted, "grad", "none", warp_window=6)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-3)

    d1 = disparity_nd(img, shifted, "grad", "none")
    d2 = disparity_nd(img, shifted, "grad", "none", warp_window=6)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-3)


def test_flow_nd_sequence_matches_pairs(rng):
    """The one-dispatch video-clip path (lax.scan over pairs) must equal
    per-pair flow_nd on every consecutive pair."""
    from pde_tpu.models.flow_nd import flow_nd, flow_nd_sequence
    import jax.numpy as jnp

    f0 = (rng.random((36, 44)) * 255).astype(np.float32)
    frames = np.stack([f0, np.roll(f0, 1, axis=1), np.roll(f0, 2, axis=1)])
    us, vs = flow_nd_sequence(jnp.asarray(frames), "grad", "none")
    assert us.shape == (2, 36, 44)
    for t in range(2):
        u, v = flow_nd(frames[t], frames[t + 1], "grad", "none")
        np.testing.assert_allclose(np.asarray(us[t]), np.asarray(u), atol=1e-3)
        np.testing.assert_allclose(np.asarray(vs[t]), np.asarray(v), atol=1e-3)
