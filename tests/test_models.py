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


def test_tv_denoise4_reduces_noise(rng):
    clean = np.zeros((32, 32), dtype=np.float32)
    clean[8:24, 8:24] = 1.0
    noisy = clean + 0.2 * rng.standard_normal((32, 32)).astype(np.float32)
    out = np.asarray(tv_denoise4(noisy, outer_iter=5, inner_iter=3))
    assert out.shape == (32, 32)
    assert np.isfinite(out).all()
    # error vs clean reduced
    assert np.mean((out - clean) ** 2) < np.mean((noisy - clean) ** 2)


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
    it0, it1 = _shifted_pair(rng, 48, 56, dx=1.0)
    u, v = flow_hs(it0, it1)
    u, v = np.asarray(u), np.asarray(v)
    # note reference flow convention: warp by +U samples It1 at X+U
    inner = np.s_[8:-8, 8:-8]
    assert np.isfinite(u).all()
    assert abs(np.median(u[inner]) - (-1.0)) < 0.35 or abs(np.median(u[inner]) - 1.0) < 0.35
    assert abs(np.median(v[inner])) < 0.2


def test_flow_nd_recovers_translation(rng):
    it0, it1 = _shifted_pair(rng, 48, 56, dx=1.0)
    u, v = flow_nd(it0, it1, "grad", "none",
                   firstLoop=2, secondLoop=2, iter=2, solver=1)
    u, v = np.asarray(u), np.asarray(v)
    inner = np.s_[8:-8, 8:-8]
    assert np.isfinite(u).all()
    # It1 = It0 shifted right by 1: matching sample of It1 at X+U needs U=-1
    assert abs(np.median(u[inner]) + 1.0) < 0.4
    assert abs(np.median(v[inner])) < 0.25


def test_disparity_recovers_shift(rng):
    il, ir = _shifted_pair(rng, 40, 48, dx=2.0)
    u = disparity_nd(il, ir, "grad", "none",
                     firstLoop=2, secondLoop=2, iter=2, solver=1)
    u = np.asarray(u)
    inner = np.s_[8:-8, 8:-8]
    assert np.isfinite(u).all()
    assert abs(np.median(u[inner]) + 2.0) < 0.8
