"""Derivative / warp / weight ops vs oracles derived from the C sources."""

import numpy as np
import scipy.ndimage as ndi
import jax.numpy as jnp

from pde_tpu.ops.derivatives import (
    fst_derivatives5,
    snd_derivatives5,
    SMOOTHER5,
    FST_DERIVATOR5,
)
from pde_tpu.ops.warp import bilinear_warp, identity_grid, warp_by_flow
from pde_tpu.ops.weights import diffusion_weights_4, tensor_diffusion_weights_8


def _corr1d(x, k, axis):
    kk = np.zeros((len(k), 1), dtype=np.float32)
    kk[:, 0] = k
    if axis == 1:
        kk = kk.T
    return ndi.correlate(x, kk, mode="nearest")


def test_fst_derivatives_oracle(rng):
    it0 = rng.standard_normal((16, 20)).astype(np.float32)
    it1 = rng.standard_normal((16, 20)).astype(np.float32)
    idt, idx, idy = (np.asarray(a) for a in fst_derivatives5(jnp.asarray(it0), jnp.asarray(it1)))
    np.testing.assert_allclose(idt, 0.5 * (it0 - it1), atol=1e-6)
    want_idx = _corr1d(_corr1d(it1, SMOOTHER5, 0), FST_DERIVATOR5, 1)
    want_idy = _corr1d(_corr1d(it1, SMOOTHER5, 1), FST_DERIVATOR5, 0)
    np.testing.assert_allclose(idx, want_idx, atol=1e-5)
    np.testing.assert_allclose(idy, want_idy, atol=1e-5)


def test_snd_derivatives_temporal_sign(rng):
    it0 = rng.standard_normal((12, 14)).astype(np.float32)
    it1 = rng.standard_normal((12, 14)).astype(np.float32)
    idxt, idyt, idxx, idyy, idxy = (
        np.asarray(a) for a in snd_derivatives5(jnp.asarray(it0), jnp.asarray(it1))
    )
    dx0 = _corr1d(_corr1d(it0, SMOOTHER5, 0), FST_DERIVATOR5, 1)
    dx1 = _corr1d(_corr1d(it1, SMOOTHER5, 0), FST_DERIVATOR5, 1)
    np.testing.assert_allclose(idxt, 0.5 * (dx0 - dx1), atol=1e-5)
    # Idxy applies the first-derivative kernel along both axes
    want_idxy = _corr1d(_corr1d(it1, FST_DERIVATOR5, 1), FST_DERIVATOR5, 0)
    np.testing.assert_allclose(idxy, want_idxy, atol=1e-5)


def test_warp_identity(rng):
    img = rng.standard_normal((9, 11)).astype(np.float32)
    x, y = identity_grid(9, 11)
    out = np.asarray(bilinear_warp(jnp.asarray(img), x, y))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_warp_halfpixel_shift():
    img = jnp.asarray(np.arange(20, dtype=np.float32).reshape(4, 5))
    x, y = identity_grid(4, 5)
    out = np.asarray(bilinear_warp(img, x + 0.5, y))
    want = np.asarray(img)
    # interior columns: average of self and right neighbour
    np.testing.assert_allclose(out[:, :-1], 0.5 * (want[:, :-1] + want[:, 1:]), atol=1e-6)


def test_warp_oob_nan():
    img = jnp.ones((6, 6), dtype=jnp.float32)
    x, y = identity_grid(6, 6)
    out = np.asarray(bilinear_warp(img, x + 10.0, y))
    assert np.isnan(out).all()
    out2 = np.asarray(bilinear_warp(img, x - 3.0, y))
    assert np.isnan(out2[:, :3]).all()
    assert np.isfinite(out2[:, 3:]).all()


def test_warp_by_flow_matches_reference_direction(rng):
    """Flow +1 in u samples one pixel to the right (X+U, imageInterpolation.c)."""
    img = jnp.asarray(np.arange(30, dtype=np.float32).reshape(5, 6))
    u = jnp.ones((5, 6), dtype=jnp.float32)
    v = jnp.zeros((5, 6), dtype=jnp.float32)
    out = np.asarray(warp_by_flow(img, u, v))
    want = np.asarray(img)
    np.testing.assert_allclose(out[:, :-1], want[:, 1:], atol=1e-6)
    assert np.isnan(out[:, -1]).all()


def test_warp_window_exact_within_bound(rng):
    """The gather-free windowed warps match the gather warp (to float32
    lerp-association noise) wherever |floor(displacement)| < r."""
    from pde_tpu.ops.warp import warp_window, warp_x_window

    h, w = 17, 23
    img = jnp.asarray(rng.standard_normal((2, h, w)).astype(np.float32))
    u = jnp.asarray((rng.random((h, w)) * 7.8 - 3.9).astype(np.float32))
    v = jnp.asarray((rng.random((h, w)) * 7.8 - 3.9).astype(np.float32))
    x, y = identity_grid(h, w)

    want = np.asarray(bilinear_warp(img, x + u, y))
    got = np.asarray(warp_x_window(img, u, 4))
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(np.nan_to_num(got), np.nan_to_num(want),
                               atol=1e-5)

    want2 = np.asarray(warp_by_flow(img, u, v))
    got2 = np.asarray(warp_window(img, u, v, 4))
    np.testing.assert_array_equal(np.isnan(got2), np.isnan(want2))
    np.testing.assert_allclose(np.nan_to_num(got2), np.nan_to_num(want2),
                               atol=1e-5)


def test_warp_window_nan_outside_window():
    """In-image samples beyond the window radius become NaN (missing
    data), never silently wrong values."""
    from pde_tpu.ops.warp import warp_window, warp_x_window

    h, w = 8, 32
    img = jnp.asarray(np.arange(h * w, dtype=np.float32).reshape(h, w))
    u = jnp.full((h, w), 6.0, jnp.float32)  # outside r=4 window
    out = np.asarray(warp_x_window(img, u, 4))
    assert np.isnan(out[:, : w - 6]).all()
    out2 = np.asarray(warp_window(img, u, jnp.zeros_like(u), 4))
    assert np.isnan(out2[:, : w - 6]).all()
    # and within a bigger window the same sample is finite + exact
    out3 = np.asarray(warp_x_window(img, u, 8))
    np.testing.assert_allclose(out3[:, : w - 6],
                               np.asarray(img)[:, 6:], atol=1e-6)


def _matlab_circshift_weights(U, V):
    """Literal NumPy translation of OPdiffWeights
    (FlowEminND_llin_2D_v10.m:389-433) for interior comparison."""

    def imfilt(x, k):
        return ndi.correlate(x, k, mode="nearest")

    kv = np.array([[0.25], [0.0], [-0.25]], dtype=np.float64)
    kh = kv.T
    out = {}
    for name, shift in (("wW", (0, 1)), ("wE", (0, -1)), ("wN", (1, 0)), ("wS", (-1, 0))):
        acc = np.zeros_like(U)
        for F in (U, V):
            Fver = imfilt(F, kv)
            Fhor = imfilt(F, kh)
            grad = Fver if name in ("wW", "wE") else Fhor
            acc += (np.roll(F, shift, (0, 1)) - F) ** 2 + (grad + np.roll(grad, shift, (0, 1))) ** 2
        out[name] = 1.0 / np.sqrt(acc + 1e-5)
    return out["wW"], out["wN"], out["wE"], out["wS"]


def test_diffusion_weights_flow_interior(rng):
    u = rng.standard_normal((10, 12)).astype(np.float64)
    v = rng.standard_normal((10, 12)).astype(np.float64)
    ww, wn, we, ws = diffusion_weights_4(jnp.stack([jnp.asarray(u), jnp.asarray(v)]).astype(jnp.float32))
    oww, own, owe, ows = _matlab_circshift_weights(u, v)
    for got, want in ((ww, oww), (wn, own), (we, owe), (ws, ows)):
        np.testing.assert_allclose(np.asarray(got)[1:-1, 1:-1], want[1:-1, 1:-1], rtol=1e-4)


def test_tensor_weights_shapes_and_symmetry(rng):
    d = rng.standard_normal((14, 17)).astype(np.float32)
    w = tensor_diffusion_weights_8(jnp.asarray(d), quantile=0.9)
    assert len(w) == 8
    for a in w:
        assert a.shape == (14, 17)
    # on a uniform image the tensor is isotropic: W == N and NW == 0
    flat = tensor_diffusion_weights_8(jnp.zeros((8, 8)), quantile=0.9)
    np.testing.assert_allclose(np.asarray(flat[0]), np.asarray(flat[2]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(flat[1]), 0.0, atol=1e-7)


def test_quantile_nonzero_matches_sort(rng):
    """The bitwise-bisection order statistic (TPU path of the adaptive
    lambda) must equal the literal sort+index exactly."""
    import jax.numpy as jnp
    from pde_tpu.ops.weights import _quantile_nonzero

    for q in (0.5, 0.9):
        for frac_zero in (0.0, 0.3):
            x = rng.random((37, 53)).astype(np.float32)
            x[rng.random(x.shape) < frac_zero] = 0.0
            x = jnp.asarray(x * x)
            got = float(_quantile_nonzero(x, q))
            flat = np.sort(np.asarray(x).ravel())
            nz = int((flat > 0).sum())
            k = (flat.size - nz) + int(np.round(nz * q)) - 1
            assert got == flat[np.clip(k, 0, flat.size - 1)]


def test_quantile_nonzero_bitselect_path(rng):
    """Force the bit-bisection branch (normally TPU-only) and check it
    against the sort on the same data."""
    from unittest import mock
    import jax
    import jax.numpy as jnp
    from pde_tpu.ops import weights

    x = jnp.asarray((rng.random((40, 40)) ** 2).astype(np.float32))
    want = float(weights._quantile_nonzero(x, 0.9))
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        got = float(weights._quantile_nonzero(x, 0.9))
    assert got == want
