"""Core ops vs NumPy/SciPy oracles."""

import numpy as np
import scipy.ndimage as ndi
import jax.numpy as jnp
import pytest

from pde_tpu.core.conv import imfilter_replicate, gaussian_kernel_2d
from pde_tpu.core.grid import replicate_border, shift_w, shift_e, shift_n, shift_s
from pde_tpu.core.median import medfilt2_3x3, nanmedfilt2
from pde_tpu.core.resize import imresize, resize_matrix


def test_imfilter_replicate_matches_scipy(rng):
    x = rng.standard_normal((17, 23)).astype(np.float32)
    k = rng.standard_normal((5, 3)).astype(np.float32)
    got = np.asarray(imfilter_replicate(jnp.asarray(x), k))
    want = ndi.correlate(x, k, mode="nearest")
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_imfilter_batched(rng):
    x = rng.standard_normal((3, 9, 11)).astype(np.float32)
    k = rng.standard_normal((3, 3)).astype(np.float32)
    got = np.asarray(imfilter_replicate(jnp.asarray(x), k))
    for c in range(3):
        np.testing.assert_allclose(got[c], ndi.correlate(x[c], k, mode="nearest"), atol=1e-5)


def test_gaussian_kernel_matches_fspecial():
    g = gaussian_kernel_2d(5, 1.25)
    assert g.shape == (5, 5)
    np.testing.assert_allclose(g.sum(), 1.0, atol=1e-6)
    # symmetry and center dominance
    np.testing.assert_allclose(g, g.T, atol=1e-7)
    assert g[2, 2] == g.max()


def test_shifts_replicate(rng):
    x = rng.standard_normal((4, 5)).astype(np.float32)
    xj = jnp.asarray(x)
    np.testing.assert_array_equal(np.asarray(shift_w(xj))[:, 1:], x[:, :-1])
    np.testing.assert_array_equal(np.asarray(shift_w(xj))[:, 0], x[:, 0])
    np.testing.assert_array_equal(np.asarray(shift_e(xj))[:, :-1], x[:, 1:])
    np.testing.assert_array_equal(np.asarray(shift_n(xj))[1:, :], x[:-1, :])
    np.testing.assert_array_equal(np.asarray(shift_s(xj))[:-1, :], x[1:, :])


def test_replicate_border_matches_reference_order(rng):
    x = rng.standard_normal((5, 6)).astype(np.float32)
    got = np.asarray(replicate_border(jnp.asarray(x)))
    # interior untouched
    np.testing.assert_array_equal(got[1:-1, 1:-1], x[1:-1, 1:-1])
    # rows filled first, then cols overwrite corners
    np.testing.assert_array_equal(got[0, 1:-1], x[1, 1:-1])
    np.testing.assert_array_equal(got[-1, 1:-1], x[-2, 1:-1])
    np.testing.assert_array_equal(got[:, 0][1:-1], x[1:-1, 1])
    assert got[0, 0] == x[1, 1]


def test_medfilt2_matches_scipy(rng):
    x = rng.standard_normal((12, 15)).astype(np.float32)
    got = np.asarray(medfilt2_3x3(jnp.asarray(x)))
    want = ndi.median_filter(x, size=3, mode="mirror")
    # scipy 'mirror' excludes edge; MATLAB 'symmetric' includes it -> use reflect
    want = ndi.median_filter(x, size=3, mode="reflect")
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_nanmedfilt2_basic():
    x = np.full((7, 7), 3.0, dtype=np.float32)
    x[3, 3] = np.nan
    got = np.asarray(nanmedfilt2(jnp.asarray(x), 5))
    # center window: 24 valid 3.0s -> median 3
    assert got[3, 3] == 3.0
    # corner window (5x5, 9 in-image values incl NaN -> 8 valid 3s + 16 zero pads)
    # median of 16 zeros + 8 threes = 0
    assert got[0, 0] == 0.0


def test_imresize_identity(rng):
    x = rng.standard_normal((10, 12)).astype(np.float32)
    got = np.asarray(imresize(jnp.asarray(x), (10, 12)))
    np.testing.assert_allclose(got, x, atol=1e-5)


def test_resize_matrix_rows_sum_to_one():
    for in_s, out_s in [(100, 75), (75, 100), (13, 7), (7, 13)]:
        m = resize_matrix(in_s, out_s, True)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)


def test_imresize_matches_pil_downscale(rng):
    """PIL's antialiased bilinear implements the same triangle+antialias
    convention as MATLAB imresize."""
    from PIL import Image

    x = (rng.random((40, 60)) * 255).astype(np.float32)
    got = np.asarray(imresize(jnp.asarray(x), (30, 45), "bilinear"))
    want = np.asarray(
        Image.fromarray(x).resize((45, 30), Image.BILINEAR), dtype=np.float32
    )
    # PIL clamps at the border where MATLAB mirrors — compare the interior
    np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2], rtol=1e-4, atol=2e-2)


def test_imresize_matches_pil_upscale(rng):
    from PIL import Image

    x = (rng.random((20, 30)) * 255).astype(np.float32)
    got = np.asarray(imresize(jnp.asarray(x), (31, 44), "triangle"))
    want = np.asarray(
        Image.fromarray(x).resize((44, 31), Image.BILINEAR), dtype=np.float32
    )
    np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2], rtol=1e-4, atol=2e-2)
