"""flow2color (incl. the directional border legend) and observability."""

import numpy as np
import jax.numpy as jnp

from pde_tpu.utils.viz import flow2color
from pde_tpu.utils import observe


def test_flow2color_basic_properties():
    u = np.array([[1.0, -1.0], [0.0, np.nan]])
    v = np.array([[0.0, 0.0], [1.0, np.nan]])
    img = flow2color(u, v)
    assert img.shape == (2, 2, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0
    # NaN flow renders white (hue=1, sat=0, val=1), flow2color.m:52-57
    np.testing.assert_allclose(img[1, 1], [1.0, 1.0, 1.0])
    # opposite directions get different colors at equal magnitude
    assert np.abs(img[0, 0] - img[0, 1]).max() > 0.3


def test_flow2color_border_legend():
    """border>0 frames the image with the radial direction legend
    (flow2color.m:25-34,61-66): output grows by 2*border per side and the
    original image sits at offset border-1."""
    h, w, b = 12, 16, 5
    rng = np.random.default_rng(0)
    u = rng.standard_normal((h, w))
    v = rng.standard_normal((h, w))
    inner = flow2color(u, v)
    out = flow2color(u, v, border=b)
    assert out.shape == (h + 2 * b, w + 2 * b, 3)
    np.testing.assert_allclose(out[b - 1:b - 1 + h, b - 1:b - 1 + w], inner)
    # legend corners encode 4 distinct directions
    corners = np.stack([out[0, 0], out[0, -1], out[-1, 0], out[-1, -1]])
    assert np.unique(np.round(corners, 2), axis=0).shape[0] == 4


def test_probe_ships_scalars_from_jit():
    import jax

    seen = []
    observe.clear_sinks()
    observe.add_sink(lambda tag, v: seen.append((tag, v)))
    try:
        @jax.jit
        def f(x):
            observe.probe("norm", jnp.linalg.norm(x))
            return x * 2
        out = f(jnp.ones((4,)))
        jax.block_until_ready(out)
        jax.effects_barrier()
    finally:
        observe.clear_sinks()
    assert seen and seen[0][0] == "norm"
    assert abs(seen[0][1] - 2.0) < 1e-5
