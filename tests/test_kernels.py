"""Interpreter-mode parity tests for the Pallas kernel layer.

Every sweep factory in ``kernels/sweeps.py`` must reproduce the
corresponding global XLA solver (``solvers/sor.py``) exactly when run
through the stripe-tiled temporally-blocked engine (``kernels/tiled.py``),
including multi-stripe plans, iters % k != 0, unaligned widths and NaN
missing-data pixels (the reference's isnan(C/D) pure-diffusion fallback,
opticalflowSolvers.c:624-644). The VMEM-resident kernel
(``kernels/sor_pallas.py``) is held to the same bar. Dispatch boundaries
(``kernels/dispatch.py``) are pinned so threshold regressions are loud.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from pde_tpu.kernels import dispatch, sweeps
from pde_tpu.kernels.sor_pallas import fits_vmem, pallas_sor_flow_llin4
from pde_tpu.kernels.tiled import plan_stripes, tiled_relax, _halo_for
from pde_tpu.solvers import sor

ATOL = 2e-6


def _fields(rng, h, w, names):
    out = {}
    for n in names:
        if n in ("duc", "dvc", "trace"):
            out[n] = jnp.asarray(rng.random((h, w)) + 1.0, jnp.float32)
        elif n == "m":
            out[n] = jnp.asarray(rng.random((h, w)) * 0.01, jnp.float32)
        elif n.startswith("w"):
            out[n] = jnp.asarray(rng.random((h, w)) + 0.1, jnp.float32)
        else:
            out[n] = jnp.asarray(rng.random((h, w)) * 0.2, jnp.float32)
    return out


def _poison(x, rng, frac=0.05):
    """Scatter NaNs (the missing-data sentinel) over a field."""
    mask = rng.random(x.shape) < frac
    return jnp.where(jnp.asarray(mask), jnp.nan, x)


W4 = ("ww", "wn", "we", "ws")
W8 = ("ww", "wnw", "wn", "wne", "we", "wse", "ws", "wsw")


def _run_case(rng, factory, xla_fn, mut_names, const_names, weight_names,
              h, w, iters, omega, plan, nan_names=(), double_buffer=False):
    f = _fields(rng, h, w, mut_names + const_names + weight_names)
    for n in nan_names:
        f[n] = _poison(f[n], rng)
    fields = tuple(f[n] for n in mut_names + const_names + weight_names)
    prepare, sweep = factory(omega)
    out = tiled_relax(fields, sweep, len(mut_names), iters,
                      prepare_fn=prepare, interpret=True, plan_override=plan,
                      double_buffer=double_buffer)
    ref = xla_fn(f, iters, omega)
    if not isinstance(ref, tuple):
        ref = (ref,)
    for got, want in zip(out, ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=ATOL, rtol=1e-5)


def _xla_llin4(f, iters, omega):
    return sor.sor_flow_llin4(f["u"], f["v"], f["du"], f["dv"], f["m"],
                              f["cu"], f["cv"], f["duc"], f["dvc"],
                              *(f[n] for n in W4), iters, omega)


def _xla_elin4(f, iters, omega):
    return sor.sor_flow_elin4(f["u"], f["v"], f["m"], f["cu"], f["cv"],
                              f["duc"], f["dvc"], *(f[n] for n in W4),
                              iters, omega)


def _xla_llin8(f, iters, omega):
    return sor.sor_flow_llin8(f["u"], f["v"], f["du"], f["dv"], f["m"],
                              f["cu"], f["cv"], f["duc"], f["dvc"],
                              *(f[n] for n in W8), iters, omega)


def _xla_disp(f, iters, omega):
    return sor.sor_disp_llin4(f["u"], f["du"], f["cu"], f["duc"],
                              *(f[n] for n in W4), iters, omega)


def _xla_pde4(f, iters, omega):
    return sor.sor_pde4(f["x"], f["trace"], f["b"], *(f[n] for n in W4),
                        iters, omega)


def _xla_pde8(f, iters, omega):
    return sor.sor_pde8(f["x"], f["trace"], f["b"], *(f[n] for n in W8),
                        iters, omega)


CASES = {
    "flow_llin4": (sweeps.flow_llin4_sweep, _xla_llin4,
                   ("du", "dv"), ("u", "v", "m", "cu", "cv", "duc", "dvc"), W4),
    "flow_elin4": (sweeps.flow_elin4_sweep, _xla_elin4,
                   ("u", "v"), ("m", "cu", "cv", "duc", "dvc"), W4),
    "flow_llin8": (sweeps.flow_llin8_sweep, _xla_llin8,
                   ("du", "dv"), ("u", "v", "m", "cu", "cv", "duc", "dvc"), W8),
    "disp_llin4": (sweeps.disp_llin4_sweep, _xla_disp,
                   ("du",), ("u", "cu", "duc"), W4),
    "pde4": (sweeps.pde4_sweep, _xla_pde4, ("x",), ("trace", "b"), W4),
    "pde8": (sweeps.pde8_sweep, _xla_pde8, ("x",), ("trace", "b"), W8),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_tiled_sweep_parity_multistripe(rng, name):
    """3-stripe plan, temporal block k=2, iters=5 (iters % k != 0),
    unaligned width."""
    factory, xla_fn, mut, const, wts = CASES[name]
    _run_case(rng, factory, xla_fn, mut, const, wts,
              h=48, w=65, iters=5, omega=1.9, plan=(2, 16))


@pytest.mark.parametrize("name", ["flow_llin4", "disp_llin4", "pde4"])
def test_tiled_sweep_parity_nan_data(rng, name):
    """NaN data terms (OOB warps) must fall back to pure diffusion
    identically to the XLA solvers."""
    factory, xla_fn, mut, const, wts = CASES[name]
    nan_names = [n for n in ("cu", "cv", "duc", "dvc", "trace") if n in const]
    _run_case(rng, factory, xla_fn, mut, const, wts,
              h=40, w=33, iters=4, omega=1.9, plan=(2, 16),
              nan_names=nan_names)


@pytest.mark.parametrize("name", sorted(CASES))
def test_tiled_sweep_parity_double_buffered(rng, name):
    """The two-slot pipelined kernel (_stripe_kernel_db) must be bitwise
    the serial engine's equal: multi-stripe plan so the cross-stripe
    prefetch/drain logic is exercised."""
    factory, xla_fn, mut, const, wts = CASES[name]
    _run_case(rng, factory, xla_fn, mut, const, wts,
              h=48, w=65, iters=5, omega=1.9, plan=(2, 16),
              double_buffer=True)


@pytest.mark.parametrize("name", ["flow_llin4", "flow_elin4"])
def test_tiled_sweep_parity_single_stripe(rng, name):
    """Whole grid in one stripe, k = iters (the dispatch 'small' path)."""
    factory, xla_fn, mut, const, wts = CASES[name]
    _run_case(rng, factory, xla_fn, mut, const, wts,
              h=24, w=130, iters=4, omega=1.9, plan=(4, 24))


def test_resident_pallas_llin4_parity(rng):
    f = _fields(rng, 37, 53, ("u", "v", "du", "dv", "m", "cu", "cv",
                              "duc", "dvc") + W4)
    f["cu"] = _poison(f["cu"], rng)
    f["duc"] = _poison(f["duc"], rng)
    args = [f[n] for n in ("u", "v", "du", "dv", "m", "cu", "cv",
                           "duc", "dvc") + W4]
    got = pallas_sor_flow_llin4(*args, 5, 1.9, interpret=True)
    want = sor.sor_flow_llin4(*args, 5, 1.9)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   atol=ATOL, rtol=1e-5)


# ---------------------------------------------------------------------------
# Dispatch boundaries
# ---------------------------------------------------------------------------


def test_fits_vmem_boundary():
    # 256x256 resident (measured to compile on v5e), 384x384 not
    assert fits_vmem(256, 256)
    assert not fits_vmem(384, 384)


def test_plan_stripes_sane():
    for (h, w, nf) in [(1024, 1024, 13), (480, 640, 8), (2048, 2048, 17)]:
        plan = plan_stripes(h, w, nf, sweeps=8)
        assert plan is not None
        k, stripe, n = plan
        assert stripe % 8 == 0
        assert n * stripe >= h
        assert stripe >= 2 * _halo_for(k)
        # stripe working set under the VMEM budget
        wp = (max(w, 128) + 127) // 128 * 128
        assert nf * (stripe + 2 * _halo_for(k)) * wp * 4 <= 6 * 1024 * 1024


def test_dispatch_cpu_fallback_exact(rng):
    """On the CPU backend every dispatch entry must be the XLA solver,
    bit-for-bit."""
    f = _fields(rng, 33, 47, ("u", "v", "du", "dv", "m", "cu", "cv",
                              "duc", "dvc", "x", "trace", "b") + W8)
    a4 = [f[n] for n in W4]
    got = dispatch.sor_flow_llin4(f["u"], f["v"], f["du"], f["dv"], f["m"],
                                  f["cu"], f["cv"], f["duc"], f["dvc"],
                                  *a4, 3, 1.9)
    want = sor.sor_flow_llin4(f["u"], f["v"], f["du"], f["dv"], f["m"],
                              f["cu"], f["cv"], f["duc"], f["dvc"],
                              *a4, 3, 1.9)
    assert all((np.asarray(g) == np.asarray(w_)).all()
               for g, w_ in zip(got, want))
    got = dispatch.sor_pde4(f["x"], f["trace"], f["b"], *a4, 3, 1.75)
    want = sor.sor_pde4(f["x"], f["trace"], f["b"], *a4, 3, 1.75)
    assert (np.asarray(got) == np.asarray(want)).all()


def test_dispatch_sym_pair_matches_vmapped(rng):
    """The per-side dispatch decomposition of the symmetric pair equals
    the vmapped coupled solver (the sweeps are independent given the
    tensors)."""
    f0 = _fields(rng, 24, 31, ("u", "du", "cu", "duc") + W4)
    f1 = _fields(rng, 24, 31, ("u", "du", "cu", "duc") + W4)
    args0 = [f0[n] for n in ("u", "du", "cu", "duc") + W4]
    args1 = [f1[n] for n in ("u", "du", "cu", "duc") + W4]
    want = sor.sor_disp_llin_sym4(*args0, *args1, 3, 1.9)
    got0 = sor.sor_disp_llin4(*args0, 3, 1.9)
    got1 = sor.sor_disp_llin4(*args1, 3, 1.9)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want[0]),
                               atol=ATOL, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want[1]),
                               atol=ATOL, rtol=1e-6)


# ---------------------------------------------------------------------------
# Cyclic-reduction tridiagonal solve (solvers/tdma.thomas_solve_cr) — the
# TPU dispatch target of thomas_solve; parity vs the lax.scan reference.
# ---------------------------------------------------------------------------


def _tridiag(rng, shape):
    """Random diagonally-dominant system (well-conditioned)."""
    a = jnp.asarray(rng.random(shape) * 0.4 - 0.5, jnp.float32)
    c = jnp.asarray(rng.random(shape) * 0.4 - 0.5, jnp.float32)
    b = jnp.abs(a) + jnp.abs(c) + jnp.asarray(rng.random(shape) + 0.5, jnp.float32)
    d = jnp.asarray(rng.random(shape) * 2.0 - 1.0, jnp.float32)
    return a, b, c, d


@pytest.mark.parametrize("shape,axis", [
    ((64, 80), -2), ((7, 130), -2), ((57, 257), -1), ((8, 128), -2),
    ((1024, 16), -2), ((3, 33, 40), -2), ((3, 33, 40), -1), ((1, 5), -2),
    ((2, 5), -2),
])
def test_thomas_cr_matches_scan(rng, shape, axis):
    from pde_tpu.solvers.tdma import thomas_solve_scan, thomas_solve_cr

    a, b, c, d = _tridiag(rng, shape)
    got = thomas_solve_cr(a, b, c, d, axis=axis)
    want = thomas_solve_scan(a, b, c, d, axis=axis)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("h, w", [(64, 256), (100, 140), (128, 130)])
def test_tridiag_cr_pallas_matches_scan(rng, h, w):
    """The VMEM-resident Pallas CR kernel (interpret mode) must agree
    with the sequential Thomas scan on diagonally dominant systems,
    incl. non-power-of-two heights (identity-row padding) and unaligned
    widths."""
    from pde_tpu.kernels.tdma_pallas import tridiag_cr_pallas
    from pde_tpu.solvers.tdma import thomas_solve_scan

    a = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)) * 0.3
    c = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32)) * 0.3
    b = 2.0 + jnp.abs(a) + jnp.abs(c)
    d = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    want = thomas_solve_scan(a, b, c, d, axis=-2)
    got = tridiag_cr_pallas(a, b, c, d, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


def test_thomas_cr_ignores_junk_corner_coeffs(rng):
    """a[0] / c[-1] may hold junk by contract (scan multiplies them by a
    zero carry); CR must mask them identically."""
    from pde_tpu.solvers.tdma import thomas_solve_scan, thomas_solve_cr

    a, b, c, d = _tridiag(rng, (33, 130))
    a_j = a.at[0].set(jnp.inf)
    c_j = c.at[-1].set(jnp.nan)
    got = thomas_solve_cr(a_j, b, c_j, d, axis=-2)
    want = thomas_solve_scan(a, b, c, d, axis=-2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
