"""Solver dispatch: pick the fastest implementation per backend/size.

Drop-in replacements for the global XLA solvers in ``solvers/sor.py``:

* CPU backend -> XLA (Pallas DMA kernels are TPU-only;
  ``tests/test_kernels.py`` exercises the tiled kernels and the resident
  kernel in interpreter mode against the XLA solvers).
* small grids (whole working set VMEM-resident) -> resident Pallas kernel
  where one exists, otherwise the tiled kernel with all sweeps fused into
  a single launch.
* large grids -> stripe-tiled temporally-blocked Pallas kernel
  (kernels/tiled.py), k sweeps per HBM pass.
* anything unplannable -> XLA fallback.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax

from pde_tpu.kernels import sweeps
from pde_tpu.kernels.tiled import tiled_relax
from pde_tpu.kernels.sor_pallas import fits_vmem, pallas_sor_flow_llin4
from pde_tpu.solvers import sor as _sor

# trace-time opt-out of the Pallas kernels (used by models whose fused
# whole-frame programs currently trip a Mosaic fault — see
# models/disparity.disparity_nd_fused)
_FORCE_XLA = contextvars.ContextVar("pde_tpu_force_xla", default=False)


@contextlib.contextmanager
def xla_solvers():
    """Within this context (at trace time), dispatch the global XLA
    solvers instead of the Pallas kernels."""
    tok = _FORCE_XLA.set(True)
    try:
        yield
    finally:
        _FORCE_XLA.reset(tok)


def _use_pallas() -> bool:
    return (not _FORCE_XLA.get()) and jax.default_backend() not in ("cpu",)


def pallas_active() -> bool:
    """Public trace-time query: may Pallas kernels be dispatched here?
    (False under :func:`xla_solvers` or on the CPU backend.)"""
    return _use_pallas()


def _run_tiled(fields, sweep_factory, n_mut, iters, omega, small):
    prepare, sweep = sweep_factory(float(omega))
    # k_max capped at 8 even for VMEM-resident grids: the chunk body is
    # fully unrolled and larger k blows up program size / compile time
    out = tiled_relax(fields, sweep, n_mut, iters,
                      k_max=min(iters, 8) if small else 4, prepare_fn=prepare)
    return out


def _is_small(h, w, n_fields):
    # single-launch threshold: whole problem comfortably VMEM-resident
    return h * w * 4 * (n_fields + 4) <= 4 * 1024 * 1024


def sor_flow_llin4(u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws,
                   iters: int, omega: float):
    h, w = u.shape
    if _use_pallas():
        if fits_vmem(h, w):
            return pallas_sor_flow_llin4(u, v, du, dv, m, cu, cv, duc, dvc,
                                         ww, wn, we, ws, iters, omega)
        out = _run_tiled(
            (du, dv, u, v, m, cu, cv, duc, dvc, ww, wn, we, ws),
            sweeps.flow_llin4_sweep, 2, iters, omega, False,
        )
        if out is not None:
            return out
    return _sor.sor_flow_llin4(u, v, du, dv, m, cu, cv, duc, dvc,
                               ww, wn, we, ws, iters, omega)


def sor_flow_elin4(u, v, m, cu, cv, duc, dvc, ww, wn, we, ws,
                   iters: int, omega: float):
    h, w = u.shape
    if _use_pallas():
        out = _run_tiled(
            (u, v, m, cu, cv, duc, dvc, ww, wn, we, ws),
            sweeps.flow_elin4_sweep, 2, iters, omega, _is_small(h, w, 11),
        )
        if out is not None:
            return out
    return _sor.sor_flow_elin4(u, v, m, cu, cv, duc, dvc, ww, wn, we, ws,
                               iters, omega)


def sor_flow_llin8(u, v, du, dv, m, cu, cv, duc, dvc,
                   ww, wnw, wn, wne, we, wse, ws, wsw,
                   iters: int, omega: float):
    h, w = u.shape
    if _use_pallas():
        out = _run_tiled(
            (du, dv, u, v, m, cu, cv, duc, dvc,
             ww, wnw, wn, wne, we, wse, ws, wsw),
            sweeps.flow_llin8_sweep, 2, iters, omega, _is_small(h, w, 17),
        )
        if out is not None:
            return out
    return _sor.sor_flow_llin8(u, v, du, dv, m, cu, cv, duc, dvc,
                               ww, wnw, wn, wne, we, wse, ws, wsw,
                               iters, omega)


def sor_disp_llin4(u, du, cu, duc, ww, wn, we, ws, iters: int, omega: float):
    h, w = u.shape
    if _use_pallas():
        out = _run_tiled(
            (du, u, cu, duc, ww, wn, we, ws),
            sweeps.disp_llin4_sweep, 1, iters, omega, _is_small(h, w, 8),
        )
        if out is not None:
            return out[0]
    return _sor.sor_disp_llin4(u, du, cu, duc, ww, wn, we, ws, iters, omega)


def sor_disp_llin_sym4(
    u0, du0, cu0, duc0, ww0, wn0, we0, ws0,
    u1, du1, cu1, duc1, ww1, wn1, we1, ws1,
    iters: int, omega: float,
):
    """Coupled left/right pair: the two relaxations are algebraically
    independent per sweep (coupling enters through the Cu/Du tensors the
    driver rebuilds between solves, see solvers/sor.py), so each side
    dispatches through the scalar kernel independently."""
    if _use_pallas():
        d0 = sor_disp_llin4(u0, du0, cu0, duc0, ww0, wn0, we0, ws0,
                            iters, omega)
        d1 = sor_disp_llin4(u1, du1, cu1, duc1, ww1, wn1, we1, ws1,
                            iters, omega)
        return d0, d1
    return _sor.sor_disp_llin_sym4(
        u0, du0, cu0, duc0, ww0, wn0, we0, ws0,
        u1, du1, cu1, duc1, ww1, wn1, we1, ws1, iters, omega,
    )


def sor_pde4(x, trace, b, ww, wn, we, ws, iters: int, omega: float):
    if _use_pallas() and x.ndim == 2:
        h, w = x.shape
        out = _run_tiled(
            (x, trace, b, ww, wn, we, ws),
            sweeps.pde4_sweep, 1, iters, omega, _is_small(h, w, 7),
        )
        if out is not None:
            return out[0]
    return _sor.sor_pde4(x, trace, b, ww, wn, we, ws, iters, omega)


def sor_pde8(x, trace, b, ww, wnw, wn, wne, we, wse, ws, wsw,
             iters: int, omega: float):
    if _use_pallas() and x.ndim == 2:
        h, w = x.shape
        out = _run_tiled(
            (x, trace, b, ww, wnw, wn, wne, we, wse, ws, wsw),
            sweeps.pde8_sweep, 1, iters, omega, _is_small(h, w, 11),
        )
        if out is not None:
            return out[0]
    return _sor.sor_pde8(x, trace, b, ww, wnw, wn, wne, we, wse, ws, wsw,
                         iters, omega)
