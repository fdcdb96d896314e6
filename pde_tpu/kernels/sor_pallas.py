"""Pallas TPU kernel: VMEM-resident red-black SOR sweeps (llin4 flow pair).

The XLA path (``solvers/sor.py``) streams all 13 coefficient fields from
HBM every half-sweep. For the image sizes this engine actually solves
(pyramid levels of Middlebury-class frames), the *entire problem state
fits in VMEM*: this kernel loads everything once, runs all ``iters``
red-black sweeps on-chip (VPU elementwise + in-register shifts), and
writes (dU, dV) back — HBM traffic drops from O(iters * fields) to
O(fields).

Semantics are identical to ``sor_flow_llin4`` (mirroring
GS_SOR_llin4_2d, opticalflowSolvers.c:504-680): color-0 then color-1
half-updates over the global interior, NaN-guarded data terms folded into
masked coefficients, and a 1-px replicated border fill after every sweep.

Arbitrary (H, W) are handled by padding to the f32 tile grid (8, 128)
with edge replication outside the kernel; the interior mask keeps padded
pixels frozen so results crop back exactly.

``sor_flow_llin4_fast`` dispatches: Pallas when the working set fits the
VMEM budget and a TPU is present, the XLA fallback otherwise (CPU tests
run the kernel in interpreter mode explicitly).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pde_tpu.solvers.sor import sor_flow_llin4

# Whole-problem budget for the 17-buffer working set. Measured on a real
# TPU v5e (16 MiB VMEM/core): 256x256 (4.3 MiB of fields) compiles, 384x384
# (9.6 MiB) does not — the kernel body's live temporaries roughly triple
# the footprint. Larger grids go through the stripe-tiled kernel
# (sor_pallas_tiled.py) or the XLA fallback.
_VMEM_BUDGET_BYTES = 9 * 1024 * 1024 // 2


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _shift_w(x):
    return jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)


def _shift_e(x):
    return jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)


def _shift_n(x):
    return jnp.concatenate([x[:1, :], x[:-1, :]], axis=0)


def _shift_s(x):
    return jnp.concatenate([x[1:, :], x[-1:, :]], axis=0)


def _replicate_border(x):
    x = jnp.concatenate([x[1:2, :], x[1:-1, :], x[-2:-1, :]], axis=0)
    return jnp.concatenate([x[:, 1:2], x[:, 1:-1], x[:, -2:-1]], axis=1)


def _kernel(hw_ref, u_ref, v_ref, du_ref, dv_ref, m_ref, cu_ref, cv_ref,
            duc_ref, dvc_ref, ww_ref, wn_ref, we_ref, ws_ref,
            du_out, dv_out, *, iters: int, omega: float):
    h = hw_ref[0]
    w = hw_ref[1]
    ph, pw = u_ref.shape

    u = u_ref[:]
    v = v_ref[:]
    m = m_ref[:]
    cu = cu_ref[:]
    cv = cv_ref[:]
    ww, wn, we, ws = ww_ref[:], wn_ref[:], we_ref[:], ws_ref[:]

    ii = lax.broadcasted_iota(jnp.int32, (ph, pw), 0)
    jj = lax.broadcasted_iota(jnp.int32, (ph, pw), 1)
    # border-solving convention (solvers/sor.py): every REAL pixel is
    # relaxed; out-facing weights zeroed at the global edges
    in_img = (ii < h) & (jj < w)
    mask0 = in_img & (((ii + jj) % 2) == 0)
    mask1 = in_img & (((ii + jj) % 2) == 1)
    zero = jnp.zeros((), ww.dtype)
    ww = jnp.where(jj == 0, zero, ww)
    we = jnp.where(jj == w - 1, zero, we)
    wn = jnp.where(ii == 0, zero, wn)
    ws = jnp.where(ii == h - 1, zero, ws)

    wsum = ww + wn + we + ws
    cu_nan = jnp.isnan(cu)
    cv_nan = jnp.isnan(cv)
    m0 = jnp.nan_to_num(m)
    cu0 = jnp.nan_to_num(cu)
    cv0 = jnp.nan_to_num(cv)
    inv_u = 1.0 / (wsum + jnp.where(jnp.isnan(duc_ref[:]), 0.0, jnp.nan_to_num(duc_ref[:])))
    inv_v = 1.0 / (wsum + jnp.where(jnp.isnan(dvc_ref[:]), 0.0, jnp.nan_to_num(dvc_ref[:])))

    def nbr(x):
        return (_shift_w(x) * ww + _shift_e(x) * we
                + _shift_n(x) * wn + _shift_s(x) * ws)

    def half(fu, fv, mask):
        # v uses the refreshed u (GS coupling, cf. solvers/sor.py)
        su = nbr(fu + u) - u * wsum
        sv = nbr(fv + v) - v * wsum
        num_u = jnp.where(cu_nan, su, su + cu0 - m0 * fv)
        new_u = jnp.where(mask, (1.0 - omega) * fu + omega * num_u * inv_u, fu)
        num_v = jnp.where(cv_nan, sv, sv + cv0 - m0 * new_u)
        new_v = jnp.where(mask, (1.0 - omega) * fv + omega * num_v * inv_v, fv)
        return new_u, new_v

    def body(_, state):
        fu, fv = state
        fu, fv = half(fu, fv, mask0)
        fu, fv = half(fu, fv, mask1)
        return fu, fv

    du, dv = lax.fori_loop(0, iters, body, (du_ref[:], dv_ref[:]))
    du_out[:] = du
    dv_out[:] = dv


def _pad_edge(x, ph, pw):
    h, w = x.shape
    return jnp.pad(x, ((0, ph - h), (0, pw - w)), mode="edge")


@partial(jax.jit, static_argnames=("iters", "omega", "interpret"))
def pallas_sor_flow_llin4(u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws,
                          iters: int, omega: float, interpret: bool = False):
    """Drop-in for ``sor_flow_llin4`` running all sweeps inside one Pallas
    kernel with the full working set VMEM-resident."""
    h, w = u.shape
    ph, pw = _round_up(max(h, 8), 8), _round_up(max(w, 128), 128)
    fields = [u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws]
    padded = [_pad_edge(f.astype(jnp.float32), ph, pw) for f in fields]
    hw = jnp.array([h, w], dtype=jnp.int32)

    out_du, out_dv = pl.pallas_call(
        partial(_kernel, iters=iters, omega=float(omega)),
        out_shape=(
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 13,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(hw, *padded)
    return out_du[:h, :w], out_dv[:h, :w]


def fits_vmem(h: int, w: int, n_fields: int = 17) -> bool:
    ph, pw = _round_up(max(h, 8), 8), _round_up(max(w, 128), 128)
    return ph * pw * 4 * n_fields <= _VMEM_BUDGET_BYTES


def sor_flow_llin4_fast(u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws,
                        iters: int, omega: float):
    """Pallas when the problem fits VMEM on a TPU backend; XLA otherwise."""
    h, w = u.shape
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu and fits_vmem(h, w):
        return pallas_sor_flow_llin4(u, v, du, dv, m, cu, cv, duc, dvc,
                                     ww, wn, we, ws, iters, omega)
    return sor_flow_llin4(u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws,
                          iters, omega)
