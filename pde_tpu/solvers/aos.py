"""Additive-operator-splitting (AOS) semi-implicit level-set steps.

Re-designs CV_AOSOMP_4_2d / AC_AOS_4_2d
(/root/reference/mex/source/library/levelsetSolvers.c:57-868) as two
batched tridiagonal solves (vertical + horizontal), summed:

    u+ = x_v + x_h,  where each solves
    (2 + nu*(Dp + Dn)) x_i - nu*Dp x_{i-1} - nu*Dn x_{i+1} = rhs
    Dn = 2*tau*G_c / (Diff_c + Diff_next)  (harmonic avg; 0 if sum <= 0)

* Chan-Vese: rhs = PHI + tau*G*DATA; result clamped to [-5, 5] after each
  pass (PMIN/PMAX, levelsetSolvers.c:32-33).
* Active contour: rhs = PHI + tau*DATA, no clamping; the AC driver follows
  every step with ``reinit(PHI, 0.25)`` (levelsetSolvers.c:179).
* zero-diffusivity freeze (GRADNORM_ZERO_CHECK): pixels with Diff == 0
  keep their input value (levelsetSolvers.c:249-273).

The OpenMP frame loop of the reference becomes a leading batch dim —
arrays are (..., H, W) and every level-set function solves in parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pde_tpu.core.grid import shift_w, shift_e, shift_n, shift_s
from pde_tpu.solvers.tdma import thomas_solve, _edge_zero

PHI_MIN = -5.0
PHI_MAX = 5.0


def _harmonic(diff, grad, tau, shift):
    s = diff + shift(diff)
    return jnp.where(s > 0.0, 2.0 * tau * grad / jnp.where(s > 0.0, s, 1.0), 0.0)


def _aos_pair(phi_rhs, grad, diff, tau, nu):
    """Vertical and horizontal implicit half-solutions."""
    # vertical (along rows, axis -2): next = S (i+1), prev = N (i-1)
    dn = _edge_zero(_harmonic(diff, grad, tau, shift_s), -2, "last")
    dp = _edge_zero(_harmonic(diff, grad, tau, shift_n), -2, "first")
    xv = thomas_solve(-nu * dp, 2.0 + nu * (dn + dp), -nu * dn, phi_rhs, axis=-2)
    # horizontal (along cols, axis -1): next = E, prev = W
    dn = _edge_zero(_harmonic(diff, grad, tau, shift_e), -1, "last")
    dp = _edge_zero(_harmonic(diff, grad, tau, shift_w), -1, "first")
    xh = thomas_solve(-nu * dp, 2.0 + nu * (dn + dp), -nu * dn, phi_rhs, axis=-1)
    return xv, xh


@jax.jit
def cv_aos_step(phi, data, grad, diff, tau, nu):
    """One Chan-Vese AOS step with clamping and zero-diffusivity freeze."""
    rhs = phi + tau * grad * data
    xv, xh = _aos_pair(rhs, grad, diff, tau, nu)
    out = jnp.clip(jnp.clip(xv, PHI_MIN, PHI_MAX) + xh, PHI_MIN, PHI_MAX)
    return jnp.where(diff == 0.0, phi, out)


@jax.jit
def ac_aos_step(phi, data, grad, diff, tau, nu):
    """One geodesic-active-contour AOS step (no clamp; caller reinits)."""
    rhs = phi + tau * data
    xv, xh = _aos_pair(rhs, grad, diff, tau, nu)
    return jnp.where(diff == 0.0, phi, xv + xh)
