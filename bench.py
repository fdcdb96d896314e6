"""Benchmark: hot relaxation-sweep throughput on the current accelerator.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mpix-iters/s", "vs_baseline": N}

Metric: megapixel-iterations/second of the late-linearisation flow SOR
sweep (the engine's hottest kernel — each iteration is two red-black
half-updates of the coupled (dU, dV) pair over a 1024x1024 grid, 13
input fields; mirrors GS_SOR_llin4_2d, opticalflowSolvers.c:504-680).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is *measured here*: the same sweep executed by a vectorised
single-core NumPy port of the reference kernel on this host's CPU —
an optimistic stand-in for the single-threaded C MEX solver. The
BASELINE.json north star asks for >=20x that per chip.
"""

import json
import os
import time

import numpy as np

H = W = 1024
ITERS = 50
REPS = 3


def numpy_sweep_throughput(h=256, w=256, iters=4):
    """Vectorised single-core red-black llin4 sweep in NumPy (proxy for the
    reference's single-threaded C kernel; same arithmetic per pixel)."""
    rng = np.random.default_rng(0)
    f32 = np.float32
    u, v, du, dv = (rng.random((h, w), dtype=f32) for _ in range(4))
    m, cu, cv, duc, dvc = (rng.random((h, w), dtype=f32) for _ in range(5))
    ww = wn = we = ws = np.full((h, w), 0.25, dtype=f32)
    ii, jj = np.mgrid[0:h, 0:w]
    interior = (ii > 0) & (ii < h - 1) & (jj > 0) & (jj < w - 1)
    masks = [interior & (((ii + jj) % 2) == p) for p in (0, 1)]
    wsum = ww + wn + we + ws
    inv_u = 1.0 / (wsum + duc)
    inv_v = 1.0 / (wsum + dvc)
    omega = f32(1.9)

    def nbr(x):
        out = np.empty_like(x)
        xp = np.pad(x, 1, mode="edge")
        out = (ww * xp[1:-1, :-2] + we * xp[1:-1, 2:]
               + wn * xp[:-2, 1:-1] + ws * xp[2:, 1:-1])
        return out

    t0 = time.perf_counter()
    for _ in range(iters):
        for mask in masks:
            su = nbr(du + u) - u * wsum
            sv = nbr(dv + v) - v * wsum
            du = np.where(mask, (1 - omega) * du + omega * (su + cu - m * dv) * inv_u, du)
            dv = np.where(mask, (1 - omega) * dv + omega * (sv + cv - m * du) * inv_v, dv)
        for f in (du, dv):
            f[0, :] = f[1, :]
            f[-1, :] = f[-2, :]
            f[:, 0] = f[:, 1]
            f[:, -1] = f[:, -2]
    dt = time.perf_counter() - t0
    return h * w * iters / dt / 1e6


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp
    from pde_tpu.solvers.sor import sor_flow_llin4

    rng = np.random.default_rng(0)

    def field():
        return jnp.asarray(rng.random((H, W)), dtype=jnp.float32)

    u, v, du, dv = field(), field(), field(), field()
    m, cu, cv = field() * 0.01, field(), field()
    duc, dvc = field() + 1.0, field() + 1.0
    ww = wn = we = ws = jnp.full((H, W), 0.25, jnp.float32)

    # warmup / compile
    out = sor_flow_llin4(u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws,
                         ITERS, 1.9)
    np.asarray(out[0])  # host fetch = true synchronisation
    # NOTE: on the experimental 'axon' TPU platform jax.block_until_ready
    # returns before execution completes; only a device->host copy truly
    # syncs. Time a dependency-chained batch of calls and fetch at the end.
    CHAIN = 5
    best = float("inf")
    for _ in range(REPS):
        cdu, cdv = du, dv
        t0 = time.perf_counter()
        for _ in range(CHAIN):
            cdu, cdv = sor_flow_llin4(u, v, cdu, cdv, m, cu, cv, duc, dvc,
                                      ww, wn, we, ws, ITERS, 1.9)
        np.asarray(cdu)  # sync
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    value = H * W * ITERS / best / 1e6

    base = numpy_sweep_throughput()
    print(json.dumps({
        "metric": "llin4 flow SOR sweep throughput (1024x1024, coupled dU/dV)",
        "value": round(value, 2),
        "unit": "Mpix-iters/s",
        "vs_baseline": round(value / base, 2),
    }))


if __name__ == "__main__":
    main()
