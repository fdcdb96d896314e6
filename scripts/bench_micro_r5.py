"""Round-5 kernel microbench: double-buffered stripe engine, Pallas CR
tridiagonal, windowed warp, ALR/PCG with the new line kernel.

Marginal (chained iteration-count differencing) methodology as bench.py.
Run on the real TPU:  python scripts/bench_micro_r5.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

H = W = 1024
REPS = 3


def _sync(x):
    np.asarray(x)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def field(scale=1.0, shape=(H, W)):
        return jnp.asarray(rng.random(shape) * scale, dtype=jnp.float32)

    u, v, du, dv = field(0.1), field(0.1), field(0.0), field(0.0)
    m, cu, cv = field(0.01), field(), field()
    duc, dvc = field() + 1.0, field() + 1.0
    ww = wn = we = ws = jnp.full((H, W), 0.25, jnp.float32)

    def chained(solver, i1, i2):
        def run(iters):
            def fn():
                a, b = du, dv
                for _ in range(2):
                    a, b = solver(a, b, iters)
                return a
            out = fn(); _sync(out)
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                out = fn(); _sync(out)
                best = min(best, time.perf_counter() - t0)
            return best
        return (run(i2) - run(i1)) / (i2 - i1)

    from pde_tpu.kernels import sweeps as ksweeps
    from pde_tpu.kernels.tiled import tiled_relax
    prep, sw = ksweeps.flow_llin4_sweep(1.9)
    consts = (u, v, m, cu, cv, duc, dvc, ww, wn, we, ws)

    for db in (False, True):
        try:
            dt = chained(lambda a, b, it: tiled_relax(
                (a, b) + consts, sw, 2, it, k_max=4, prepare_fn=prep,
                double_buffer=db), 128, 4096)
            print(f"stripe kernel double_buffer={db}: "
                  f"{H*W/dt/1e6:.0f} Mpix-iters/s", flush=True)
        except Exception as e:
            print(f"stripe double_buffer={db} FAILED: {str(e)[:300]}",
                  flush=True)

    # Pallas CR tridiag vs XLA CR
    from pde_tpu.kernels.tdma_pallas import tridiag_cr_pallas
    from pde_tpu.solvers.tdma import thomas_solve_cr
    a3 = field(0.3); c3 = field(0.3)
    b3 = 2.0 + jnp.abs(a3) + jnp.abs(c3)
    d3 = field()

    def time_solver(fn):
        def chain(n):
            def body():
                x = d3
                for _ in range(n):
                    x = fn(a3, b3, c3, x)
                return x
            out = body(); _sync(out)
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                out = body(); _sync(out)
                best = min(best, time.perf_counter() - t0)
            return best
        return (chain(64) - chain(8)) / 56

    import functools
    tp = jax.jit(lambda a, b, c, d: tridiag_cr_pallas(a, b, c, d))
    tx = jax.jit(functools.partial(thomas_solve_cr, axis=-2))
    for name, fn in (("pallas CR", tp), ("xla CR", tx)):
        try:
            dt = time_solver(fn)
            print(f"tridiag 1024x1024 {name}: {dt*1e6:.0f} us/solve",
                  flush=True)
        except Exception as e:
            print(f"tridiag {name} FAILED: {str(e)[:300]}", flush=True)

    # ALR + PCG with the new dispatch
    from pde_tpu.solvers.tdma import alr_flow_llin4
    from pde_tpu.solvers.krylov import pcg_flow_llin4
    try:
        dt = chained(lambda a, b, it: alr_flow_llin4(
            u, v, a, b, m, cu, cv, duc, dvc, ww, wn, we, ws, it, 1.9), 16, 256)
        print(f"ALR (pallas lines): {H*W/dt/1e6:.0f} Mpix-iters/s", flush=True)
    except Exception as e:
        print(f"ALR FAILED: {str(e)[:300]}", flush=True)
    try:
        dt = chained(lambda a, b, it: pcg_flow_llin4(
            u, v, a, b, m, cu, cv, duc, dvc, ww, wn, we, ws, it, 1.9), 16, 128)
        print(f"PCG (pallas lines): {H*W/dt/1e6:.0f} Mpix-iters/s", flush=True)
    except Exception as e:
        print(f"PCG FAILED: {str(e)[:300]}", flush=True)

    # windowed warp vs gather warp on the fused flow frame
    from pde_tpu.utils.io import load_yosemite
    from pde_tpu.models.flow_nd import flow_nd_fused, FlowNDParams
    y0, y1, gtu, gtv = load_yosemite()
    y0, y1 = jnp.asarray(y0), jnp.asarray(y1)

    for name, p in (("gather", None),
                    ("window8", FlowNDParams(warp_window=8))):
      try:
        def e2e():
            uo, vo = flow_nd_fused(y0, y1, "grad", "gradmag", p)
            _sync(uo)
            return uo, vo
        uo, vo = e2e()
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            uo, vo = e2e()
            best = min(best, time.perf_counter() - t0)
        aee = float(np.mean(np.hypot(np.asarray(uo) - gtu,
                                     np.asarray(vo) - gtv)))
        print(f"flow_nd_fused {name}: {1/best:.1f} fps (wall incl tunnel), "
              f"AEE vs GT {aee:.3f}", flush=True)
      except Exception as e:
        print(f"flow_nd_fused {name} FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
