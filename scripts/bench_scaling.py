"""Halo-exchange tiling overhead on a virtual device mesh.

The environment exposes ONE physical TPU chip, so multi-chip scaling is
measured the only way available (SURVEY.md section 4): N virtual host
devices (XLA_FLAGS=--xla_force_host_platform_device_count) running the
REAL shard_map solvers with the REAL ppermute halo exchanges.

What the number means — and doesn't: N virtual devices time-slice this
host's 2 CPU cores, so the reported ratio (tiled_time /
single_device_time at identical total work) mixes three things:
(1) genuine tiling overhead — the 2k-px halo strips recomputed per
k-sweep chunk and the ppermute collectives (what a real ICI slice
pays), (2) pure time-slicing serialisation of >2 programs on 2 cores
(≥ N/2× by construction, absent on real chips), and (3) XLA:CPU's
per-shard fixed costs. It is therefore a loose UPPER BOUND on real
communication overhead, useful mainly as a round-over-round trend:
temporal blocking (halo exchanged once per k sweeps instead of twice
per sweep, parallel/tiled.py) cut it from 21-29x in round 3 to ~8-11x.
Real scaling numbers require a real multi-chip slice.

Prints one JSON line per mesh shape:
    {"metric": "tiled llin4 SOR halo overhead, <ty>x<tx> mesh", ...}
(the driver's BENCH parser keys on the LAST line of bench.py, which
re-emits its headline after relaying these).

Run standalone:  python scripts/bench_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))

import numpy as np
import jax.numpy as jnp


def main():
    from pde_tpu.parallel.mesh import make_mesh
    from pde_tpu.parallel.tiled import tiled_sor_flow_llin4
    from pde_tpu.solvers.sor import sor_flow_llin4

    H = W = 512
    ITERS = 8
    rng = np.random.default_rng(0)
    f = lambda s=1.0: jnp.asarray(rng.random((H, W)) * s, jnp.float32)
    u, v, du, dv = f(.1), f(.1), f(0.), f(0.)
    m, cu, cv = f(.01), f(.1), f(.1)
    duc, dvc = f() + 1, f() + 1
    ww = wn = we = ws = jnp.full((H, W), 0.25, jnp.float32)
    args = (u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws)

    def timeit(fn, reps=3):
        out = fn()
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timeit(lambda: sor_flow_llin4(*args, ITERS, 1.9))

    for ty, tx in [(1, 2), (2, 2), (2, 4)]:
        mesh = make_mesh(ty, tx)
        tn = timeit(lambda: tiled_sor_flow_llin4(mesh, *args, ITERS, 1.9))
        print(json.dumps({
            "metric": f"tiled llin4 SOR halo+collective overhead, {ty}x{tx} virtual mesh (512^2, same total work)",
            "value": round(tn / t1, 3),
            "unit": "x single-device time",
            "vs_baseline": 1.0,
        }), flush=True)


if __name__ == "__main__":
    main()
