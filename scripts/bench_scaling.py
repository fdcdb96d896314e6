"""Halo-exchange cost on a virtual device mesh — weak-scaling sweep.

The environment exposes ONE physical TPU chip, so multi-chip behavior is
measured the only way available (SURVEY.md section 4): 8 virtual host
devices (XLA_FLAGS=--xla_force_host_platform_device_count) running the
REAL shard_map solvers with the REAL ppermute halo exchanges.

Methodology (round 5): raw tiled-vs-single ratios on a 2-core host mix
communication cost with the N-programs-on-2-cores time-slicing floor, so
they are not reported as scaling numbers. Instead, for each image size
the same sharded sweep runs twice — once with the real ppermute halo
exchange, once with a communication-free local pad of identical shape and
arithmetic (parallel/halo.halo_local) — and the reported metric is their
ratio: the measured multiplicative cost of the collectives alone
(1.0 = free communication). Caveat on the size trend: on a real ICI
slice the per-message latency amortises and the ratio falls with image
size; on this virtual CPU mesh the strips move by memcpy, whose cost
grows with the strip bytes, so the ratio need not fall (measured r5:
~1.4x at 1024^2, ~1.7x at 2048^2; 512^2 is noise-dominated). The
absolute tiled/single ratio is emitted once, clearly labelled as a
time-slicing artifact, for round-over-round trend only.

Prints one JSON line per measurement. vs_baseline repeats the measured
ratio (there is no external baseline for these lines — the reference is
single-node; BASELINE.md).

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

    ITERS = 8
    TY, TX = 2, 4
    mesh = make_mesh(TY, TX)
    rng = np.random.default_rng(0)

    def timeit(fn, reps=5):
        out = fn()
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    for size in (512, 1024, 2048):
        H = W = size
        f = lambda s=1.0: jnp.asarray(rng.random((H, W)) * s, jnp.float32)
        u, v, du, dv = f(.1), f(.1), f(0.), f(0.)
        m, cu, cv = f(.01), f(.1), f(.1)
        duc, dvc = f() + 1, f() + 1
        ww = wn = we = ws = jnp.full((H, W), 0.25, jnp.float32)
        args = (u, v, du, dv, m, cu, cv, duc, dvc, ww, wn, we, ws)

        t_comm = timeit(lambda: tiled_sor_flow_llin4(mesh, *args, ITERS, 1.9))
        t_free = timeit(lambda: tiled_sor_flow_llin4(mesh, *args, ITERS, 1.9,
                                                     comm=False))
        ratio = t_comm / t_free
        print(json.dumps({
            "metric": (f"halo-collective cost ratio, {TY}x{TX} virtual mesh, "
                       f"{size}^2 (ppermute exchange vs identical comm-free "
                       "sweep; 1.0 = free)"),
            "value": round(ratio, 3),
            "unit": "x comm-free sharded time",
            "vs_baseline": round(ratio, 3),
        }), flush=True)

        if size == 512:
            t1 = timeit(lambda: sor_flow_llin4(*args, ITERS, 1.9))
            r = t_comm / t1
            print(json.dumps({
                "metric": (f"tiled llin4 total overhead, {TY}x{TX} virtual "
                           f"mesh, {size}^2 (vs single device, same work; "
                           "DOMINATED by 8-programs-on-2-cores time-slicing "
                           "— trend line only, not a scaling result)"),
                "value": round(r, 3),
                "unit": "x single-device time",
                "vs_baseline": round(r, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
