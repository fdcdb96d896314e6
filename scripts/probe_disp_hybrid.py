"""Probe 2: hybrid / per-level-segment disparity configurations on TPU.

Isolates whether the in-program pyramid build is the crash trigger:
n_parts = n_levels runs ONE level per program but (unlike the known-good
disparity_nd per-level path) rebuilds the pyramid inside each program.
Results append to /tmp/probe_disp_hybrid.log.
Usage: python scripts/probe_disp_hybrid.py [mode]
  mode: hybrid5 | perlevel | hybrid3
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "/tmp/probe_disp_hybrid.log"


def run_one(mode: str):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import numpy as np

    from pde_tpu.models.disparity import (DisparityParams, disparity_nd_hybrid,
                                          disparity_nd_split)
    from pde_tpu.utils.io import load_image_pair

    il, ir = load_image_pair("tsukuba")
    p = DisparityParams()

    def call():
        if mode == "perlevel":
            return disparity_nd_split(il, ir, "grad", "gradmag", p,
                                      n_parts=99)
        k = int(mode.replace("hybrid", ""))
        return disparity_nd_hybrid(il, ir, "grad", "gradmag", p,
                                   fused_finest=k)

    t0 = time.perf_counter()
    u = np.asarray(call())
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        u = np.asarray(call())
        best = min(best, time.perf_counter() - t0)
    print(f"RESULT mode={mode} compile={compile_s:.1f}s warm={best:.3f}s "
          f"fps={1/best:.2f} vs26.57={26.57/best:.0f}x "
          f"finite={bool(np.isfinite(u).all())} "
          f"range=[{np.nanmin(u):.2f},{np.nanmax(u):.2f}]", flush=True)


def main():
    if len(sys.argv) == 2:
        run_one(sys.argv[1])
        return

    def log(line):
        print(line, flush=True)
        with open(LOG, "a") as f:
            f.write(line + "\n")

    for mode in ["perlevel", "hybrid5", "hybrid3"]:
        log(f"--- probing {mode}")
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode],
            capture_output=True, text=True, timeout=1500)
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                log(line)
        if r.returncode != 0:
            tail = (r.stdout + r.stderr).strip().splitlines()[-2:]
            log(f"CRASH mode={mode} rc={r.returncode}: " + " | ".join(tail))


if __name__ == "__main__":
    main()
