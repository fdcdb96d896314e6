"""Probe which disparity_nd_split configurations run on the real TPU.

Each (n_parts, xla, fori) configuration runs in its own subprocess so a
TPU worker crash (the open XLA:TPU defect, models/disparity.py
docstring) doesn't take down the probe. Results also append to
/tmp/probe_disp_split.log (pipe-buffering-proof). Usage:
    python scripts/probe_disp_split.py [n_parts xla fori]
With args: run ONE config in-process (the subprocess entry).
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "/tmp/probe_disp_split.log"


def run_one(n_parts: int, xla: bool, fori: bool, fl: int = 4, sl: int = 6):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import numpy as np

    from pde_tpu.models.disparity import DisparityParams, disparity_nd_split
    from pde_tpu.utils.io import load_image_pair

    il, ir = load_image_pair("tsukuba")
    p = DisparityParams(fori=fori, firstLoop=fl, secondLoop=sl)
    t0 = time.perf_counter()
    u = disparity_nd_split(il, ir, "grad", "gradmag", p,
                           n_parts=n_parts, xla=xla)
    u = np.asarray(u)
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        u = disparity_nd_split(il, ir, "grad", "gradmag", p,
                               n_parts=n_parts, xla=xla)
        np.asarray(u)
        best = min(best, time.perf_counter() - t0)
    print(f"RESULT n_parts={n_parts} xla={xla} fori={fori} fl={fl} sl={sl} "
          f"compile={compile_s:.1f}s "
          f"warm={best:.3f}s fps={1/best:.2f} vs26.57={26.57/best:.0f}x "
          f"finite={bool(np.isfinite(u).all())} "
          f"range=[{np.nanmin(u):.2f},{np.nanmax(u):.2f}]", flush=True)


def main():
    if len(sys.argv) == 6:
        run_one(int(sys.argv[1]), sys.argv[2] == "1", sys.argv[3] == "1",
                int(sys.argv[4]), int(sys.argv[5]))
        return
    # (n_parts, xla, fori, firstLoop, secondLoop)
    configs = [(1, True, True, 4, 4),   # fori control at known-good counts
               (1, True, True, 3, 6),   # is secondLoop=6 itself the trigger?
               (4, True, False, 4, 6),  # fine split, reference counts
               (7, True, False, 4, 6)]

    def log(line):
        print(line, flush=True)
        with open(LOG, "a") as f:
            f.write(line + "\n")

    for n_parts, xla, fori, fl, sl in configs:
        log(f"--- probing n_parts={n_parts} xla={xla} fori={fori} "
            f"fl={fl} sl={sl}")
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(n_parts),
             "1" if xla else "0", "1" if fori else "0", str(fl), str(sl)],
            capture_output=True, text=True, timeout=1200)
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                log(line)
        if r.returncode != 0:
            tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
            log(f"CRASH n_parts={n_parts} xla={xla} fori={fori} "
                f"fl={fl} sl={sl} rc={r.returncode}: " + " | ".join(tail))


if __name__ == "__main__":
    main()
