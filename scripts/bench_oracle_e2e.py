"""Measure the single-core CPU end-to-end baseline for the flagship model.

Times the literal NumPy/SciPy oracle port of FlowEminND_llin_2D_v10.m
(tests/oracle.py) on the bundled Yosemite pair, once per solver flavour:

* solver=1 — vectorised NumPy red-black sweeps: an OPTIMISTIC stand-in
  for the reference's single-threaded C MEX kernels (same arithmetic,
  BLAS-free, no interpreter overhead in the hot loop). This is the
  denominator bench.py uses for the end-to-end ``vs_baseline``.
* solver=2 — the literal sequential ALR port (per-line Python loops +
  scipy solve_banded): the reference's *default trajectory*, far slower
  than its C implementation — recorded for completeness, never used as
  a denominator.

Writes ``tests/golden/oracle_e2e.json``; run manually on a quiet
machine (the numbers go stale only if the oracle or images change).
"""

import json
import os
import sys
import time

# pure-CPU measurement; must not hold the (single-tenant) TPU tunnel open
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np  # noqa: E402


def main():
    from pde_tpu.utils.io import load_yosemite
    import oracle

    y0, y1, _, _ = load_yosemite()
    y0 = np.asarray(y0, np.float64)
    y1 = np.asarray(y1, np.float64)
    out = {"image": "yosemite", "shape": list(y0.shape)}

    path = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                        "oracle_e2e.json")

    def write():
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out), flush=True)

    t0 = time.perf_counter()
    u1, v1 = oracle.flow_nd_oracle(y0, y1, "grad", "gradmag", solver=1)
    out["solver1_vectorised_numpy_s"] = round(time.perf_counter() - t0, 2)
    assert np.isfinite(u1).all() and np.isfinite(v1).all()
    assert 0.05 < np.median(np.abs(u1)) < 5.0
    write()  # the vs_baseline denominator is safe even if solver=2 is cut

    t0 = time.perf_counter()
    u2, v2 = oracle.flow_nd_oracle(y0, y1, "grad", "gradmag", solver=2)
    out["solver2_literal_alr_s"] = round(time.perf_counter() - t0, 2)
    assert np.isfinite(u2).all() and np.isfinite(v2).all()
    assert 0.05 < np.median(np.abs(u2)) < 5.0
    out["aee_between_solvers"] = round(float(np.mean(
        np.hypot(u1 - u2, v1 - v2))), 4)
    write()


if __name__ == "__main__":
    main()
