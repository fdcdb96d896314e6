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

    t0 = time.perf_counter()
    u1, v1 = oracle.flow_nd_oracle(y0, y1, "grad", "gradmag", solver=1)
    out["solver1_vectorised_numpy_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    u2, v2 = oracle.flow_nd_oracle(y0, y1, "grad", "gradmag", solver=2)
    out["solver2_literal_alr_s"] = round(time.perf_counter() - t0, 2)

    # sanity: both produce finite flows of the expected scale
    for u, v in ((u1, v1), (u2, v2)):
        assert np.isfinite(u).all() and np.isfinite(v).all()
        assert 0.05 < np.median(np.abs(u)) < 5.0
    out["aee_between_solvers"] = round(float(np.mean(
        np.hypot(u1 - u2, v1 - v2))), 4)

    path = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                        "oracle_e2e.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
