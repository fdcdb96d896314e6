"""Measure single-core CPU end-to-end baselines for EVERY model family.

Times the literal NumPy oracle ports (tests/oracle.py) of each reference
driver on its runme.m workload (or the nearest bundled equivalent), one
run each, and records the wall-clocks in
``tests/golden/oracle_families.json``. bench.py uses these as the
``vs_baseline`` denominators for the per-family end-to-end lines
(BASELINE.md: the reference publishes no numbers, so baselines are
measured). The vectorised-NumPy solver flavour (solver=1) is used where
available — an OPTIMISTIC stand-in for the reference's single-threaded C
MEX kernels, making the reported multipliers conservative.

Workload map (reference runme.m):
  flow_fmg   — Yosemite pair               (runme.m:90)
  flow_ad    — Urban3 pair, grad/gradmag   (flow family, runme.m:39-96)
  disp_sym   — Tsukuba pair                (runme.m:28)
  tv4 / tv8  — DRIVSCO road frame          (runme.m:143-144)
  gac_a/gac_b— DRIVSCO road frame, box PHI (runme.m:117-130)

Run manually on a quiet machine; results go stale only if the oracles or
images change. Single-run timings (these oracles take minutes).
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np  # noqa: E402

PATH = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                    "oracle_families.json")


def main(only=None):
    from pde_tpu.utils.io import load_image_pair, load_yosemite, load_image
    import oracle

    out = {}
    if os.path.exists(PATH):
        with open(PATH) as f:
            out = json.load(f)

    def record(name, fn):
        if only and name not in only:
            return
        t0 = time.perf_counter()
        res = fn()
        dt = time.perf_counter() - t0
        for r in res if isinstance(res, tuple) else (res,):
            assert np.isfinite(np.asarray(r)).all() or name.startswith("disp"), name
        out[name] = round(dt, 2)
        with open(PATH, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({name: out[name]}), flush=True)

    road = load_image(os.path.join(
        "/root/reference/images/drivsco", "c_tour_03_L_4980.jpg"))
    road01 = np.asarray(road, np.float64) / 255.0  # (C, H, W) in [0,1]
    phi0 = -np.ones(road.shape[-2:], np.float64)
    phi0[41:175, 114:217] = 1.0  # MATLAB 42:175,115:217 (1-based, inclusive)

    y0, y1, _, _ = load_yosemite()
    u0, u1 = load_image_pair("urban3")
    tl, tr = load_image_pair("tsukuba")

    def fmg():
        try:  # vectorised sweeps (conservative denominator) if supported
            return oracle.flow_fmg_oracle(
                np.asarray(y0, np.float64), np.asarray(y1, np.float64),
                solver=1)
        except Exception:
            return oracle.flow_fmg_oracle(
                np.asarray(y0, np.float64), np.asarray(y1, np.float64))

    record("flow_fmg_yosemite", fmg)
    record("flow_ad_urban3", lambda: oracle.flow_ad_oracle(
        np.asarray(u0, np.float64), np.asarray(u1, np.float64),
        "grad", "gradmag"))
    record("disp_sym_tsukuba", lambda: oracle.disp_sym_oracle(
        np.asarray(tl, np.float64), np.asarray(tr, np.float64)))
    # the NumPy TV oracles are single-channel; per-channel runs sum to
    # the same single-core work as the reference's multi-frame loop
    record("tv4_road", lambda: tuple(
        oracle.tv_denoise4_oracle(ch) for ch in road01))
    record("tv8_road", lambda: tuple(
        oracle.tv_denoise8_oracle(ch) for ch in road01))
    record("gac_a_road", lambda: oracle.gac_oracle(road01, phi0, model="a"))
    record("gac_b_road", lambda: oracle.gac_oracle(road01, phi0, model="b"))

    # segmentation: literal DispSegmentation.m port (tests/oracle_seg.py)
    # on the regenerated Tsukuba disparity fixture, same half-res crop as
    # the slow real-fixture test (tests/test_segmentation.py _CROP) so
    # the engine line is apples-to-apples (runme.m:158)
    fix = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                       "disparity_maps.npz")
    if os.path.exists(fix):
        import oracle_seg

        ddm = np.load(fix)["dd"]
        dd = ddm[::2, ::2][40:120, 50:150]
        record("seg_tsukuba_crop", lambda: oracle_seg.disp_segmentation_np(
            np.asarray(dd, np.float64), seeds=4)[0])
        # the actual runme.m:156-158 workload: the FULL regenerated map
        record("seg_tsukuba_full", lambda: oracle_seg.disp_segmentation_np(
            np.asarray(ddm, np.float64), seeds=4)[0])


if __name__ == "__main__":
    main(set(sys.argv[1:]) or None)
