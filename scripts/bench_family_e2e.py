"""End-to-end engine timing for ONE model family on the current backend.

Subprocess worker for bench.py's per-family e2e lines (VERDICT r4 #2):
each family runs in its own process so the open XLA:TPU fused-program
defect (models/disparity.py docstring) can at worst kill one family's
line, not the whole bench. Prints exactly one JSON line:
    {"metric": ..., "value": fps, "unit": "frames/s", "vs_baseline": x}
vs_baseline divides the measured single-core oracle wall-clock for the
same workload (tests/golden/oracle_families.json, measured by
scripts/bench_oracle_families.py; disparity uses oracle_disp_e2e.json).

Usage: python scripts/bench_family_e2e.py <family>
Families: disparity, disparity_sym, flow_fmg, flow_ad, tv4, tv8,
          gac_a, gac_b
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

GOLD = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
REPS = 3


def _base(key, fname="oracle_families.json"):
    try:
        with open(os.path.join(GOLD, fname)) as f:
            d = json.load(f)
        return float(d[key])
    except Exception:
        return 0.0


def _time(fn):
    out = fn()
    np.asarray(jax_leaves(out)[0])  # device->host copy = true sync on axon
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def jax_leaves(x):
    import jax

    return jax.tree_util.tree_leaves(x)


def main():
    fam = sys.argv[1]
    import jax.numpy as jnp

    from pde_tpu.utils.io import load_image, load_image_pair, load_yosemite

    if fam == "disparity":
        from pde_tpu.models.disparity import (DisparityParams,
                                              disparity_nd_split)

        il, ir = load_image_pair("tsukuba")
        il, ir = jnp.asarray(il), jnp.asarray(ir)
        p = DisparityParams()
        # one fused program PER LEVEL: the known-safe partitioning around
        # the open XLA:TPU multi-level-program fault (disparity_nd_fused
        # docstring); ~14 dispatches, measured 115x oracle incl. tunnel
        best = _time(lambda: disparity_nd_split(il, ir, "grad", "gradmag", p,
                                                n_parts=99))
        base = _base("solver2_literal_alr_s", "oracle_disp_e2e.json") or 26.57
        metric = ("disparity_nd end-to-end, Tsukuba (per-level fused "
                  "programs, incl. tunnel overhead)")
    elif fam == "disparity_sym":
        from pde_tpu.models.disparity_sym import disparity_sym_fused

        il, ir = load_image_pair("tsukuba")
        il, ir = jnp.asarray(il), jnp.asarray(ir)
        best = _time(lambda: disparity_sym_fused(il, ir))
        base = _base("disp_sym_tsukuba")
        metric = ("disparity_sym end-to-end, Tsukuba (fused single-dispatch, "
                  "incl. tunnel overhead)")
    elif fam == "flow_fmg":
        from pde_tpu.models.flow_fmg import flow_fmg_fused

        y0, y1, _, _ = load_yosemite()
        y0, y1 = jnp.asarray(y0), jnp.asarray(y1)
        best = _time(lambda: flow_fmg_fused(y0, y1))
        base = _base("flow_fmg_yosemite")
        metric = ("flow_fmg (FAS-FMG) end-to-end, Yosemite (fused "
                  "single-dispatch, incl. tunnel overhead)")
    elif fam == "flow_ad":
        from pde_tpu.models.flow_ad import flow_ad_fused

        u0, u1 = load_image_pair("urban3")
        u0, u1 = jnp.asarray(u0), jnp.asarray(u1)
        best = _time(lambda: flow_ad_fused(u0, u1, "grad", "gradmag"))
        base = _base("flow_ad_urban3")
        metric = ("flow_ad (anisotropic) end-to-end, Urban3 (fused "
                  "single-dispatch, incl. tunnel overhead)")
    elif fam in ("tv4", "tv8"):
        from pde_tpu.models.tv_denoise import (tv_denoise4_fused,
                                               tv_denoise8_fused)

        road = load_image(
            "/root/reference/images/drivsco/c_tour_03_L_4980.jpg")
        img = jnp.asarray(road / 255.0, jnp.float32)
        fn = tv_denoise4_fused if fam == "tv4" else tv_denoise8_fused
        best = _time(lambda: fn(img))
        base = _base(f"{fam}_road")
        metric = (f"tv_denoise{fam[-1]} end-to-end, DRIVSCO road frame "
                  "(fused single-dispatch, incl. tunnel overhead)")
    elif fam in ("gac_a", "gac_b"):
        from pde_tpu.models.gac import gac_a_fused, gac_b_fused

        road = load_image(
            "/root/reference/images/drivsco/c_tour_03_L_4980.jpg")
        img = jnp.asarray(road / 255.0, jnp.float32)
        phi0 = -np.ones(road.shape[-2:], np.float32)
        phi0[41:175, 114:217] = 1.0  # runme.m:124 box (1-based inclusive)
        phi0 = jnp.asarray(phi0)
        fn = gac_a_fused if fam == "gac_a" else gac_b_fused
        best = _time(lambda: fn(img, phi0))
        base = _base(f"{fam}_road")
        metric = (f"{fam} (geodesic contour) end-to-end, DRIVSCO road frame "
                  "(fused single-dispatch, incl. tunnel overhead)")
    elif fam == "segmentation":
        from pde_tpu.models.segmentation import disp_segmentation

        fix = os.path.join(os.path.dirname(__file__), "..", "tests",
                           "fixtures", "disparity_maps.npz")
        dd = jnp.asarray(np.load(fix)["dd"])  # full map: runme.m:156-158

        # host-orchestrated pipeline (seed growth + region competition,
        # DispSegmentation.m:96-145) with one fused program per pyramid
        # stage (_seed_stage/_rc_stage): ~1e2 dispatches total, each
        # paying this environment's tunnel overhead — labeled
        # accordingly. One warm run (jit caches populated), one timed.
        disp_segmentation(dd, seeds=4)
        t0 = time.perf_counter()
        phi, seg, sparam = disp_segmentation(dd, seeds=4)
        np.asarray(seg)
        best = time.perf_counter() - t0
        base = _base("seg_tsukuba_full")
        metric = ("segmentation end-to-end, regenerated Tsukuba disparity "
                  "map 356x451 (dense seeds=4; host-orchestrated stages, "
                  "incl. per-dispatch tunnel overhead)")
    else:
        raise SystemExit(f"unknown family {fam}")

    print(json.dumps({
        "metric": metric,
        "value": round(1.0 / best, 4),
        "unit": "frames/s",
        "vs_baseline": round(base / best, 2) if base else 0.0,
    }), flush=True)


if __name__ == "__main__":
    main()
