"""Worked observability demo: evolving GAC contours + segmentation
phase snapshots rendered to PNGs.

The reference redraws inside its hot loops (imagesc/drawnow,
GAC_v10a.m:117, DispSegmentation.m:395,644-645). The engine's
equivalents are host-side hooks BETWEEN jitted programs: the GAC
drivers' ``collect``/``collect_every`` chunked evolution and the
segmentation pipeline's phase snapshots — the device never stalls on a
UI callback. This script drives both on the bundled data and writes:

    out_demo/gac_contour_###.png  — contour overlay every 10 AOS steps
    out_demo/seg_phase_<name>.png — SEG map after each pipeline phase

Run:  JAX_PLATFORMS=cpu python scripts/demo_observability.py [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np


def _contour_overlay(gray01, phi):
    """RGB image with the phi>=0 boundary painted red (PIL-only)."""
    inside = np.asarray(phi) >= 0
    edge = inside ^ (np.roll(inside, 1, 0) & np.roll(inside, 1, 1)
                     & np.roll(inside, -1, 0) & np.roll(inside, -1, 1)
                     & inside)
    rgb = np.stack([gray01] * 3, axis=-1)
    rgb[edge] = [1.0, 0.0, 0.0]
    return (np.clip(rgb, 0, 1) * 255).astype(np.uint8)


def _seg_colors(seg):
    """Deterministic color map for a SEG label image."""
    rng = np.random.default_rng(7)
    n = int(seg.max()) + 1
    lut = np.vstack([[0, 0, 0], rng.integers(64, 255, size=(max(n, 1), 3))])
    return lut[np.asarray(seg).astype(int) + 0].astype(np.uint8)


def main():
    from PIL import Image

    from pde_tpu.models.gac import gac_a
    from pde_tpu.models.segmentation import disp_segmentation
    from pde_tpu.utils.io import load_image

    out = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
        else "out_demo"
    os.makedirs(out, exist_ok=True)

    # --- GAC contours on the DRIVSCO road frame (runme.m:117-130) -------
    road = load_image("/root/reference/images/drivsco/c_tour_03_L_4980.jpg")
    img01 = np.asarray(road, np.float32) / 255.0
    gray = img01.mean(axis=0)
    phi0 = -np.ones(gray.shape, np.float32)
    phi0[41:175, 114:217] = 1.0
    snaps = []
    gac_a(img01, phi0, collect=snaps, collect_every=10)
    for i, phi in enumerate(snaps):
        Image.fromarray(_contour_overlay(gray, phi)).save(
            os.path.join(out, f"gac_contour_{i:03d}.png"))
    print(f"wrote {len(snaps)} GAC contour frames to {out}/", flush=True)

    # --- segmentation phase snapshots on the regenerated fixture --------
    fx = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                      "disparity_maps.npz")
    if os.path.exists(fx):
        d = np.load(fx)["dd"][::2, ::2][40:120, 50:150]
        phases = []
        disp_segmentation(d, seeds=3, seed_iterations=6, rc_iterations=6,
                          rc_iterations2=4, ransac_first=200,
                          ransac_rest=50, collect=phases)
        for name, seg in phases:
            Image.fromarray(_seg_colors(seg)).save(
                os.path.join(out, f"seg_phase_{name}.png"))
        print(f"wrote {len(phases)} segmentation phase maps to {out}/",
              flush=True)
    else:
        print("fixture missing - segmentation snapshots skipped", flush=True)


if __name__ == "__main__":
    main()
