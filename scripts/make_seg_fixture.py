"""Regenerate the segmentation demo input the reference ships without.

The reference's segmentation demo loads ``images/stereo/disparity_maps.mat``
(runme.m:156) holding a dense map ``Dd`` and a sparse map ``Ds`` — the file
is absent from the checkout (/root/reference/.MISSING_LARGE_BLOBS:1).
SURVEY.md section 4 prescribes regenerating it from the disparity pipeline
on the bundled Tsukuba pair; this script does exactly that with the
engine:

* ``Dd``: dense late-linearisation disparity of Tsukuba
  (DispEminND_llin_2D equivalent, grad+gradmag terms).
* ``Ds``: the same map with NaN holes at weakly-textured pixels (the
  bottom-65%-gradient mask) — the shape of input a sparse feature-based
  stereo method produces, which is what DispSegmentationSparse.m's
  nanmedfilt2/sentinel machinery exists to handle.

Writes tests/fixtures/disparity_maps.npz.

Run:  JAX_PLATFORMS=cpu python scripts/make_seg_fixture.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

# the container's sitecustomize forces jax_platforms="axon,cpu" (tunnelled
# TPU with a large fixed cost per call) — force the CPU backend before any
# backend initialises, as tests/conftest.py does
jax.config.update("jax_platforms", "cpu")
os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")


def main():
    t0 = time.time()
    from pde_tpu.utils.io import load_image_pair
    from pde_tpu.models.disparity import disparity_nd

    tl, tr = load_image_pair("tsukuba")
    dd = np.asarray(disparity_nd(tl[:3], tr[:3], "grad", "gradmag"))
    print(f"[{time.time()-t0:6.1f}s] dense disparity: median {np.nanmedian(dd):.2f}px,"
          f" finite {np.isfinite(dd).mean()*100:.1f}%")

    gray = tl[:3].mean(axis=0)
    gy, gx = np.gradient(gray)
    gmag = np.hypot(gx, gy)
    keep = gmag > np.quantile(gmag, 0.65)
    ds = np.where(keep, dd, np.nan).astype(np.float32)
    print(f"[{time.time()-t0:6.1f}s] sparse map: {keep.mean()*100:.1f}% support")

    os.makedirs(OUT, exist_ok=True)
    np.savez(os.path.join(OUT, "disparity_maps.npz"),
             dd=dd.astype(np.float32), ds=ds)
    print(f"[{time.time()-t0:6.1f}s] wrote {os.path.join(OUT, 'disparity_maps.npz')}")


if __name__ == "__main__":
    main()
