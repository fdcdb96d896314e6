"""Drive the public pde_tpu API end-to-end on the bundled reference images.

Used by the verify workflow and as a quick sanity harness:
    JAX_PLATFORMS=cpu python scripts/drive_e2e.py [--fast]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

# the container's sitecustomize force-registers the axon TPU plugin and sets
# jax_platforms="axon,cpu"; env vars alone cannot undo that — override the
# config before any backend initialises (same dance as tests/conftest.py).
if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

t0 = time.time()
import pde_tpu
from pde_tpu.models.tv_denoise import tv_denoise4
from pde_tpu.models.flow_hs import flow_hs
from pde_tpu.models.flow_nd import flow_nd
from pde_tpu.models.disparity import disparity_nd
from pde_tpu.utils.io import load_image_pair, load_yosemite

print(f"[{time.time()-t0:6.1f}s] import ok, version {pde_tpu.__version__}")

fast = "--fast" in sys.argv
rng = np.random.default_rng(0)

# --- TV denoise on a real image crop ---
it0, it1 = load_image_pair("beanbags")  # (3, H, W) in [0,255]
gray = it0.mean(axis=0)[:96, :128] / 255.0
noisy = gray + 0.1 * rng.standard_normal(gray.shape).astype(np.float32)
den = np.asarray(tv_denoise4(noisy))
print(
    f"[{time.time()-t0:6.1f}s] tv_denoise4: mse(noisy)={np.mean((noisy-gray)**2):.5f}"
    f" -> mse(denoised)={np.mean((den-gray)**2):.5f}"
)

# --- Horn-Schunck flow on Yosemite (with ground truth) ---
y0, y1, gtu, gtv = load_yosemite()
print(f"[{time.time()-t0:6.1f}s] yosemite {y0.shape}, gt={'yes' if gtu is not None else 'no'}")
if fast:
    y0, y1 = y0[:128, :160], y1[:128, :160]
    if gtu is not None:
        gtu, gtv = gtu[:128, :160], gtv[:128, :160]
u, v = flow_hs(y0, y1)
u, v = np.asarray(u), np.asarray(v)
if gtu is not None:
    valid = np.isfinite(gtu) & (np.abs(gtu) < 1e3)
    aee = np.mean(np.sqrt((u - gtu)[valid] ** 2 + (v - gtv)[valid] ** 2))
    print(f"[{time.time()-t0:6.1f}s] flow_hs yosemite AEE={aee:.4f} "
          f"(|u| med={np.median(np.abs(u)):.3f})")
else:
    print(f"[{time.time()-t0:6.1f}s] flow_hs |u| med={np.median(np.abs(u)):.3f}")

# --- ND warping flow ---
if not fast:
    u2, v2 = flow_nd(y0, y1, "grad", "gradmag")
    u2, v2 = np.asarray(u2), np.asarray(v2)
    if gtu is not None:
        aee2 = np.mean(np.sqrt((u2 - gtu)[valid] ** 2 + (v2 - gtv)[valid] ** 2))
        print(f"[{time.time()-t0:6.1f}s] flow_nd yosemite AEE={aee2:.4f}")

# --- Disparity on Tsukuba ---
tl, tr = load_image_pair("tsukuba")
if fast:
    tl, tr = tl[:, :96, :128], tr[:, :96, :128]
d = np.asarray(disparity_nd(tl, tr, "grad", "gradmag"))
print(
    f"[{time.time()-t0:6.1f}s] disparity tsukuba: range [{np.nanmin(d):.2f}, {np.nanmax(d):.2f}],"
    f" median {np.nanmedian(d):.2f}, finite {np.isfinite(d).mean()*100:.1f}%"
)

# --- Symmetric disparity (runme.m:28) ---
from pde_tpu.models.disparity_sym import disparity_sym

ds = np.asarray(disparity_sym(tl[:3], tr[:3]))  # tl/tr already cropped in fast mode
print(
    f"[{time.time()-t0:6.1f}s] disparity_sym tsukuba: med u0 {np.nanmedian(ds[0]):.2f}"
    f" u1 {np.nanmedian(ds[1]):.2f} (sign symmetry {np.nanmedian(ds[0]+ds[1]):+.3f})"
)

# --- FAS-FMG flow on Yosemite (runme.m:90) ---
from pde_tpu.models.flow_fmg import flow_fmg

uf, vf = flow_fmg(y0, y1)
uf, vf = np.asarray(uf), np.asarray(vf)
if gtu is not None:
    aee3 = np.mean(np.sqrt((uf - gtu)[valid] ** 2 + (vf - gtv)[valid] ** 2))
    print(f"[{time.time()-t0:6.1f}s] flow_fmg yosemite AEE={aee3:.4f}")
else:
    print(f"[{time.time()-t0:6.1f}s] flow_fmg |u| med={np.median(np.abs(uf)):.3f}")

# --- AD (anisotropic tensor) flow ---
from pde_tpu.models.flow_ad import flow_ad

b0, b1f = load_image_pair("beanbags")
if fast:
    b0, b1f = b0[:3, 40:136, 140:268], b1f[:3, 40:136, 140:268]
else:
    b0, b1f = b0[:3], b1f[:3]
ua, va = flow_ad(b0, b1f, "grad", "gradmag")
print(f"[{time.time()-t0:6.1f}s] flow_ad beanbags |flow| med="
      f"{np.median(np.hypot(np.asarray(ua), np.asarray(va))):.3f}")

# --- ND flow, rgb/none variant + flow2color border legend (runme.m:104-110) ---
if not fast:
    ub, vb = flow_nd(b0, b1f, "rgb", "none")
    img = pde_tpu.flow2color(np.asarray(ub), np.asarray(vb), border=10)
    print(f"[{time.time()-t0:6.1f}s] flow_nd rgb/none + flow2color border: "
          f"img {img.shape}, rgb range [{img.min():.2f}, {img.max():.2f}]")

# --- Geodesic active contours on DRIVSCO (runme.m:114-137) ---
from pde_tpu.models.gac import gac_a, gac_b
from pde_tpu.utils.io import load_image, REFERENCE_IMAGES

dr = load_image(os.path.join(REFERENCE_IMAGES, "drivsco", "c_tour_03_L_4980.jpg"),
                gray=True)[0] / 255.0
phi0 = -np.ones_like(dr)
phi0[42:176, 115:218] = 1.0   # runme.m:124 (1-based inclusive)
if fast:
    dr_c, phi_c = dr[:192, 64:256], phi0[:192, 64:256]
else:
    dr_c, phi_c = dr, phi0
phia = np.asarray(gac_a(dr_c, phi_c))
phib = np.asarray(gac_b(dr_c, phi_c))
print(f"[{time.time()-t0:6.1f}s] gac_a/gac_b: inside fractions "
      f"{np.mean(phia >= 0):.3f} / {np.mean(phib >= 0):.3f}")

# --- TV denoise 8-neighbour (runme.m:145) ---
from pde_tpu.models.tv_denoise import tv_denoise8

den8 = np.asarray(tv_denoise8(noisy))
print(f"[{time.time()-t0:6.1f}s] tv_denoise8: mse(noisy)={np.mean((noisy-gray)**2):.5f}"
      f" -> mse={np.mean((np.clip(den8,0,1)-gray)**2):.5f}")

# --- Pure-MATLAB-layer diffusion (Diffusion4_v10.m) ---
from pde_tpu.models.diffusion import diffusion4

dif = np.asarray(diffusion4(noisy))
print(f"[{time.time()-t0:6.1f}s] diffusion4: mse={np.mean((dif-gray)**2):.5f}")

# --- Segmentation on the regenerated disparity fixture (runme.m:152-168) ---
fix = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "disparity_maps.npz")
if os.path.exists(fix) and not fast:
    from pde_tpu.models.segmentation import disp_segmentation, disp_segmentation_sparse

    maps = np.load(fix)
    ad, bd, cd = disp_segmentation(maps["dd"])
    print(f"[{time.time()-t0:6.1f}s] segmentation dense: "
          f"{int(np.asarray(bd).max())} segments")
    as_, bs, cs = disp_segmentation_sparse(maps["ds"])
    print(f"[{time.time()-t0:6.1f}s] segmentation sparse: "
          f"{int(np.asarray(bs).max())} segments")
else:
    print(f"[{time.time()-t0:6.1f}s] segmentation skipped "
          f"({'fast mode' if fast else 'fixture missing - run scripts/make_seg_fixture.py'})")

print(f"[{time.time()-t0:6.1f}s] E2E drive complete")
