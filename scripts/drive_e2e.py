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
print(f"[{time.time()-t0:6.1f}s] E2E drive complete")
