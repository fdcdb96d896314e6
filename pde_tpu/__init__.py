"""pde_tpu — a TPU-native variational PDE image-processing engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
JediZ/PDE-based-image-processing (MATLAB + C MEX):

* optical flow (Horn&Schunck early-lin., late-lin. warping, anisotropic
  diffusion, FAS full multigrid),
* stereo disparity (late-lin. warping + symmetric variant),
* level-set segmentation of disparity maps (Chan-Vese + RANSAC surfaces),
* geodesic active contours (Caselles a/b),
* total-variation denoising (4- and 8-neighbour).

Everything is expressed as jittable functional transforms over (..., H, W)
float32 arrays; hot relaxation sweeps have fused Pallas TPU kernels; the
image grid shards over a device mesh with halo exchange for multi-chip runs.
"""

__version__ = "0.1.0"

from pde_tpu import core, ops, solvers, models, parallel, utils  # noqa: F401
