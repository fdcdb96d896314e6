"""Multi-chip spatial parallelism: mesh construction, tiled stencil ops.

The reference is single-process (SURVEY.md §2.3) — its only parallel
constructs are OpenMP frame loops and SSE lanes. Here the image grid is
sharded over a 2-D ``jax.sharding.Mesh`` and every stencil sweep exchanges
1-2 rows/cols of halo via ``jax.lax.ppermute`` over ICI; reductions
(quantile lambda, residual norms, RANSAC votes) ride ``psum``.
"""

from pde_tpu.parallel.mesh import make_mesh, tile_sharding  # noqa: F401
from pde_tpu.parallel.halo import halo_exchange  # noqa: F401
