"""Device-mesh construction and sharding helpers for spatially tiled fields.

Fields are ``(..., H, W)``; the mesh axes are ``("ty", "tx")`` — tile-rows
and tile-cols of the image plane. Batch/frame dims stay replicated or ride
an optional leading ``"batch"`` axis (the OpenMP-over-frames analogue,
``levelsetSolvers.c:200-324`` in the reference).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(ty: int = 1, tx: int | None = None, devices=None) -> Mesh:
    """Build a (ty, tx) mesh over the available devices.

    With only one device this degenerates to a 1x1 mesh, so single-chip and
    multi-chip code paths are identical.
    """
    if devices is None:
        devices = jax.devices()
    if tx is None:
        tx = len(devices) // ty
    n = ty * tx
    if n > len(devices):
        raise ValueError(f"mesh {ty}x{tx} needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(ty, tx)
    return Mesh(dev, ("ty", "tx"))


def tile_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Sharding that splits the trailing (H, W) dims over (ty, tx)."""
    spec = [None] * (ndim - 2) + ["ty", "tx"]
    return NamedSharding(mesh, P(*spec))


def field_spec(ndim: int = 2) -> P:
    """PartitionSpec splitting trailing (H, W) over ("ty", "tx")."""
    return P(*([None] * (ndim - 2) + ["ty", "tx"]))
