"""Solver-state checkpoint / resume (SURVEY.md §5 checkpoint bullet).

The reference has no checkpointing; its warm-start inputs (param.Us/Vs
flow priors, FlowEminND_llin_2D_v10.m:65-66; param.PHI re-segmentation,
DispSegmentation.m:41,147-180; RANSAC model_in, ransac.c:109-144) serve
that role and are first-class arguments throughout this engine. This
module adds the missing piece: durable snapshots of solver state (flow
fields mid-pyramid, level-set stacks + alive masks + surface models
mid-segmentation) so long runs can resume after preemption.

Format: a single ``.npz`` holding a flat pytree plus a JSON treedef —
dependency-free, atomic (write-to-temp + rename), and readable by plain
NumPy. Orbax would buy async/multi-host sharded saves; for single-host
image-processing state (a few MB) the npz path is simpler and has no
restore-time device-mesh coupling.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import jax


def save_state(path: str, state) -> None:
    """Snapshot a pytree of arrays/scalars to ``path`` (atomic)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = json.dumps({"n": len(leaves), "treedef": str(treedef)})
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, __meta__=np.frombuffer(meta.encode(), dtype=np.uint8),
                     **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_state(path: str, like):
    """Restore a pytree saved by :func:`save_state`.

    ``like``: a pytree with the same structure (e.g. the initial state) —
    its treedef is authoritative, so refactors that only rename internal
    container types still load old snapshots of identical arity.
    """
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        leaves = [z[f"leaf_{i}"] for i in range(meta["n"])]
    treedef = jax.tree_util.tree_structure(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint holds {len(leaves)} leaves, expected "
            f"{treedef.num_leaves}")
    saved_def = meta.get("treedef")
    if saved_def is not None and saved_def != str(treedef):
        # Same arity but different structure string: a container rename is
        # benign, but reordered/renamed keys would silently permute leaves.
        import warnings

        warnings.warn(
            "checkpoint treedef differs from the expected structure "
            f"(saved: {saved_def!r}; expected: {str(treedef)!r}); leaves are "
            "assigned by flatten order — verify the mapping is intended",
            stacklevel=2)
    return jax.tree_util.tree_unflatten(treedef, leaves)
