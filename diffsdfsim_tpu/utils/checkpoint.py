"""Simulation state checkpoint/restore.

The reference leaves `World.save_state/load_state` unimplemented
(`lcp_physics/physics/world.py:503-510` raise NotImplementedError); its only
persistence is sacred run dirs and pickled histories (SURVEY §5.4). The TPU
rebuild makes checkpointing trivial because the full simulation state is one
pytree: serialize any `WorldState` (or optimizer state, trajectory, ...) to
a single file and restore it bit-exactly.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def save_state(path, tree):
    """Serialize a pytree of arrays (WorldState, optimizer state, ...)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    payload = {
        "leaves": [np.asarray(l) for l in leaves],
        "treedef": pickle.dumps(treedef),
    }
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_state(path, like=None):
    """Restore a pytree saved by save_state. If `like` is given, its treedef
    and dtypes are used (safe against pickled-treedef version drift)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    leaves = [jnp.asarray(l) for l in payload["leaves"]]
    if like is not None:
        like_leaves, treedef = jax.tree_util.tree_flatten(like)
        assert len(like_leaves) == len(leaves), "checkpoint structure mismatch"
        leaves = [jnp.asarray(l, dtype=ll.dtype) for l, ll in zip(leaves, like_leaves)]
    else:
        treedef = pickle.loads(payload["treedef"])
    return jax.tree_util.tree_unflatten(treedef, leaves)
