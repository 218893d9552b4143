"""Multi-chip scaling: vmap over seeds/scenes, sharded over a device mesh.

The reference has NO distributed execution of any kind (SURVEY.md §2.9: no
torch.distributed/NCCL/MPI; "multi-node" = embarrassingly parallel sacred job
lists aggregated by eval scripts). The TPU-native equivalent is:

- the optimization-seed / scene batch is a leading ``vmap`` axis over the
  jitted rollout (the per-seed state is KBs, so no parameter sharding is ever
  warranted)
- multi-chip scaling shards that batch axis over a 1-D ``jax.sharding.Mesh``
  ("batch" axis); XLA inserts the ICI collectives (psum for reduced losses)
  automatically from the sharding annotations.

This replaces the reference's `generate_*.sh` one-process-per-seed job farms
with one SPMD program.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "batch") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch(tree, mesh: Mesh, axis_name: str = "batch"):
    """Place a pytree with a leading batch axis onto the mesh, sharded on
    that axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batched_rollout(
    rollout_fn: Callable,
    mesh: Mesh | None = None,
    axis_name: str = "batch",
):
    """Lift a per-seed rollout/loss fn over a leading batch axis, jitted and
    (optionally) sharded over `mesh`.

    `rollout_fn(seed_args) -> outputs`; returns a function over stacked
    seed_args with outputs sharded on the batch axis."""
    vf = jax.vmap(rollout_fn)
    if mesh is None:
        return jax.jit(vf)
    in_sharding = NamedSharding(mesh, P(axis_name))
    out_sharding = NamedSharding(mesh, P(axis_name))
    return jax.jit(vf, in_shardings=in_sharding, out_shardings=out_sharding)
