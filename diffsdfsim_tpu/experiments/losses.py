"""Trajectory losses shared by the experiments.

`trajectory_loss` is the nearest-time position MSE of the reference
(`experiments/trajectory_fitting/optim_sphere.py:114-160`), vectorized over
the padded (T, S) substep records: for every valid simulated record, find the
nearest-in-time valid target record and accumulate squared position error,
normalized by the number of valid records.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..physics.world import Trajectory


def trajectory_loss(
    traj: Trajectory,
    target: Trajectory,
    body: int,
    with_vel: bool = False,
    vel_weight: float = 0.0,
) -> jnp.ndarray:
    st = traj.t.reshape(-1)
    sv = traj.valid.reshape(-1)
    tt = target.t.reshape(-1)
    tv = target.valid.reshape(-1)

    big = jnp.asarray(1e9, dtype=st.dtype)
    diff = jnp.abs(st[:, None] - tt[None, :]) + big * (~tv)[None, :]
    j = jnp.argmin(diff, axis=1)

    spos = traj.pos.reshape(-1, traj.pos.shape[-2], 3)[:, body, :]
    tpos = target.pos.reshape(-1, target.pos.shape[-2], 3)[:, body, :][j]
    per = jnp.sum((spos - tpos) ** 2, axis=-1)
    if with_vel and vel_weight > 0:
        svel = traj.v.reshape(-1, traj.v.shape[-2], 6)[:, body, :]
        tvel = target.v.reshape(-1, target.v.shape[-2], 6)[:, body, :][j]
        per = per + vel_weight * jnp.sum((svel - tvel) ** 2, axis=-1)
    per = jnp.where(sv, per, 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(sv), 1)


def final_velocity_loss(final_v, target_v, body: int) -> jnp.ndarray:
    """Inertia-fitting loss (reference optim_primitives.py:198)."""
    return jnp.sum((final_v[body] - target_v[body]) ** 2)
