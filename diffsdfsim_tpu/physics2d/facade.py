"""2D physics as a planar configuration of the 3D core.

The reference ships a separate 2D stack (`lcp_physics/physics/bodies.py`
Circle/Hull/Rect, 2D contacts, 2D constraints) and a legacy 2D SDF layer
(`sdf_physics/physics/`, SURVEY §2.4) that is capability-wise superseded by
the 3D machinery. The TPU rebuild covers 2D as a thin facade over the 3D
world: bodies live in the world's x-y plane, constrained by a
``PlanarConstraint`` (v_z = 0, ω_x = ω_y = 0), with 2D shapes realized as
z-extruded SDF primitives:

- Circle(rad)        -> cylinder along z
- Rect(w, h)         -> box with unit depth

2D generalized coordinates map as p = [θ, x, y] -> quat about z + (x, y, 0),
v = [ω, vx, vy] -> ([0,0,ω], [vx,vy,0]); `to_2d_state` projects back.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..config import SimConfig, default_dtype
from ..physics.bodies import make_body
from ..physics.joints import JointBase
from ..physics.shapes import BoxShape, CylinderShape
from ..physics.world import make_world
from ..utils.quaternion import quat_from_euler


_DEPTH = 1.0


@dataclasses.dataclass(frozen=True)
class PlanarConstraint(JointBase):
    """Restricts a body to planar x-y motion with rotation about z only."""

    num_constraints: int = 3

    def rows(self, state):
        dtype = default_dtype()
        J = jnp.zeros((3, 6), dtype=dtype)
        J = J.at[0, 0].set(1.0)  # omega_x = 0
        J = J.at[1, 1].set(1.0)  # omega_y = 0
        J = J.at[2, 5].set(1.0)  # v_z = 0
        return J, None


def Circle(rad, **kw):
    """2D circle = z-extruded cylinder (reference physics/bodies.py Circle)."""
    dtype = default_dtype()
    return make_body(
        CylinderShape(jnp.asarray(rad, dtype=dtype), jnp.asarray(_DEPTH, dtype=dtype)),
        template="cube",
        **kw,
    )


def Rect(dims, **kw):
    """2D rectangle = unit-depth box (reference physics/bodies.py Rect)."""
    dtype = default_dtype()
    dims = jnp.asarray(dims, dtype=dtype)
    return make_body(
        BoxShape(jnp.concatenate([dims, jnp.asarray([_DEPTH], dtype=dtype)])),
        template="cube",
        **kw,
    )


def make_world_2d(bodies, poses_2d, vels_2d, joints=(), forces=(), no_contact=(), cfg=SimConfig()):
    """poses_2d (B,3) = [theta, x, y]; vels_2d (B,3) = [omega, vx, vy]
    (reference 2D generalized coordinates, SURVEY §1)."""
    dtype = default_dtype()
    poses_2d = jnp.asarray(poses_2d, dtype=dtype)
    vels_2d = jnp.asarray(vels_2d, dtype=dtype)
    nb = poses_2d.shape[0]

    euler = jnp.zeros((nb, 3), dtype=dtype).at[:, 2].set(poses_2d[:, 0])
    quat = quat_from_euler(euler)
    pos = jnp.concatenate([poses_2d[:, 1:], jnp.zeros((nb, 1), dtype=dtype)], axis=-1)
    poses = jnp.concatenate([quat, pos], axis=-1)

    vels = jnp.zeros((nb, 6), dtype=dtype)
    vels = vels.at[:, 2].set(vels_2d[:, 0])
    vels = vels.at[:, 3:5].set(vels_2d[:, 1:])

    # planar rows would duplicate a TotalConstraint3D's (singular Je);
    # fully-constrained bodies are already planar
    from ..physics.joints import TotalConstraint3D

    fully = {j.body1 for j in joints if isinstance(j, TotalConstraint3D)}
    joints = tuple(joints) + tuple(
        PlanarConstraint(body1=i) for i in range(nb) if i not in fully
    )
    return make_world(bodies, poses, vels, joints=joints, forces=forces,
                      no_contact=no_contact, cfg=cfg)


def to_2d_state(state):
    """Project a 3D WorldState back to 2D coords: ([theta, x, y], [w, vx, vy])."""
    w, x, y, z = state.quat[:, 0], state.quat[:, 1], state.quat[:, 2], state.quat[:, 3]
    theta = 2.0 * jnp.arctan2(z, w)
    p2 = jnp.stack([theta, state.pos[:, 0], state.pos[:, 1]], axis=-1)
    v2 = jnp.stack([state.v[:, 2], state.v[:, 3], state.v[:, 4]], axis=-1)
    return p2, v2
