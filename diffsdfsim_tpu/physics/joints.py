"""Equality constraints (joints) for the 3D world.

Ports of the reference 3D constraints (`sdf_physics/physics3d/constraints.py`):
X/Y/ZConstraint (1 row each), RotConstraint3D (3), TotalConstraint3D (6),
GripperJoint (5, state-dependent). Each joint exposes

    rows(spec_bodies, state) -> (J1 (r,6), J2 (r,6) | None)

with static body indices; the world assembles Je (neq, 6B) by static
scatter. Velocity layout per body is [omega(3), v(3)], matching the
reference generalized coordinates.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..config import default_dtype
from ..utils.quaternion import quat_apply
from ..utils.spherical import normalize, orthogonal, skew_symmetric_mat


@dataclasses.dataclass(frozen=True)
class JointBase:
    body1: int
    body2: int | None = None
    num_constraints: int = 0

    def rows(self, state):
        raise NotImplementedError


def _unit_row(idx, dtype):
    J = jnp.zeros((1, 6), dtype=dtype)
    return J.at[0, idx].set(1.0)


@dataclasses.dataclass(frozen=True)
class XConstraint3D(JointBase):
    """constraints.py:84-107 — blocks linear motion along x."""

    num_constraints: int = 1

    def rows(self, state):
        return _unit_row(3, default_dtype()), None


@dataclasses.dataclass(frozen=True)
class YConstraint3D(JointBase):
    num_constraints: int = 1

    def rows(self, state):
        return _unit_row(4, default_dtype()), None


@dataclasses.dataclass(frozen=True)
class ZConstraint3D(JointBase):
    num_constraints: int = 1

    def rows(self, state):
        return _unit_row(5, default_dtype()), None


@dataclasses.dataclass(frozen=True)
class RotConstraint3D(JointBase):
    """constraints.py:110-128 — blocks all angular motion."""

    num_constraints: int = 3

    def rows(self, state):
        dtype = default_dtype()
        J = jnp.concatenate([jnp.eye(3, dtype=dtype), jnp.zeros((3, 3), dtype=dtype)], axis=1)
        return J, None


@dataclasses.dataclass(frozen=True)
class TotalConstraint3D(JointBase):
    """constraints.py:131-145 — blocks all motion (J = I6)."""

    num_constraints: int = 6

    def rows(self, state):
        return jnp.eye(6, dtype=default_dtype()), None


@dataclasses.dataclass(frozen=True)
class GripperJoint(JointBase):
    """constraints.py:148-195 — equal angular velocity + blocked lateral
    linear motion (5 rows); only relative motion along `axis` allowed."""

    axis: tuple = (1.0, 0.0, 0.0)
    num_constraints: int = 5

    def rows(self, state):
        dtype = default_dtype()
        q1 = state.quat[self.body1]
        pos1 = state.pos[self.body1]
        pos2 = state.pos[self.body2]
        # joint anchored at body1's origin (reference update_pos keeps
        # pos = body1.pos, so pos1_off = 0, pos2_off = pos - body2.pos)
        p1_off = jnp.zeros(3, dtype=dtype)
        p2_off = pos1 - pos2

        ax = quat_apply(q1, jnp.asarray(self.axis, dtype=dtype))
        dir1 = orthogonal(ax)
        dir2 = jnp.cross(dir1, ax)
        dirs = normalize(jnp.stack([dir1, dir2]))

        eye3 = jnp.eye(3, dtype=dtype)
        J1 = jnp.zeros((5, 6), dtype=dtype)
        J2 = jnp.zeros((5, 6), dtype=dtype)
        J1 = J1.at[:3, :3].set(eye3)
        J2 = J2.at[:3, :3].set(-eye3)
        J1 = J1.at[3:].set(dirs @ jnp.concatenate([-skew_symmetric_mat(p1_off), eye3], axis=1))
        J2 = J2.at[3:].set(dirs @ jnp.concatenate([skew_symmetric_mat(p2_off), -eye3], axis=1))
        return J1, J2
