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
from ..physics.shapes import BoxShape, CylinderShape, ShapeBase
from ..physics.world import make_world
from ..utils.quaternion import quat_from_euler
from flax import struct


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


def polygon_sdf_2d(p, verts):
    """Exact signed distance to a 2D polygon (verts (V,2), CCW), batched over
    p (...,2) — the standard winding/segment-distance formulation."""
    v = verts
    vj = jnp.roll(verts, -1, axis=0)  # next vertex per edge
    e = vj - v  # (V,2)
    w = p[..., None, :] - v  # (...,V,2)
    t = jnp.clip(
        jnp.sum(w * e, axis=-1) / jnp.maximum(jnp.sum(e * e, axis=-1), 1e-12),
        0.0, 1.0,
    )
    b = w - t[..., None] * e
    d2 = jnp.min(jnp.sum(b * b, axis=-1), axis=-1)
    # winding-parity sign
    c1 = p[..., None, 1] >= v[:, 1]
    c2 = p[..., None, 1] < vj[:, 1]
    c3 = e[:, 0] * w[..., 1] > e[:, 1] * w[..., 0]
    flip = (c1 & c2 & c3) | (~c1 & ~c2 & ~c3)
    s = 1.0 - 2.0 * (jnp.sum(flip, axis=-1) % 2).astype(p.dtype)
    return s * jnp.sqrt(jnp.maximum(d2, 1e-24))


@struct.dataclass
class HullShape(ShapeBase):
    """2D convex hull body (reference `lcp_physics` Hull): an extruded
    polygon SDF. `verts2d` (V,2) normalized by `scale_`."""

    verts2d: jnp.ndarray
    scale_: jnp.ndarray

    def scale(self):
        return self.scale_

    def sdf(self, pts):
        d2 = polygon_sdf_2d(pts[..., :2], self.verts2d)
        qz = jnp.abs(pts[..., 2]) - (_DEPTH / 2.0) / self.scale_
        q = jnp.stack([d2, qz], axis=-1)
        return jnp.sqrt(
            jnp.maximum(jnp.sum(jnp.maximum(q, 0.0) ** 2, axis=-1), 1e-24)
        ) + jnp.minimum(jnp.max(q, axis=-1), 0.0)


def Hull(verts2d, **kw):
    """2D convex polygon body (reference physics/bodies.py Hull). `verts2d`
    are CCW, centered at the body origin."""
    dtype = default_dtype()
    v = jnp.asarray(verts2d, dtype=dtype)
    scale = jnp.maximum(jnp.max(jnp.linalg.norm(v, axis=-1)), _DEPTH / 2.0) * 1.5
    shape = HullShape(verts2d=v / scale, scale_=scale)
    return make_body(shape, template="cube", **kw)


@struct.dataclass
class GridShape2D(ShapeBase):
    """2D grid-SDF body (reference legacy ``SDFGrid``,
    sdf_physics/physics/bodies.py:91-283): a (H, W) lattice of normalized
    signed distances over [-0.5, 0.5]^2, bilinearly interpolated and
    z-extruded to unit depth. Differentiable w.r.t. the grid values (the
    reference's DiffSDFGrid role) through the gather-based interpolation."""

    grid: jnp.ndarray  # (H, W) signed distances normalized by scale_
    scale_: jnp.ndarray
    coord_scale: jnp.ndarray  # body-normalized -> grid-normalized coords

    def scale(self):
        return self.scale_

    def sdf(self, pts):
        from ..ops.marching2d import bilinear_interp

        d2 = bilinear_interp(self.grid, pts[..., :2] * self.coord_scale)
        qz = jnp.abs(pts[..., 2]) - (_DEPTH / 2.0) / self.scale_
        q = jnp.stack([d2, qz], axis=-1)
        return jnp.sqrt(
            jnp.maximum(jnp.sum(jnp.maximum(q, 0.0) ** 2, axis=-1), 1e-24)
        ) + jnp.minimum(jnp.max(q, axis=-1), 0.0)


def GridSDF2D(grid, scale, **kw):
    """Body from a 2D SDF grid sampled on the reference's node lattice:
    `grid` (H, W) holds signed distances in world units over the
    [-scale/2, scale/2]^2 square. Surface mesh comes from the framework's
    template projection onto the interpolated field (the reference instead
    runs marching squares — available as ops.marching2d.marching_squares
    for contour extraction/visualization)."""
    dtype = default_dtype()
    g = jnp.asarray(grid, dtype=dtype)
    scale = jnp.asarray(scale, dtype=dtype)
    # body frame must also cover the unit extrusion depth; grid coordinates
    # keep their own span (coord_scale maps between the two)
    eff_scale = jnp.maximum(scale, _DEPTH) * 1.01
    shape = GridShape2D(
        grid=g / eff_scale, scale_=eff_scale, coord_scale=eff_scale / scale
    )
    return make_body(shape, template="cube", **kw)


def contour_2d(grid, scale):
    """Marching-squares iso-contour of a world-units 2D SDF grid: masked
    fixed-size segments in world coordinates (reference
    SDFGrid.marching_squares, bodies.py:117-196)."""
    from ..ops.marching2d import marching_squares

    segs, valid = marching_squares(jnp.asarray(grid, dtype=default_dtype()))
    return segs * scale, valid


@dataclasses.dataclass(frozen=True)
class RevoluteJoint2D(JointBase):
    """Planar hinge (reference 2D Joint, physics/constraints.py:35-75):
    anchor-point velocities of both bodies match in the x-y plane. Local
    anchor offsets are body-frame vectors (z = 0)."""

    r1_local: tuple = (0.0, 0.0)
    r2_local: tuple = (0.0, 0.0)
    num_constraints: int = 2

    def rows(self, state):
        from ..utils.quaternion import quat_apply
        from ..utils.spherical import skew_symmetric_mat

        dtype = default_dtype()
        eye = jnp.eye(3, dtype=dtype)
        r1 = quat_apply(state.quat[self.body1],
                        jnp.asarray([*self.r1_local, 0.0], dtype=dtype))
        J1 = jnp.concatenate([-skew_symmetric_mat(r1), eye], axis=1)[:2]
        J2 = None
        if self.body2 is not None:
            r2 = quat_apply(state.quat[self.body2],
                            jnp.asarray([*self.r2_local, 0.0], dtype=dtype))
            J2 = -jnp.concatenate([-skew_symmetric_mat(r2), eye], axis=1)[:2]
        return J1, J2


@dataclasses.dataclass(frozen=True)
class FixedJoint2D(RevoluteJoint2D):
    """Planar weld (reference FixedJoint, physics/constraints.py:78-114):
    hinge rows + equal z angular velocity."""

    num_constraints: int = 3

    def rows(self, state):
        J1, J2 = super().rows(state)
        dtype = default_dtype()
        rot_row = jnp.zeros((1, 6), dtype=dtype).at[0, 2].set(1.0)
        J1 = jnp.concatenate([J1, rot_row])
        if J2 is not None:
            J2 = jnp.concatenate([J2, -rot_row])
        return J1, J2


def make_world_2d(bodies, poses_2d, vels_2d, joints=(), forces=(), no_contact=(),
                  cfg=SimConfig(), narrowphase="fw"):
    """poses_2d (B,3) = [theta, x, y]; vels_2d (B,3) = [omega, vx, vy]
    (reference 2D generalized coordinates, SURVEY §1).

    `narrowphase="analytic"` switches supported pairs (Circle/Rect/Hull) to
    the reference's analytic 2D contact algorithms (circle-circle,
    circle-hull, hull-hull SAT + clipping — physics2d/narrowphase.py) as the
    candidate generator; "fw" keeps the 3D Frank-Wolfe search on the
    extruded meshes."""
    if narrowphase == "analytic":
        cfg = cfg.replace(narrowphase2d=True)
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
