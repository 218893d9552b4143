"""Force / torque arrow rendering (reference
`sdf_physics/physics3d/bodies.py:513-593`: Body3D.render(render_forces=True,
render_torques=True) adds a cylinder+cone mesh per applied force/torque).

TPU-native redesign: the raymarch renderer has no meshes, so an arrow is an
analytic SDF (capped shaft cylinder + cone head along local +z) wrapped in a
lightweight render-only body that duck-types BodyDef's `scale()` /
`query_sdfs()` surface. `force_arrows(...)` builds one arrow per body whose
net applied force (linear part) / torque (angular part) is non-zero, posed
at the body origin and aligned with the vector — exactly the reference's
arrow placement semantics (force_scale/torque_scale multiply the length).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import default_dtype
from ..physics.engine import apply_forces


def _arrow_sdf(pts, length, shaft_r, head_r, head_len):
    """SDF of an arrow along +z: shaft z in [0, length], cone head from
    z=length to z=length+head_len. All args in the same (normalized) units
    as pts."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    rho = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-24))

    # capped cylinder (iq's exact formula)
    half = length / 2.0
    dxy = rho - shaft_r
    dz = jnp.abs(z - half) - half
    outside = jnp.sqrt(
        jnp.maximum(dxy, 0.0) ** 2 + jnp.maximum(dz, 0.0) ** 2
    )
    inside = jnp.minimum(jnp.maximum(dxy, dz), 0.0)
    d_shaft = outside + inside

    # cone head: linear radius taper head_r -> 0 over [length, length+head_len]
    t = jnp.clip((z - length) / jnp.maximum(head_len, 1e-9), 0.0, 1.0)
    r_at = head_r * (1.0 - t)
    # distance approximation: radial excess against the local taper, capped
    # axially (adequate for rendering; not used by physics)
    d_rad = (rho - r_at) * jnp.cos(jnp.arctan2(head_r, head_len))
    d_ax = jnp.maximum(length - z, z - (length + head_len))
    d_head = jnp.maximum(d_rad, d_ax)

    return jnp.minimum(d_shaft, d_head)


class ArrowBody(NamedTuple):
    """Render-only pseudo-body: an arrow of world length `length` along the
    local +z axis, origin at the tail. Duck-types the BodyDef surface the
    raymarcher uses (`scale()`, `query_sdfs()`)."""

    length: jnp.ndarray
    shaft_r: jnp.ndarray
    head_r: jnp.ndarray
    head_len: jnp.ndarray

    def scale(self):
        total = self.length + self.head_len
        return jnp.maximum(total, self.head_r * 2.0) * 1.05

    def query_sdfs(self, pts_loc, return_grads=True):
        s = self.scale()
        f = lambda p: _arrow_sdf(
            p, self.length / s, self.shaft_r / s, self.head_r / s,
            self.head_len / s,
        )
        d = f(pts_loc / s) * s
        if not return_grads:
            return d
        # gradient via autodiff on the scalar SDF (render-only path)
        grad = jax.vmap(jax.grad(lambda p: _arrow_sdf(
            p / s, self.length / s, self.shaft_r / s, self.head_r / s,
            self.head_len / s,
        )))(pts_loc.reshape(-1, 3)).reshape(pts_loc.shape)
        return d, grad


def _quat_align_z(v):
    """Quaternion (wxyz) rotating +z onto unit vector v."""
    z = jnp.asarray([0.0, 0.0, 1.0], dtype=v.dtype)
    c = jnp.dot(z, v)
    axis = jnp.cross(z, v)
    an = jnp.linalg.norm(axis)
    # stable half-angle construction; fall back to x-axis flip for v ~ -z
    w = jnp.sqrt(jnp.maximum((1.0 + c) / 2.0, 0.0))
    s = jnp.sqrt(jnp.maximum((1.0 - c) / 2.0, 0.0))
    xyz = jnp.where(an > 1e-8, axis / jnp.maximum(an, 1e-12) * s,
                    jnp.asarray([1.0, 0.0, 0.0], dtype=v.dtype) * s)
    return jnp.concatenate([w[None], xyz])


def force_arrows(
    bodies,
    forces,
    state_t,
    quat,
    pos,
    render_forces: bool = True,
    render_torques: bool = False,
    force_scale: float = 0.1,
    torque_scale: float = 0.1,
    shaft_r: float = 0.05,
    head_r: float = 0.1,
    head_len: float = 0.15,
    min_norm: float = 1e-6,
):
    """Build arrow pseudo-bodies for each body's net applied force/torque at
    time `state_t` (reference Body3D.render force/torque arms). Returns
    (arrow_bodies, arrow_quats (A,4), arrow_poss (A,3)) — append them to the
    render call's body/pose lists. Host-side helper (concrete values)."""
    dtype = default_dtype()
    af = apply_forces(bodies, forces, jnp.asarray(state_t, dtype=dtype))
    af = af.reshape(len(bodies), 6)
    out_bodies, out_q, out_p = [], [], []
    specs = []
    if render_forces:
        specs.append((af[:, 3:], force_scale))
    if render_torques:
        specs.append((af[:, :3], torque_scale))
    for vecs, vscale in specs:
        for b in range(len(bodies)):
            v = vecs[b]
            n = float(jnp.linalg.norm(v))
            if n <= min_norm:
                continue
            vhat = v / n
            length = jnp.asarray(n * vscale, dtype=dtype)
            arrow = ArrowBody(
                length=length,
                shaft_r=jnp.asarray(shaft_r, dtype=dtype),
                head_r=jnp.asarray(head_r, dtype=dtype),
                head_len=jnp.asarray(head_len, dtype=dtype),
            )
            out_bodies.append(arrow)
            out_q.append(_quat_align_z(vhat.astype(dtype)))
            out_p.append(pos[b].astype(dtype))
    if not out_bodies:
        return [], jnp.zeros((0, 4), dtype=dtype), jnp.zeros((0, 3), dtype=dtype)
    return out_bodies, jnp.stack(out_q), jnp.stack(out_p)
