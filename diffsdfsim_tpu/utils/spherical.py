"""Coordinate helpers: spherical/polar conversions, orthogonals, 2D cross.

Ports of the small math helpers in the reference
(`sdf_physics/physics3d/utils.py:224-267`, `lcp_physics/physics/utils.py`).
"""

from __future__ import annotations

import jax.numpy as jnp


def cart_to_spherical(v, positive=True):
    """3-vector -> (r, theta, phi); reference `physics3d/utils.py:224-235`."""
    r = jnp.linalg.norm(v, axis=-1)
    phi = jnp.arctan2(v[..., 1], v[..., 0])
    theta = jnp.arctan2(v[..., 2], jnp.linalg.norm(v[..., :2], axis=-1))
    if positive:
        two_pi = 2.0 * jnp.pi
        theta = jnp.where(theta < 0, theta + two_pi, theta)
        phi = jnp.where(phi < 0, phi + two_pi, phi)
    return r, theta, phi


def spherical_to_cart(r, theta, phi):
    rcos = r * jnp.cos(theta)
    return jnp.stack([rcos * jnp.cos(phi), rcos * jnp.sin(phi), r * jnp.sin(theta)], axis=-1)


def cart_to_polar(v, positive=True):
    r = jnp.linalg.norm(v, axis=-1)
    theta = jnp.arctan2(v[..., 1], v[..., 0])
    if positive:
        theta = jnp.where(theta < 0, theta + 2.0 * jnp.pi, theta)
    return r, theta


def polar_to_cart(r, theta):
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def orthogonal(v):
    """Any vector orthogonal to v (3D); port of `physics3d/utils.py:247-256`:
    cross v with the coordinate axis least aligned with it."""
    eye = jnp.eye(3, dtype=v.dtype)
    corr = jnp.abs(eye @ v[..., None]).squeeze(-1)
    idx = jnp.argmin(corr, axis=-1)
    axis = eye[idx]
    return jnp.cross(axis, v)


def left_orthogonal(v):
    """2D left-orthogonal (reference `physics/utils.py` left_orthogonal)."""
    return jnp.stack([v[..., 1], -v[..., 0]], axis=-1)


def skew_symmetric_mat(v):
    """3x3 skew matrix; port of `physics3d/utils.py:259-267`."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def cross_2d(a, b):
    """Scalar z-component of the 2D cross product."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def normalize(v, axis=-1, eps=1e-12):
    """L2-normalize along axis (torch.nn.functional.normalize semantics:
    division by max(norm, eps), so zero vectors map to zero).

    NaN-safe gradients: the norm is computed as sqrt(max(sum v², eps²)), so
    d/dv is finite at v = 0 (where plain jnp.linalg.norm has a NaN
    derivative that would poison masked-out lanes via 0 * NaN)."""
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    n = jnp.sqrt(jnp.maximum(n2, eps * eps))
    return v / n
