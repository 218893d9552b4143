"""Pure-JAX quaternion / SO(3) library.

TPU-native replacement for the pytorch3d.transforms calls used by the
reference (`sdf_physics/physics3d/bodies.py:25-26`, `world.py:28`):
``so3_exponential_map``, ``quaternion_to_matrix``, ``matrix_to_quaternion``,
``quaternion_multiply``, ``quaternion_apply``, ``quaternion_invert``,
``axis_angle_to_matrix``, ``random_quaternions``, ``so3_relative_angle``.

Conventions: quaternions are wxyz (scalar-first), matching the reference.
All functions broadcast over leading batch dimensions and are fully
differentiable (closed-form exp map uses an even-power Taylor expansion near
zero so gradients are exact and finite at the identity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SMALL = 1e-6


def _sinc_sq(x2):
    """sin(sqrt(x2))/sqrt(x2) as a smooth function of x2 (NaN-safe grads at 0)."""
    small = 1.0 - x2 / 6.0 + x2 * x2 / 120.0
    safe = jnp.where(x2 < _SMALL**2, 1.0, x2)
    x = jnp.sqrt(safe)
    return jnp.where(x2 < _SMALL**2, small, jnp.sin(x) / x)


def _cosc_sq(x2):
    """(1 - cos(sqrt(x2)))/x2 as a smooth function of x2."""
    small = 0.5 - x2 / 24.0 + x2 * x2 / 720.0
    safe = jnp.where(x2 < _SMALL**2, 1.0, x2)
    return jnp.where(x2 < _SMALL**2, small, (1.0 - jnp.cos(jnp.sqrt(safe))) / safe)


def _sinc(x):
    """sin(x)/x with an accurate Taylor branch at 0 (safe gradients)."""
    return _sinc_sq(x * x)


def hat(v):
    """Skew-symmetric matrix [v]x of a 3-vector; batched over leading dims."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp_map(log_rot):
    """Rodrigues' formula: axis-angle 3-vector -> rotation matrix (...,3,3).

    Matches pytorch3d.so3_exponential_map used at reference world.py:155-156.
    """
    theta2 = jnp.sum(log_rot * log_rot, axis=-1)
    K = hat(log_rot)
    KK = K @ K
    s = _sinc_sq(theta2)[..., None, None]
    c = _cosc_sq(theta2)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=log_rot.dtype), K.shape)
    return eye + s * K + c * KK


axis_angle_to_matrix = so3_exp_map


def so3_log_map(R):
    """Rotation matrix -> axis-angle 3-vector (principal branch)."""
    cos_theta = jnp.clip((jnp.trace(R, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # w = 2 sin(theta) * axis ; near 0, w / 2 -> log_rot
    scale = jnp.where(theta < _SMALL, 0.5, theta / (2.0 * jnp.sin(jnp.where(theta < _SMALL, 1.0, theta))))
    return w * scale[..., None]


def quat_to_matrix(q):
    """wxyz quaternion -> rotation matrix (...,3,3). Normalizes internally."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two = jnp.asarray(2.0, dtype=q.dtype)
    return jnp.stack(
        [
            jnp.stack([1 - two * (y * y + z * z), two * (x * y - w * z), two * (x * z + w * y)], axis=-1),
            jnp.stack([two * (x * y + w * z), 1 - two * (x * x + z * z), two * (y * z - w * x)], axis=-1),
            jnp.stack([two * (x * z - w * y), two * (y * z + w * x), 1 - two * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R):
    """Rotation matrix -> wxyz quaternion (w >= 0 branchless Shepperd)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-30))

    # four candidate constructions, pick the numerically best
    qw0 = safe_sqrt(1.0 + tr) / 2.0
    c0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)], axis=-1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    c1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)], axis=-1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    c2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)], axis=-1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    c3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3], axis=-1)

    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2).squeeze(-2)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_multiply(a, b):
    """Hamilton product a*b of wxyz quaternions (batched)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_invert(q):
    """Inverse of a unit wxyz quaternion (conjugate)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_apply(q, pts):
    """Rotate point(s) by quaternion: q ⊗ [0,p] ⊗ q⁻¹, broadcast over pts."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w = q[..., :1]
    u = q[..., 1:]
    # v' = v + 2w (u×v) + 2 u×(u×v)
    uv = jnp.cross(jnp.broadcast_to(u, pts.shape), pts)
    uuv = jnp.cross(jnp.broadcast_to(u, pts.shape), uv)
    return pts + 2.0 * (w * uv + uuv)


def quat_exp_map(omega_dt):
    """Axis-angle 3-vector -> unit quaternion exp([0, w/2])."""
    half_sq = jnp.sum(omega_dt * omega_dt, axis=-1, keepdims=True) / 4.0
    safe = jnp.where(half_sq < _SMALL**2, 1.0, half_sq)
    w = jnp.where(
        half_sq < _SMALL**2,
        1.0 - half_sq / 2.0 + half_sq * half_sq / 24.0,
        jnp.cos(jnp.sqrt(safe)),
    )
    xyz = omega_dt * 0.5 * _sinc_sq(half_sq)
    return jnp.concatenate([w, xyz], axis=-1)


def integrate_quat(q, omega, dt):
    """q_{t+dt} = exp(omega*dt) ⊗ q, matching reference Body3D.move
    (`physics3d/bodies.py:488-496`: matrix_to_quaternion(so3_exp(w dt)) ⊗ q).
    """
    return quat_multiply(quat_exp_map(omega * dt), q)


def random_quaternions(key, n, dtype=jnp.float32):
    """Uniform random unit quaternions (wxyz), matching pytorch3d semantics."""
    q = jax.random.normal(key, (n, 4), dtype=dtype)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., :1] < 0, -q, q)


def so3_relative_angle(R1, R2):
    """Angle of R1ᵀ R2 (batched) — eval metric in optim_pointcloud.py:27."""
    R = jnp.swapaxes(R1, -1, -2) @ R2
    cos = jnp.clip((jnp.trace(R, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    return jnp.arccos(cos)


def quat_from_euler(euler, style="wxyz"):
    """Euler angles (phi, the, psi) -> quaternion; port of reference `quat`
    (`physics3d/utils.py:207-221`)."""
    phi, the, psi = euler[..., 0] * 0.5, euler[..., 1] * 0.5, euler[..., 2] * 0.5
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    cthe, sthe = jnp.cos(the), jnp.sin(the)
    cpsi, spsi = jnp.cos(psi), jnp.sin(psi)
    w = cphi * cthe * cpsi + sphi * sthe * spsi
    x = sphi * cthe * cpsi - cphi * sthe * spsi
    y = cphi * sthe * cpsi + sphi * cthe * spsi
    z = cphi * cthe * spsi - sphi * sthe * cpsi
    if style == "xyzw":
        return jnp.stack([x, y, z, w], axis=-1)
    return jnp.stack([w, x, y, z], axis=-1)


def rotation_2d(theta):
    """2D rotation matrix (reference `physics/utils.py` rotation_matrix)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2)
