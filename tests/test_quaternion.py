import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsdfsim_tpu.utils import quaternion as q


def rand_quat(key, n=8):
    v = jax.random.normal(key, (n, 4))
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def test_exp_map_identity():
    R = q.so3_exp_map(jnp.zeros((3, 3)))
    np.testing.assert_allclose(R, np.tile(np.eye(3), (3, 1, 1)), atol=1e-12)


def test_exp_map_rotation_z():
    theta = 0.3
    R = q.so3_exp_map(jnp.array([0.0, 0.0, theta]))
    expected = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    np.testing.assert_allclose(R, expected, atol=1e-12)


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (16, 3)) * 0.8
    R = q.so3_exp_map(w)
    w2 = q.so3_log_map(R)
    np.testing.assert_allclose(w, w2, atol=1e-8)


def test_exp_map_gradient_at_zero():
    # gradient through the small-angle branch must be finite and exact
    g = jax.jacobian(q.so3_exp_map)(jnp.zeros(3))
    # dR/dw at 0 equals the hat-map generators
    gen = np.zeros((3, 3, 3))
    gen[:, :, 0] = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0]])
    gen[:, :, 1] = np.array([[0, 0, 1], [0, 0, 0], [-1, 0, 0]])
    gen[:, :, 2] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 0]])
    np.testing.assert_allclose(g, gen, atol=1e-10)
    assert np.all(np.isfinite(g))


def test_quat_matrix_roundtrip():
    quats = rand_quat(jax.random.PRNGKey(1), 32)
    R = q.quat_to_matrix(quats)
    q2 = q.matrix_to_quat(R)
    # sign ambiguity: compare via |dot| = 1
    dots = jnp.abs(jnp.sum(quats * q2, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-9)


def test_quat_apply_matches_matrix():
    key = jax.random.PRNGKey(2)
    quats = rand_quat(key, 8)
    pts = jax.random.normal(jax.random.PRNGKey(3), (8, 3))
    out1 = q.quat_apply(quats, pts)
    out2 = jnp.einsum("bij,bj->bi", q.quat_to_matrix(quats), pts)
    np.testing.assert_allclose(out1, out2, atol=1e-10)


def test_quat_multiply_matches_matrix_product():
    a = rand_quat(jax.random.PRNGKey(4), 8)
    b = rand_quat(jax.random.PRNGKey(5), 8)
    R1 = q.quat_to_matrix(q.quat_multiply(a, b))
    R2 = q.quat_to_matrix(a) @ q.quat_to_matrix(b)
    np.testing.assert_allclose(R1, R2, atol=1e-10)


def test_quat_invert():
    a = rand_quat(jax.random.PRNGKey(6), 8)
    prod = q.quat_multiply(a, q.quat_invert(a))
    expected = jnp.tile(jnp.array([1.0, 0, 0, 0]), (8, 1))
    np.testing.assert_allclose(prod, expected, atol=1e-10)


def test_integrate_quat_matches_exp():
    # q' = exp(w dt) ⊗ q should rotate like R' = exp(w dt) R
    a = rand_quat(jax.random.PRNGKey(7), 8)
    w = jax.random.normal(jax.random.PRNGKey(8), (8, 3))
    dt = 0.01
    qn = q.integrate_quat(a, w, dt)
    R1 = q.quat_to_matrix(qn)
    R2 = q.so3_exp_map(w * dt) @ q.quat_to_matrix(a)
    np.testing.assert_allclose(R1, R2, atol=1e-9)


def test_random_quaternions_unit():
    quats = q.random_quaternions(jax.random.PRNGKey(9), 100, dtype=jnp.float64)
    np.testing.assert_allclose(jnp.linalg.norm(quats, axis=-1), 1.0, atol=1e-12)
    assert jnp.all(quats[:, 0] >= 0)


def test_so3_relative_angle():
    w = jnp.array([[0.0, 0.0, 0.5]])
    R1 = q.so3_exp_map(jnp.zeros((1, 3)))
    R2 = q.so3_exp_map(w)
    ang = q.so3_relative_angle(R1, R2)
    np.testing.assert_allclose(ang, 0.5, atol=1e-6)
