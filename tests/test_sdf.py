import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsdfsim_tpu.ops import sdf as s


def fd_grad(fn, pts, eps=1e-6):
    g = np.zeros_like(np.asarray(pts))
    for i in range(3):
        d = np.zeros(3)
        d[i] = eps
        g[:, i] = (np.asarray(fn(pts + d)) - np.asarray(fn(pts - d))) / (2 * eps)
    return g


def sample_pts(key, n=200, lim=1.2):
    return jax.random.uniform(key, (n, 3), minval=-lim, maxval=lim)


def _check_grad(sdf_fn, grad_fn, key, mask_fn=None):
    pts = sample_pts(key)
    g_analytic = np.asarray(grad_fn(pts))
    g_fd = fd_grad(sdf_fn, pts)
    norms = np.linalg.norm(g_fd, axis=1)
    # only compare where FD is well-defined (away from SDF kinks)
    ok = np.abs(norms - 1.0) < 1e-3
    if mask_fn is not None:
        ok &= mask_fn(np.asarray(pts))
    assert ok.sum() > 50
    np.testing.assert_allclose(g_analytic[ok], g_fd[ok], atol=1e-4)


def test_sphere_sdf_values():
    pts = jnp.array([[0.5, 0, 0], [0, 0.2, 0], [1.0, 0, 0]])
    np.testing.assert_allclose(
        s.sphere_sdf(pts, 0.5), [0.0, -0.3, 0.5], atol=1e-12
    )


def test_sphere_grad():
    _check_grad(
        lambda p: s.sphere_sdf(p, 0.5),
        lambda p: s.sphere_sdf_grad(p, 0.5),
        jax.random.PRNGKey(0),
    )


def test_box_sdf_values():
    dims = jnp.array([1.0, 0.5, 2.0])
    pts = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.5, 0.25, 1.0]])
    vals = s.box_sdf(pts, dims)
    np.testing.assert_allclose(vals, [-0.25, 0.5, 0.0], atol=1e-12)


def test_box_grad():
    dims = jnp.array([1.0, 0.5, 2.0])
    _check_grad(
        lambda p: s.box_sdf(p, dims),
        lambda p: s.box_sdf_grad(p, dims),
        jax.random.PRNGKey(1),
    )


def test_cylinder_sdf_values():
    pts = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0], [0.0, 0.0, 0.6]])
    vals = s.cylinder_sdf(pts, 0.5, 1.0)
    np.testing.assert_allclose(vals, [-0.5, 0.0, 0.1], atol=1e-12)


def test_cylinder_grad():
    _check_grad(
        lambda p: s.cylinder_sdf(p, 0.5, 1.0),
        lambda p: s.cylinder_sdf_grad(p, 0.5, 1.0),
        jax.random.PRNGKey(2),
        # exclude the z-axis where the lateral direction is undefined
        mask_fn=lambda p: np.linalg.norm(p[:, :2], axis=1) > 1e-2,
    )


def test_bowl_sdf_shell():
    r, d = 0.5, 0.05
    # point on the outer shell bottom: z = r/2 - (r + d)
    p = jnp.array([[0.0, 0.0, 0.5 / 2 - 0.55]])
    np.testing.assert_allclose(s.bowl_sdf(p, r, d), [0.0], atol=1e-9)
    # center of the bowl cavity is inside empty space, sdf > 0
    assert s.bowl_sdf(jnp.array([[0.0, 0.0, 0.25]]), r, d)[0] > 0


def test_bowl_grad():
    # The bowl gradient is (like the reference's) a heuristic normal above
    # the rim plane; it is exact below the shifted center (z < r/2), so FD
    # comparison is restricted there. Everywhere else we only require unit
    # normals.
    _check_grad(
        lambda p: s.bowl_sdf(p, 0.5, 0.05),
        lambda p: s.bowl_sdf_grad(p, 0.5, 0.05),
        jax.random.PRNGKey(3),
        mask_fn=lambda p: (np.linalg.norm(p[:, :2], axis=1) > 1e-2)
        & (p[:, 2] < 0.0),
    )
    pts = sample_pts(jax.random.PRNGKey(33), 100)
    g = np.asarray(s.bowl_sdf_grad(pts, 0.5, 0.05))
    np.testing.assert_allclose(np.linalg.norm(g, axis=1), 1.0, atol=1e-6)


def test_brick_matches_box_limit():
    dims = jnp.array([1.0, 0.8, 0.6])
    pts = sample_pts(jax.random.PRNGKey(4), 100)
    # r -> 0 brick converges to box
    np.testing.assert_allclose(
        s.brick_sdf(pts, dims, 0.0), s.box_sdf(pts, dims), atol=1e-9
    )


def test_rounded_sdf():
    pts = sample_pts(jax.random.PRNGKey(5), 50)
    rounded = s.rounded_sdf(s.sphere_sdf)(pts, 0.1, 0.4)
    np.testing.assert_allclose(rounded, s.sphere_sdf(pts, 0.5), atol=1e-12)


def test_grid_sdf_matches_analytic():
    res = 33
    lin = jnp.linspace(-1, 1, res)
    grid_pts = jnp.stack(jnp.meshgrid(lin, lin, lin, indexing="ij"), axis=-1)
    grid = s.sphere_sdf(grid_pts.reshape(-1, 3), 0.5).reshape(res, res, res)

    pts = sample_pts(jax.random.PRNGKey(6), 100, lim=0.9)
    vals = s.grid_sdf(pts, grid)
    expected = s.sphere_sdf(pts, 0.5)
    np.testing.assert_allclose(vals, expected, atol=5e-3)


def test_grid_sdf_oob():
    grid = jnp.zeros((8, 8, 8))
    pts = jnp.array([[2.0, 0.0, 0.0]])
    np.testing.assert_allclose(s.grid_sdf(pts, grid), [1.0])


def test_grid_sdf_custom_vjp():
    res = 33
    lin = jnp.linspace(-1, 1, res)
    grid_pts = jnp.stack(jnp.meshgrid(lin, lin, lin, indexing="ij"), axis=-1)
    grid = s.sphere_sdf(grid_pts.reshape(-1, 3), 0.5).reshape(res, res, res)
    pts = jnp.array([[0.3, 0.2, 0.1]])
    g = jax.grad(lambda p: jnp.sum(s.grid_sdf(p, grid)))(pts)
    expected = np.asarray(pts / jnp.linalg.norm(pts))
    np.testing.assert_allclose(g, expected, atol=1e-2)
