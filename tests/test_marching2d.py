"""2D grid-SDF layer: marching squares + bilinear grid bodies (reference
legacy ``SDFGrid``, sdf_physics/physics/bodies.py:91-283)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.ops.marching2d import (
    bilinear_interp,
    grid_from_sdf_fn,
    marching_squares,
)


def _circle_grid(res=33, rad=0.3):
    return grid_from_sdf_fn(
        lambda p: jnp.sqrt(jnp.sum(p**2, axis=-1)) - rad, res
    )


def test_bilinear_matches_nodes_and_interpolates():
    g = _circle_grid(17)
    xs = jnp.linspace(-0.5, 0.5, 17)
    # exact at nodes
    for i, j in [(0, 0), (8, 8), (3, 12)]:
        v = bilinear_interp(g, jnp.array([xs[i], xs[j]]))
        np.testing.assert_allclose(float(v), float(g[i, j]), atol=1e-6)
    # midpoint of a cell = mean of its 4 corners
    mid = jnp.array([(xs[3] + xs[4]) / 2, (xs[5] + xs[6]) / 2])
    v = bilinear_interp(g, mid)
    np.testing.assert_allclose(
        float(v), float((g[3, 5] + g[3, 6] + g[4, 5] + g[4, 6]) / 4), atol=1e-6
    )


def test_bilinear_out_of_range_grows():
    g = _circle_grid(17)
    inside = bilinear_interp(g, jnp.array([0.0, 0.0]))
    border = bilinear_interp(g, jnp.array([0.5, 0.0]))
    beyond = bilinear_interp(g, jnp.array([0.9, 0.0]))
    assert float(beyond) > float(border) > float(inside)


def test_marching_squares_circle():
    rad = 0.3
    g = _circle_grid(65, rad)
    segs, valid = marching_squares(g)
    pts = np.asarray(segs[np.asarray(valid)]).reshape(-1, 2)
    assert pts.shape[0] > 50
    r = np.linalg.norm(pts, axis=-1)
    # contour vertices of a linearly-interpolated circle SDF lie on r = rad
    np.testing.assert_allclose(r, rad, atol=2e-3)
    # contour length ~ circumference (each segment counted once)
    seg_np = np.asarray(segs)[np.asarray(valid)]
    length = np.sum(np.linalg.norm(seg_np[:, 1] - seg_np[:, 0], axis=-1))
    np.testing.assert_allclose(length, 2 * np.pi * rad, rtol=2e-2)


def test_marching_squares_empty_and_full():
    segs, valid = marching_squares(jnp.ones((9, 9)))
    assert not bool(valid.any())
    segs, valid = marching_squares(-jnp.ones((9, 9)))
    assert not bool(valid.any())


def test_grid_body_rolls_like_circle():
    """A circle-grid 2D body dropped on the floor must land at the same rest
    height as the analytic Circle body (grid field == analytic field up to
    interpolation error)."""
    from diffsdfsim_tpu.config import SimConfig
    from diffsdfsim_tpu.physics import Gravity3D, TotalConstraint3D, rollout
    from diffsdfsim_tpu.physics2d import Circle, GridSDF2D, Rect, make_world_2d

    rad = 0.4
    scale = 2.0
    res = 65
    xs = jnp.linspace(-scale / 2, scale / 2, res)
    px, py = jnp.meshgrid(xs, xs, indexing="ij")
    grid = jnp.sqrt(px**2 + py**2) - rad

    cfg = SimConfig(
        fric_dirs=4, max_contacts_per_pair=2, max_contacts_total=4,
        mesh_subdiv=2, max_substeps=3, max_bisect=6,
    )

    def drop(body):
        floor = Rect(jnp.array([20.0, 1.0]), fric_coeff=0.3, restitution=0.0)
        poses = jnp.array([[0.0, 0.0, -0.5], [0.0, 0.0, 1.0]])
        vels = jnp.zeros((2, 3))
        spec, state = make_world_2d(
            [floor, body], poses, vels,
            joints=(TotalConstraint3D(body1=0),),
            forces=((), (Gravity3D(10.0),)), cfg=cfg,
        )
        final, traj = rollout(spec, state, n_frames=25)
        return float(final.pos[1, 1])

    y_grid = drop(GridSDF2D(grid, scale, fric_coeff=0.3, restitution=0.0))
    y_circ = drop(Circle(rad, fric_coeff=0.3, restitution=0.0))
    assert abs(y_grid - rad) < 0.05, y_grid
    assert abs(y_grid - y_circ) < 0.03, (y_grid, y_circ)


def test_grid_values_are_differentiable():
    """Gradient flows from a query back to the grid values (DiffSDFGrid
    role, reference bodies.py:250-283)."""
    from diffsdfsim_tpu.physics2d import GridShape2D

    g = _circle_grid(17)

    def f(grid):
        shape = GridShape2D(
            grid=grid, scale_=jnp.asarray(1.0), coord_scale=jnp.asarray(1.0)
        )
        return jnp.sum(shape.sdf(jnp.array([[0.21, 0.07, 0.0], [0.0, 0.33, 0.1]])))

    grads = jax.grad(f)(g)
    assert np.isfinite(np.asarray(grads)).all()
    assert float(jnp.sum(jnp.abs(grads))) > 0
