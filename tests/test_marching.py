import jax
import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.ops.marching import grid_to_mesh, marching_tets
from diffsdfsim_tpu.ops.inertia import mesh_volume
from diffsdfsim_tpu.ops.sdf import sphere_sdf


def sphere_grid(res=24, rad=0.5):
    lin = jnp.linspace(-1, 1, res)
    pts = jnp.stack(jnp.meshgrid(lin, lin, lin, indexing="ij"), axis=-1)
    return sphere_sdf(pts.reshape(-1, 3), rad).reshape(res, res, res)


def test_marching_tets_sphere_surface():
    grid = sphere_grid()
    tri, valid = marching_tets(grid)
    pts = np.asarray(tri[np.asarray(valid)]).reshape(-1, 3)
    assert pts.shape[0] > 100
    # triangle vertices lie on the iso-surface: |center + r*dir| = r in
    # index coords: sphere radius 0.5 in [-1,1] = 0.25*(res-1) voxels
    res = grid.shape[0]
    center = (res - 1) / 2.0
    rr = np.linalg.norm(pts - center, axis=1) / (res - 1) * 2.0
    np.testing.assert_allclose(rr, 0.5, atol=0.02)


def test_grid_to_mesh_volume():
    grid = sphere_grid(res=32)
    verts, faces, valid = grid_to_mesh(grid, scale=1.0)
    vol = float(mesh_volume(verts, jnp.asarray(faces)))
    expected = 4.0 / 3.0 * np.pi * 0.5**3
    np.testing.assert_allclose(vol, expected, rtol=0.03)


def test_marching_tets_watertight_budget():
    grid = sphere_grid(res=16)
    tri, valid = marching_tets(grid, max_tris=4000)
    assert int(np.asarray(valid).sum()) > 0
    # padded entries are all invalid at the tail
    v = np.asarray(valid)
    first_invalid = np.argmax(~v) if (~v).any() else len(v)
    assert not v[first_invalid:].any()


def test_vertex_positions_differentiable():
    """d(vertex)/d(grid) exists: shifting the level set moves vertices."""
    grid = sphere_grid(res=12)

    def f(offset):
        tri, valid = marching_tets(grid + offset)
        return jnp.sum(jnp.where(valid[:, None, None], tri, 0.0))

    g = jax.grad(f)(jnp.asarray(0.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 0
