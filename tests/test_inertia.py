import jax
import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.ops import inertia as I
from diffsdfsim_tpu.ops import sdf as s
from diffsdfsim_tpu.ops.surface import surface_mesh, project_to_surface
from diffsdfsim_tpu.utils import meshes


def box_mesh(dims):
    """Exact triangulated box."""
    hx, hy, hz = np.asarray(dims) / 2
    v = np.array(
        [
            [-hx, -hy, -hz], [hx, -hy, -hz], [hx, hy, -hz], [-hx, hy, -hz],
            [-hx, -hy, hz], [hx, -hy, hz], [hx, hy, hz], [-hx, hy, hz],
        ]
    )
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # bottom (z=-hz), outward -z
            [4, 5, 6], [4, 6, 7],  # top
            [0, 1, 5], [0, 5, 4],  # y=-hy
            [2, 3, 7], [2, 7, 6],  # y=+hy
            [1, 2, 6], [1, 6, 5],  # x=+hx
            [3, 0, 4], [3, 4, 7],  # x=-hx
        ],
        dtype=np.int32,
    )
    return jnp.asarray(v), jnp.asarray(f)


def test_box_volume_and_inertia():
    dims = jnp.array([1.0, 0.5, 2.0])
    v, f = box_mesh(dims)
    vol = I.mesh_volume(v, f)
    np.testing.assert_allclose(vol, 1.0, atol=1e-10)

    mass = 3.0
    J = I.ang_inertia_from_mesh(v, f, mass)
    np.testing.assert_allclose(J, I.box_inertia(dims, mass), atol=1e-9)


def test_sphere_inertia_from_projected_mesh():
    rad = 0.7
    tv, tf = meshes.icosphere(4)
    verts = jnp.asarray(tv) * rad
    J = I.ang_inertia_from_mesh(verts, jnp.asarray(tf), 2.0)
    expected = I.sphere_inertia(jnp.asarray(rad), 2.0)
    # icosphere approximates the ball; inertia within ~1%
    np.testing.assert_allclose(J, expected, rtol=0.02, atol=1e-4)


def test_cylinder_analytic_inertia():
    J = I.cylinder_inertia(jnp.asarray(0.5), jnp.asarray(2.0), 1.5)
    lat = 1.5 * (3 * 0.25 + 4.0) / 12
    np.testing.assert_allclose(jnp.diag(J), [lat, lat, 1.5 * 0.125], atol=1e-12)


def test_surface_projection_sphere():
    tv, _ = meshes.icosphere(2)
    tv = jnp.asarray(tv) * 0.3  # start off-surface
    out = project_to_surface(
        tv,
        lambda p: s.sphere_sdf(p, 0.5),
        lambda p: s.sphere_sdf_grad(p, 0.5),
        iters=8,
    )
    np.testing.assert_allclose(jnp.linalg.norm(out, axis=-1), 0.5, atol=1e-8)


def test_surface_mesh_gradient_meshsdf():
    """d verts / d radius must equal the MeshSDF formula: for a sphere,
    dv/dr = v/|v| (vertices move radially outward at rate 1)."""
    tv, _ = meshes.icosphere(1)
    tv = jnp.asarray(tv)

    def verts_of_rad(rad):
        return surface_mesh(
            tv,
            lambda p, r: s.sphere_sdf(p, r),
            lambda p, r: s.sphere_sdf_grad(p, r),
            (rad,),
            iters=8,
        )

    rad = jnp.asarray(0.5)
    J = jax.jacobian(verts_of_rad)(rad)
    v = verts_of_rad(rad)
    expected = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    np.testing.assert_allclose(J, expected, atol=1e-6)


def test_box_projection_mesh_inertia():
    """cube-sphere template projected onto a box SDF gives a usable box
    mesh whose inertia approximates the analytic one."""
    dims = jnp.array([1.0, 1.0, 1.0])
    tv, tf = meshes.cube_template(8)
    out = surface_mesh(
        jnp.asarray(tv),
        lambda p, d: s.box_sdf(p, d),
        lambda p, d: s.box_sdf_grad(p, d),
        (dims,),
        iters=15,
    )
    sd = s.box_sdf(out, dims)
    assert float(jnp.max(jnp.abs(sd))) < 1e-6
    J = I.ang_inertia_from_mesh(out, jnp.asarray(tf), 1.0)
    np.testing.assert_allclose(J, I.box_inertia(dims, 1.0), rtol=0.05, atol=5e-3)
