import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.ops.inertia import mesh_volume, ang_inertia_from_mesh, box_inertia, cylinder_inertia
from diffsdfsim_tpu.ops.sdf import bowl_sdf
from diffsdfsim_tpu.physics.analytic_meshes import bowl_mesh, box_mesh, cylinder_mesh, sphere_mesh


def test_box_mesh_volume_inertia():
    dims = jnp.array([1.0, 0.5, 2.0])
    v, f = box_mesh(dims)
    np.testing.assert_allclose(float(mesh_volume(v, jnp.asarray(f))), 1.0, rtol=1e-9)
    J = ang_inertia_from_mesh(v, jnp.asarray(f), 2.0)
    np.testing.assert_allclose(np.asarray(J), np.asarray(box_inertia(dims, 2.0)), atol=1e-9)


def test_cylinder_mesh_volume():
    v, f = cylinder_mesh(0.5, 2.0, numsegs=64)
    vol = float(mesh_volume(v, jnp.asarray(f)))
    np.testing.assert_allclose(vol, np.pi * 0.25 * 2.0, rtol=0.01)
    J = ang_inertia_from_mesh(v, jnp.asarray(f), 1.0)
    np.testing.assert_allclose(
        np.asarray(jnp.diag(J)), np.asarray(jnp.diag(cylinder_inertia(jnp.asarray(0.5), jnp.asarray(2.0), 1.0))),
        rtol=0.02,
    )


def test_sphere_mesh_volume():
    v, f = sphere_mesh(jnp.asarray(0.7), subdivisions=3)
    vol = float(mesh_volume(v, jnp.asarray(f)))
    np.testing.assert_allclose(vol, 4 / 3 * np.pi * 0.343, rtol=0.01)


def test_bowl_mesh_watertight_and_on_sdf():
    r, d = 0.5, 0.05
    v, f = bowl_mesh(r, d, numsegs=48, nlat=12)
    # shell volume = half of (4/3 pi ((r+d)^3 - (r-d)^3))
    vol = float(mesh_volume(v, jnp.asarray(f)))
    expected = 0.5 * 4 / 3 * np.pi * ((r + d) ** 3 - (r - d) ** 3)
    np.testing.assert_allclose(vol, expected, rtol=0.05)
    # all vertices lie on the bowl SDF zero set
    sd = bowl_sdf(v, jnp.asarray(r), jnp.asarray(d))
    assert float(jnp.max(jnp.abs(sd))) < 0.02
