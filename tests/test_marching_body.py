"""Marching-tets mesher wired into body construction (VERDICT r1 task 10).

A torus is genus-1: the star-shaped template projection (ops/surface.py)
provably cannot represent it (any ray from the origin through the hole
crosses the surface 0 or 4 times), while marching tetrahedra extract it
correctly. The reference builds such bodies via CUDA marching cubes
(`sdf_physics/physics3d/bodies.py:652-704`).
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.config import SimConfig
from diffsdfsim_tpu.physics import (
    BoxShape,
    Gravity3D,
    TotalConstraint3D,
    make_body,
    make_world,
    rollout,
)
from diffsdfsim_tpu.physics.shapes import GridShape

RES = 14
R_MAJ, R_MIN = 0.55, 0.25  # normalized units


def _torus_grid(res=RES):
    lin = np.linspace(-1.0, 1.0, res)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return jnp.asarray(np.sqrt((np.sqrt(x**2 + z**2) - R_MAJ) ** 2 + y**2) - R_MIN)


def _torus_shape(scale=1.0):
    return GridShape(grid=_torus_grid(), scale_=jnp.asarray(scale))


def test_marching_mesh_is_torus():
    """The extracted mesh must cover the full torus (points near the inner
    equator AND the outer equator), which template projection cannot."""
    body = make_body(_torus_shape(), mesher="marching")
    v = np.asarray(body.verts)
    nz = v[np.abs(v).sum(axis=1) > 1e-9]  # drop padded zeros
    assert nz.shape[0] > 100
    rho = np.sqrt(nz[:, 0] ** 2 + nz[:, 2] ** 2)
    # inner hole boundary ~ R-r = 0.3, outer ~ R+r = 0.8
    assert rho.min() < 0.40, f"no inner-equator verts (min rho {rho.min():.3f})"
    assert rho.max() > 0.70, f"no outer-equator verts (max rho {rho.max():.3f})"
    # all extracted verts lie near the zero level set
    d = np.asarray(body.query_sdfs(body.verts, return_grads=False))
    d = d[np.abs(v).sum(axis=1) > 1e-9]
    assert np.abs(d).max() < 0.1


def test_template_projection_fails_on_torus():
    """Sanity: the star-shaped mesher cannot reach the hole's inner tube —
    no vertex lands near the inner equator (the marching mesher covers it,
    see test_marching_mesh_is_torus)."""
    body = make_body(_torus_shape(), subdiv=2)
    v = np.asarray(body.verts)
    rho = np.sqrt(v[:, 0] ** 2 + v[:, 2] ** 2)
    near_inner = (rho < 0.40) & (np.abs(v[:, 1]) < R_MIN)
    d = np.asarray(body.query_sdfs(body.verts, return_grads=False))
    on_surface = np.abs(d) < 0.05
    assert not np.any(near_inner & on_surface)


def test_marching_body_rollout_contacts_and_grads():
    """Torus dropped on the floor: produces contacts and a finite, nonzero
    gradient through the marching-extracted surface (MeshSDF correction)."""
    cfg = SimConfig(
        fric_dirs=4, max_contacts_per_pair=4, max_contacts_total=4,
        mesh_subdiv=2, max_substeps=2, max_bisect=4, tol=1e-6,
        time_of_contact_diff=False,
    )
    grid = _torus_grid()

    def loss_fn(scale):
        floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=3)
        torus = make_body(
            GridShape(grid=grid, scale_=scale), mesher="marching"
        )
        poses = jnp.array([[1.0, 0, 0, 0, 0.0, -0.5, 0.0],
                           [1.0, 0, 0, 0, 0.0, 1.2, 0.0]])
        spec, state = make_world(
            [floor, torus], poses, jnp.zeros((2, 6)),
            joints=(TotalConstraint3D(body1=0),),
            forces=((), (Gravity3D(10.0),)),
            cfg=cfg,
        )
        final, traj = rollout(spec, state, n_frames=16)
        ys = jnp.where(traj.valid, traj.pos[:, :, 1, 1], jnp.inf)
        return jnp.sum(final.pos[1] ** 2), jnp.min(ys)

    (val, min_y), g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(jnp.asarray(1.0))
    # free fall over 16 frames would punch through the floor (y < 0);
    # resting on the tube means y ~= R_MIN = 0.25
    assert 0.2 < float(min_y) < 0.35, f"torus not resting on floor (min y {float(min_y)})"
    assert np.isfinite(float(val))
    assert np.isfinite(float(g)) and abs(float(g)) > 0.0
