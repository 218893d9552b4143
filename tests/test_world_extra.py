"""Coverage for the remaining world features: gradient valves, grid bodies,
explicit meshes, gripper joints, post-stabilization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsdfsim_tpu.config import SimConfig
from diffsdfsim_tpu.ops.sdf import sphere_sdf
from diffsdfsim_tpu.physics import (
    BoxShape,
    GridShape,
    SphereShape,
    GripperJoint,
    TotalConstraint3D,
    Gravity3D,
    make_body,
    make_world,
    rollout,
)
from diffsdfsim_tpu.physics.world import step_frame


CFG = SimConfig(fric_dirs=4, max_contacts_per_pair=4, max_contacts_total=8,
                mesh_subdiv=2, max_substeps=4, max_bisect=6)


def drop_world(rad=0.55, cfg=CFG, ball=None):
    floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), fric_coeff=0.25, subdiv=3)
    ball = ball or make_body(SphereShape(jnp.asarray(rad)), fric_coeff=0.25, subdiv=2)
    poses = jnp.array([[1.0, 0, 0, 0, 0, -0.5, 0], [1.0, 0, 0, 0, 0, 1.0, 0]])
    return make_world([floor, ball], poses, jnp.zeros((2, 6)),
                      joints=(TotalConstraint3D(body1=0),),
                      forces=((), (Gravity3D(10.0),)), cfg=cfg)


def test_stop_contact_grad_valve():
    """stop_contact_grad detaches contact geometry in Jc (world.py:433-437);
    with TOC also off, the radius gradient must vanish entirely."""
    cfg = CFG.replace(stop_contact_grad=True, stop_friction_grad=True,
                      time_of_contact_diff=False)

    def final_y(rad):
        spec, state = drop_world(rad, cfg=cfg)
        final, _ = rollout(spec, state, n_frames=14)
        return final.pos[1, 1]

    g = float(jax.grad(final_y)(jnp.asarray(0.55)))
    assert abs(g) < 1e-6, g


def test_grid_body_bounces():
    """SDFGrid3D equivalent: a voxelized sphere body behaves like the
    analytic one (reference bodies.py:763-775)."""
    res = 33
    lin = jnp.linspace(-1, 1, res)
    pts = jnp.stack(jnp.meshgrid(lin, lin, lin, indexing="ij"), axis=-1)
    grid = sphere_sdf(pts.reshape(-1, 3), 0.5 / 0.75).reshape(res, res, res)
    shape = GridShape(grid=grid, scale_=jnp.asarray(0.75))
    ball = make_body(shape, fric_coeff=0.25, template="ico", subdiv=2, project_iters=16)
    spec, state = drop_world(ball=ball)
    final, traj = rollout(spec, state, n_frames=16)
    ys = np.asarray(traj.pos)[:, :, 1, 1][np.asarray(traj.valid)]
    vys = np.asarray(traj.v)[:, :, 1, 4][np.asarray(traj.valid)]
    assert vys.max() > 0.3  # bounced
    assert ys.min() > 0.42  # never sank through (grid sdf ~ 0.5 radius)


def test_explicit_mesh_body():
    """Mesh3D path: a body given by explicit verts/faces (reference
    bodies.py:596-624) collides against an SDF floor."""
    from diffsdfsim_tpu.utils.meshes import icosphere

    tv, tf = icosphere(2)
    ball = make_body(
        SphereShape(jnp.asarray(0.5)),  # shape only used for inertia fallback
        verts=jnp.asarray(tv) * 0.5,
        faces=tf,
    )
    assert not ball.is_sdf
    spec, state = drop_world(ball=ball)
    final, traj = rollout(spec, state, n_frames=16)
    vys = np.asarray(traj.v)[:, :, 1, 4][np.asarray(traj.valid)]
    assert vys.max() > 0.3


def test_gripper_joint_rows():
    g = GripperJoint(body1=0, body2=1, axis=(1.0, 0, 0))
    spec, state = drop_world()
    J1, J2 = g.rows(state)
    assert J1.shape == (5, 6) and J2.shape == (5, 6)
    # angular rows enforce equal angular velocity
    np.testing.assert_allclose(np.asarray(J1[:3, :3]), np.eye(3))
    np.testing.assert_allclose(np.asarray(J2[:3, :3]), -np.eye(3))


def test_gripper_joint_dynamics():
    """Two free spheres joined by a gripper move with equal angular
    velocity and no lateral relative motion."""
    cfg = CFG.replace(time_of_contact_diff=False)
    a = make_body(SphereShape(jnp.asarray(0.3)), subdiv=1)
    b = make_body(SphereShape(jnp.asarray(0.3)), subdiv=1)
    poses = jnp.array([[1.0, 0, 0, 0, 0, 5, 0], [1.0, 0, 0, 0, 1.0, 5, 0]])
    vels = jnp.zeros((2, 6)).at[0, 4].set(1.0)  # push body 0 upward
    spec, state = make_world(
        [a, b], poses, vels,
        joints=(GripperJoint(body1=0, body2=1, axis=(1.0, 0, 0)),),
        no_contact=[(0, 1)], cfg=cfg,
    )
    final, _ = rollout(spec, state, n_frames=5)
    # angular velocities equalized exactly
    np.testing.assert_allclose(
        np.asarray(final.v[0, :3]), np.asarray(final.v[1, :3]), atol=1e-8
    )
    # lateral ANCHOR velocities match: the joint constrains the velocity of
    # body1's origin as seen from both bodies (v + w x offset), reference
    # constraints.py:180-181
    p2_off = np.asarray(final.pos[0] - final.pos[1])
    v2_anchor = np.asarray(final.v[1, 3:]) + np.cross(np.asarray(final.v[1, :3]), p2_off)
    v1_anchor = np.asarray(final.v[0, 3:])
    # compare along directions orthogonal to the joint axis (x)
    np.testing.assert_allclose(v1_anchor[1:], v2_anchor[1:], atol=5e-2)


def test_post_stabilization_runs():
    cfg = CFG.replace(post_stab=True, time_of_contact_diff=False)
    spec, state = drop_world(cfg=cfg)
    state2, had, _, _ = step_frame(spec, state)
    assert np.all(np.isfinite(np.asarray(state2.pos)))


def test_notoc_friction_gradient_alive():
    """With TOC off, the ONLY smooth radius signal is the rolling/friction
    lever arm (p1 = -r n in Jc/Jf). This pins that path as live: a thrown
    sphere's loss must have finite, nonzero d(loss)/d(rad) (VERDICT r1
    task 3 — the head-on no-TOC gradient is exactly zero by construction,
    see RESULTS_TPU.md)."""
    import jax

    from diffsdfsim_tpu.config import SimConfig
    from diffsdfsim_tpu.physics import (
        BoxShape, Gravity3D, SphereShape, TotalConstraint3D,
        make_body, make_world, rollout,
    )

    cfg = SimConfig(fric_dirs=4, max_contacts_per_pair=2, max_contacts_total=2,
                    mesh_subdiv=2, max_substeps=3, max_bisect=6, tol=1e-8,
                    time_of_contact_diff=False)

    def loss(rad):
        floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=3,
                          fric_coeff=0.25)
        sphere = make_body(SphereShape(rad), subdiv=2, fric_coeff=0.25)
        poses = jnp.array([[1.0, 0, 0, 0, 0.0, -0.5, 0.0],
                           [1.0, 0, 0, 0, 0.0, 0.52, 0.0]])
        vels = jnp.zeros((2, 6)).at[1, 3].set(3.0).at[1, 4].set(-0.5)
        spec, state = make_world(
            [floor, sphere], poses, vels,
            joints=(TotalConstraint3D(body1=0),),
            forces=((), (Gravity3D(10.0),)), cfg=cfg,
        )
        final, traj = rollout(spec, state, n_frames=10)
        # x-progress of the rolling sphere depends on rad through friction
        return jnp.sum(traj.pos[:, :, 1, 0] ** 2 * traj.valid)

    g = jax.jit(jax.grad(loss))(jnp.asarray(0.5))
    assert bool(jnp.isfinite(g))
    assert abs(float(g)) > 1e-8
