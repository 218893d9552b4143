import jax
import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.config import SimConfig
from diffsdfsim_tpu.physics import Gravity3D, TotalConstraint3D
from diffsdfsim_tpu.physics.world import rollout
from diffsdfsim_tpu.physics2d import (
    Circle, FixedJoint2D, Hull, Rect, RevoluteJoint2D, make_world_2d,
    polygon_sdf_2d, to_2d_state,
)

CFG = SimConfig(fric_dirs=4, max_contacts_per_pair=4, max_contacts_total=8,
                mesh_subdiv=2, max_substeps=4, max_bisect=6,
                time_of_contact_diff=False)


def test_polygon_sdf_square():
    verts = jnp.array([[-1.0, -1], [1, -1], [1, 1], [-1, 1]])
    pts = jnp.array([[0.0, 0.0], [2.0, 0.0], [0.0, 1.5], [1.5, 1.5]])
    d = polygon_sdf_2d(pts, verts)
    np.testing.assert_allclose(np.asarray(d), [-1.0, 1.0, 0.5, np.sqrt(0.5)], atol=1e-9)


def test_hull_body_drops_on_floor():
    floor = Rect([20.0, 1.0])
    tri = Hull([[-0.5, -0.3], [0.5, -0.3], [0.0, 0.5]])
    poses = jnp.array([[0.0, 0.0, -0.5], [0.0, 0.0, 1.5]])
    vels = jnp.zeros((2, 3))
    spec, state = make_world_2d(
        [floor, tri], poses, vels,
        joints=(TotalConstraint3D(body1=0),),
        forces=((), (Gravity3D(10.0),)), cfg=CFG)
    final, traj = rollout(spec, state, n_frames=20)
    ys = np.asarray(traj.pos)[:, :, 1, 1][np.asarray(traj.valid)]
    assert ys.min() > 0.2  # rests on its base, no tunnelling
    assert abs(float(final.pos[1, 2])) < 1e-6  # stays planar


def test_revolute_joint_pendulum():
    """A circle pinned by a revolute joint to a fixed anchor body swings
    instead of falling: its distance to the anchor stays constant."""
    anchor = Circle(0.1)
    bob = Circle(0.2)
    poses = jnp.array([[0.0, 0.0, 2.0], [0.0, 1.0, 2.0]])
    vels = jnp.zeros((2, 3))
    spec, state = make_world_2d(
        [anchor, bob], poses, vels,
        joints=(
            TotalConstraint3D(body1=0),
            RevoluteJoint2D(body1=0, body2=1, r1_local=(0.0, 0.0), r2_local=(-1.0, 0.0)),
        ),
        forces=((), (Gravity3D(10.0),)),
        no_contact=[(0, 1)],
        cfg=CFG,
    )
    final, traj = rollout(spec, state, n_frames=15)
    pos = np.asarray(traj.pos)[:, :, :, :][np.asarray(traj.valid)]
    dists = np.linalg.norm(pos[:, 1, :2] - pos[:, 0, :2], axis=-1)
    # bob swings (moves) but keeps the rod length approximately (velocity-
    # level constraints drift without post-stabilization, same as reference)
    assert float(final.pos[1, 1]) < 1.99  # it swung down
    np.testing.assert_allclose(dists, 1.0, atol=0.08)


def test_fixed_joint_locks_rotation():
    a = Circle(0.2)
    b = Circle(0.2)
    poses = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.6, 2.0]])
    vels = jnp.zeros((2, 3)).at[0, 0].set(2.0)  # spin body a
    spec, state = make_world_2d(
        [a, b], poses, vels,
        joints=(FixedJoint2D(body1=0, body2=1, r1_local=(0.3, 0.0), r2_local=(-0.3, 0.0)),),
        no_contact=[(0, 1)],
        cfg=CFG,
    )
    final, _ = rollout(spec, state, n_frames=5)
    # equal angular velocity about z
    np.testing.assert_allclose(float(final.v[0, 2]), float(final.v[1, 2]), atol=1e-6)
