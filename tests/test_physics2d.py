import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.config import SimConfig
from diffsdfsim_tpu.physics import Gravity3D, TotalConstraint3D
from diffsdfsim_tpu.physics.world import rollout
from diffsdfsim_tpu.physics2d import Circle, Rect, make_world_2d, to_2d_state


CFG = SimConfig(fric_dirs=4, max_contacts_per_pair=4, max_contacts_total=8,
                mesh_subdiv=2, max_substeps=4, max_bisect=6,
                time_of_contact_diff=False)


def test_2d_circle_drop_on_rect():
    floor = Rect([20.0, 1.0])
    ball = Circle(0.5)
    poses = jnp.array([[0.0, 0.0, -0.5], [0.0, 0.0, 2.0]])  # [theta, x, y]
    vels = jnp.zeros((2, 3))
    spec, state = make_world_2d(
        [floor, ball], poses, vels,
        joints=(TotalConstraint3D(body1=0),),
        forces=((), (Gravity3D(10.0),)),
        cfg=CFG,
    )
    final, traj = rollout(spec, state, n_frames=20)
    p2, v2 = to_2d_state(final)
    # ball stays in plane and above the floor
    assert abs(float(final.pos[1, 2])) < 1e-6
    assert float(p2[1, 2]) > 0.4
    ys = np.asarray(traj.pos)[:, :, 1, 1]
    assert ys[np.asarray(traj.valid)].min() > 0.4


def test_2d_state_roundtrip():
    floor = Rect([4.0, 1.0])
    poses = jnp.array([[0.3, 1.0, 2.0]])
    vels = jnp.array([[0.1, 0.5, -0.2]])
    spec, state = make_world_2d([floor], poses, vels, cfg=CFG)
    p2, v2 = to_2d_state(state)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(poses), atol=1e-9)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(vels), atol=1e-9)
