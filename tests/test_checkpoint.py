import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.config import SimConfig
from diffsdfsim_tpu.physics import (
    BoxShape, SphereShape, TotalConstraint3D, Gravity3D, make_body, make_world,
)
from diffsdfsim_tpu.physics.world import rollout, step_frame
from diffsdfsim_tpu.utils.checkpoint import load_state, save_state


def test_worldstate_roundtrip(tmp_path):
    cfg = SimConfig(fric_dirs=4, max_contacts_per_pair=2, max_contacts_total=2,
                    mesh_subdiv=1, max_substeps=2, max_bisect=3)
    floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=2)
    ball = make_body(SphereShape(jnp.asarray(0.5)), subdiv=1)
    poses = jnp.array([[1.0, 0, 0, 0, 0, -0.5, 0], [1.0, 0, 0, 0, 0, 2.0, 0]])
    spec, state = make_world([floor, ball], poses, jnp.zeros((2, 6)),
                             joints=(TotalConstraint3D(body1=0),),
                             forces=((), (Gravity3D(10.0),)), cfg=cfg)
    # advance, checkpoint, advance, restore, re-advance: bit-exact resume
    state1, _, _, _ = step_frame(spec, state)
    path = tmp_path / "ck.pkl"
    save_state(path, state1)
    state2, _, _, _ = step_frame(spec, state1)

    restored = load_state(path, like=state1)
    state2b, _, _, _ = step_frame(spec, restored)
    np.testing.assert_array_equal(np.asarray(state2.pos), np.asarray(state2b.pos))
    np.testing.assert_array_equal(np.asarray(state2.v), np.asarray(state2b.v))
