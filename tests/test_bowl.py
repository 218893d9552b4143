import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.config import SimConfig
from diffsdfsim_tpu.physics import (
    BowlShape, SphereShape, TotalConstraint3D, Gravity3D, make_body, make_world, rollout,
)


def test_marble_in_bowl():
    """A small sphere dropped into a fixed bowl stays inside it (reference
    bowl bodies are static containers in the demos)."""
    cfg = SimConfig(fric_dirs=4, max_contacts_per_pair=4, max_contacts_total=8,
                    mesh_subdiv=2, max_substeps=4, max_bisect=6,
                    time_of_contact_diff=False)
    bowl = make_body(BowlShape(jnp.asarray(1.0), jnp.asarray(0.1)), custom_mesh=True)
    assert bowl.is_sdf
    marble = make_body(SphereShape(jnp.asarray(0.2)), subdiv=1, fric_coeff=0.3)
    # bowl opens +y after rotating -90deg about x (local +z -> world +y)
    s = np.sqrt(0.5)
    poses = jnp.array([
        [s, -s, 0, 0, 0.0, 0.0, 0.0],
        [1.0, 0, 0, 0, 0.15, 1.2, 0.0],
    ])
    spec, state = make_world(
        [bowl, marble], poses, jnp.zeros((2, 6)),
        joints=(TotalConstraint3D(body1=0),),
        forces=((), (Gravity3D(10.0),)),
        cfg=cfg,
    )
    final, traj = rollout(spec, state, n_frames=30)
    p = np.asarray(final.pos[1])
    # marble settled inside the bowl: below the rim, above the shell bottom,
    # laterally within the bowl radius
    assert -1.2 < p[1] < 0.8, p
    assert np.linalg.norm(p[[0, 2]]) < 1.0, p
