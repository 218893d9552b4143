"""Multi-point contact manifolds: resting boxes and stacks.

These exercise the contact filtering's support-point selection (a box on a
floor needs >= 3 contact points for stable support — the reference keeps
Qhull vertices of the contact patch, we keep deterministic support points)
and the detach_contact_b2 gradient valve (reference contacts.py:176-180,
noted for the block-tower example)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.config import SimConfig
from diffsdfsim_tpu.physics import (
    BoxShape,
    TotalConstraint3D,
    Gravity3D,
    make_body,
    make_world,
    rollout,
)

CFG = SimConfig(fric_dirs=4, max_contacts_per_pair=6, max_contacts_total=8,
                mesh_subdiv=2, max_substeps=4, max_bisect=6,
                time_of_contact_diff=False)


def test_box_rests_flat():
    """A cube dropped flat settles with a multi-point contact patch and
    stays level."""
    floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), fric_coeff=0.5, subdiv=3)
    cube = make_body(BoxShape(jnp.array([1.0, 1.0, 1.0])), fric_coeff=0.5, subdiv=2)
    poses = jnp.array([[1.0, 0, 0, 0, 0, -0.5, 0], [1.0, 0, 0, 0, 0, 0.6, 0]])
    spec, state = make_world(
        [floor, cube], poses, jnp.zeros((2, 6)),
        joints=(TotalConstraint3D(body1=0),),
        forces=((), (Gravity3D(10.0),)), cfg=CFG,
    )
    final, traj = rollout(spec, state, n_frames=20)
    # settled at half-height, level orientation
    np.testing.assert_allclose(float(final.pos[1, 1]), 0.5, atol=0.03)
    q = np.asarray(final.quat[1])
    assert abs(abs(q[0]) - 1.0) < 0.01, q  # no significant rotation
    # multi-point support
    assert int(jnp.sum(final.contacts.valid)) >= 3


def test_two_box_stack_stands():
    """A two-box tower remains standing (reference block-tower scenario,
    detach_contact_b2=True for consistent contact-point gradients)."""
    cfg = CFG.replace(detach_contact_b2=True, max_contacts_total=12)
    floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), fric_coeff=0.6, subdiv=3)
    b1 = make_body(BoxShape(jnp.array([1.0, 1.0, 1.0])), fric_coeff=0.6, subdiv=2)
    b2 = make_body(BoxShape(jnp.array([0.8, 0.8, 0.8])), fric_coeff=0.6, subdiv=2)
    poses = jnp.array(
        [
            [1.0, 0, 0, 0, 0, -0.5, 0],
            [1.0, 0, 0, 0, 0, 0.5, 0],
            [1.0, 0, 0, 0, 0.05, 1.4, 0],
        ]
    )
    spec, state = make_world(
        [floor, b1, b2], poses, jnp.zeros((3, 6)),
        joints=(TotalConstraint3D(body1=0),),
        forces=((), (Gravity3D(10.0),), (Gravity3D(10.0),)), cfg=cfg,
    )
    final, traj = rollout(spec, state, n_frames=25)
    # both boxes still near their stack positions
    np.testing.assert_allclose(float(final.pos[1, 1]), 0.5, atol=0.05)
    np.testing.assert_allclose(float(final.pos[2, 1]), 1.4, atol=0.12)
    # top box did not slide off laterally
    assert abs(float(final.pos[2, 0])) < 0.3
