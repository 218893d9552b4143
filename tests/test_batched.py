"""Batched-native rollout (physics/batched.py): the explicit-batch-axis
production path must be a pure batching optimization — identical values and
gradients to the per-lane unbatched rollout, including detach_2nd_bounce."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.config import SimConfig
from diffsdfsim_tpu.physics import (
    BoxShape,
    Gravity3D,
    SphereShape,
    TotalConstraint3D,
    make_body,
    make_world,
    make_world_batched,
    rollout,
    rollout_batched,
)

CFG = SimConfig(fric_dirs=4, max_contacts_per_pair=4, max_contacts_total=8,
                mesh_subdiv=1, max_substeps=4, max_bisect=4)


def _build(rad, cfg=CFG, height=1.2):
    floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), mass=1.0,
                      fric_coeff=0.25, subdiv=2)
    sphere = make_body(SphereShape(rad), mass=1.0, fric_coeff=0.25, subdiv=1)
    poses = jnp.array([
        [1.0, 0, 0, 0, 0.0, -0.5, 0.0],
        [1.0, 0, 0, 0, 0.0, height, 0.0],
    ])
    vels = jnp.zeros((2, 6)).at[1, 3].set(2.0)
    return make_world(
        [floor, sphere], poses, vels,
        joints=(TotalConstraint3D(body1=0),),
        forces=((), (Gravity3D(10.0),)), cfg=cfg,
    )


def _single_loss(rad, n_frames=10, detach=False):
    spec, state = _build(rad)
    _, traj = rollout(spec, state, n_frames=n_frames, detach_2nd_bounce=detach)
    return jnp.sum(traj.pos[:, :, 1, :] ** 2 * traj.valid[:, :, None])


def _batched_losses(rads, n_frames=10, detach=False):
    spec, bodies_b, state_b = make_world_batched(_build, rads)
    _, traj = rollout_batched(spec, bodies_b, state_b, n_frames,
                              detach_2nd_bounce=detach)
    # traj leaves are (T, S, B, ...): per-lane loss
    return jnp.sum(
        traj.pos[:, :, :, 1, :] ** 2 * traj.valid[:, :, :, None], axis=(0, 1, 3)
    )


def test_batched_matches_unbatched_values_and_grads():
    rads = jnp.asarray([0.45, 0.6, 0.8])

    single = [jax.value_and_grad(_single_loss)(r) for r in rads]

    @jax.jit
    def batch(rads):
        return jax.value_and_grad(lambda r: jnp.sum(_batched_losses(r)))(rads), \
            _batched_losses(rads)

    (total, grads), vals = batch(rads)
    for i, (v, g) in enumerate(single):
        np.testing.assert_allclose(float(vals[i]), float(v), rtol=1e-6)
        np.testing.assert_allclose(float(grads[i]), float(g), rtol=1e-5,
                                   atol=1e-8)


def test_batched_detach_matches_unbatched():
    rads = jnp.asarray([0.55, 0.7])
    single = [
        jax.value_and_grad(lambda r: _single_loss(r, n_frames=14, detach=True))(r)
        for r in rads
    ]
    grads = jax.jit(jax.grad(
        lambda r: jnp.sum(_batched_losses(r, n_frames=14, detach=True))
    ))(rads)
    vals = _batched_losses(rads, n_frames=14, detach=True)
    for i, (v, g) in enumerate(single):
        np.testing.assert_allclose(float(vals[i]), float(v), rtol=1e-6)
        np.testing.assert_allclose(float(grads[i]), float(g), rtol=1e-5,
                                   atol=1e-8)
