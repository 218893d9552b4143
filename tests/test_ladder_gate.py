"""Whole-batch rung-0 ladder gate (cfg.ladder_batch_gate) and the
detach_2nd_bounce re-run semantics.

The gate (world._probe_ladder_gated) must be a pure batching optimization:
vmapped rollouts with the gate on must match the per-lane unbatched rollout
bit-for-bit in both values and gradients. detach_2nd_bounce (reference
optim_sphere.py:163-177 + world.undo_step) is a pure gradient-tape
operation: it must not change trajectory VALUES or time coverage, only
sever gradient history at every second contacting frame.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.config import SimConfig
from diffsdfsim_tpu.physics import (
    BoxShape,
    SphereShape,
    TotalConstraint3D,
    Gravity3D,
    make_body,
    make_world,
    rollout,
)

CFG = SimConfig(fric_dirs=4, max_contacts_per_pair=4, max_contacts_total=8,
                mesh_subdiv=1, max_substeps=4, max_bisect=4)


def _loss_fn(cfg, n_frames=12, detach=False, height=1.2):
    def loss(rad):
        floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), mass=1.0,
                          fric_coeff=0.25, subdiv=2)
        sphere = make_body(SphereShape(rad), mass=1.0, fric_coeff=0.25,
                           subdiv=1)
        poses = jnp.array([
            [1.0, 0, 0, 0, 0.0, -0.5, 0.0],
            [1.0, 0, 0, 0, 0.0, height, 0.0],
        ])
        vels = jnp.zeros((2, 6)).at[1, 3].set(2.0)
        spec, state = make_world(
            [floor, sphere], poses, vels,
            joints=(TotalConstraint3D(body1=0),),
            forces=((), (Gravity3D(10.0),)), cfg=cfg,
        )
        final, traj = rollout(spec, state, n_frames=n_frames,
                              detach_2nd_bounce=detach)
        return (jnp.sum(traj.pos[:, :, 1, :] ** 2 * traj.valid[:, :, None]),
                traj)

    return loss


def test_batch_gate_matches_unbatched():
    """vmap + gate == per-lane single rollout (values AND gradients)."""
    rads = jnp.asarray([0.45, 0.6, 0.8])

    cfg_plain = CFG.replace(ladder_fast_path=True, ladder_batch_gate=False)
    cfg_gate = CFG.replace(ladder_fast_path=False, ladder_batch_gate=True)

    def scalar_loss(cfg):
        fn = _loss_fn(cfg)
        return lambda r: fn(r)[0]

    single = [jax.value_and_grad(scalar_loss(cfg_plain))(r) for r in rads]
    batched = jax.jit(jax.vmap(jax.value_and_grad(scalar_loss(cfg_gate))))(rads)

    for i, (v, g) in enumerate(single):
        np.testing.assert_allclose(float(batched[0][i]), float(v), rtol=1e-6)
        np.testing.assert_allclose(float(batched[1][i]), float(g), rtol=1e-5,
                                   atol=1e-8)


def test_batch_gate_single_lane_matches_plain():
    """Unbatched call through the gate (custom_vmap primal path) == plain."""
    cfg_plain = CFG.replace(ladder_fast_path=True, ladder_batch_gate=False)
    cfg_gate = CFG.replace(ladder_fast_path=False, ladder_batch_gate=True)
    r = jnp.asarray(0.55)
    v1, g1 = jax.value_and_grad(lambda r: _loss_fn(cfg_plain)(r)[0])(r)
    v2, g2 = jax.value_and_grad(lambda r: _loss_fn(cfg_gate)(r)[0])(r)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-7)
    np.testing.assert_allclose(float(g2), float(g1), rtol=1e-6, atol=1e-9)


def test_detach_2nd_bounce_preserves_values():
    """detach_2nd_bounce changes the tape, never the trajectory: same
    recorded values, same validity, same final time (the old implementation
    burned a scan slot per trigger, shrinking simulated coverage)."""
    # low drop + 24 frames: the sphere settles into resting contact, so the
    # 2nd-contact-frame trigger fires repeatedly (a high bounce never
    # reaches two contacting frames inside the horizon and the detach would
    # be vacuously untested)
    fn_plain = _loss_fn(CFG, n_frames=24, detach=False, height=0.8)
    fn_det = _loss_fn(CFG, n_frames=24, detach=True, height=0.8)
    r = jnp.asarray(0.6)
    _, traj_p = fn_plain(r)
    _, traj_d = fn_det(r)

    np.testing.assert_array_equal(np.asarray(traj_d.valid),
                                  np.asarray(traj_p.valid))
    m = np.asarray(traj_p.valid)[..., None]
    np.testing.assert_allclose(np.asarray(traj_d.pos)[m[..., 0]],
                               np.asarray(traj_p.pos)[m[..., 0]],
                               rtol=1e-7, atol=1e-9)
    # every frame advances time: coverage == n_frames * dt for both
    t_max_p = float(np.max(np.asarray(traj_p.t)[np.asarray(traj_p.valid)]))
    t_max_d = float(np.max(np.asarray(traj_d.t)[np.asarray(traj_d.valid)]))
    np.testing.assert_allclose(t_max_d, t_max_p, atol=1e-9)


def test_detach_2nd_bounce_severs_gradient():
    """With contacts in play the detached rollout's gradient must differ
    from the full-tape gradient (the severed history carries signal)."""
    r = jnp.asarray(0.6)
    g_plain = jax.grad(
        lambda r: _loss_fn(CFG, n_frames=24, detach=False, height=0.8)(r)[0]
    )(r)
    g_det = jax.grad(
        lambda r: _loss_fn(CFG, n_frames=24, detach=True, height=0.8)(r)[0]
    )(r)
    assert np.isfinite(float(g_plain)) and np.isfinite(float(g_det))
    assert abs(float(g_plain) - float(g_det)) > 1e-12
