"""Parity tests for the replay-emission mode (cfg.replay_mode="emit",
world._replay_emit): the substep forward re-emits probe-cached VALUES and the
backward runs the exact vjp of the inline replay, so trajectories must match
the legacy inline mode (positions bitwise; velocities/orientations to the one
ulp introduced by the TOC-pairing dt on no-contact substeps) and gradients
must match to numerical noise. Reference semantics under test:
lcp_physics/physics/world.py:241-379 (step) + lcp.py:155-213 (LCP backward).
"""

import jax
import jax.numpy as jnp
import pytest

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

N_FRAMES = 12


def _cfg(mode, **kw):
    base = dict(
        fric_dirs=8, max_contacts_per_pair=4, max_contacts_total=4,
        mesh_subdiv=1, max_substeps=4, max_bisect=6, tol=1e-8,
        strict_no_penetration=False, replay_mode=mode,
    )
    base.update(kw)
    return SimConfig(**base)


def _build(rad, cfg, drop=0.9):
    floor = make_body(
        BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=2, fric_coeff=0.25
    )
    sphere = make_body(SphereShape(rad), subdiv=1, fric_coeff=0.25)
    poses = jnp.array(
        [[1.0, 0, 0, 0, 0.0, -0.5, 0.0], [1.0, 0, 0, 0, 0.3, drop, 0.0]]
    )
    vels = jnp.zeros((2, 6)).at[1, 3].set(1.0)
    return make_world(
        [floor, sphere], poses, vels,
        joints=(TotalConstraint3D(body1=0),),
        forces=((), (Gravity3D(10.0),)), cfg=cfg,
    )


def _loss_traj(rad, cfg, detach=False):
    spec, st = _build(rad, cfg)
    final, traj = rollout(spec, st, N_FRAMES, detach_2nd_bounce=detach)
    loss = jnp.sum(
        jnp.where(traj.valid[..., None], traj.pos[:, :, 1, :], 0.0) ** 2
    )
    return loss, (final, traj)


@pytest.mark.parametrize("detach", [False, True])
def test_single_rollout_parity(detach):
    rad = jnp.asarray(0.55)
    modes = {}
    for mode in ("inline", "emit"):
        cfg = _cfg(mode)
        (l, (final, traj)), g = jax.jit(
            jax.value_and_grad(
                lambda r: _loss_traj(r, cfg, detach), has_aux=True
            )
        )(rad)
        modes[mode] = (l, final, traj, g)

    l1, f1, t1, g1 = modes["inline"]
    l2, f2, t2, g2 = modes["emit"]
    # positions are bitwise identical; rotational state may differ by the
    # one-ulp TOC-pairing dt on no-contact substeps
    assert bool(jnp.all(t1.pos == t2.pos))
    assert jnp.allclose(t1.quat, t2.quat, atol=1e-9)
    assert jnp.allclose(t1.v, t2.v, atol=1e-9)
    assert bool(jnp.all(t1.valid == t2.valid))
    assert bool(jnp.all(t1.n_halvings == t2.n_halvings))
    assert jnp.allclose(l1, l2, rtol=1e-12)
    assert jnp.isfinite(g1) and jnp.isfinite(g2)
    assert jnp.allclose(g1, g2, rtol=1e-6)


def test_batched_rollout_parity():
    rads = jnp.array([0.5, 0.55, 0.6])
    cfg_i = _cfg("inline", ladder_fast_path=False)
    cfg_e = _cfg("emit", ladder_fast_path=False)

    outs = {}
    for tag, cfg in (("inline", cfg_i), ("emit", cfg_e)):
        def loss(rs):
            spec, bodies_b, state_b = make_world_batched(
                lambda r: _build(r, cfg), rs
            )
            final, traj = rollout_batched(spec, bodies_b, state_b, N_FRAMES)
            return jnp.sum(
                jnp.where(traj.valid[..., None], traj.pos[:, :, :, 1, :], 0.0)
                ** 2
            ), traj

        (l, traj), g = jax.jit(
            jax.value_and_grad(loss, has_aux=True)
        )(rads)
        outs[tag] = (l, traj, g)

    l1, t1, g1 = outs["inline"]
    l2, t2, g2 = outs["emit"]
    assert bool(jnp.all(t1.pos == t2.pos))
    assert jnp.allclose(t1.quat, t2.quat, atol=1e-9)
    assert jnp.allclose(t1.v, t2.v, atol=1e-9)
    assert jnp.allclose(l1, l2, rtol=1e-12)
    assert jnp.all(jnp.isfinite(g1)) and jnp.all(jnp.isfinite(g2))
    assert jnp.allclose(g1, g2, rtol=1e-6)


def test_vmapped_sweep_parity():
    """Emission must compose with plain jax.vmap over the single path (the
    sweep drivers' shape)."""
    rads = jnp.array([0.5, 0.58])
    gs = {}
    for mode in ("inline", "emit"):
        cfg = _cfg(mode)
        g = jax.jit(
            jax.vmap(jax.grad(lambda r: _loss_traj(r, cfg)[0]))
        )(rads)
        gs[mode] = g
    assert jnp.all(jnp.isfinite(gs["inline"]))
    assert jnp.allclose(gs["inline"], gs["emit"], rtol=1e-6)


def test_emit_ladder_batch_gate():
    """Emission under the whole-batch probe gate (cfg.ladder_batch_gate) —
    the vmapped-sweep production config."""
    rads = jnp.array([0.5, 0.58])
    cfg = _cfg("emit", ladder_batch_gate=True)
    cfg_ref = _cfg("inline")
    g = jax.jit(jax.vmap(jax.grad(lambda r: _loss_traj(r, cfg)[0])))(rads)
    g_ref = jax.jit(
        jax.vmap(jax.grad(lambda r: _loss_traj(r, cfg_ref)[0]))
    )(rads)
    assert jnp.all(jnp.isfinite(g))
    assert jnp.allclose(g, g_ref, rtol=1e-6)
