import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
from diffsdfsim_tpu.physics.contacts import find_contacts


CFG = SimConfig(fric_dirs=4, max_contacts_per_pair=4, max_contacts_total=8,
                mesh_subdiv=2, max_substeps=6)


def sphere_floor_world(rad=0.5, height=2.0, vel=(0, 0, 0), gravity=True,
                       fric_coeff=0.25, cfg=CFG, toc=True):
    floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), mass=1.0,
                      fric_coeff=fric_coeff, subdiv=3)
    sphere = make_body(SphereShape(jnp.asarray(rad)), mass=1.0,
                       fric_coeff=fric_coeff, subdiv=2)
    poses = jnp.array([
        [1.0, 0, 0, 0, 0.0, -0.5, 0.0],
        [1.0, 0, 0, 0, 0.0, height, 0.0],
    ])
    vels = jnp.zeros((2, 6)).at[1, 3:].set(jnp.asarray(vel, dtype=jnp.float64))
    joints = (TotalConstraint3D(body1=0),)
    forces = ((), (Gravity3D(10.0),) if gravity else ())
    cfg = cfg.replace(time_of_contact_diff=toc)
    return make_world([floor, sphere], poses, vels, joints=joints,
                      forces=forces, cfg=cfg)


def test_initial_contacts_empty():
    spec, state = sphere_floor_world()
    assert not bool(jnp.any(state.contacts.valid))


def test_contact_detection_touching():
    """Sphere resting exactly on the floor surface -> one contact, pen ~ 0."""
    spec, state = sphere_floor_world(rad=0.5, height=0.5)
    c = state.contacts
    assert bool(jnp.any(c.valid))
    pens = np.asarray(jnp.where(c.valid, c.pen, -1.0))
    assert pens.max() < 1e-4
    # contact normal should be +y (from floor pointing up) or -y depending
    # on stability selection; it must be vertical
    n = np.asarray(c.normal)[np.asarray(c.valid)]
    assert np.all(np.abs(n[:, [0, 2]]) < 1e-2)


def test_free_fall_no_contact():
    """Before any contact, gravity integration matches closed form."""
    spec, state = sphere_floor_world(rad=0.3, height=5.0)
    final, traj = rollout(spec, state, n_frames=5)
    t = float(final.t)
    y = float(final.pos[1, 1])
    # semi-implicit Euler: y_{k+1} = y_k + v_{k+1} dt, v_{k+1} = v_k - g dt
    dt = spec.cfg.dt
    y_expected, v = 5.0, 0.0
    for _ in range(5):
        v -= 10.0 * dt
        y_expected += v * dt
    np.testing.assert_allclose(y, y_expected, atol=1e-6)
    np.testing.assert_allclose(t, 5 * dt, atol=1e-9)


def test_bounce_reverses_velocity():
    """Sphere dropped on the floor bounces with restitution 0.5."""
    spec, state = sphere_floor_world(rad=0.5, height=1.2)
    final, traj = rollout(spec, state, n_frames=25)
    vy = np.asarray(traj.v)[:, :, 1, 4]  # (T,S) sphere vertical velocity
    valid = np.asarray(traj.valid)
    assert vy[valid].min() < -1.0  # fell
    assert vy[valid].max() > 0.4  # bounced up
    # never sinks through the floor
    ys = np.asarray(traj.pos)[:, :, 1, 1]
    assert ys[valid].min() > 0.4


def test_resting_contact_stays():
    spec, state = sphere_floor_world(rad=0.5, height=0.5)
    final, traj = rollout(spec, state, n_frames=10)
    np.testing.assert_allclose(float(final.pos[1, 1]), 0.5, atol=5e-2)


def test_rollout_gradient_radius():
    """TOC gradient of final height w.r.t. sphere radius after one bounce.

    Ground truth note: the reference's discrete TOC scheme (which we
    replicate) yields d y_T/d r ≈ (1+e) = 1.5 for this scenario — verified
    against a hand-derived 1D simulation implementing exactly the reference
    formulas (world.py:141-257). This deliberately differs from both the
    finite difference of the discrete forward (which is ~0 without TOC —
    the paper's motivating failure) and the continuous-time derivative
    (1+e)(1-(T-t*)/t*) ≈ 0.63; the TOC gradient substitutes the
    contact-time sensitivity for the (useless) discrete one."""

    def final_y(rad, toc=True):
        spec, state = sphere_floor_world(rad=rad, height=1.0, toc=toc)
        final, _ = rollout(spec, state, n_frames=15)
        return final.pos[1, 1]

    # NOTE: rad=0.5 with height=1.0 and dt=1/30 is a degenerate point — the
    # sphere touches the floor EXACTLY at a frame boundary (1 - k(k+1)/180
    # = 0.5 at k=9) and the TOC classification sits on a knife edge; use a
    # generic radius.
    rad0 = jnp.asarray(0.55)
    g = float(jax.grad(final_y)(rad0))
    assert np.isfinite(g)
    # reference-semantics magnitude (mini-1d gives 1.5; full 3D pipeline
    # includes accel/rotation terms and two contact directions)
    assert 0.7 < g < 2.2, g

    # without TOC the frictionless-normal-bounce gradient path vanishes
    g_no_toc = float(jax.grad(lambda r: final_y(r, toc=False))(rad0))
    assert abs(g_no_toc) < 0.3, g_no_toc


def test_radius_recovery_gd():
    """Functional acceptance (reference RESULTS.md trajectory-fitting):
    gradient descent on a trajectory MSE recovers the target radius."""

    def traj_of(rad):
        spec, state = sphere_floor_world(rad=rad, height=1.0)
        _, traj = rollout(spec, state, n_frames=20)
        return traj

    target = traj_of(jnp.asarray(0.6))
    t_pos = jax.lax.stop_gradient(target.pos[:, :, 1, :])
    t_valid = jax.lax.stop_gradient(target.valid)

    def loss(rad):
        traj = traj_of(rad)
        m = (traj.valid & t_valid)[..., None]
        return jnp.sum(jnp.where(m, (traj.pos[:, :, 1, :] - t_pos) ** 2, 0.0)) / jnp.sum(m)

    loss_grad = jax.jit(jax.value_and_grad(loss))
    rad = jnp.asarray(0.45)
    lr = 0.2
    losses = []
    for _ in range(12):
        val, g = loss_grad(rad)
        losses.append(float(val))
        rad = jnp.clip(rad - lr * g, 0.3, 0.9)
    err0 = abs(0.45 - 0.6)
    err = abs(float(rad) - 0.6)
    assert err < 0.5 * err0, (float(rad), losses)
