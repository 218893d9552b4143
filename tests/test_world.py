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
    """Gradient of final height w.r.t. sphere radius is nonzero and finite
    after a bounce, and matches finite differences."""
    def final_y(rad):
        spec, state = sphere_floor_world(rad=rad, height=1.0)
        final, _ = rollout(spec, state, n_frames=15)
        return final.pos[1, 1]

    rad0 = jnp.asarray(0.5)
    g = jax.grad(final_y)(rad0)
    assert np.isfinite(float(g))
    eps = 1e-4
    fd = (float(final_y(rad0 + eps)) - float(final_y(rad0 - eps))) / (2 * eps)
    assert abs(fd) > 1e-3  # radius must matter after a bounce
    np.testing.assert_allclose(float(g), fd, rtol=0.25, atol=5e-3)
