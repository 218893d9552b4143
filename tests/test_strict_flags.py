"""strict_no_penetration + silent-cap surfacing (VERDICT r1 task 7).

Reference behavior being matched:
- construction-time interpenetration assert
  (`lcp_physics/physics/world.py:98-100`)
- strict-mode failure when dt-bisection hits the floor still penetrating
  (`lcp_physics/physics/world.py:344-356`) — under jit we surface a
  per-substep `bisect_failed` flag instead of raising
- substep exhaustion (frame ends before covering cfg.dt) was previously
  silent; now carried as `Trajectory.truncated`.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from diffsdfsim_tpu.config import SimConfig
from diffsdfsim_tpu.physics import (
    BoxShape,
    Gravity3D,
    SphereShape,
    TotalConstraint3D,
    make_body,
    make_world,
    rollout,
    run_world,
)

CFG = SimConfig(fric_dirs=4, max_contacts_per_pair=4, max_contacts_total=8,
                mesh_subdiv=2, max_substeps=4, max_bisect=6, tol=1e-6)


def _world(height, cfg, strict):
    floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=3)
    sphere = make_body(SphereShape(0.5), subdiv=2)
    poses = jnp.array([[1.0, 0, 0, 0, 0.0, -0.5, 0.0],
                       [1.0, 0, 0, 0, 0.0, height, 0.0]])
    vels = jnp.zeros((2, 6))
    return make_world(
        [floor, sphere], poses, vels,
        joints=(TotalConstraint3D(body1=0),),
        forces=((), (Gravity3D(10.0),)),
        cfg=cfg.replace(strict_no_penetration=strict),
    )


def test_construction_assert_raises_on_penetration():
    with pytest.raises(ValueError, match="strict_no_penetration"):
        _world(height=0.3, cfg=CFG, strict=True)  # sphere 0.2 deep in floor


def test_construction_no_raise_when_disabled():
    spec, state = _world(height=0.3, cfg=CFG, strict=False)
    assert bool(state.contacts.max_pen_all > CFG.tol)


def test_construction_no_raise_when_separated():
    spec, state = _world(height=1.0, cfg=CFG, strict=True)
    assert not bool(jnp.any(state.contacts.valid))


def test_start_penetration_accepted_without_bisection():
    """Pre-existing penetration the step does not worsen must be accepted in
    O(1) probes (acceptance vs max(tol, start_pen)): halving dt cannot
    remove penetration that exists at step start, so re-running the full
    bisection ladder every substep (reference world.py:349 semantics in f32)
    is pure waste — measured 20 ms vs 0.4 ms per resting frame."""
    spec, state = _world(height=0.3, cfg=CFG, strict=False)
    final, traj = rollout(spec, state, n_frames=2)
    valid = np.asarray(traj.valid)
    assert not np.asarray(traj.bisect_failed)[valid].any()
    assert np.asarray(traj.n_halvings)[valid].max() == 0


def _overflow_world():
    """Two spheres over the floor but only ONE global contact slot: the
    dropped sphere falls unconstrained, deepening penetration at every dt —
    the one state where bisection genuinely fails."""
    cfg = CFG.replace(max_contacts_total=1, max_contacts_per_pair=1)
    floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=3)
    s1 = make_body(SphereShape(0.5), subdiv=2)
    s2 = make_body(SphereShape(0.5), subdiv=2)
    poses = jnp.array([
        [1.0, 0, 0, 0, 0.0, -0.5, 0.0],
        [1.0, 0, 0, 0, -2.0, 0.45, 0.0],
        [1.0, 0, 0, 0, 2.0, 0.45, 0.0],
    ])
    vels = jnp.zeros((3, 6)).at[1, 4].set(-1.0).at[2, 4].set(-1.0)
    return make_world(
        [floor, s1, s2], poses, vels,
        joints=(TotalConstraint3D(body1=0),),
        forces=((), (Gravity3D(10.0),), (Gravity3D(10.0),)),
        cfg=cfg.replace(strict_no_penetration=False),
        no_contact=((1, 2),),
    )


def test_bisect_failed_flag_on_worsening_penetration():
    spec, state = _overflow_world()
    final, traj = rollout(spec, state, n_frames=3)
    bf = np.asarray(traj.bisect_failed)
    valid = np.asarray(traj.valid)
    assert bf.shape == valid.shape
    assert bf[valid].any()


def test_bisect_failed_clear_in_normal_sim():
    spec, state = _world(height=1.0, cfg=CFG, strict=False)
    final, traj = rollout(spec, state, n_frames=10)
    bf = np.asarray(traj.bisect_failed)
    assert not bf[np.asarray(traj.valid)].any()


def test_truncated_flag_on_substep_exhaustion():
    """max_substeps=1 with a mid-frame contact forces dt-halving: the single
    substep covers < dt, so the frame must report truncation."""
    cfg = CFG.replace(max_substeps=1)
    # drop height so the sphere crosses the floor surface mid-frame
    spec, state = _world(height=0.52, cfg=cfg, strict=False)
    state = state.replace(v=state.v.at[1, 4].set(-1.0))
    final, traj = rollout(spec, state, n_frames=2)
    tr = np.asarray(traj.truncated)
    assert tr.shape == (2,)
    assert tr.any()
    # and simulated time falls visibly short of 2*dt
    assert float(final.t) < 2 * cfg.dt - 1e-9


def test_truncated_clear_when_substeps_suffice():
    spec, state = _world(height=1.0, cfg=CFG, strict=False)
    final, traj = rollout(spec, state, n_frames=5)
    assert not np.asarray(traj.truncated).any()
    np.testing.assert_allclose(float(final.t), 5 * CFG.dt, atol=1e-9)


def test_run_world_strict_raises_on_bisect_floor():
    spec, state = _overflow_world()
    # flip to strict after construction (the overflow scene starts clean but
    # loses a contact to the 1-slot buffer mid-run)
    spec.cfg = spec.cfg.replace(strict_no_penetration=True)
    with pytest.raises(AssertionError, match="strict_no_penetration"):
        run_world(spec, state, run_time=4 * CFG.dt)
