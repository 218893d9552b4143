"""Scan-unroll knobs (cfg.substep_unroll / cfg.frame_unroll) are pure
dispatch-overhead levers: value AND gradient must be bitwise-identical to
the rolled scans (lax.scan unroll changes scheduling, not math)."""

import jax
import jax.numpy as jnp

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

CFG = SimConfig(fric_dirs=4, max_contacts_per_pair=2, max_contacts_total=2,
                mesh_subdiv=1, max_substeps=3, max_bisect=4)


def _loss(rad, cfg):
    floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=2,
                      fric_coeff=0.25)
    sphere = make_body(SphereShape(rad), subdiv=1, fric_coeff=0.25)
    poses = jnp.array([[1.0, 0, 0, 0, 0.0, -0.5, 0.0],
                       [1.0, 0, 0, 0, 0.0, 1.1, 0.0]])
    vels = jnp.zeros((2, 6))
    spec, state = make_world(
        [floor, sphere], poses, vels,
        joints=(TotalConstraint3D(body1=0),),
        forces=((), (Gravity3D(10.0),)), cfg=cfg,
    )
    final, traj = rollout(spec, state, n_frames=6)
    return jnp.sum(traj.pos[:, :, 1, :] ** 2 * traj.valid[:, :, None])


def test_unroll_value_and_grad_identical():
    rad = jnp.asarray(0.55)
    base = jax.jit(jax.value_and_grad(lambda r: _loss(r, CFG)))(rad)
    cfg_u = CFG.replace(substep_unroll=3, frame_unroll=2)
    unr = jax.jit(jax.value_and_grad(lambda r: _loss(r, cfg_u)))(rad)
    assert float(base[0]) == float(unr[0])
    assert float(base[1]) == float(unr[1])


def test_unroll_with_dots_policy_close():
    """remat_policy='dots' changes which residuals are saved vs recomputed;
    same math up to re-association — require tight agreement, not bitwise."""
    rad = jnp.asarray(0.55)
    base = jax.jit(jax.value_and_grad(lambda r: _loss(r, CFG)))(rad)
    cfg_d = CFG.replace(remat_policy="dots")
    dots = jax.jit(jax.value_and_grad(lambda r: _loss(r, cfg_d)))(rad)
    assert abs(float(base[0]) - float(dots[0])) <= 1e-12 * max(1.0, abs(float(base[0])))
    assert abs(float(base[1]) - float(dots[1])) <= 1e-9 * max(1.0, abs(float(base[1])))
