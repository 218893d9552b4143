"""Pallas PDIPM kernel vs the XLA reference implementation.

The kernel (ops/qp_pallas.py) must reproduce ops.qp._pdipm_forward on the
physics friction-LCP problem family — same Mehrotra iterates up to the
order-of-operations, so solutions agree to solver tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsdfsim_tpu.ops.qp import pdipm_solve_raw
from diffsdfsim_tpu.ops.qp_pallas import pdipm_pallas

from test_qp_structure import _fric_problem


def _stack_problems(keys, neq=6, k=3, fd=4):
    probs = [_fric_problem(kk, neq=neq, k=k, fd=fd)[:7] for kk in keys]
    return [jnp.concatenate([p[i] for p in probs], axis=0) for i in range(7)]


@pytest.mark.parametrize("neq,k,fd,nb", [(6, 3, 4, 5), (0, 2, 8, 3), (4, 1, 2, 8)])
def test_pallas_matches_xla_fric(neq, k, fd, nb):
    keys = jax.random.split(jax.random.PRNGKey(neq * 101 + k * 13 + fd), nb)
    Q, p, G, h, A, b, F = _stack_problems(keys, neq=neq, k=k, fd=fd)

    x_ref, y_ref, z_ref, s_ref = pdipm_solve_raw(
        Q, p, G, h, A, b, F, 10, 1e-9, 3, None
    )
    x_pl, y_pl, z_pl, s_pl = pdipm_pallas(
        Q, p, G, h, A, b, F, max_iter=10, eps=1e-9, interpret=True
    )
    # both are interior-point approximations of the same solution; compare
    # primal iterates to solver tolerance
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_ref), rtol=2e-4, atol=2e-5)
    if neq > 0:
        np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=2e-3, atol=2e-4)
    assert y_pl.shape == (nb, neq)


def test_pallas_padded_batch_lanes_independent():
    """Results must not depend on batch padding (B=3 pads to 8)."""
    keys = jax.random.split(jax.random.PRNGKey(42), 3)
    Q, p, G, h, A, b, F = _stack_problems(keys)
    x3, *_ = pdipm_pallas(Q, p, G, h, A, b, F, interpret=True)

    keys8 = jax.random.split(jax.random.PRNGKey(42), 3)
    Q8, p8, G8, h8, A8, b8, F8 = _stack_problems(list(keys8) + list(keys8)[:1] * 5)
    x8, *_ = pdipm_pallas(Q8, p8, G8, h8, A8, b8, F8, interpret=True)
    np.testing.assert_allclose(np.asarray(x3), np.asarray(x8[:3]), rtol=1e-6, atol=1e-8)


def test_pallas_physics_problem():
    """The actual physics assembly (resting sphere-on-floor LCP) solved by
    kernel vs XLA path, checking the resulting velocity impulse."""
    from diffsdfsim_tpu.config import SimConfig
    from diffsdfsim_tpu.physics import (
        BoxShape, Gravity3D, SphereShape, TotalConstraint3D, make_body, make_world,
    )
    from diffsdfsim_tpu.physics.engine import probe_dynamics_batch

    cfg = SimConfig(fric_dirs=8, max_contacts_per_pair=4, max_contacts_total=4,
                    mesh_subdiv=2, tol=1e-6, strict_no_penetration=False)
    floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=3, fric_coeff=0.25)
    sphere = make_body(SphereShape(0.5), subdiv=2, fric_coeff=0.25)
    poses = jnp.array([[1.0, 0, 0, 0, 0.0, -0.5, 0.0],
                       [1.0, 0, 0, 0, 0.0, 0.4999999, 0.0]])
    spec, state = make_world(
        [floor, sphere], poses, jnp.zeros((2, 6)),
        joints=(TotalConstraint3D(body1=0),),
        forces=((), (Gravity3D(10.0),)), cfg=cfg,
    )
    assert bool(jnp.any(state.contacts.valid))
    dts = cfg.dt * 0.5 ** jnp.arange(4.0)

    new_v_x, _ = probe_dynamics_batch(
        spec.bodies, spec.joints, spec.forces, state, state.contacts, dts,
        cfg.replace(solver_backend="xla"),
    )
    new_v_p, _ = probe_dynamics_batch(
        spec.bodies, spec.joints, spec.forces, state, state.contacts, dts,
        cfg.replace(solver_backend="pallas"),
    )
    np.testing.assert_allclose(
        np.asarray(new_v_p), np.asarray(new_v_x), rtol=1e-4, atol=1e-6
    )


def test_kkt_grad_pallas_matches_xla():
    """Backward implicit-diff solve: structure ("fric_pallas", ...) must give
    the same input gradients as the XLA ("fric", ...) path. Q is the
    block-diagonal mass-matrix layout the pallas path's analytic inverse
    assumes."""
    from diffsdfsim_tpu.ops.qp import lcp_solve_from_solution, pdipm_solve_raw

    key = jax.random.PRNGKey(11)
    nz, neq, k, fd = 12, 6, 3, 4
    blocks = []
    for i in range(nz // 3):
        L = jax.random.normal(jax.random.fold_in(key, i), (3, 3))
        blocks.append(L @ L.T + 3 * jnp.eye(3))
    Q = jax.scipy.linalg.block_diag(*blocks)[None]
    _, p, G, h, A, b, F, k, fd = _fric_problem(key, nz=nz, neq=neq, k=k, fd=fd)
    # the ("fric_pallas", ...) structure flag asserts the ENGINE's friction
    # layout, whose direction rows come in per-contact +/- pairs
    # (engine.friction_dirs) — rebuild Jf accordingly
    Jb = jax.random.normal(jax.random.fold_in(key, 99), (1, k, fd // 2, nz))
    Jf = jnp.concatenate([Jb, -Jb], axis=2).reshape(1, k * fd, nz)
    G = jnp.concatenate([G[:, :k], Jf, jnp.zeros((1, k, nz))], axis=1)

    sol = pdipm_solve_raw(Q, p, G, h, A, b, F, 10, 1e-9, 3, None)

    def loss(args, structure):
        p_, G_, h_ = args
        x = lcp_solve_from_solution(Q, p_, G_, h_, A, b, F, sol, structure)
        return jnp.sum(x**2) + jnp.sum(x[:, :3] * x[:, 3:6])

    g_x = jax.grad(lambda a: loss(a, ("fric", k, fd)))((p, G, h))
    g_p = jax.grad(lambda a: loss(a, ("fric_pallas", k, fd)))((p, G, h))
    for gx, gp, name in zip(g_x, g_p, ("p", "G", "h")):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=1e-5, atol=1e-8,
            err_msg=f"grad mismatch for {name}",
        )
