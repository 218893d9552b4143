import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsdfsim_tpu.ops.qp import lcp_solve


def make_random_qp(key, nb=4, nz=6, nineq=4, neq=2):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    L = jax.random.normal(k1, (nb, nz, nz))
    Q = L @ jnp.swapaxes(L, 1, 2) + 0.5 * jnp.eye(nz)
    p = jax.random.normal(k2, (nb, nz))
    G = jax.random.normal(k3, (nb, nineq, nz))
    # h chosen so z=0 is strictly feasible
    h = jax.random.uniform(k4, (nb, nineq), minval=0.5, maxval=1.5)
    A = jax.random.normal(k5, (nb, neq, nz))
    b = jnp.zeros((nb, neq))
    F = jnp.zeros((nb, nineq, nineq))
    return Q, p, G, h, A, b, F


def solve_qp_reference(Q, p, G, h, A, b):
    """Active-set-free reference via scipy for a single QP."""
    from scipy.optimize import minimize

    nz = Q.shape[0]
    cons = [
        {"type": "ineq", "fun": lambda z: h - G @ z, "jac": lambda z: -G},
    ]
    if A.shape[0] > 0:
        cons.append({"type": "eq", "fun": lambda z: A @ z - b, "jac": lambda z: A})
    res = minimize(
        lambda z: 0.5 * z @ Q @ z + p @ z,
        np.zeros(nz),
        jac=lambda z: Q @ z + p,
        constraints=cons,
        method="SLSQP",
        options={"maxiter": 200, "ftol": 1e-12},
    )
    return res.x


def test_qp_matches_scipy():
    Q, p, G, h, A, b, F = make_random_qp(jax.random.PRNGKey(0))
    z = lcp_solve(Q, p, G, h, A, b, F, 25, 1e-12, 5)
    for i in range(Q.shape[0]):
        z_ref = solve_qp_reference(
            np.asarray(Q[i]), np.asarray(p[i]), np.asarray(G[i]),
            np.asarray(h[i]), np.asarray(A[i]), np.asarray(b[i]),
        )
        np.testing.assert_allclose(np.asarray(z[i]), z_ref, atol=1e-5)


def test_qp_no_eq():
    key = jax.random.PRNGKey(1)
    Q, p, G, h, A, b, F = make_random_qp(key, neq=2)
    A0 = jnp.zeros((Q.shape[0], 0, Q.shape[-1]))
    b0 = jnp.zeros((Q.shape[0], 0))
    z = lcp_solve(Q, p, G, h, A0, b0, F, 25, 1e-12, 5)
    for i in range(Q.shape[0]):
        z_ref = solve_qp_reference(
            np.asarray(Q[i]), np.asarray(p[i]), np.asarray(G[i]),
            np.asarray(h[i]), np.zeros((0, Q.shape[-1])), np.zeros(0),
        )
        np.testing.assert_allclose(np.asarray(z[i]), z_ref, atol=1e-5)


def test_qp_unconstrained_active():
    """QP whose solution has no active inequality: matches -Q^{-1} p."""
    nz = 4
    Q = jnp.eye(nz)[None] * 2.0
    p = jnp.array([[1.0, -1.0, 0.5, 0.0]])
    G = jnp.eye(nz)[None]
    h = jnp.full((1, nz), 10.0)
    A = jnp.zeros((1, 0, nz))
    b = jnp.zeros((1, 0))
    F = jnp.zeros((1, nz, nz))
    z = lcp_solve(Q, p, G, h, A, b, F, 20, 1e-12, 3)
    np.testing.assert_allclose(z, -p / 2.0, atol=1e-7)


def test_qp_gradients_vs_fd():
    """Implicit-diff gradients match finite differences on active QPs."""
    nz, nineq, neq = 4, 3, 1
    key = jax.random.PRNGKey(2)
    Q, p, G, h, A, b, F = make_random_qp(key, nb=1, nz=nz, nineq=nineq, neq=neq)
    # make some constraints active
    h = h * 0.05

    def loss(p_):
        z = lcp_solve(Q, p_, G, h, A, b, F, 30, 1e-12, 5)
        return jnp.sum(z**2)

    g = jax.grad(loss)(p)
    eps = 1e-6
    for i in range(nz):
        dp = jnp.zeros_like(p).at[0, i].set(eps)
        fd = (loss(p + dp) - loss(p - dp)) / (2 * eps)
        np.testing.assert_allclose(g[0, i], fd, rtol=2e-3, atol=1e-6)


def test_qp_gradients_h_vs_fd():
    nz, nineq, neq = 4, 3, 1
    Q, p, G, h, A, b, F = make_random_qp(jax.random.PRNGKey(3), nb=1, nz=nz, nineq=nineq, neq=neq)
    h = h * 0.05

    def loss(h_):
        z = lcp_solve(Q, p, G, h_, A, b, F, 30, 1e-12, 5)
        return jnp.sum(z**2)

    g = jax.grad(loss)(h)
    eps = 1e-6
    for i in range(nineq):
        dh = jnp.zeros_like(h).at[0, i].set(eps)
        fd = (loss(h + dh) - loss(h - dh)) / (2 * eps)
        np.testing.assert_allclose(g[0, i], fd, rtol=5e-3, atol=1e-6)


def test_qp_padded_inert_rows():
    """Zero G rows with h=1 must not perturb the solution (contact padding)."""
    nz = 4
    Q = jnp.eye(nz)[None] * 2.0
    p = jnp.array([[1.0, -1.0, 0.5, 0.0]])
    G1 = jnp.eye(nz)[None]
    h1 = jnp.full((1, nz), 0.1)
    A = jnp.zeros((1, 0, nz))
    b = jnp.zeros((1, 0))
    F1 = jnp.zeros((1, nz, nz))
    z1 = lcp_solve(Q, p, G1, h1, A, b, F1, 30, 1e-12, 5)

    G2 = jnp.concatenate([G1, jnp.zeros((1, 3, nz))], axis=1)
    h2 = jnp.concatenate([h1, jnp.ones((1, 3))], axis=1)
    F2 = jnp.zeros((1, nz + 3, nz + 3))
    z2 = lcp_solve(Q, p, G2, h2, A, b, F2, 30, 1e-12, 5)
    np.testing.assert_allclose(z1, z2, atol=1e-6)


def test_pdipm_solve_checked_fallback():
    """Runtime accuracy fallback (reference INACC_ERR / CVXPY escape hatch):
    an under-iterated solve must trigger the escalation and come back with
    a small residual."""
    from diffsdfsim_tpu.ops.qp import lcp_residuals, pdipm_solve_checked

    key = jax.random.PRNGKey(3)
    nz, nineq, neq = 8, 6, 2
    L = jax.random.normal(key, (1, nz, nz))
    Q = L @ jnp.swapaxes(L, -1, -2) + nz * jnp.eye(nz)
    p = jax.random.normal(jax.random.fold_in(key, 1), (1, nz))
    G = jax.random.normal(jax.random.fold_in(key, 2), (1, nineq, nz))
    h = jax.random.uniform(jax.random.fold_in(key, 3), (1, nineq)) + 0.2
    A = jax.random.normal(jax.random.fold_in(key, 4), (1, neq, nz))
    b = jnp.zeros((1, neq))
    F = jnp.zeros((1, nineq, nineq))

    # 1 iteration: nowhere near converged -> fallback must trigger
    sol, resids, fell_back = pdipm_solve_checked(
        Q, p, G, h, A, b, F, max_iter=1, eps=1e-12,
        fallback_iters=25, fallback_thresh=1e-6,
    )
    assert bool(fell_back)
    assert float(jnp.max(resids)) < 1e-6

    # plenty of iterations: no fallback
    _, resids2, fell_back2 = pdipm_solve_checked(
        Q, p, G, h, A, b, F, max_iter=20, eps=1e-12,
        fallback_iters=25, fallback_thresh=1e-6,
    )
    assert not bool(fell_back2)
