"""Structured (Cholesky+Woodbury) Schur path vs the generic LU path.

The physics mixed LCP has G = [Jc; Jf; 0] with the E/mu friction coupling in
F (reference engines.py:72-78). _factor_S("fric") eliminates the cone rows
analytically and factors the SPD remainder with Cholesky + a rank-k Woodbury
correction; these tests pin it to the generic path bit-for-bit (same
problem, same iterations).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsdfsim_tpu.ops.qp import lcp_solve, _pre_factor, _factor_S, _solve_S


def _fric_problem(key, nz=12, neq=6, k=3, fd=4):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    L = jax.random.normal(k1, (1, nz, nz))
    Q = L @ jnp.swapaxes(L, -1, -2) + nz * jnp.eye(nz)
    p = jax.random.normal(k2, (1, nz))
    Jc = jax.random.normal(k3, (1, k, nz))
    Jf = jax.random.normal(k4, (1, k * fd, nz))
    G = jnp.concatenate([Jc, Jf, jnp.zeros((1, k, nz))], axis=1)
    A = jax.random.normal(k5, (1, neq, nz)) if neq else jnp.zeros((1, 0, nz))
    b = jnp.zeros((1, neq))
    mu = jax.random.uniform(k6, (1, k), minval=0.1, maxval=0.9)
    E = jnp.repeat(jnp.eye(k), fd, axis=0)
    nineq = k * (2 + fd)
    F = jnp.zeros((1, nineq, nineq))
    F = F.at[:, k : k + k * fd, -k:].set(E)
    F = F.at[:, -k:, :k].set(jax.vmap(jnp.diag)(mu))
    F = F.at[:, -k:, k : k + k * fd].set(-E.T)
    h = jnp.concatenate(
        [jax.random.uniform(k2, (1, k)) + 0.5, jnp.zeros((1, k * fd + k))], axis=1
    )
    return Q, p, G, h, A, b, F, k, fd


@pytest.mark.parametrize("neq,k,fd", [(6, 3, 4), (0, 2, 8), (4, 1, 2), (0, 4, 4)])
def test_solve_S_fric_matches_lu(neq, k, fd):
    Q, p, G, h, A, b, F, k, fd = _fric_problem(
        jax.random.PRNGKey(neq * 31 + k * 7 + fd), neq=neq, k=k, fd=fd
    )
    nineq = G.shape[1]
    d = jnp.abs(jax.random.normal(jax.random.PRNGKey(5), (1, nineq))) + 0.3

    cache_lu = _pre_factor(Q, G, A, F, None)
    cache_fr = _pre_factor(Q, G, A, F, ("fric", k, fd))
    hvec = jax.random.normal(jax.random.PRNGKey(9), (1, neq + nineq))

    w_lu = _solve_S(cache_lu, _factor_S(cache_lu, d), hvec)
    w_fr = _solve_S(cache_fr, _factor_S(cache_fr, d), hvec)
    np.testing.assert_allclose(np.asarray(w_fr), np.asarray(w_lu), rtol=1e-8, atol=1e-10)


def test_lcp_solve_structured_matches_generic():
    Q, p, G, h, A, b, F, k, fd = _fric_problem(jax.random.PRNGKey(0))
    z_gen = lcp_solve(Q, p, G, h, A, b, F, 15, 1e-12, 3, None)
    z_str = lcp_solve(Q, p, G, h, A, b, F, 15, 1e-12, 3, ("fric", k, fd))
    np.testing.assert_allclose(np.asarray(z_str), np.asarray(z_gen), rtol=1e-6, atol=1e-8)


def test_lcp_grad_structured_matches_generic():
    Q, p, G, h, A, b, F, k, fd = _fric_problem(jax.random.PRNGKey(2))

    def loss(p_, structure):
        z = lcp_solve(Q, p_, G, h, A, b, F, 15, 1e-12, 3, structure)
        return jnp.sum(z**2)

    g_gen = jax.grad(lambda p_: loss(p_, None))(p)
    g_str = jax.grad(lambda p_: loss(p_, ("fric", k, fd)))(p)
    np.testing.assert_allclose(np.asarray(g_str), np.asarray(g_gen), rtol=1e-5, atol=1e-8)


def test_solve_S_plain_matches_lu():
    # F = 0 (post-stabilization layout): SPD Cholesky path
    key = jax.random.PRNGKey(3)
    nz, neq, k = 12, 6, 4
    L = jax.random.normal(key, (1, nz, nz))
    Q = L @ jnp.swapaxes(L, -1, -2) + nz * jnp.eye(nz)
    G = jax.random.normal(jax.random.PRNGKey(4), (1, k, nz))
    A = jax.random.normal(jax.random.PRNGKey(5), (1, neq, nz))
    F = jnp.zeros((1, k, k))
    d = jnp.abs(jax.random.normal(jax.random.PRNGKey(6), (1, k))) + 0.3
    hvec = jax.random.normal(jax.random.PRNGKey(7), (1, neq + k))

    cache_lu = _pre_factor(Q, G, A, F, None)
    cache_pl = _pre_factor(Q, G, A, F, ("plain",))
    w_lu = _solve_S(cache_lu, _factor_S(cache_lu, d), hvec)
    w_pl = _solve_S(cache_pl, _factor_S(cache_pl, d), hvec)
    np.testing.assert_allclose(np.asarray(w_pl), np.asarray(w_lu), rtol=1e-8, atol=1e-10)
