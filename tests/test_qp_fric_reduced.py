"""Reduced friction-structure Schur solve (qp_pallas structure=("fric",k,fd))
vs the generic full-system kernel.

The reduction (cone-row elimination + +/- friction-pair folding with a
per-contact Sherman-Morrison, see _make_kernel docstring) is exact algebra:
on problems with the physics layout (Jf per-contact blocks [+dirs | -dirs],
E/mu cone coupling — engine.assemble_contact_lcp) the Mehrotra iterates
must match the generic kernel to round-off."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsdfsim_tpu.ops.qp_pallas import pdipm_pallas


def _fric_pm_problem(key, nz=12, neq=6, k=4, fd=8):
    """Random mixed LCP with the EXACT physics friction structure, including
    the +/- direction-pair layout the reduced solve asserts."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    L = jax.random.normal(k1, (1, nz, nz))
    Q = L @ jnp.swapaxes(L, -1, -2) + nz * jnp.eye(nz)
    p = jax.random.normal(k2, (1, nz))
    Jc = jax.random.normal(k3, (1, k, nz))
    Jb = jax.random.normal(k4, (1, k, fd // 2, nz))
    Jf = jnp.concatenate([Jb, -Jb], axis=2).reshape(1, k * fd, nz)
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
        [jax.random.uniform(k2, (1, k)) + 0.5, jnp.zeros((1, k * fd + k))],
        axis=1,
    )
    return Q, p, G, h, A, b, F


@pytest.mark.parametrize("neq,k,fd,nb", [(6, 4, 8, 5), (0, 2, 4, 3), (3, 1, 2, 4)])
def test_reduced_matches_generic(neq, k, fd, nb):
    keys = jax.random.split(jax.random.PRNGKey(neq * 7 + k * 3 + fd), nb)
    probs = [_fric_pm_problem(kk, neq=neq, k=k, fd=fd) for kk in keys]
    args = [jnp.concatenate([pr[i] for pr in probs], axis=0) for i in range(7)]

    xg, yg, zg, sg = pdipm_pallas(*args, max_iter=10, eps=1e-9, interpret=True)
    xr, yr, zr, sr = pdipm_pallas(
        *args, max_iter=10, eps=1e-9, interpret=True, structure=("fric", k, fd)
    )
    # identical iterates up to round-off of the restructured linear solve
    np.testing.assert_allclose(np.asarray(xr), np.asarray(xg), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(zr), np.asarray(zg), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sr), np.asarray(sg), rtol=1e-6, atol=1e-8)
    if neq:
        np.testing.assert_allclose(np.asarray(yr), np.asarray(yg), rtol=1e-6, atol=1e-8)


def test_reduced_refuses_unstructured():
    """Without the +/- layout guarantee the structured path must NOT engage
    (odd fd) — _fric_ok gates it statically."""
    from diffsdfsim_tpu.ops.qp_pallas import _fric_ok

    assert not _fric_ok(("fric", 4, 3), 4 * 5, 6)  # odd fd
    assert not _fric_ok(("fric", 0, 8), 0, 6)  # no contacts
    assert not _fric_ok(None, 40, 6)
    assert not _fric_ok(("plain",), 40, 6)
    assert _fric_ok(("fric", 4, 8), 40, 6)
