"""Independent-solver cross-check of the PDIPM on REAL engine LCPs.

The reference keeps a CVXPY fallback as a second opinion on its interior
point solver (`lcp_physics/lcp/solvers/cvxpy.py:29-55`).  Here the same role
is filled at test time by a from-scratch numpy implementation of **Lemke's
complementary pivoting algorithm** — a genuinely independent algorithm
family (pivoting vs interior-point) — run on the exact mixed LCPs
`physics/engine.solve_dynamics` assembles during a rollout
(`engine.dump_contact_lcp`).

The mixed LCP (reference lcp.py KKT conditions):

    Q z + p + Aᵀν + Gᵀλ = 0
    A z = b
    G z + s = h + F λ,   s ≥ 0, λ ≥ 0, sᵀλ = 0

Eliminating (z, ν) through the equality KKT system turns it into a standard
LCP(q, N) in λ with N = F + G W Gᵀ (W = the (1,1) block of the equality-KKT
inverse), which Lemke solves exactly (up to pivot tolerance).  The friction
coupling F makes N asymmetric with zero diagonal blocks — exactly the case
an interior-point bug could hide in, and the case PGS cannot handle.

Velocities z are compared (the physical output; λ itself can be
non-unique under friction-cone degeneracy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsdfsim_tpu.config import SimConfig
from diffsdfsim_tpu.ops.qp import lcp_solve, pdipm_solve_raw
from diffsdfsim_tpu.physics import (
    BoxShape,
    Gravity3D,
    SphereShape,
    TotalConstraint3D,
    make_body,
    make_world,
    rollout,
)
from diffsdfsim_tpu.physics.contacts import search_contacts, find_contacts
from diffsdfsim_tpu.physics.engine import dump_contact_lcp


# --------------------------------------------------------------------------
# independent numpy Lemke solver
# --------------------------------------------------------------------------


def lemke(N, q, max_pivots=500, tol=1e-10):
    """Solve s = q + N λ ≥ 0 ⊥ λ ≥ 0 by Lemke's algorithm with a unit
    covering vector. Returns λ or None on ray termination."""
    m = q.shape[0]
    if np.all(q >= -tol):
        return np.zeros(m)
    # tableau: [I, -N, -1, q] with basis s; artificial z0 enters first
    T = np.hstack([np.eye(m), -N, -np.ones((m, 1)), q[:, None]])
    basis = list(range(m))  # s_i in basis
    # z0 enters, s_r leaves where q_r most negative
    r = int(np.argmin(q))
    z0_col, lam0_col = 2 * m, m

    def pivot(r, c):
        T[r] /= T[r, c]
        for i in range(m):
            if i != r and abs(T[i, c]) > 0:
                T[i] -= T[i, c] * T[r]

    pivot(r, z0_col)
    leaving = basis[r]
    basis[r] = z0_col
    entering = lam0_col + leaving  # complement of s_r is λ_r

    for _ in range(max_pivots):
        col = T[:, entering]
        rhs = T[:, -1]
        ratios = np.where(col > tol, rhs / np.where(col > tol, col, 1.0), np.inf)
        if not np.any(np.isfinite(ratios)):
            return None  # ray termination
        # lexicographic-ish tie-break: prefer the z0 row so z0 leaves ASAP
        r = int(np.argmin(ratios))
        ties = np.where(ratios <= ratios[r] * (1 + 1e-9) + 1e-12)[0]
        for t in ties:
            if basis[t] == z0_col:
                r = int(t)
                break
        pivot(r, entering)
        leaving = basis[r]
        basis[r] = entering
        if leaving == z0_col:
            lam = np.zeros(m)
            for i, b in enumerate(basis):
                if lam0_col <= b < 2 * m:
                    lam[b - lam0_col] = T[i, -1]
            return lam
        # next entering variable: complement of what just left
        entering = leaving + m if leaving < m else leaving - m
    return None


def solve_mixed_lcp_lemke(Q, p, G, h, A, b, F):
    """Independent solve of the engine's mixed LCP: equality-KKT elimination
    + Lemke on the reduced LCP. Returns (z, lam) or (None, None)."""
    n = Q.shape[0]
    neq = A.shape[0]
    K = np.block([[Q, A.T], [A, np.zeros((neq, neq))]]) if neq else Q
    Kinv = np.linalg.inv(K)
    W = Kinv[:n, :n]

    rhs0 = np.concatenate([-p, b]) if neq else -p
    z0 = (Kinv @ rhs0)[:n]
    N = F + G @ W @ G.T
    q = h - G @ z0
    lam = lemke(N, q)
    if lam is None:
        return None, None
    rhs = np.concatenate([-p - G.T @ lam, b]) if neq else -p - G.T @ lam
    z = (Kinv @ rhs)[:n]
    return z, lam


def test_lemke_on_known_lcp():
    """Sanity: Lemke reproduces a hand-checkable QP solution."""
    # min 1/2 z'z - z1  s.t. z <= 0.3 elementwise
    Q = np.eye(3)
    p = np.array([-1.0, 0.0, 0.0])
    G = np.eye(3)
    h = np.full(3, 0.3)
    z, lam = solve_mixed_lcp_lemke(
        Q, p, G, h, np.zeros((0, 3)), np.zeros(0), np.zeros((3, 3))
    )
    np.testing.assert_allclose(z, [0.3, 0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(lam, [0.7, 0.0, 0.0], atol=1e-9)


# --------------------------------------------------------------------------
# cross-check on real engine LCPs
# --------------------------------------------------------------------------


def _world(cfg, drop, vel_x=0.0):
    floor = make_body(
        BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=3,
        fric_coeff=0.25, restitution=0.0,
    )
    sphere = make_body(
        SphereShape(jnp.asarray(0.55)), subdiv=2,
        fric_coeff=0.25, restitution=0.0,
    )
    poses = jnp.array([[1.0, 0, 0, 0, 0.0, -0.5, 0.0], [1.0, 0, 0, 0, 0.0, drop, 0.0]])
    vels = jnp.zeros((2, 6)).at[1, 3].set(vel_x)
    return make_world(
        [floor, sphere], poses, vels,
        joints=(TotalConstraint3D(body1=0),),
        forces=((), (Gravity3D(10.0),)), cfg=cfg,
    )


def _collect_lcps(n_frames=25):
    """Roll a bouncing+sliding sphere and dump every in-contact frame's
    assembled LCP (concrete arrays, so the dump runs outside jit on the
    recorded trajectory states)."""
    cfg = SimConfig(
        fric_dirs=8, max_contacts_per_pair=4, max_contacts_total=4,
        mesh_subdiv=2, max_substeps=3, max_bisect=6, tol=1e-8,
    )
    # start just above rest height with a horizontal push: settles into
    # sliding/rolling frictional contact for most frames
    spec, state = _world(cfg, 0.58, vel_x=1.5)
    final, traj = rollout(spec, state, n_frames=n_frames)

    lcps = []
    for fr in range(n_frames):
        st = state.replace(
            quat=traj.quat[fr, 0], pos=traj.pos[fr, 0],
            v=traj.v[fr, 0], t=traj.t[fr, 0],
        )
        cache = search_contacts(
            spec.bodies, st.quat, st.pos, spec.directed_pairs, cfg
        )
        contacts = find_contacts(
            spec.bodies, st.quat, st.pos, spec.directed_pairs,
            spec.n_unordered, cfg, cache=cache,
        )
        if not bool(jnp.any(contacts.valid)):
            continue
        args, structure = dump_contact_lcp(
            spec.bodies, spec.joints, spec.forces, st, contacts,
            jnp.asarray(cfg.dt, dtype=st.v.dtype), cfg,
        )
        lcps.append((args, structure))
    return lcps


@pytest.fixture(scope="module")
def engine_lcps():
    lcps = _collect_lcps()
    assert len(lcps) >= 3, "expected several in-contact frames"
    return lcps


def test_pdipm_matches_lemke_on_engine_lcps(engine_lcps):
    """The PDIPM's velocity solution must match the independent Lemke solve
    on every real assembled LCP of a bounce+slide rollout."""
    checked = 0
    for args, structure in engine_lcps[:8]:
        Q, p, G, h, A, b, F = [np.asarray(a[0], dtype=np.float64) for a in args]
        x = lcp_solve(*[jnp.asarray(a) for a in args], 30, 1e-12, 3, structure)
        x = np.asarray(x[0], dtype=np.float64)

        z_ref, lam_ref = solve_mixed_lcp_lemke(Q, p, G, h, A, b, F)
        assert z_ref is not None, "Lemke ray termination on an engine LCP"
        scale = max(1.0, float(np.max(np.abs(z_ref))))
        np.testing.assert_allclose(x, z_ref, atol=2e-5 * scale, rtol=2e-4)
        checked += 1
    assert checked >= 3


def test_pdipm_duals_satisfy_complementarity(engine_lcps):
    """Full primal-dual outputs must satisfy the mixed-LCP KKT system to
    solver tolerance (independent residual audit, no second solver)."""
    for args, structure in engine_lcps[:4]:
        Q, p, G, h, A, b, F = [np.asarray(a[0], dtype=np.float64) for a in args]
        x, y, lam, s = pdipm_solve_raw(
            *[jnp.asarray(a) for a in args], 30, 1e-12, 3, structure
        )
        x, y, lam, s = [np.asarray(a[0], dtype=np.float64) for a in (x, y, lam, s)]
        # stationarity
        r1 = Q @ x + p + G.T @ lam + (A.T @ y if A.size else 0.0)
        # primal feasibility (ineq with slack + coupling)
        r2 = G @ x + s - h - F @ lam
        # equality
        r3 = A @ x - b if A.size else np.zeros(0)
        assert np.max(np.abs(r1)) < 1e-5
        assert np.max(np.abs(r2)) < 1e-5
        if r3.size:
            assert np.max(np.abs(r3)) < 1e-5
        assert np.min(s) > -1e-6 and np.min(lam) > -1e-6
        assert abs(np.dot(s, lam)) < 1e-5
