"""Dynamics assembly and the PDIPM engine.

Port of the reference `PdipmEngine` (`lcp_physics/physics/engines.py:16-121`)
plus the matrix builders from `World`/`World3D`
(`lcp_physics/physics/world.py:402-501`, `sdf_physics/physics3d/world.py:
48-101`) to fixed-shape masked assembly:

- M: block-diagonal of per-body [R I Rᵀ, m I₃] (world3d.py:48-50,
  bodies.py:429-435); rebuilt every call because it rotates with the body
- Je: static joint rows scattered into static body columns
- Jc: per-contact rows [c×n, n | -(c₂×n), -n] scattered by DYNAMIC body
  index one-hots (contacts are compacted across pairs)
- Jf: friction pyramid, 4 or 8 directions ± (world3d.py:72-101)
- mu/E/restitutions: per-contact averages and the selector pattern
  (world.py:480-501)
- padded (invalid) contact slots get zero G rows and h = 1 on all their
  inequality rows, making them strictly feasible and inert in the LCP.

``solve_dynamics`` branches (lax.cond) between the exact equality-constrained
linear solve (no contacts, engines.py:42-54 / Cline eq. 2.41) and the mixed
LCP (engines.py:56-82).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..ops.qp import _small_solve, lcp_solve, lcp_solve_from_solution, pdipm_solve_raw
from ..utils.quaternion import quat_to_matrix
from ..utils.spherical import normalize, orthogonal
from .contacts import Contacts


def mass_matrix(bodies, quat):
    """(6B, 6B) block-diagonal generalized mass matrix."""
    nb = len(bodies)
    dtype = quat.dtype
    M = jnp.zeros((6 * nb, 6 * nb), dtype=dtype)
    for b, bd in enumerate(bodies):
        R = quat_to_matrix(quat[b])
        M = M.at[6 * b : 6 * b + 3, 6 * b : 6 * b + 3].set(R @ bd.ang_inertia @ R.T)
        M = M.at[6 * b + 3 : 6 * b + 6, 6 * b + 3 : 6 * b + 6].set(
            jnp.eye(3, dtype=dtype) * bd.mass
        )
    return M


def _inv3(B):
    """Analytic inverse of (..., 3, 3) via adjugate/det (pure elementwise —
    no LAPACK call; XLA's batched small factorizations serialize on TPU)."""
    a, b, c = B[..., 0, 0], B[..., 0, 1], B[..., 0, 2]
    d, e, f = B[..., 1, 0], B[..., 1, 1], B[..., 1, 2]
    g, h, i = B[..., 2, 0], B[..., 2, 1], B[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], axis=-1),
            jnp.stack([A21, A22, A23], axis=-1),
            jnp.stack([A31, A32, A33], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def mass_matrix_inv(bodies, quat):
    """(6B, 6B) inverse generalized mass matrix, analytic per 3x3 block
    (M is block-diagonal [R I R^T, m I3] per body — mass_matrix above)."""
    nb = len(bodies)
    dtype = quat.dtype
    Minv = jnp.zeros((6 * nb, 6 * nb), dtype=dtype)
    for b, bd in enumerate(bodies):
        R = quat_to_matrix(quat[b])
        Minv = Minv.at[6 * b : 6 * b + 3, 6 * b : 6 * b + 3].set(
            _inv3(R @ bd.ang_inertia @ R.T)
        )
        Minv = Minv.at[6 * b + 3 : 6 * b + 6, 6 * b + 3 : 6 * b + 6].set(
            jnp.eye(3, dtype=dtype) / bd.mass
        )
    return Minv


def joint_jacobian(joints, nb, state):
    """(neq, 6B) equality Jacobian (reference Je, world.py:414-428)."""
    neq = sum(j.num_constraints for j in joints)
    dtype = state.quat.dtype
    Je = jnp.zeros((max(neq, 0), 6 * nb), dtype=dtype)
    row = 0
    for j in joints:
        J1, J2 = j.rows(state)
        r = j.num_constraints
        Je = Je.at[row : row + r, 6 * j.body1 : 6 * j.body1 + 6].set(J1.astype(dtype))
        if J2 is not None:
            Je = Je.at[row : row + r, 6 * j.body2 : 6 * j.body2 + 6].set(J2.astype(dtype))
        row += r
    return Je


def _maybe_detach(x, flag):
    return jax.lax.stop_gradient(x) if flag else x


def contact_jacobian(contacts: Contacts, nb: int, stop_grad: bool):
    """(K, 6B) normal contact Jacobian (world3d.py:56-70)."""
    n = _maybe_detach(contacts.normal, stop_grad)
    p1 = _maybe_detach(contacts.p1, stop_grad)
    p2 = _maybe_detach(contacts.p2, stop_grad)
    vm = contacts.valid[:, None].astype(n.dtype)

    J1 = jnp.concatenate([jnp.cross(p1, n), n], axis=-1) * vm  # (K,6)
    J2 = -jnp.concatenate([jnp.cross(p2, n), n], axis=-1) * vm

    oh1 = jax.nn.one_hot(contacts.i1, nb, dtype=n.dtype)  # (K,B)
    oh2 = jax.nn.one_hot(contacts.i2, nb, dtype=n.dtype)
    Jc = jnp.einsum("kb,kx->kbx", oh1, J1) + jnp.einsum("kb,kx->kbx", oh2, J2)
    return Jc.reshape(Jc.shape[0], 6 * nb)


def friction_dirs(n, fric_dirs: int):
    """(K, fd, 3) pyramid directions (world3d.py:84-94)."""
    dir1 = normalize(orthogonal_batch(n))
    dir2 = normalize(jnp.cross(dir1, n))
    dirs = [dir1, dir2]
    if fric_dirs == 8:
        dir3 = normalize(dir1 + dir2)
        dir4 = normalize(jnp.cross(dir3, n))
        dirs += [dir3, dir4]
    base = jnp.stack(dirs, axis=1)  # (K, fd/2, 3)
    return jnp.concatenate([base, -base], axis=1)


def orthogonal_batch(v):
    """Vectorized `orthogonal` over (K,3)."""
    return jax.vmap(orthogonal)(v)


def friction_jacobian(contacts: Contacts, nb: int, fric_dirs: int, stop_grad: bool):
    """(K*fd, 6B) friction Jacobian (world3d.py:72-101)."""
    n = _maybe_detach(contacts.normal, stop_grad)
    p1 = _maybe_detach(contacts.p1, stop_grad)
    p2 = _maybe_detach(contacts.p2, stop_grad)
    k = n.shape[0]
    vm = contacts.valid[:, None, None].astype(n.dtype)

    dirs = friction_dirs(n, fric_dirs) * vm  # (K, fd, 3)
    J1 = jnp.concatenate(
        [jnp.cross(jnp.broadcast_to(p1[:, None, :], dirs.shape), dirs), dirs], axis=-1
    )  # (K, fd, 6)
    J2 = jnp.concatenate(
        [jnp.cross(jnp.broadcast_to(p2[:, None, :], dirs.shape), dirs), dirs], axis=-1
    )

    oh1 = jax.nn.one_hot(contacts.i1, nb, dtype=n.dtype)
    oh2 = jax.nn.one_hot(contacts.i2, nb, dtype=n.dtype)
    Jf = jnp.einsum("kb,kdx->kdbx", oh1, J1) - jnp.einsum("kb,kdx->kdbx", oh2, J2)
    return Jf.reshape(k * fric_dirs, 6 * nb)


def contact_coeffs(contacts: Contacts, bodies):
    """Per-contact friction coefficient and restitution averages
    (world.py:480-491, :402-409)."""
    fric = jnp.stack([b.fric_coeff for b in bodies])
    rest = jnp.stack([b.restitution for b in bodies])
    mu = 0.5 * (fric[contacts.i1] + fric[contacts.i2])
    restitution = 0.5 * (rest[contacts.i1] + rest[contacts.i2])
    return mu, restitution


def apply_forces(bodies, forces, t):
    """(6B,) generalized force vector (Σ per-body force objects)."""
    out = []
    for bd, flist in zip(bodies, forces):
        f = jnp.zeros(6, dtype=bd.mass.dtype)
        for force in flist:
            f = f + force.force(t, bd)
        out.append(f)
    return jnp.concatenate(out)


def _eq_constrained_solve(Minv, Je, u, b_eq=None):
    """Solve [[M, -Je^T], [Je, 0]] [x; y] = [u; b_eq] for x via the joint Schur
    complement — all elementwise (analytic M^-1 + unrolled Gauss-Jordan on
    the tiny neq x neq system). Replaces jnp.linalg.solve, whose batched
    small LU SERIALIZES per lane on TPU — and under a vmapped lax.cond the
    no-contact branch executes for every lane every substep.

    `u` may be (n,) or (D, n) (shared factorization across the D rhs)."""
    squeeze = u.ndim == 1
    if squeeze:
        u = u[None]
    Minv_u = u @ Minv.T  # (D, n)
    neq = Je.shape[0]
    if neq == 0:
        return Minv_u[0] if squeeze else Minv_u
    S = Je @ Minv @ Je.T  # (neq, neq)
    rhs = Minv_u @ Je.T if b_eq is None else Minv_u @ Je.T - b_eq[None]
    nD = rhs.shape[0]
    y = -_small_solve(jnp.broadcast_to(S, (nD, neq, neq)), rhs)
    x = Minv_u + (y @ Je) @ Minv.T
    return x[0] if squeeze else x


def assemble_contact_lcp(bodies, contacts: Contacts, v, cfg: SimConfig, stop_grads=None):
    """Contact-LCP constraint data shared by every solve path (and dumped by
    tests/test_qp_crosscheck.py for the independent-solver parity check):
    G = [Jc; Jf; 0], the friction coupling F (reference world.py:493-501),
    and h = [restitution * Jc v; 0; 0] with strictly-feasible inert rows for
    padded contact slots. Returns (G, F, hvec, k, fd, nineq)."""
    nb = v.shape[0] // 6
    dtype = v.dtype
    k = contacts.valid.shape[0]
    fd = cfg.fric_dirs
    nineq = k * (2 + fd)
    sg_c = cfg.stop_contact_grad if stop_grads is None else stop_grads
    sg_f = cfg.stop_friction_grad if stop_grads is None else stop_grads

    Jc = contact_jacobian(contacts, nb, sg_c)
    Jf = friction_jacobian(contacts, nb, fd, sg_f)
    mu, restitution = contact_coeffs(contacts, bodies)

    E = jnp.repeat(jnp.eye(k, dtype=dtype), fd, axis=0)  # (k*fd, k)
    G = jnp.concatenate([Jc, Jf, jnp.zeros((k, 6 * nb), dtype=dtype)])
    F = jnp.zeros((nineq, nineq), dtype=dtype)
    F = F.at[k : k + k * fd, -k:].set(E)
    F = F.at[-k:, :k].set(jnp.diag(mu))
    F = F.at[-k:, k : k + k * fd].set(-E.T)

    hvec = jnp.concatenate(
        [(Jc @ v) * restitution, jnp.zeros(k * fd + k, dtype=dtype)]
    )
    invalid = ~contacts.valid
    pad = jnp.concatenate([invalid, jnp.repeat(invalid, fd), invalid]).astype(dtype)
    hvec = hvec + pad
    return G, F, hvec, k, fd, nineq


def dump_contact_lcp(bodies, joints, forces, state, contacts: Contacts, dt, cfg: SimConfig):
    """Test/diagnostic hook: the exact (Q, p, G, h, A, b, F) batch-of-1
    mixed LCP `solve_dynamics` would hand the PDIPM at this state — the
    reference's CVXPY-cross-check role (lcp/solvers/cvxpy.py:29-55) is
    filled by solving THESE with an independent algorithm in tests."""
    nb = len(bodies)
    dtype = state.v.dtype
    v = state.v.reshape(-1)
    M = mass_matrix(bodies, state.quat)
    Je = joint_jacobian(joints, nb, state)
    neq = Je.shape[0]
    f = apply_forces(bodies, forces, state.t)
    u = M @ v + dt * f
    G, F, hvec, k, fd, nineq = assemble_contact_lcp(bodies, contacts, v, cfg)
    return (
        M[None], u[None], G[None], hvec[None],
        Je[None] if neq > 0 else jnp.zeros((1, 0, 6 * nb), dtype=dtype),
        jnp.zeros((1, neq), dtype=dtype), F[None],
    ), ("fric", k, fd)


def solve_dynamics(
    bodies, joints, forces, state, contacts: Contacts, dt, cfg: SimConfig,
    lcp_sol=None, return_sol: bool = False,
):
    """New generalized velocities after impulse solve (engines.py:31-83).

    Modes (TPU step-sharing optimization):
    - default: full differentiable solve (custom_vjp PDIPM)
    - return_sol=True: gradient-free probe path — also return the full
      primal-dual solution (x, y, z, s) for later reuse
    - lcp_sol=...: differentiable replay path — skip the interior-point
      iterations and re-emit the cached solution with the exact KKT
      implicit-diff backward (ops.qp.lcp_solve_from_solution)."""
    nb = len(bodies)
    dtype = state.v.dtype
    v = state.v.reshape(-1)

    M = mass_matrix(bodies, state.quat)
    Je = joint_jacobian(joints, nb, state)
    neq = Je.shape[0]
    f = apply_forces(bodies, forces, state.t)
    u = M @ v + dt * f

    k = contacts.valid.shape[0]
    fd = cfg.fric_dirs
    nineq = k * (2 + fd)

    def _zero_sol():
        return (
            jnp.zeros((1, 6 * nb), dtype=dtype),
            jnp.zeros((1, neq), dtype=dtype),
            jnp.zeros((1, nineq), dtype=dtype),
            jnp.zeros((1, nineq), dtype=dtype),
        )

    def no_contact_branch(_):
        x = _eq_constrained_solve(mass_matrix_inv(bodies, state.quat), Je, u)
        # the sol x-slot carries -new_v so emission-mode callers
        # (world.finish_step replay_mode="emit") can read the cached step
        # velocity uniformly as -sol.x regardless of the contact branch;
        # nothing consumes the no-contact sol otherwise
        zx, zy, zz, zs = _zero_sol()
        return x, (-x[None], zy, zz, zs)

    def contact_branch(_):
        G, F, hvec, _, _, _ = assemble_contact_lcp(bodies, contacts, v, cfg)

        args = (
            M[None],
            u[None],
            G[None],
            hvec[None],
            Je[None] if neq > 0 else jnp.zeros((1, 0, 6 * nb), dtype=dtype),
            jnp.zeros((1, neq), dtype=dtype),
            F[None],
        )
        structure = ("fric", k, fd)
        # dtype-aware convergence threshold: the reference default 1e-12 is
        # below f32 resolution, so in f32 the early exit would never fire and
        # every solve would pay max_iter regardless of convergence
        eps = cfg.solver_eps if dtype == jnp.float64 else max(cfg.solver_eps, 1e-6)
        if lcp_sol is not None:
            backend = cfg.solver_backend
            if backend == "auto":
                backend = "pallas" if jax.default_backend() == "tpu" else "xla"
            # the replay's backward (KKT implicit diff): Q here is always the
            # block-diagonal mass matrix the pallas kernel's analytic
            # inverse needs
            bwd = cfg.solver_bwd if cfg.solver_bwd != "auto" else backend
            bwd_structure = (
                ("fric_pallas", k, fd) if bwd == "pallas" else structure
            )
            x = lcp_solve_from_solution(*args, lcp_sol, bwd_structure)
            sol = lcp_sol
        elif return_sol:
            x, y, z, s = pdipm_solve_raw(
                *args, cfg.solver_max_iter, eps, 3, structure
            )
            sol = (x, y, z, s)
        else:
            x = lcp_solve(*args, cfg.solver_max_iter, eps, 3, structure)
            sol = _zero_sol()
        return -x[0, : 6 * nb], sol

    any_contact = jnp.any(contacts.valid)
    new_v, sol = jax.lax.cond(
        any_contact, contact_branch, no_contact_branch, operand=None
    )
    if return_sol:
        return new_v, sol
    return new_v


def probe_dynamics_batch(bodies, joints, forces, state, contacts: Contacts, dts, cfg: SimConfig):
    """Gradient-free dynamics solve for a LADDER of D candidate timesteps in
    ONE batched PDIPM call.

    TPU-native replacement for the reference's sequential dt-bisection
    probes (world.py:344-356): the KKT data (M, Je, Jc, Jf, F, h) is
    dt-INDEPENDENT — only u = M v + dt f varies — so all halved-dt trials
    share one batched factorization instead of a data-dependent while_loop
    of small sequential solves (each ~350 us of latency-bound ops).

    Returns (new_vs (D, 6B), sol) where sol leaves have leading D; the
    selected lane is re-emitted differentiably via lcp_solve_from_solution.
    Caller must pass stop-gradient state (this is pure probe work)."""
    nb = len(bodies)
    dtype = state.v.dtype
    v = state.v.reshape(-1)
    n = 6 * nb
    D = dts.shape[0]

    M = mass_matrix(bodies, state.quat)
    Je = joint_jacobian(joints, nb, state)
    neq = Je.shape[0]
    f = apply_forces(bodies, forces, state.t)
    u = M @ v + dts[:, None] * f  # (D, n)

    k = contacts.valid.shape[0]
    fd = cfg.fric_dirs
    nineq = k * (2 + fd)

    def _zero_sol():
        return (
            jnp.zeros((D, n), dtype=dtype),
            jnp.zeros((D, neq), dtype=dtype),
            jnp.zeros((D, nineq), dtype=dtype),
            jnp.zeros((D, nineq), dtype=dtype),
        )

    def no_contact_branch(_):
        x = _eq_constrained_solve(mass_matrix_inv(bodies, state.quat), Je, u)
        # sol x-slot = -new_v for uniform emission-mode reuse (see
        # solve_dynamics.no_contact_branch)
        zx, zy, zz, zs = _zero_sol()
        return x, (-x, zy, zz, zs)

    def contact_branch(_):
        G, F, hvec, _, _, _ = assemble_contact_lcp(
            bodies, contacts, v, cfg, stop_grads=True
        )

        bc = lambda a: jnp.broadcast_to(a, (D,) + a.shape)
        args = (
            bc(M), u, bc(G), bc(hvec),
            bc(Je) if neq > 0 else jnp.zeros((D, 0, n), dtype=dtype),
            jnp.zeros((D, neq), dtype=dtype),
            bc(F),
        )
        eps = cfg.solver_eps if dtype == jnp.float64 else max(cfg.solver_eps, 1e-6)
        backend = cfg.solver_backend
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        interpret = jax.default_backend() != "tpu"
        Minv = mass_matrix_inv(bodies, state.quat)
        invQ = jnp.broadcast_to(Minv, (D,) + Minv.shape)
        if backend == "pallas":
            from ..ops.qp_pallas import pdipm_pallas

            sol = pdipm_pallas(
                *args, max_iter=cfg.solver_max_iter, eps=eps,
                interpret=interpret, invQ=invQ, structure=("fric", k, fd),
            )
        else:
            sol = pdipm_solve_raw(
                *args, cfg.solver_max_iter, eps, 3, ("fric", k, fd)
            )
        if cfg.solver_fallback:
            # runtime accuracy fallback (reference INACC_ERR escape hatch):
            # re-solve with escalated iterations when triggered. custom_vmap
            # wrapper: under a seed-batch vmap a plain cond would run the
            # escalated solve unconditionally for every lane
            from ..ops.qp import escalated_resolve

            sol = escalated_resolve(
                *args, invQ, sol,
                backend=backend, iters_hi=cfg.solver_fallback_iters, eps=eps,
                thresh=cfg.solver_fallback_thresh,
                structure=("fric", k, fd), interpret=interpret,
            )
        x, y, z, s = sol
        return -x[:, :n], (x, y, z, s)

    any_contact = jnp.any(contacts.valid)
    return jax.lax.cond(any_contact, contact_branch, no_contact_branch, operand=None)


def post_stabilization(bodies, joints, state, contacts: Contacts, cfg: SimConfig):
    """Positional correction velocities (engines.py:85-121)."""
    nb = len(bodies)
    dtype = state.v.dtype
    v = state.v.reshape(-1)
    M = mass_matrix(bodies, state.quat)
    Je = joint_jacobian(joints, nb, state)
    neq = Je.shape[0]
    ge = Je @ v

    def no_contact_branch(_):
        x = _eq_constrained_solve(
            mass_matrix_inv(bodies, state.quat), Je,
            jnp.zeros(6 * nb, dtype=dtype), b_eq=ge,
        )
        return -x

    def contact_branch(_):
        Jc = contact_jacobian(contacts, nb, cfg.stop_contact_grad)
        _, restitution = contact_coeffs(contacts, bodies)
        gc = (Jc @ v) + (Jc @ v) * -restitution
        # inert rows for padded slots
        gc = gc + (~contacts.valid).astype(dtype)
        k = Jc.shape[0]
        F = jnp.zeros((k, k), dtype=dtype)
        x = lcp_solve(
            M[None],
            jnp.zeros((1, 6 * nb), dtype=dtype),
            Jc[None],
            gc[None],
            Je[None] if neq > 0 else jnp.zeros((1, 0, 6 * nb), dtype=dtype),
            ge[None] if neq > 0 else jnp.zeros((1, 0), dtype=dtype),
            F[None],
            cfg.solver_max_iter,
            cfg.solver_eps,
            3,
            ("plain",),
        )
        return -x[0, : 6 * nb]

    any_contact = jnp.any(contacts.valid)
    return jax.lax.cond(any_contact, contact_branch, no_contact_branch, operand=None)
