"""Batched differentiable mixed-LCP / QP solver (primal-dual interior point).

TPU-native redesign of the reference solver stack
(`lcp_physics/lcp/lcp.py` + `lcp_physics/lcp/solvers/batch.py`): a Mehrotra
predictor-corrector interior-point method solving, per batch element,

    min_z  1/2 zᵀQz + pᵀz   s.t.  Gz <= h + Fz  (mixed-LCP slack coupling),
                                   Az  = b

with gradients by implicit differentiation of the KKT conditions
(`lcp.py:155-213`), exposed through ``jax.custom_vjp``.

Differences from the reference that are deliberate TPU design choices:

- fixed iteration count under ``lax.fori_loop`` with best-iterate carry; the
  reference's early exits (`batch.py:164-167` notImprovedLim / eps / mu
  blow-up) become a ``done`` flag that freezes further updates — numerically
  identical results, static control flow.
- no partial-LU caching of the Schur complement (`batch.py:413-520`): the
  KKT systems here are tiny (tens of rows), so we rebuild the Schur
  complement S each iteration and use dense batched ``jnp.linalg.solve``
  (one XLA fused LU per call). Q is pre-factorized once by Cholesky (it is
  the SPD mass matrix in the physics use).
- NaN-robust: a failed factorization (NaN/Inf in the step) freezes the
  iterate at the best-so-far (the reference catches the exception and
  returns best, `batch.py:134-137`).

All inputs are batched with a leading ``nb`` axis. ``neq`` (rows of A) may be
zero; shapes are static.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _bouter(a, b):
    """Batched outer product a bᵀ: (nb,n),(nb,m) -> (nb,n,m)."""
    return a[..., :, None] * b[..., None, :]


def _bmv(M, v):
    """Batched matrix-vector: (nb,n,m),(nb,m) -> (nb,n)."""
    return jnp.einsum("...ij,...j->...i", M, v)


def _bmtv(M, v):
    """Batched Mᵀ v: (nb,n,m),(nb,n) -> (nb,m)."""
    return jnp.einsum("...ij,...i->...j", M, v)


class _KKTCache(NamedTuple):
    invQ: jnp.ndarray  # (nb, nz, nz) explicit Q^-1 (Q is tiny and SPD)
    base: jnp.ndarray  # (nb, m, m) = [A;G] Q^-1 [A;G]^T, m = neq+nineq
    G: jnp.ndarray
    A: jnp.ndarray
    F: jnp.ndarray
    structure: tuple | None  # static: None | ("plain",) | ("fric", k, fd)


def _pre_factor(Q, G, A, F, structure=None):
    """One-time products (reference pre_factor_kkt, batch.py:413-479).

    TPU note: Q is the tiny SPD generalized mass matrix (tens of rows), so we
    invert it explicitly once — every later Q-solve becomes a matvec instead
    of a pair of LAPACK triangular-solve custom calls (which are
    latency-bound on TPU)."""
    nz = Q.shape[-1]
    Q_chol = jnp.linalg.cholesky(Q)
    invQ = jax.scipy.linalg.cho_solve(
        (Q_chol, True), jnp.broadcast_to(jnp.eye(nz, dtype=Q.dtype), Q.shape)
    )
    AG = jnp.concatenate([A, G], axis=-2) if A.shape[-2] > 0 else G
    base = AG @ invQ @ jnp.swapaxes(AG, -1, -2)
    return _KKTCache(invQ, base, G, A, F, structure)


def _small_solve(C, r):
    """Solve the tiny (nb,k,k) system by unrolled pivot-free Gauss-Jordan —
    pure elementwise ops, no LAPACK custom call (k is a static handful).

    A zero leading pivot (singular/indefinite C) is guarded to a tiny
    constant: for healthy pivots the `where` is a bit-exact identity, and a
    degenerate pivot produces a huge-but-finite row whose blown residual
    downstream accuracy checks (best-iterate / solver_fallback) can see,
    instead of a silent NaN (ADVICE r2)."""
    k = C.shape[-1]
    tiny = jnp.asarray(1e-30 if C.dtype == jnp.float32 else 1e-200, dtype=C.dtype)
    M = jnp.concatenate([C, r[..., None]], axis=-1)
    for i in range(k):
        pv = M[..., i, i][..., None]
        pv = jnp.where(jnp.abs(pv) < tiny, tiny, pv)
        piv = M[..., i, :] / pv
        M = M - M[..., :, i][..., None] * piv[..., None, :]
        M = M.at[..., i, :].set(piv)
    return M[..., -1]


class _SFactor(NamedTuple):
    """Factored Schur complement for one diagonal d (see _factor_S)."""

    kind: str  # static: "lu" | "plain" | "fric"
    mat: jnp.ndarray  # "lu": S itself; else cholesky factor of the SPD part
    d: jnp.ndarray
    Z: jnp.ndarray | None = None  # "fric": M^-1 U (Woodbury)
    C: jnp.ndarray | None = None  # "fric": I + V^T M^-1 U (nb,k,k)
    mu: jnp.ndarray | None = None  # "fric": (nb,k)
    dc: jnp.ndarray | None = None  # "fric": (nb,k) cone-row d


def _fric_sizes(cache: _KKTCache):
    _, k, fd = cache.structure
    neq = cache.A.shape[-2]
    return neq, k, k * fd


def _factor_S(cache: _KKTCache, d):
    """Factor the Schur complement S for a given diagonal d = z/s. Mehrotra
    solves TWO systems with the same matrix per iteration (affine +
    corrector), and the factorization is shared.

    S = [[A Q⁻¹Aᵀ, A Q⁻¹Gᵀ], [G Q⁻¹Aᵀ, G Q⁻¹Gᵀ + F + D⁻¹]]  (D⁻¹ = diag(1/d))

    Three strategies (static choice):
    - "fric" (the physics mixed LCP, G = [Jc; Jf; 0] with the E/mu friction
      coupling in F): eliminate the K cone rows analytically; the remaining
      (neq + K + K·fd) system is SPD **plus a rank-K correction**
      U Vᵀ (U = -E·Dc on the friction rows, V = mu on the normal rows), so it
      factors with one native Cholesky + Woodbury — ~4x cheaper than LU on
      TPU, where small LU/pivoting lowers poorly.
    - "plain" (F = 0, e.g. post-stabilization): S is SPD outright; Cholesky.
    - generic fallback: dense S, jnp.linalg.solve (LU) per RHS.
    """
    neq = cache.A.shape[-2]
    nineq = cache.G.shape[-2]
    dtype = d.dtype
    if dtype == jnp.float32:
        # f32 conditioning cap (forward analogue of _lcp_bwd's d-cap):
        # strongly-active rows drive d = z/s through the f32 dynamic range
        # and jnp.linalg.cholesky on the fric/plain SPD block returns NaN —
        # the whole iterate then NaNs before any best-iterate exists
        # (observed: solver_backend="xla" on TPU f32 NaN'd 6/10 sweep
        # seeds). Equivalent to 1/cap diagonal regularization on those
        # rows; a no-op in f64 (the accuracy/parity path) and unnecessary
        # in the Pallas kernel (pivot-guarded GJ). The cap matches the
        # backward's (1e5).
        d = jnp.clip(d, min=1e-5, max=1e5)
    dinv = 1.0 / d

    if cache.structure is not None and cache.structure[0] == "fric":
        _, k, nf = _fric_sizes(cache)
        m = neq + k + nf
        dn, df = dinv[..., :k], dinv[..., k : k + nf]
        dc = d[..., k + nf :]
        diag_add = jnp.concatenate(
            [jnp.zeros(dn.shape[:-1] + (neq,), dtype=dtype), dn, df], axis=-1
        )
        M = cache.base[..., :m, :m] + jnp.eye(m, dtype=dtype) * diag_add[..., None, :]
        # + E Dc Eᵀ on the friction block: per-contact dc_j over its fd x fd
        fd = nf // k
        Ebig = jnp.repeat(jnp.eye(k, dtype=dtype), fd, axis=0)  # (nf,k)
        edce = jnp.einsum("ik,...k,jk->...ij", Ebig, dc, Ebig)
        M = M.at[..., neq + k :, neq + k :].add(edce)
        if dtype == jnp.float32:
            # f32 PD jitter: near-degenerate interior-point diagonals make M
            # numerically indefinite in single precision and cholesky emits
            # NaN (see the d-cap note above); a relative 1e-6 ridge keeps
            # the factorization finite with negligible bias. No-op in f64.
            diag_scale = jnp.max(
                jnp.abs(jnp.diagonal(M, axis1=-2, axis2=-1)), axis=-1
            )
            M = M + (1e-6 * diag_scale)[..., None, None] * jnp.eye(m, dtype=dtype)
        cholM = jnp.linalg.cholesky(M)
        U = jnp.concatenate(
            [
                jnp.zeros(dc.shape[:-1] + (neq + k, k), dtype=dtype),
                -(Ebig * dc[..., None, :]),
            ],
            axis=-2,
        )  # (nb, m, k)
        Z = jax.scipy.linalg.cho_solve((cholM, True), U)
        # mu = diag of F[c rows, n cols] (the friction-cone coefficients)
        mu = jnp.diagonal(
            cache.F[..., k + nf :, :k], axis1=-2, axis2=-1
        )
        C = jnp.eye(k, dtype=dtype) + mu[..., :, None] * Z[..., neq : neq + k, :]
        return _SFactor("fric", cholM, d, Z=Z, C=C, mu=mu, dc=dc)

    F_pad = cache.F
    if neq > 0:
        F_pad = jnp.zeros_like(cache.base).at[..., neq:, neq:].set(cache.F)
    S = (
        cache.base
        + F_pad
        + jnp.eye(neq + nineq, dtype=dtype)
        * jnp.concatenate(
            [jnp.zeros(dinv.shape[:-1] + (neq,), dtype=dtype), dinv], axis=-1
        )[..., None, :]
    )
    if cache.structure is not None and cache.structure[0] == "plain":
        return _SFactor("plain", jnp.linalg.cholesky(S), d)
    return _SFactor("lu", S, d)


def _solve_S(cache: _KKTCache, fac: _SFactor, hvec):
    """Solve S w = hvec with the factored Schur complement."""
    if fac.kind == "lu":
        return jnp.linalg.solve(fac.mat, hvec[..., None])[..., 0]
    if fac.kind == "plain":
        return jax.scipy.linalg.cho_solve((fac.mat, True), hvec[..., None])[..., 0]

    neq, k, nf = _fric_sizes(cache)
    fd = nf // k
    dtype = hvec.dtype
    Ebig = jnp.repeat(jnp.eye(k, dtype=dtype), fd, axis=0)  # (nf,k)
    he = hvec[..., :neq]
    hn = hvec[..., neq : neq + k]
    hf = hvec[..., neq + k : neq + k + nf]
    hc = hvec[..., neq + k + nf :]
    hf2 = hf - jnp.einsum("ik,...k->...i", Ebig, fac.dc * hc)
    rhs = jnp.concatenate([he, hn, hf2], axis=-1)
    w0 = jax.scipy.linalg.cho_solve((fac.mat, True), rhs[..., None])[..., 0]
    alpha = _small_solve(fac.C, fac.mu * w0[..., neq : neq + k])
    w = w0 - _bmv(fac.Z, alpha)
    wn = w[..., neq : neq + k]
    wf = w[..., neq + k :]
    wc = fac.dc * (hc - fac.mu * wn + jnp.einsum("ik,...i->...k", Ebig, wf))
    return jnp.concatenate([w, wc], axis=-1)


def _solve_kkt_factored(cache: _KKTCache, fac: _SFactor, d, rx, rs, rz, ry):
    """Solve the reduced KKT system with a prefactored Schur complement
    (reference solve_kkt, batch.py:380-410). Returns (dx, ds, dz, dy)."""
    G, A = cache.G, cache.A
    neq = A.shape[-2]
    invQ_rx = _bmv(cache.invQ, rx)

    h_ineq = _bmv(G, invQ_rx) + rs / d - rz
    if neq > 0:
        h_eq = _bmv(A, invQ_rx) - ry
        hvec = jnp.concatenate([h_eq, h_ineq], axis=-1)
    else:
        hvec = h_ineq

    w = -_solve_S(cache, fac, hvec)
    w_eq, w_ineq = w[..., :neq], w[..., neq:]

    g1 = -rx - _bmtv(G, w_ineq)
    if neq > 0:
        g1 = g1 - _bmtv(A, w_eq)
    g2 = -rs - w_ineq

    dx = _bmv(cache.invQ, g1)
    ds = g2 / d
    dz = w_ineq
    dy = w_eq
    return dx, ds, dz, dy


def _solve_kkt(cache: _KKTCache, d, rx, rs, rz, ry):
    """Single-shot KKT solve (factor + solve)."""
    fac = _factor_S(cache, d)
    return _solve_kkt_factored(cache, fac, d, rx, rs, rz, ry)


def _get_step(v, dv):
    """Max step in [0,1] keeping v + a*dv > 0 (reference get_step,
    batch.py:234-237; entries with dv >= 0 never bind)."""
    a = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
    return jnp.min(a, axis=-1)


def _pdipm_forward(Q, p, G, h, A, b, F, max_iter, eps, not_improved_lim, structure=None):
    """Mehrotra predictor-corrector loop (reference batch.py:70-231).

    Runs as a `while_loop` with an all-lanes-done early exit: every forward
    solve sits under a custom_vjp (gradients come from the KKT implicit
    diff, never from unrolling the iterations), so a dynamic trip count is
    free — converged problems (the common resting-contact steps) stop after
    a handful of iterations instead of always paying max_iter."""
    nb, nineq, nz = G.shape
    neq = A.shape[-2]
    dtype = Q.dtype
    cache = _pre_factor(Q, G, A, F, structure)

    # initialization: one KKT solve with d = 1 (batch.py:84-90)
    d0 = jnp.ones((nb, nineq), dtype=dtype)
    x, s, z, y = _solve_kkt(
        cache, d0, p, jnp.zeros((nb, nineq), dtype=dtype), -h, -b if neq > 0 else b
    )

    # shift slacks and ineq duals to >= 1 (batch.py:100-110)
    def shift(v):
        m = jnp.min(v, axis=-1, keepdims=True)
        return jnp.where(m < 0, v - m + 1.0, v)

    s = shift(s)
    z = shift(z)

    big = jnp.asarray(jnp.finfo(dtype).max, dtype=dtype)

    class Carry(NamedTuple):
        it: jnp.ndarray
        x: jnp.ndarray
        s: jnp.ndarray
        z: jnp.ndarray
        y: jnp.ndarray
        best_x: jnp.ndarray
        best_s: jnp.ndarray
        best_z: jnp.ndarray
        best_y: jnp.ndarray
        best_resids: jnp.ndarray
        n_not_improved: jnp.ndarray
        done: jnp.ndarray

    def body(c: Carry):
        x, s, z, y = c.x, c.s, c.z, c.y
        # residuals (batch.py:117-131)
        rx = _bmtv(G, z) + _bmv(jnp.swapaxes(Q, -1, -2), x) + p
        if neq > 0:
            rx = rx + _bmtv(A, y)
        rs = z
        rz = _bmv(G, x) + s - h - _bmv(F, z)
        mu = jnp.abs(jnp.sum(s * z, axis=-1) / nineq)
        pri_resid = jnp.linalg.norm(rz, axis=-1)
        if neq > 0:
            ry = _bmv(A, x) - b
            pri_resid = pri_resid + jnp.linalg.norm(ry, axis=-1)
        else:
            ry = jnp.zeros((nb, 0), dtype=dtype)
        dual_resid = jnp.linalg.norm(rx, axis=-1)
        resids = pri_resid + dual_resid + nineq * mu

        # best-iterate tracking (batch.py:143-163). The reference stops on
        # BATCH-aggregated criteria (best_resids.max() < eps, a shared
        # not-improved counter); with independent physics lanes flattened
        # into one solver batch that makes a lane's returned iterate depend
        # on its batch COMPOSITION (single-path D-rung batch vs
        # batched-native B*D: extra shared iterations perturb borderline
        # lanes, which flips near-threshold bisection acceptances between
        # the two rollout paths). The criteria here are PER-LANE — matching
        # the Pallas kernel's per-lane freeze (qp_pallas.py) — so every
        # lane's solution is composition-independent; the while_loop still
        # exits when all lanes are done.
        improved = resids < c.best_resids
        best_x = jnp.where(improved[:, None], x, c.best_x)
        best_s = jnp.where(improved[:, None], s, c.best_s)
        best_z = jnp.where(improved[:, None], z, c.best_z)
        best_y = jnp.where(improved[:, None], y, c.best_y) if neq > 0 else c.best_y
        best_resids = jnp.where(improved, resids, c.best_resids)
        n_not_improved = jnp.where(improved, 0, c.n_not_improved + 1)

        done = (
            c.done
            | (n_not_improved >= not_improved_lim)
            | (best_resids < eps)
            | (mu > 1e32)
        )

        # affine scaling direction (batch.py:169-181); one factorization
        # shared by the affine and corrector solves
        d = z / s
        fac = _factor_S(cache, d)
        dx_aff, ds_aff, dz_aff, dy_aff = _solve_kkt_factored(
            cache, fac, d, rx, rs, rz, ry
        )

        # centering-corrector (batch.py:184-211)
        alpha = jnp.minimum(
            jnp.minimum(_get_step(z, dz_aff), _get_step(s, ds_aff)), 1.0
        )
        t1 = s + alpha[:, None] * ds_aff
        t2 = z + alpha[:, None] * dz_aff
        sig = (jnp.sum(t1 * t2, axis=-1) / jnp.sum(s * z, axis=-1)) ** 3

        rs_cor = ((-mu * sig)[:, None] + ds_aff * dz_aff) / s
        zeros_nz = jnp.zeros((nb, nz), dtype=dtype)
        zeros_ineq = jnp.zeros((nb, nineq), dtype=dtype)
        zeros_eq = jnp.zeros((nb, neq), dtype=dtype)
        dx_cor, ds_cor, dz_cor, dy_cor = _solve_kkt_factored(
            cache, fac, d, zeros_nz, rs_cor, zeros_ineq, zeros_eq
        )

        dx = dx_aff + dx_cor
        ds = ds_aff + ds_cor
        dz = dz_aff + dz_cor
        alpha = jnp.minimum(
            0.999 * jnp.minimum(_get_step(z, dz), _get_step(s, ds)), 1.0
        )

        x_new = x + alpha[:, None] * dx
        s_new = s + alpha[:, None] * ds
        z_new = z + alpha[:, None] * dz
        if neq > 0:
            dy = dy_aff + dy_cor
            y_new = y + alpha[:, None] * dy
        else:
            y_new = y

        # NaN guard: freeze on non-finite step (reference returns best on
        # factorization failure, batch.py:134-137)
        finite = (
            jnp.all(jnp.isfinite(x_new), axis=-1)
            & jnp.all(jnp.isfinite(s_new), axis=-1)
            & jnp.all(jnp.isfinite(z_new), axis=-1)
        )
        done = done | ~finite

        keep = c.done[:, None] | ~finite[:, None]
        x_new = jnp.where(keep, x, x_new)
        s_new = jnp.where(keep, s, s_new)
        z_new = jnp.where(keep, z, z_new)
        y_new = jnp.where(keep, y, y_new) if neq > 0 else y_new

        return Carry(
            c.it + 1,
            x_new, s_new, z_new, y_new,
            best_x, best_s, best_z, best_y,
            best_resids, n_not_improved, done,
        )

    init = Carry(
        jnp.zeros((), dtype=jnp.int32),
        x, s, z, y,
        x, s, z, y,
        jnp.full((nb,), big, dtype=dtype),
        jnp.zeros((nb,), dtype=jnp.int32),
        jnp.zeros((nb,), dtype=bool),
    )
    out = jax.lax.while_loop(
        lambda c: (c.it < max_iter) & ~jnp.all(c.done), body, init
    )
    # one final best-iterate check on the last iterate (the reference loop
    # computes residuals at the top of each iteration, so iterate max_iter's
    # residuals are evaluated here)
    rx = _bmtv(G, out.z) + _bmv(jnp.swapaxes(Q, -1, -2), out.x) + p
    if neq > 0:
        rx = rx + _bmtv(A, out.y)
    rz = _bmv(G, out.x) + out.s - h - _bmv(F, out.z)
    mu = jnp.abs(jnp.sum(out.s * out.z, axis=-1) / nineq)
    pri = jnp.linalg.norm(rz, axis=-1)
    if neq > 0:
        pri = pri + jnp.linalg.norm(_bmv(A, out.x) - b, axis=-1)
    resids = pri + jnp.linalg.norm(rx, axis=-1) + nineq * mu
    improved = (resids < out.best_resids) & ~out.done
    best_x = jnp.where(improved[:, None], out.x, out.best_x)
    best_s = jnp.where(improved[:, None], out.s, out.best_s)
    best_z = jnp.where(improved[:, None], out.z, out.best_z)
    best_y = jnp.where(improved[:, None], out.y, out.best_y) if neq > 0 else out.best_y
    return best_x, best_y, best_z, best_s


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def lcp_solve(
    Q, p, G, h, A, b, F, max_iter=10, eps=1e-12, not_improved_lim=3, structure=None
):
    """Solve the batched mixed LCP/QP; returns zhat (nb, nz).

    Backward pass is the exact KKT implicit differentiation of the reference
    (`lcp.py:155-213`): one extra KKT solve with rhs (dL/dz, 0, 0, 0) and the
    outer-product gradient formulas for Q, p, G, h, A, b, F.

    `structure` (static) selects the Schur-complement strategy: None for the
    generic LU path, ("plain",) when F = 0 (SPD, Cholesky), ("fric", k, fd)
    for the physics friction LCP layout G = [Jc; Jf; 0] (Cholesky + rank-k
    Woodbury) — see _factor_S.
    """
    x, _, _, _ = _pdipm_forward(
        Q, p, G, h, A, b, F, max_iter, eps, not_improved_lim, structure
    )
    return x


def _lcp_fwd(Q, p, G, h, A, b, F, max_iter, eps, not_improved_lim, structure):
    x, y, z, s = _pdipm_forward(
        Q, p, G, h, A, b, F, max_iter, eps, not_improved_lim, structure
    )
    return x, (Q, G, A, F, x, y, z, s)


def _lcp_bwd(max_iter, eps, not_improved_lim, structure, res, dl_dzhat):
    Q, G, A, F, zhat, nu, lam, slack = res
    nb, nineq, nz = G.shape
    neq = A.shape[-2]
    dtype = Q.dtype

    # clamp to avoid blow-up on tiny slacks (lcp.py:174-176). The reference
    # only floors (f64); in f32 the strongly-active rows (slack -> 0, d huge)
    # push the Schur complement past single-precision conditioning and the
    # backward solve emits NaN — cap d as well (equivalent to adding 1/cap
    # regularization to those rows' D^-1, a no-op in f64).
    cap = 1e5 if dtype == jnp.float32 else 1e12
    d = jnp.clip(jnp.clip(lam, min=1e-8) / jnp.clip(slack, min=1e-8), max=cap)

    if structure is not None and structure[0] == "fric_pallas":
        # fused backward KKT solve (ops/qp_pallas.py): one kernel launch,
        # batch in the vector lanes. Valid when Q is the block-diagonal
        # generalized mass matrix (analytic inverse).
        from .qp_pallas import blockdiag_inv3, kkt_grad_pallas

        invQ = blockdiag_inv3(Q)
        # "fric_pallas" is only ever set for engine-assembled LCPs
        # (engine.solve_dynamics bwd_structure), whose Jf rows carry the
        # +/- direction-pair layout — so the reduced Schur solve applies
        dx, dlam, dnu = kkt_grad_pallas(
            invQ, G, A, F, d, dl_dzhat,
            interpret=jax.default_backend() != "tpu",
            structure=("fric", structure[1], structure[2]),
        )
    else:
        cache = _pre_factor(Q, G, A, F, structure)
        zeros_ineq = jnp.zeros((nb, nineq), dtype=dtype)
        zeros_eq = jnp.zeros((nb, neq), dtype=dtype)
        dx, _, dlam, dnu = _solve_kkt(
            cache, d, dl_dzhat, zeros_ineq, zeros_ineq, zeros_eq
        )

    dp = dx
    dF = _bouter(dlam, lam)
    dG = _bouter(dlam, zhat) + _bouter(lam, dx)
    dh = -dlam
    if neq > 0:
        dA = _bouter(dnu, zhat) + _bouter(nu, dx)
        db = -dnu
    else:
        dA = jnp.zeros_like(A)
        db = jnp.zeros((nb, 0), dtype=dtype)
    dQ = 0.5 * (_bouter(dx, zhat) + _bouter(zhat, dx))
    return dQ, dp, dG, dh, dA, db, dF


lcp_solve.defvjp(_lcp_fwd, _lcp_bwd)


def pdipm_solve_raw(
    Q, p, G, h, A, b, F, max_iter=10, eps=1e-12, not_improved_lim=3, structure=None
):
    """Plain forward solve returning the full primal-dual solution
    (x, y, z, s) with NO autodiff plumbing — for gradient-free probe phases
    whose solution is later re-emitted via `lcp_solve_from_solution`."""
    return _pdipm_forward(
        Q, p, G, h, A, b, F, max_iter, eps, not_improved_lim, structure
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def lcp_solve_from_solution(Q, p, G, h, A, b, F, sol, structure=None):
    """Re-emit a precomputed LCP solution with the exact KKT implicit-diff
    backward of `lcp_solve`.

    The interior-point iterations are pure forward work: the backward pass
    only needs the solution (zhat, nu, lam, slack) and the problem data
    (lcp.py:155-213). When a gradient-free search phase has already solved
    the IDENTICAL problem, the differentiable replay can skip the solve and
    attach gradients here. `sol` must be stop-gradient data."""
    x, _, _, _ = sol
    return x


def _lcp_sol_fwd(Q, p, G, h, A, b, F, sol, structure):
    x, y, z, s = sol
    return x, (Q, G, A, F, x, y, z, s)


def _lcp_sol_bwd(structure, res, dl_dzhat):
    grads = _lcp_bwd(0, 0.0, 0, structure, res, dl_dzhat)
    zero_sol = (
        jnp.zeros_like(res[4]),
        jnp.zeros_like(res[5]),
        jnp.zeros_like(res[6]),
        jnp.zeros_like(res[7]),
    )
    return grads + (zero_sol,)


lcp_solve_from_solution.defvjp(_lcp_sol_fwd, _lcp_sol_bwd)


def lcp_residuals(Q, p, G, h, A, b, F, sol):
    """Per-problem KKT residual of a primal-dual solution (the quantity the
    reference thresholds before printing INACC_ERR, batch.py:164-167 +
    lcp.py:46-61)."""
    x, y, z, s = sol
    nineq = G.shape[-2]
    neq = A.shape[-2]
    rx = _bmtv(G, z) + _bmv(jnp.swapaxes(Q, -1, -2), x) + p
    if neq > 0:
        rx = rx + _bmtv(A, y)
    rz = _bmv(G, x) + s - h - _bmv(F, z)
    mu = jnp.abs(jnp.sum(s * z, axis=-1) / nineq)
    pri = jnp.linalg.norm(rz, axis=-1)
    if neq > 0:
        pri = pri + jnp.linalg.norm(_bmv(A, x) - b, axis=-1)
    return pri + jnp.linalg.norm(rx, axis=-1) + nineq * mu


def escalated_resolve(
    Q, p, G, h, A, b, F, invQ, sol,
    *, backend, iters_hi, eps, thresh, structure, interpret=False,
):
    """Runtime accuracy fallback, batch-scaling safe: re-solve the batch
    with escalated iterations iff any residual exceeds `thresh`.

    A plain lax.cond around the re-solve executes BOTH branches for every
    lane once the caller is vmapped (seed sweeps, bench --batch), turning
    the safety net into an unconditional ~2x solver cost. This wrapper is a
    custom_vmap: mapped lanes are flattened into the solver batch (the same
    trick as qp_pallas._make_batched_impl), so at any nesting depth there is
    exactly ONE top-level cond over the whole flattened batch — the common
    all-accurate case pays only the residual evaluation."""

    @jax.custom_batching.custom_vmap
    def impl(Q, p, G, h, A, b, F, invQ, x, y, z, s):
        args = (Q, p, G, h, A, b, F)
        cur = (x, y, z, s)
        resids = lcp_residuals(*args, cur)
        bad = jnp.max(resids) > thresh

        def redo(_):
            if backend == "pallas":
                from .qp_pallas import pdipm_pallas

                return pdipm_pallas(
                    *args, max_iter=iters_hi, eps=eps, interpret=interpret,
                    invQ=invQ, structure=structure,
                )
            return pdipm_solve_raw(*args, iters_hi, eps, 6, structure)

        return jax.lax.cond(bad, redo, lambda _: cur, None)

    @impl.def_vmap
    def _vmap_rule(axis_size, in_batched, *xs):
        flat = []
        for x, batched in zip(xs, in_batched):
            if not batched:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            flat.append(x.reshape((-1,) + x.shape[2:]))
        out = impl(*flat)
        out = tuple(o.reshape((axis_size, -1) + o.shape[1:]) for o in out)
        return out, (True, True, True, True)

    return impl(Q, p, G, h, A, b, F, invQ, *sol)


def pdipm_solve_checked(
    Q, p, G, h, A, b, F,
    max_iter=10, eps=1e-12, not_improved_lim=3, structure=None,
    fallback_iters=30, fallback_thresh=1e-3,
):
    """Forward solve with a runtime accuracy fallback.

    The reference warns (INACC_ERR) and returns the best iterate when a
    residual is large (`lcp_physics/lcp/solvers/batch.py:164-167`,
    `lcp.py:134`: the CVXPY solver is its offline escape hatch). The
    TPU-native equivalent re-solves the batch with `fallback_iters`
    interior-point iterations and a reset initialization under a lax.cond —
    executed only when triggered (scalar predicate), so the hot path pays
    one residual evaluation.

    Returns (sol, resids, fell_back)."""
    sol = pdipm_solve_raw(Q, p, G, h, A, b, F, max_iter, eps, not_improved_lim, structure)
    resids = lcp_residuals(Q, p, G, h, A, b, F, sol)
    bad = jnp.max(resids) > fallback_thresh

    def redo(_):
        return pdipm_solve_raw(
            Q, p, G, h, A, b, F, fallback_iters, eps, 2 * not_improved_lim, structure
        )

    sol2 = jax.lax.cond(bad, redo, lambda _: sol, None)
    resids2 = jnp.where(bad, lcp_residuals(Q, p, G, h, A, b, F, sol2), resids)
    return sol2, resids2, bad
