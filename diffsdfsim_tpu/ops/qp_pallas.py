"""Fused Pallas TPU kernel for the batched PDIPM forward solve.

Why this kernel exists: the physics KKT systems are TINY (nz ~ 12, m =
neq+nineq ~ 46). XLA's per-op dispatch costs more than the math — a single
10-iteration Mehrotra solve is ~270 us of latency-bound small ops, and
XLA's batched small-matrix linalg SERIALIZES over the batch (measured:
16-batch LU = 16x single), so batching buys nothing. This kernel runs the
ENTIRE interior-point loop in one launch with all state in VMEM:

- the batch rides the sublane dimension (block of 8 problems per grid
  step), every vector op processes all 8 problems at once;
- the Schur complement S (m x m) is inverted by fully-unrolled pivot-free
  Gauss-Jordan on the augmented [S | I] block — m static steps of 3 VPU
  ops, no LAPACK, no dispatch;
- Q^-1 and base = [A;G] Q^-1 [A;G]^T are computed ONCE outside (they are
  iteration- and dt-independent; for the probe-ladder use they are also
  identical across the batch).

Semantics match ops/qp._pdipm_forward (reference lcp solver,
`lcp_physics/lcp/solvers/batch.py:70-231`): same initialization (one KKT
solve at d=1, slack shift), Mehrotra predictor-corrector, best-iterate
tracking, NaN freeze. Differences: the not-improved / eps freezes act per
problem rather than globally over the batch (at least as accurate), and the
loop exits early only when EVERY lane in the block is frozen (bit-identical
outputs — frozen lanes are exact no-ops — but resting-contact solves
converge in ~half of max_iter, so the exit saves real GJ inversions).

This is the gradient-free PROBE path (pdipm_solve_raw). Gradients never
flow through the iterations — the differentiable replay re-emits the
solution via ops.qp.lcp_solve_from_solution (KKT implicit diff in XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _mv(M, v):
    """(BB,n,m) @ (BB,m) -> (BB,n)."""
    return jnp.sum(M * v[:, None, :], axis=-1)


def _mtv(M, v):
    """(BB,n,m)^T @ (BB,n) -> (BB,m)."""
    return jnp.sum(M * v[:, :, None], axis=1)


def _make_gj_inverter(mm, dtype, unroll, force_unroll_small=False):
    """In-kernel pivot-free Gauss-Jordan inverter for (bb, mm, mm) systems
    (see inv_gj comments in _make_kernel for the Mosaic constraints).

    `force_unroll_small` unconditionally unrolls when mm <= 32 even at wide
    blocks — calibrated ONLY for the reduced fric system (_make_fric_ops,
    m2 = 26 at bench shape; measured: the unrolled GJ's live-range union
    fits scoped VMEM at block 48 and beats the fori variant). The generic
    kernel keeps the caller's unroll choice: wide-block unrolled GJ compile
    time explodes with block width (ADVICE r4)."""
    rid_aug = jax.lax.broadcasted_iota(jnp.int32, (mm, 2 * mm), 0)
    rid_mm = jax.lax.broadcasted_iota(jnp.int32, (mm, mm), 0)
    cid_mm = jax.lax.broadcasted_iota(jnp.int32, (mm, mm), 1)
    eye_mm = (rid_mm == cid_mm).astype(dtype)
    tiny = jnp.asarray(1e-30, dtype=dtype)

    def safe_pv(pv):
        return jnp.where(jnp.abs(pv) < tiny, tiny, pv)

    def inv_gj(S):
        aug = jnp.concatenate(
            [S, jnp.broadcast_to(eye_mm[None], S.shape)], axis=-1
        )
        if (unroll and mm <= 64) or (force_unroll_small and mm <= 32):
            for kk in range(mm):
                piv = aug[:, kk, :] / safe_pv(aug[:, kk, kk][:, None])
                elim = aug - aug[:, :, kk][:, :, None] * piv[:, None, :]
                aug = jnp.where((rid_aug == kk)[None], piv[:, None, :], elim)
            return aug[:, :, mm:]

        rid_m1 = jax.lax.broadcasted_iota(jnp.int32, (mm, 1), 0)
        cid_2m = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * mm), 1)

        def gj_step(kk, aug):
            rowmask = (rid_m1 == kk).astype(dtype)
            row = jnp.sum(aug * rowmask[None], axis=1, keepdims=True)
            colmask = (cid_2m == kk).astype(dtype)
            pv = jnp.sum(row * colmask[None], axis=2, keepdims=True)
            piv = row / safe_pv(pv)
            col = jnp.sum(aug * colmask[None], axis=2, keepdims=True)
            elim = aug - col * piv
            return jnp.where(rid_aug[None] == kk, piv, elim)

        aug = jax.lax.fori_loop(0, mm, gj_step, aug)
        return aug[:, :, mm:]

    return inv_gj


def _make_fric_ops(neq, neq_real, k_c, fd, m, bb, dtype, base_red, mu_fric,
                   unroll):
    """Reduced friction-structure Schur machinery shared by the forward and
    backward kernels: returns (factor, solve_S_fac) where factor(dinv)
    produces the per-diagonal factorization and solve_S_fac(fac, hvec)
    solves S w = hvec in the full m frame (see _make_kernel docstring for
    the derivation)."""
    fd2 = fd // 2
    nf = k_c * fd
    nf2 = k_c * fd2
    m2 = neq + k_c + nf2
    inv_gj2 = _make_gj_inverter(m2, dtype, unroll, force_unroll_small=True)

    # static selection masks (iota only; Mosaic has no gather).
    # friction rows are per-contact blocks [d1..d_fd2, -d1..-d_fd2]
    r2 = jax.lax.broadcasted_iota(jnp.int32, (nf2, nf), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (nf2, nf), 1)
    src_p = (r2 // fd2) * fd + r2 % fd2
    mask_p = (c2 == src_p).astype(dtype)  # (nf2, nf)
    mask_m = (c2 == src_p + fd2).astype(dtype)
    rk = jax.lax.broadcasted_iota(jnp.int32, (nf2, k_c), 0)
    ck = jax.lax.broadcasted_iota(jnp.int32, (nf2, k_c), 1)
    mask_e = (ck == rk // fd2).astype(dtype)  # (nf2, k): contact of row

    def pick_p(x):  # (bb, nf) -> (bb, nf2)
        return jnp.sum(mask_p[None] * x[:, None, :], axis=-1)

    def pick_m(x):
        return jnp.sum(mask_m[None] * x[:, None, :], axis=-1)

    def scat_pm(xp, xm):  # two (bb, nf2) -> (bb, nf)
        return jnp.sum(
            mask_p[None] * xp[:, :, None] + mask_m[None] * xm[:, :, None],
            axis=1,
        )

    def expand(xk):  # per-contact (bb, k) -> per-row (bb, nf2)
        return jnp.sum(mask_e[None] * xk[:, None, :], axis=-1)

    def csum(x2):  # per-row (bb, nf2) -> per-contact (bb, k)
        return jnp.sum(mask_e[None] * x2[:, :, None], axis=1)

    # full-m2-frame masks for assembling the v-block updates without
    # scatter: rows/cols [eq | n | f+]
    rm2 = jax.lax.broadcasted_iota(jnp.int32, (m2, m2), 0)
    cm2 = jax.lax.broadcasted_iota(jnp.int32, (m2, m2), 1)
    eye_m2 = (rm2 == cm2).astype(dtype)
    vstart = neq + k_c
    in_v = (rm2 >= vstart) & (cm2 >= vstart)
    same_blk = ((rm2 - vstart) // fd2) == ((cm2 - vstart) // fd2)
    blockmask_v = (in_v & same_blk).astype(dtype)  # (m2, m2)
    vn_mask = (
        (rm2 >= vstart) & (cm2 >= neq) & (cm2 < vstart)
        & (((rm2 - vstart) // fd2) == (cm2 - neq))
    ).astype(dtype)
    colid2 = jax.lax.broadcasted_iota(jnp.int32, (1, m2), 1)
    pad_reg2 = ((colid2 >= neq_real) & (colid2 < neq)).astype(dtype)

    def cat_parts(parts, offs, width):
        """Place (bb, w_i) pieces at static column offsets in a (bb, width)
        vector. Mosaic cannot lower concatenate of sliced operands with
        mismatched sublane offsets; masked placement via iota one-hots
        lowers cleanly."""
        out = None
        for part, off in zip(parts, offs):
            wi = part.shape[-1]
            r = jax.lax.broadcasted_iota(jnp.int32, (wi, width), 0)
            c = jax.lax.broadcasted_iota(jnp.int32, (wi, width), 1)
            sel = (c == off + r).astype(dtype)
            t = jnp.sum(sel[None] * part[:, :, None], axis=1)
            out = t if out is None else out + t
        return out

    def pad_v(x2):  # (bb, nf2) -> (bb, m2) zeros on [eq, n]
        return cat_parts([x2], [vstart], m2)

    def factor(dinv):
        dn_inv = dinv[:, :k_c]
        df_inv = dinv[:, k_c : k_c + nf]
        dc = 1.0 / dinv[:, k_c + nf :]  # cone d = z_c / s_c
        dpi = pick_p(df_inv)
        dmi = pick_m(df_inv)
        sigma = 0.5 * (dpi + dmi)
        delta = 0.5 * (dpi - dmi)
        sig_inv = 1.0 / sigma
        dsig = delta * sig_inv
        s_j = csum(sig_inv)  # (bb, k)
        cj = 2.0 * dc / (1.0 + 2.0 * dc * s_j)
        cj_r = expand(cj)

        # K = base_red + diag adds + rank-1 v-block + (v, n) coupling
        diag_add = cat_parts(
            [dn_inv, 0.5 * sigma - 0.5 * delta * dsig],
            [neq, vstart], m2,
        )
        K = base_red + eye_m2[None] * (diag_add[:, None, :] + pad_reg2)
        dsig_f = pad_v(dsig)
        cj_f = pad_v(cj_r)
        K = K + 0.5 * cj_f[:, :, None] * dsig_f[:, :, None] * dsig_f[:, None, :] * blockmask_v[None]
        vn_coef = pad_v(dsig * expand(dc * mu_fric * (1.0 - cj * s_j)))
        K = K + vn_coef[:, :, None] * vn_mask[None]

        invK = inv_gj2(K)
        return (invK, sig_inv, cj_r, dc, delta)

    def solve_S_fac(fac, hvec):
        """w with S w = hvec via the reduced system + closed-form recovery
        of (wf+, wf-, wc)."""
        invK, sig_inv, cj_r, dc, delta = fac
        he = hvec[:, :neq]
        hn = hvec[:, neq : neq + k_c]
        hf = hvec[:, neq + k_c : neq + k_c + nf]
        hc = hvec[:, m - k_c :]
        rp = pick_p(hf)
        rm_ = pick_m(hf)
        g = expand(dc * hc)
        q = rp + rm_ - 2.0 * g

        def SM(x):  # (sigma + 2C)^-1 x, per-contact Sherman-Morrison
            t = sig_inv * x
            return t - cj_r * sig_inv * expand(csum(t))

        rhs = cat_parts(
            [he, hn, 0.5 * (rp - rm_ - delta * SM(q))],
            [0, neq, vstart], m2,
        )
        w2 = _mv(invK, rhs)
        we = w2[:, :neq]
        wn = w2[:, neq : neq + k_c]
        v = w2[:, neq + k_c :]
        u = SM(q + 2.0 * expand(dc * mu_fric * wn) - delta * v)
        wf = scat_pm(0.5 * (u + v), 0.5 * (u - v))
        wc = dc * (hc - mu_fric * wn + csum(u))
        return cat_parts(
            [we, wn, wf, wc], [0, neq, neq + k_c, m - k_c], m
        )

    return factor, solve_S_fac


def _make_kernel(nz, neq, nineq, neq_real, max_iter, eps, not_improved_lim,
                 unroll=True, fric=None):
    """Build the kernel function with static sizes closed over.

    `unroll`: fully unroll the GJ + Mehrotra loops (fastest per step but
    Mosaic compile time explodes with block width — a block_b=16 unrolled
    kernel took 4 min to compile, block_b=32 >18 min; wide blocks use the
    fori_loop variant, which compiles in ~2 s).

    `fric`: optional (k, fd) static structure of the physics mixed LCP
    (G = [Jc(k); Jf(k*fd, per-contact blocks of +dirs then -dirs); 0(k)],
    F the E/mu cone coupling — engine.assemble_contact_lcp). When given, the
    per-iteration Schur solve runs on a REDUCED system: the k cone rows are
    eliminated analytically (exact algebra, as ops.qp._factor_S), and the
    +/- friction-direction pairs (Jf- = -Jf+) are folded into sum/difference
    variables u = wf+ + wf-, v = wf+ - wf-, where the u-block is
    (per-contact diagonal + rank-1) and inverts in closed form
    (Sherman-Morrison); only the dense (neq + k + k*fd/2) system in
    (w_eq, w_n, v) needs the Gauss-Jordan. At the bench shape that is a
    26x26 GJ instead of 46x46 — ~5x less VPU work per iteration, which is
    where this latency-bound kernel spends its time. The kernel then takes
    two extra inputs: base_red (the base Schur block on [eq, n, f+] rows)
    and mu (the per-contact friction coefficients)."""
    m = neq + nineq

    def kernel(*refs):
        if fric is not None:
            (q_ref, invq_ref, base_ref, basered_ref, g_ref, a_ref, f_ref,
             mu_ref, p_ref, h_ref, b_ref, x_out, s_out, z_out, y_out) = refs
        else:
            (q_ref, invq_ref, base_ref, g_ref, a_ref, f_ref, p_ref, h_ref,
             b_ref, x_out, s_out, z_out, y_out) = refs
        dtype = p_ref.dtype
        Q = q_ref[:]
        invQ = invq_ref[:]
        base = base_ref[:]
        G = g_ref[:]
        A = a_ref[:]
        F = f_ref[:]
        p = p_ref[:]
        h = h_ref[:]
        b = b_ref[:]
        bb = p.shape[0]

        # constants generated in-kernel (Pallas forbids captured arrays)
        rid = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
        eye_m = (rid == cid).astype(dtype)
        colid = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
        # diag regularizer 1.0 on PADDED equality rows (A=0 there would
        # make S singular; the reg pins the padded y to exactly 0)
        pad_reg = ((colid >= neq_real) & (colid < neq)).astype(dtype)

        def build_S(dinv):
            # F arrives pre-padded to the (m, m) frame (Mosaic has no
            # strided scatter); base + F_full + diag([pad_reg, dinv])
            dfull = jnp.concatenate(
                [jnp.zeros((bb, neq), dtype=dtype), dinv], axis=-1
            ) + pad_reg
            return base + F + eye_m[None] * dfull[:, None, :]

        inv_gj = _make_gj_inverter(m, dtype, unroll)

        if fric is None:

            def factor(dinv):
                return inv_gj(build_S(dinv))

            def solve_S_fac(fac, hvec):
                return _mv(fac, hvec)

        else:
            k_c, fd = fric
            factor, solve_S_fac = _make_fric_ops(
                neq, neq_real, k_c, fd, m, bb, dtype,
                basered_ref[:], mu_ref[:], unroll,
            )

        def solve_kkt(fac, d, rx, rs, rz, ry):
            invQ_rx = _mv(invQ, rx)
            h_ineq = _mv(G, invQ_rx) + rs / d - rz
            h_eq = _mv(A, invQ_rx) - ry
            hvec = jnp.concatenate([h_eq, h_ineq], axis=-1)
            w = -solve_S_fac(fac, hvec)
            w_eq, w_ineq = w[:, :neq], w[:, neq:]
            g1 = -rx - _mtv(G, w_ineq) - _mtv(A, w_eq)
            g2 = -rs - w_ineq
            return _mv(invQ, g1), g2 / d, w_ineq, w_eq

        def get_step(v, dv):
            a = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
            return jnp.min(a, axis=-1, keepdims=True)

        def norm(r):
            return jnp.sqrt(jnp.sum(r * r, axis=-1, keepdims=True))

        d0 = jnp.ones((bb, nineq), dtype=dtype)
        x, s, z, y = solve_kkt(
            factor(d0), d0, p, jnp.zeros((bb, nineq), dtype=dtype), -h, -b
        )

        def shift(v):
            mn = jnp.min(v, axis=-1, keepdims=True)
            return jnp.where(mn < 0, v - mn + 1.0, v)

        s = shift(s)
        z = shift(z)
        big = jnp.asarray(jnp.finfo(dtype).max, dtype=dtype)

        def Fz(z):
            zf = jnp.concatenate([jnp.zeros((bb, neq), dtype=dtype), z], axis=-1)
            return _mv(F, zf)[:, neq:]

        def residuals(x, s, z, y):
            # Q^T x (not Q x): parity with ops/qp.py:294 and the reference
            # for non-symmetric Q (identical for the symmetric mass matrix)
            rx = _mtv(G, z) + _mtv(Q, x) + p + _mtv(A, y)
            rs = z
            rz = _mv(G, x) + s - h - Fz(z)
            ry = _mv(A, x) - b
            mu = jnp.abs(jnp.sum(s * z, axis=-1, keepdims=True)) / nineq
            res = norm(rz) + norm(ry) + norm(rx) + nineq * mu
            return rx, rs, rz, ry, mu, res

        def body(it, carry):
            x, s, z, y, bx, bs, bz, by, bres, nni, done = carry
            rx, rs, rz, ry, mu, res = residuals(x, s, z, y)

            improved = res < bres  # (BB,1)
            bx = jnp.where(improved, x, bx)
            bs = jnp.where(improved, s, bs)
            bz = jnp.where(improved, z, bz)
            by = jnp.where(improved, y, by)
            bres = jnp.where(improved, res, bres)
            nni = jnp.where(improved, 0.0, nni + 1.0)

            # done carried as an f32 mask (uniform carry layouts legalize
            # Mosaic's scf.for; a bool/int mix does not)
            newly_done = (
                (nni >= not_improved_lim) | (bres < eps) | (mu > 1e32)
            )
            done = jnp.where(newly_done, 1.0, done)

            d = z / s
            fac = factor(1.0 / d)
            dx_a, ds_a, dz_a, dy_a = solve_kkt(fac, d, rx, rs, rz, ry)

            alpha = jnp.minimum(
                jnp.minimum(get_step(z, dz_a), get_step(s, ds_a)), 1.0
            )
            t1 = s + alpha * ds_a
            t2 = z + alpha * dz_a
            sig = (
                jnp.sum(t1 * t2, axis=-1, keepdims=True)
                / jnp.sum(s * z, axis=-1, keepdims=True)
            ) ** 3

            rs_cor = (-(mu * sig) + ds_a * dz_a) / s
            dx_c, ds_c, dz_c, dy_c = solve_kkt(
                fac, d,
                jnp.zeros((bb, nz), dtype=dtype), rs_cor,
                jnp.zeros((bb, nineq), dtype=dtype),
                jnp.zeros((bb, neq), dtype=dtype),
            )

            dx = dx_a + dx_c
            ds = ds_a + ds_c
            dz = dz_a + dz_c
            dy = dy_a + dy_c
            alpha = jnp.minimum(
                0.999 * jnp.minimum(get_step(z, dz), get_step(s, ds)), 1.0
            )

            x_n = x + alpha * dx
            s_n = s + alpha * ds
            z_n = z + alpha * dz
            y_n = y + alpha * dy

            finite = (
                jnp.all(jnp.isfinite(x_n), axis=-1, keepdims=True)
                & jnp.all(jnp.isfinite(s_n), axis=-1, keepdims=True)
                & jnp.all(jnp.isfinite(z_n), axis=-1, keepdims=True)
            )
            done = jnp.where(~finite, 1.0, done)
            keep = done > 0.5
            x_n = jnp.where(keep, x, x_n)
            s_n = jnp.where(keep, s, s_n)
            z_n = jnp.where(keep, z, z_n)
            y_n = jnp.where(keep, y, y_n)
            return (x_n, s_n, z_n, y_n, bx, bs, bz, by, bres, nni, done)

        # while_loop with an ALL-DONE early exit instead of a fixed-trip
        # fori/unroll: once every lane in the block is frozen (converged /
        # not-improved / NaN), the remaining iterations are exact no-ops —
        # resting-contact solves typically converge in ~half of max_iter, so
        # exiting saves real GJ inversions. Carries stay uniform f32
        # (Mosaic legalization; the iteration counter rides a (bb,1) plane).
        carry = (
            jnp.zeros((bb, 1), dtype=dtype),
            x, s, z, y, x, s, z, y,
            jnp.full((bb, 1), big, dtype=dtype),
            jnp.zeros((bb, 1), dtype=dtype),
            jnp.zeros((bb, 1), dtype=dtype),
        )

        def w_cond(carry):
            itv, done = carry[0], carry[-1]
            return (jnp.min(itv) < max_iter) & (jnp.min(done) < 0.5)

        def w_body(carry):
            itv = carry[0]
            return (itv + 1.0,) + body(0, carry[1:])

        carry = jax.lax.while_loop(w_cond, w_body, carry)
        x, s, z, y, bx, bs, bz, by, bres, nni, done = carry[1:]

        # final best-iterate check on the last iterate
        _, _, _, _, _, res = residuals(x, s, z, y)
        improved = (res < bres) & (done < 0.5)
        x_out[:] = jnp.where(improved, x, bx)
        s_out[:] = jnp.where(improved, s, bs)
        z_out[:] = jnp.where(improved, z, bz)
        y_out[:] = jnp.where(improved, y, by)

    return kernel


def _fric_ok(structure, nineq, neq_real):
    """Static predicate: can the reduced friction-structure solve be used?"""
    if structure is None or structure[0] != "fric":
        return False
    _, k, fd = structure
    return k > 0 and fd >= 2 and fd % 2 == 0 and nineq == k * (2 + fd)


def _pdipm_pallas_flat(
    Q, invQ, p, G, h, A, b, F, max_iter, eps, not_improved_lim, block_b,
    interpret, structure=None,
):
    B, nineq, nz = G.shape
    neq_real = A.shape[-2]
    dtype = Q.dtype
    fric = None
    if _fric_ok(structure, nineq, neq_real):
        fric = (structure[1], structure[2])

    # pad equality block to >= 1 row (zero rows + diag reg pin y_pad = 0)
    neq = max(neq_real, 1)
    if neq_real == 0:
        A = jnp.zeros((B, 1, nz), dtype=dtype)
        b = jnp.zeros((B, 1), dtype=dtype)

    # one-time products (iteration-independent)
    if invQ is None:
        Q_chol = jnp.linalg.cholesky(Q)
        invQ = jax.scipy.linalg.cho_solve(
            (Q_chol, True), jnp.broadcast_to(jnp.eye(nz, dtype=dtype), Q.shape)
        )
    AG = jnp.concatenate([A, G], axis=-2)
    base = AG @ invQ @ jnp.swapaxes(AG, -1, -2)
    if fric is not None:
        # reduced-solve one-time data (see _make_kernel docstring): the base
        # Schur block restricted to [eq, n, f+] rows (one static gather, done
        # here because Mosaic has none) and the cone coefficients mu
        k_c, fd = fric
        fd2 = fd // 2
        idx = np.concatenate(
            [
                np.arange(neq + k_c),
                neq + k_c
                + (np.arange(k_c * fd2) // fd2) * fd
                + np.arange(k_c * fd2) % fd2,
            ]
        )
        base_red = base[:, idx][:, :, idx]
        mu_f = jnp.diagonal(F[:, k_c * (1 + fd) :, :k_c], axis1=-2, axis2=-1)
    # F padded into the full (m, m) Schur frame (in-kernel strided scatter
    # is not lowerable on Mosaic)
    m_ = neq + nineq
    F = (
        jnp.zeros((B, m_, m_), dtype=dtype)
        .at[:, neq:, neq:]
        .set(F)
    )

    # block sizing: grid steps run SERIALLY on the TensorCore while each
    # Mehrotra iteration's per-lane work is latency-bound, so packing more
    # problems per block converts idle VPU lanes into throughput (measured:
    # the B=16 seed-batch ladder at block_b=8 spends ~90% of its time in
    # sequential half-empty grid steps). VMEM per problem is dominated by
    # the (m, 2m) GJ augmented matrix plus a handful of (m, m)/(nz, nz)
    # planes; cap the block so a block's working set stays ~8MB.
    if block_b is None:
        if fric is not None:
            # reduced solve: the winning layout is the FEWEST grid steps
            # (measured at 48 lanes: one 48-wide step 398 us vs two 32-wide
            # 587 us vs three 16-wide 497 us — grid steps serialize on the
            # TensorCore). The scoped-VMEM footprint is the unrolled GJ's
            # live-range UNION, not the nominal arrays: measured 19.04MB at
            # 64 lanes / m2 = 26 (~300KB per lane, ~440 bytes * m2^2);
            # budget 15.5MB of the 16MB scoped limit (48 lanes = 14.3MB ok)
            m2_ = neq + fric[0] + fric[0] * (fric[1] // 2)
            per_lane = 440 * m2_ * m2_
            cap = max(8, min(64, (15_500_000 // max(per_lane, 1)) // 8 * 8))
        else:
            # calibrated to the fori GJ's measured live-range union: a
            # 32-wide m=92 block allocated 18.93MB scoped (~72 B x m^2 per
            # lane) and OOM'd the 16MB limit; budget 15.5MB
            m_rows = neq + nineq
            per_lane = 72 * m_rows * m_rows
            cap = max(8, min(32, (15_500_000 // max(per_lane, 1)) // 8 * 8))
        block_b = min(_round_up(B, 8), cap)

    # pad batch to a multiple of block_b by edge replication (independent
    # lanes; padded results are dropped)
    Bp = _round_up(max(B, block_b), block_b)
    def padb(x):
        if Bp == B:
            return x
        return jnp.concatenate(
            [x, jnp.broadcast_to(x[-1:], (Bp - B,) + x.shape[1:])], axis=0
        )
    Qp_, invQp, basep, Gp, Ap, Fp, pp, hp, bp = map(
        padb, (Q, invQ, base, G, A, F, p, h, b)
    )

    kernel = _make_kernel(
        nz, neq, nineq, neq_real, max_iter, eps, not_improved_lim,
        unroll=block_b <= 8, fric=fric,
    )

    grid = (Bp // block_b,)
    mat = lambda r, c: pl.BlockSpec(
        (block_b, r, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    vec = lambda n: pl.BlockSpec(
        (block_b, n), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    m = neq + nineq
    inputs = [Qp_, invQp, basep, Gp, Ap, Fp, pp, hp, bp]
    in_specs = [
        mat(nz, nz), mat(nz, nz), mat(m, m), mat(nineq, nz),
        mat(neq, nz), mat(m, m), vec(nz), vec(nineq), vec(neq),
    ]
    if fric is not None:
        m2 = neq + k_c + k_c * fd2
        inputs = inputs[:3] + [padb(base_red)] + inputs[3:5] + [inputs[5], padb(mu_f)] + inputs[6:]
        in_specs = in_specs[:3] + [mat(m2, m2)] + in_specs[3:5] + [in_specs[5], vec(k_c)] + in_specs[6:]
    x, s, z, y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[vec(nz), vec(nineq), vec(nineq), vec(neq)],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, nz), dtype),
            jax.ShapeDtypeStruct((Bp, nineq), dtype),
            jax.ShapeDtypeStruct((Bp, nineq), dtype),
            jax.ShapeDtypeStruct((Bp, neq), dtype),
        ],
        interpret=interpret,
    )(*inputs)

    x, s, z, y = x[:B], s[:B], z[:B], y[:B]
    if neq_real == 0:
        y = y[:, :0]
    return x, y, z, s


def _make_batched_impl(max_iter, eps, not_improved_lim, block_b, interpret,
                       structure=None):
    """custom_vmap wrapper: vmapping this solver must FLATTEN the mapped
    axis into the kernel's batch dimension. The default vmap-of-pallas_call
    instead prepends a grid axis, so every mapped lane pads its own batch to
    a multiple of block_b and runs as separate sequential grid programs —
    a 16-lane vmap of a 9-deep probe ladder would run 32 half-empty blocks
    instead of 18 full ones."""

    @jax.custom_batching.custom_vmap
    def impl(Q, invQ, p, G, h, A, b, F):
        return _pdipm_pallas_flat(
            Q, invQ, p, G, h, A, b, F, max_iter, eps, not_improved_lim, block_b,
            interpret, structure,
        )

    @impl.def_vmap
    def _vmap_rule(axis_size, in_batched, Q, invQ, p, G, h, A, b, F):
        args = []
        for x, batched in zip((Q, invQ, p, G, h, A, b, F), in_batched):
            if not batched:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            args.append(x.reshape((-1,) + x.shape[2:]))
        out = impl(*args)
        out = tuple(o.reshape((axis_size, -1) + o.shape[1:]) for o in out)
        return out, (True, True, True, True)

    return impl


@functools.partial(jax.custom_jvp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def _pdipm_pallas_impl(
    Q, invQ, p, G, h, A, b, F, max_iter, eps, not_improved_lim, block_b,
    interpret, structure,
):
    impl = _make_batched_impl(
        max_iter, eps, not_improved_lim, block_b, interpret, structure
    )
    return impl(Q, invQ, p, G, h, A, b, F)


@_pdipm_pallas_impl.defjvp
def _pdipm_pallas_jvp(
    max_iter, eps, not_improved_lim, block_b, interpret, structure, primals,
    tangents,
):
    """Zero tangents: this is the gradient-free PROBE solver; gradients are
    attached later through ops.qp.lcp_solve_from_solution (KKT implicit
    diff). Declaring the derivative (rather than relying on callers'
    stop_gradient) keeps the pallas_call off every autodiff path."""
    out = _pdipm_pallas_impl(
        *primals, max_iter, eps, not_improved_lim, block_b, interpret, structure
    )
    return out, jax.tree_util.tree_map(jnp.zeros_like, out)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iter", "eps", "not_improved_lim", "block_b", "interpret",
        "structure",
    ),
)
def pdipm_pallas(
    Q, p, G, h, A, b, F,
    max_iter=10, eps=1e-6, not_improved_lim=3,
    block_b=None, interpret=False, invQ=None, structure=None,
):
    """Batched PDIPM forward (x, y, z, s) — Pallas TPU kernel.

    Mirrors ops.qp.pdipm_solve_raw (gradient-free; see _pdipm_pallas_jvp).
    All inputs batched (B, ...); neq may be 0. The batch is processed in
    blocks of `block_b` problems, each block fully vectorized across
    sublanes. `structure=("fric", k, fd)` (static) asserts the physics
    friction-LCP layout (engine.assemble_contact_lcp row ordering) and
    switches the per-iteration Schur solve to the reduced
    (neq + k + k*fd/2) system — see _make_kernel."""
    if invQ is None:
        # generic path: explicit inverse via one batched Cholesky. Callers
        # with structured Q (the block-diagonal mass matrix) should pass an
        # analytic invQ — XLA's batched small Cholesky serializes per lane.
        Q_chol = jnp.linalg.cholesky(Q)
        invQ = jax.scipy.linalg.cho_solve(
            (Q_chol, True),
            jnp.broadcast_to(jnp.eye(Q.shape[-1], dtype=Q.dtype), Q.shape),
        )
    return _pdipm_pallas_impl(
        Q, invQ, p, G, h, A, b, F, max_iter, eps, not_improved_lim, block_b,
        interpret, structure,
    )


# ---------------------------------------------------------------------------
# Backward: one KKT solve for the implicit differentiation (lcp.py:155-213)
# ---------------------------------------------------------------------------


def _make_grad_kernel(nz, neq, nineq, neq_real, unroll=True, fric=None):
    """KKT solve with rhs (dl_dzhat, 0, 0, 0) — the only linear-algebra work
    in the LCP backward. Same GJ machinery as the forward kernel, including
    the reduced friction-structure solve (`fric=(k, fd)`, see _make_fric_ops)."""
    m = neq + nineq

    def kernel(*refs):
        if fric is not None:
            (invq_ref, base_ref, basered_ref, g_ref, a_ref, f_ref, mu_ref,
             d_ref, rx_ref, dx_out, dlam_out, dnu_out) = refs
        else:
            (invq_ref, base_ref, g_ref, a_ref, f_ref, d_ref, rx_ref,
             dx_out, dlam_out, dnu_out) = refs
        dtype = rx_ref.dtype
        invQ = invq_ref[:]
        base = base_ref[:]
        G = g_ref[:]
        A = a_ref[:]
        F = f_ref[:]
        d = d_ref[:]
        rx = rx_ref[:]
        bb = rx.shape[0]

        if fric is None:
            rid = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
            cid = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
            eye_m = (rid == cid).astype(dtype)
            colid = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
            pad_reg = ((colid >= neq_real) & (colid < neq)).astype(dtype)

            dfull = jnp.concatenate(
                [jnp.zeros((bb, neq), dtype=dtype), 1.0 / d], axis=-1
            ) + pad_reg
            S = base + F + eye_m[None] * dfull[:, None, :]
            inv_gj = _make_gj_inverter(m, dtype, unroll)
            fac = inv_gj(S)

            def solve_S_fac(fac, hvec):
                return _mv(fac, hvec)

        else:
            k_c, fd = fric
            factor, solve_S_fac = _make_fric_ops(
                neq, neq_real, k_c, fd, m, bb, dtype,
                basered_ref[:], mu_ref[:], unroll,
            )
            fac = factor(1.0 / d)

        invQ_rx = _mv(invQ, rx)
        hvec = jnp.concatenate([_mv(A, invQ_rx), _mv(G, invQ_rx)], axis=-1)
        w = -solve_S_fac(fac, hvec)
        w_eq, w_ineq = w[:, :neq], w[:, neq:]
        g1 = -rx - _mtv(G, w_ineq) - _mtv(A, w_eq)
        dx_out[:] = _mv(invQ, g1)
        dlam_out[:] = w_ineq
        dnu_out[:] = w_eq

    return kernel


def _kkt_grad_flat(invQ, base, G, A, Ffull, d, rx, block_b, interpret,
                   structure=None):
    B, nineq, nz = G.shape
    m = base.shape[-1]
    neq = m - nineq
    dtype = rx.dtype
    fric = None
    if _fric_ok(structure, nineq, neq):
        fric = (structure[1], structure[2])

    if block_b is None:
        # same grid-serialization economics as the forward kernel: one KKT
        # solve per lane is latency-bound, pack blocks as wide as VMEM allows
        # (fewest grid steps for the reduced solve — see _pdipm_pallas_flat)
        if fric is not None:
            # same scoped-VMEM calibration as the forward kernel
            m2_ = neq + fric[0] + fric[0] * (fric[1] // 2)
            per_lane = 440 * m2_ * m2_
            cap = max(8, min(64, (15_500_000 // max(per_lane, 1)) // 8 * 8))
        else:
            # same fori-GJ live-range calibration as the forward kernel
            per_lane = 72 * m * m
            cap = max(8, min(32, (15_500_000 // max(per_lane, 1)) // 8 * 8))
        block_b = min(_round_up(B, 8), cap)

    Bp = _round_up(max(B, block_b), block_b)

    def padb(x):
        if Bp == B:
            return x
        return jnp.concatenate(
            [x, jnp.broadcast_to(x[-1:], (Bp - B,) + x.shape[1:])], axis=0
        )

    inputs = list(map(padb, (invQ, base, G, A, Ffull, d, rx)))
    kernel = _make_grad_kernel(nz, neq, nineq, neq, unroll=block_b <= 8,
                               fric=fric)

    mat = lambda r, c: pl.BlockSpec(
        (block_b, r, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    vec = lambda n: pl.BlockSpec(
        (block_b, n), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        mat(nz, nz), mat(m, m), mat(nineq, nz), mat(neq, nz), mat(m, m),
        vec(nineq), vec(nz),
    ]
    if fric is not None:
        k_c, fd = fric
        fd2 = fd // 2
        m2 = neq + k_c + k_c * fd2
        idx = np.concatenate(
            [
                np.arange(neq + k_c),
                neq + k_c
                + (np.arange(k_c * fd2) // fd2) * fd
                + np.arange(k_c * fd2) % fd2,
            ]
        )
        base_red = base[:, idx][:, :, idx]
        # mu from the padded Ffull: cone rows at [neq+k(1+fd):], normal cols
        # at [neq : neq+k]
        mu_f = jnp.diagonal(
            Ffull[:, neq + k_c * (1 + fd) :, neq : neq + k_c],
            axis1=-2, axis2=-1,
        )
        inputs = inputs[:2] + [padb(base_red)] + inputs[2:5] + [padb(mu_f)] + inputs[5:]
        in_specs = in_specs[:2] + [mat(m2, m2)] + in_specs[2:5] + [vec(k_c)] + in_specs[5:]
    dx, dlam, dnu = pl.pallas_call(
        kernel,
        grid=(Bp // block_b,),
        in_specs=in_specs,
        out_specs=[vec(nz), vec(nineq), vec(neq)],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, nz), dtype),
            jax.ShapeDtypeStruct((Bp, nineq), dtype),
            jax.ShapeDtypeStruct((Bp, neq), dtype),
        ],
        interpret=interpret,
    )(*inputs)
    return dx[:B], dlam[:B], dnu[:B]


@functools.partial(
    jax.jit, static_argnames=("block_b", "interpret", "structure")
)
def kkt_grad_pallas(invQ, G, A, F, d, rx, block_b=None, interpret=False,
                    structure=None):
    """Solve the backward KKT system (reference lcp.py:184-198: rhs =
    (dl_dzhat, 0, 0, 0)) for a batch, entirely in one kernel launch.

    Returns (dx, dlam, dnu). `invQ` must be supplied (analytic for the
    block-diagonal mass matrix — engine.mass_matrix_inv); `F` is the
    (nineq, nineq) coupling, padded internally. neq may be 0.
    `structure=("fric", k, fd)` additionally asserts the physics +/-
    friction-pair layout and uses the reduced Schur solve (_make_fric_ops)."""
    B, nineq, nz = G.shape
    neq_real = A.shape[-2]
    dtype = invQ.dtype
    neq = max(neq_real, 1)
    if neq_real == 0:
        A = jnp.zeros((B, 1, nz), dtype=dtype)
    m = neq + nineq
    AG = jnp.concatenate([A, G], axis=-2)
    base = AG @ invQ @ jnp.swapaxes(AG, -1, -2)
    Ffull = jnp.zeros((B, m, m), dtype=dtype).at[:, neq:, neq:].set(F)

    @jax.custom_batching.custom_vmap
    def impl(invQ, base, G, A, Ffull, d, rx):
        return _kkt_grad_flat(invQ, base, G, A, Ffull, d, rx, block_b,
                              interpret, structure)

    @impl.def_vmap
    def _vmap_rule(axis_size, in_batched, *args):
        flat = []
        for x, batched in zip(args, in_batched):
            if not batched:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            flat.append(x.reshape((-1,) + x.shape[2:]))
        out = impl(*flat)
        out = tuple(o.reshape((axis_size, -1) + o.shape[1:]) for o in out)
        return out, (True, True, True)

    dx, dlam, dnu = impl(invQ, base, G, A, Ffull, d, rx)
    if neq_real == 0:
        dnu = dnu[:, :0]
    return dx, dlam, dnu


def blockdiag_inv3(Q):
    """Inverse of a (nb, nz, nz) matrix made of 3x3 DIAGONAL blocks (the
    generalized mass matrix layout) — analytic adjugate/det per block, no
    LAPACK. Caller asserts the structure (the "fric_pallas" path)."""
    nb, nz, _ = Q.shape
    nblk = nz // 3
    out = jnp.zeros_like(Q)
    for i in range(nblk):
        s = slice(3 * i, 3 * i + 3)
        B = Q[:, s, s]
        a, b, c = B[:, 0, 0], B[:, 0, 1], B[:, 0, 2]
        d, e, f = B[:, 1, 0], B[:, 1, 1], B[:, 1, 2]
        g, h, i_ = B[:, 2, 0], B[:, 2, 1], B[:, 2, 2]
        A11 = e * i_ - f * h
        A12 = c * h - b * i_
        A13 = b * f - c * e
        A21 = f * g - d * i_
        A22 = a * i_ - c * g
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
        out = out.at[:, s, s].set(adj / det[:, None, None])
    return out
