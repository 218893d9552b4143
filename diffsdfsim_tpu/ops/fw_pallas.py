"""Fused Pallas TPU kernel for the Frank-Wolfe contact search.

One kernel launch runs, for one directed body pair, the ENTIRE gradient-free
contact-search phase of the reference `FWContactHandler`
(`sdf_physics/physics3d/contacts.py:39-94` `_frank_wolfe`, `:84-94` surface
push + contact test, `:161-214` no-grad contact quantities):

- candidate gate (centroid SDF < circumradius + eps)
- min-corner initialization + 32 Frank-Wolfe iterations with the reference's
  per-face improvement freeze and per-pair early stops ("all improvements
  below tol" / "found sdf < -tol", contacts.py:73-78) — early-stopped
  iterations become exact no-ops via an active mask
- b1-surface push (for SDF-SDF pairs) + final contact test (sdf <= eps)
- contact quantities for filtering/acceptance: world normals, world-oriented
  p1 offsets, penetration, and the max-penetration reduction.

Why a kernel: the search is per-face independent elementwise math over a few
hundred to a few thousand faces, iterated ~32x. As XLA ops each iteration is
~50 small HBM-roundtrip ops — latency-bound single-lane and bandwidth-bound
under the probe-ladder x seed-batch vmap (every intermediate re-reads/writes
(BB, F) from HBM). In the kernel all per-face state lives in VMEM/registers
for the whole loop; HBM traffic is one read of the triangle soup and one
write of the outputs.

Scope: analytic SDF shapes (sphere / box / rounded box / cylinder / brick)
for body 2 (the queried SDF) and for body 1 when it is an SDF body. Grid and
latent (IGR) shapes fall back to the XLA path (physics/contacts.py), which
remains the reference implementation this kernel is parity-tested against
(tests/test_fw_pallas.py).

Layout: the batch (vmap lanes x probe-ladder depth, flattened by a
custom_vmap rule like ops/qp_pallas.py) rides the sublanes; faces ride the
vector lanes; 3-vectors are kept as separate (bb, F) component planes.
Per-lane scalars (rotations, translations, normalized shape params) arrive
in one packed (bb, NCONST) block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# static shape-kind tags (kernel specializations)
KIND_NONE = -1  # body 1 is a plain mesh (no SDF queries on it)
KIND_SPHERE = 0
KIND_BOX = 1
KIND_ROUNDED_BOX = 2
KIND_CYLINDER = 3
KIND_BRICK = 4

_NPARAMS = 4  # packed param slots per shape
NCONST = 32  # packed lane-constant block: R1(9) R2(9) d21(3) s1 s2 _ _ _ p1(4) p2(4)... see _pack_consts

# test/bench hook: force the batch-block width regardless of the VMEM model
_FORCED_BLOCK = None


def _round_up(x, m):
    return (x + m - 1) // m * m


# --------------------------------------------------------------------------
# in-kernel math on (bb, F) component planes
# --------------------------------------------------------------------------


def _safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 1e-24))


def _norm3(a, b, c):
    return _safe_sqrt(a * a + b * b + c * c)


def _sign_nz(x):
    return jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)


def _prim_sdf_grad(kind, prm, x, y, z):
    """Normalized-frame SDF value + (unnormalized-ok) gradient of one
    analytic primitive; mirrors ops/sdf.py formula for formula."""
    one = jnp.ones_like(x)
    if kind == KIND_SPHERE:
        rad = prm[0]
        n = _norm3(x, y, z)
        return n - rad, (x, y, z)

    if kind in (KIND_BOX, KIND_ROUNDED_BOX):
        if kind == KIND_ROUNDED_BOX:
            r, d0, d1, d2 = prm[0], prm[1], prm[2], prm[3]
        else:
            d0, d1, d2 = prm[0], prm[1], prm[2]
        q0 = jnp.abs(x) - d0 * 0.5
        q1 = jnp.abs(y) - d1 * 0.5
        q2 = jnp.abs(z) - d2 * 0.5
        maxd = jnp.maximum(jnp.maximum(q0, q1), q2)
        m0 = jnp.maximum(q0, 0.0)
        m1 = jnp.maximum(q1, 0.0)
        m2 = jnp.maximum(q2, 0.0)
        sdf = _norm3(m0, m1, m2) + jnp.minimum(maxd, 0.0)
        if kind == KIND_ROUNDED_BOX:
            sdf = sdf - r
        # failsafe tie gradient (ops/sdf.py box_sdf_grad; reference
        # bodies.py:51-72)
        nrm = _norm3(m0, m1, m2)
        inside = (maxd <= 0).astype(x.dtype)
        g0 = (m0 / nrm + inside * (q0 == maxd)) * _sign_nz(x)
        g1 = (m1 / nrm + inside * (q1 == maxd)) * _sign_nz(y)
        g2 = (m2 / nrm + inside * (q2 == maxd)) * _sign_nz(z)
        return sdf, (g0, g1, g2)

    if kind == KIND_CYLINDER:
        rad, height = prm[0], prm[1]
        r_xy = _safe_sqrt(x * x + y * y)
        q0 = r_xy - rad  # |r_xy| = r_xy
        q1 = jnp.abs(z) - height * 0.5
        maxd = jnp.maximum(q0, q1)
        m0 = jnp.maximum(q0, 0.0)
        m1 = jnp.maximum(q1, 0.0)
        sdf = _safe_sqrt(m0 * m0 + m1 * m1) + jnp.minimum(maxd, 0.0)
        nrm = _safe_sqrt(m0 * m0 + m1 * m1)
        inside = (maxd <= 0).astype(x.dtype)
        g2d0 = m0 / nrm + inside * (q0 == maxd)
        g2d1 = m1 / nrm + inside * (q1 == maxd)
        inv_rxy = 1.0 / r_xy
        g0 = g2d0 * x * inv_rxy
        g1 = g2d0 * y * inv_rxy
        g2 = g2d1 * _sign_nz(z)
        return sdf, (g0, g1, g2)

    if kind == KIND_BRICK:
        d0, d1, d2, r = prm[0], prm[1], prm[2], prm[3]
        h0 = d0 * 0.5 - r
        h1 = d1 * 0.5 - r
        h2 = d2 * 0.5
        q0 = jnp.abs(x) - h0
        q1 = jnp.abs(y) - h1
        q2 = jnp.abs(z) - h2
        max01 = jnp.maximum(q0, q1)
        m0 = jnp.maximum(q0, 0.0)
        m1 = jnp.maximum(q1, 0.0)
        sdf01 = _safe_sqrt(m0 * m0 + m1 * m1) + jnp.minimum(max01, 0.0) - r
        ma = jnp.maximum(sdf01, 0.0)
        mb = jnp.maximum(q2, 0.0)
        sdf = _safe_sqrt(ma * ma + mb * mb) + jnp.minimum(
            jnp.maximum(sdf01, q2), 0.0
        )
        # grad: box failsafe on the outer dims (ops/shapes.py BrickShape
        # uses box_sdf_grad on the full dims)
        qq0 = jnp.abs(x) - d0 * 0.5
        qq1 = jnp.abs(y) - d1 * 0.5
        qq2 = jnp.abs(z) - d2 * 0.5
        maxd = jnp.maximum(jnp.maximum(qq0, qq1), qq2)
        mm0 = jnp.maximum(qq0, 0.0)
        mm1 = jnp.maximum(qq1, 0.0)
        mm2 = jnp.maximum(qq2, 0.0)
        nrm = _norm3(mm0, mm1, mm2)
        inside = (maxd <= 0).astype(x.dtype)
        g0 = (mm0 / nrm + inside * (qq0 == maxd)) * _sign_nz(x)
        g1 = (mm1 / nrm + inside * (qq1 == maxd)) * _sign_nz(y)
        g2 = (mm2 / nrm + inside * (qq2 == maxd)) * _sign_nz(z)
        return sdf, (g0, g1, g2)

    raise ValueError(f"unsupported kind {kind}")


def _query(kind, scale, prm, x, y, z, need_grad=True):
    """Metric local-frame query — mirrors physics/shapes.py query_sdfs:
    bounding-scale overlap mask, metric sdf, normalized masked gradient."""
    ov = (
        (jnp.abs(x) <= scale) & (jnp.abs(y) <= scale) & (jnp.abs(z) <= scale)
    )
    inv_s = 1.0 / scale
    sdf_n, (g0, g1, g2) = _prim_sdf_grad(kind, prm, x * inv_s, y * inv_s, z * inv_s)
    sdf = jnp.where(ov, sdf_n, 1.0) * scale
    if not need_grad:
        return sdf, None
    n = _norm3(g0, g1, g2)
    ovf = ov.astype(x.dtype)
    return sdf, (g0 / n * ovf, g1 / n * ovf, g2 / n * ovf)


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------


def _make_kernel(kind1, kind2, F_real, iters, eps, tol, polish_iters):
    b1_is_sdf = kind1 != KIND_NONE

    def kernel(
        pqr_ref, c_ref,
        abc_out, nrm_out, p1_out, x1_out, pen_out, cand_out, cmask_out, mp_out,
    ):
        C = c_ref[:]
        dtype = C.dtype
        pq = pqr_ref[:]  # (bb, 9, F)
        bb, _, F = pq.shape

        def cc(i):  # (bb, 1) lane scalar
            return C[:, i : i + 1]

        def p(v, c):  # corner v component c: (bb, F)
            return pq[:, 3 * v + c, :]

        R1 = [cc(i) for i in range(9)]
        R2 = [cc(9 + i) for i in range(9)]
        d21 = [cc(18 + i) for i in range(3)]
        s1 = cc(21)
        s2 = cc(22)
        prm1 = [cc(24 + i) for i in range(_NPARAMS)]
        prm2 = [cc(24 + _NPARAMS + i) for i in range(_NPARAMS)]

        # R12 = R1^T R2 (b2 local -> b1 local rotation), t12 = R1^T (p2-p1)
        R12 = [
            [
                R1[0 + i] * R2[0 + j] + R1[3 + i] * R2[3 + j] + R1[6 + i] * R2[6 + j]
                for j in range(3)
            ]
            for i in range(3)
        ]
        t12 = [
            R1[0 + i] * d21[0] + R1[3 + i] * d21[1] + R1[6 + i] * d21[2]
            for i in range(3)
        ]

        def to_b1(x):
            return [
                R12[i][0] * x[0] + R12[i][1] * x[1] + R12[i][2] * x[2] + t12[i]
                for i in range(3)
            ]

        def q2_query(x, need_grad=True):
            return _query(kind2, s2, prm2, x[0], x[1], x[2], need_grad)

        def q1_query(x, need_grad=True):
            return _query(kind1, s1, prm1, x[0], x[1], x[2], need_grad)

        fid = jax.lax.broadcasted_iota(jnp.int32, (bb, F), 1)
        in_range = fid < F_real

        # candidate gate: centroid sdf < circumradius + eps
        # (reference contacts.py:44-52)
        cen = [(p(0, c) + p(1, c) + p(2, c)) * (1.0 / 3.0) for c in range(3)]
        csdf, cg = q2_query(cen)
        rads = jnp.maximum(
            jnp.maximum(
                _norm3(cen[0] - p(0, 0), cen[1] - p(0, 1), cen[2] - p(0, 2)),
                _norm3(cen[0] - p(1, 0), cen[1] - p(1, 1), cen[2] - p(1, 2)),
            ),
            _norm3(cen[0] - p(2, 0), cen[1] - p(2, 1), cen[2] - p(2, 2)),
        )
        g_nz = (cg[0] * cg[0] + cg[1] * cg[1] + cg[2] * cg[2]) > 1e-24
        cand = (csdf < rads + eps) & g_nz & in_range
        candf = cand.astype(dtype)

        # init at min-sdf corner (contacts.py:57-61; first-min tie rule)
        s0, _ = q2_query([p(0, 0), p(0, 1), p(0, 2)], need_grad=False)
        s1_, _ = q2_query([p(1, 0), p(1, 1), p(1, 2)], need_grad=False)
        s2_, _ = q2_query([p(2, 0), p(2, 1), p(2, 2)], need_grad=False)
        i0 = (s0 <= s1_) & (s0 <= s2_)
        i1 = (~i0) & (s1_ <= s2_)
        i2 = (~i0) & (~i1)
        a = [i0.astype(dtype), i1.astype(dtype), i2.astype(dtype)]
        x = [a[0] * p(0, c) + a[1] * p(1, c) + a[2] * p(2, c) for c in range(3)]

        active = jnp.max(candf, axis=-1, keepdims=True)  # (bb, 1)

        # Frank-Wolfe loop (contacts.py:63-82 semantics). while_loop with
        # ALL-f32 uniform carries (the iteration counter rides a (bb,1)
        # plane), NOT a Python unroll: 32 unrolled bodies blow the 16MB
        # scoped VMEM via long live ranges (same hybrid-loop lesson as
        # ops/qp_pallas.py) and take minutes of Mosaic compile. The loop
        # exits as soon as every lane's search has stopped (penetration
        # found / no improvement / no candidates) — frozen iterations are
        # exact no-ops, so outputs are bit-identical to the fixed-trip
        # version, and a no-candidate block (free flight; the far direction
        # of a gated SDF-SDF pair) pays ONE iteration instead of `iters`.
        def fw_body(itv, carry):
            x0, x1, x2, a0, a1, a2, active = carry
            x = [x0, x1, x2]
            sdf, g = q2_query(x)
            d0 = p(0, 0) * g[0] + p(0, 1) * g[1] + p(0, 2) * g[2]
            d1 = p(1, 0) * g[0] + p(1, 1) * g[1] + p(1, 2) * g[2]
            d2 = p(2, 0) * g[0] + p(2, 1) * g[1] + p(2, 2) * g[2]
            m0 = (d0 <= d1) & (d0 <= d2)
            m1 = (~m0) & (d1 <= d2)
            m2 = (~m0) & (~m1)
            mv = [m0.astype(dtype), m1.astype(dtype), m2.astype(dtype)]
            s = [mv[0] * p(0, c) + mv[1] * p(1, c) + mv[2] * p(2, c) for c in range(3)]

            gamma = 2.0 / (itv + 2.0)  # (bb,1) broadcasts over faces
            impr = (
                (x[0] - s[0]) * g[0] + (x[1] - s[1]) * g[1] + (x[2] - s[2]) * g[2]
            )
            gam = gamma * (jnp.abs(impr) > tol).astype(dtype) * candf

            pen_found = jnp.max(
                candf * (sdf < -tol).astype(dtype), axis=-1, keepdims=True
            )
            no_impr = (jnp.max(gam, axis=-1, keepdims=True) == 0.0).astype(dtype)
            stop = jnp.maximum(pen_found, no_impr)
            active = active * (1.0 - stop)

            ge = gam * active
            x = [(1.0 - ge) * x[c] + ge * s[c] for c in range(3)]
            a = [(1.0 - ge) * (a0, a1, a2)[v] + ge * mv[v] for v in range(3)]
            return (x[0], x[1], x[2], a[0], a[1], a[2], active)

        def w_cond(carry):
            itv, active = carry[0], carry[-1]
            return (jnp.min(itv) < iters) & (jnp.max(active) > 0.0)

        def w_body(carry):
            itv = carry[0]
            return (itv + 1.0,) + fw_body(itv, carry[1:])

        _, x0, x1, x2, a0, a1, a2, active = jax.lax.while_loop(
            w_cond,
            w_body,
            (
                jnp.zeros((bb, 1), dtype=dtype),
                x[0], x[1], x[2], a[0], a[1], a[2], active,
            ),
        )
        x = [x0, x1, x2]
        a = [a0, a1, a2]

        # surface push + final contact test (contacts.py:84-94). The push
        # maps x into b1's frame by rigid transform (== abc . tri1 exactly,
        # up to rounding) instead of carrying tri1 through HBM.
        xf = x
        if b1_is_sdf:
            xb1 = to_b1(x)
            s1v, g1v = q1_query(xb1)
            # push vector in b2 frame: -s1 * R12^T g1
            xf = [
                x[c]
                - s1v * (R12[0][c] * g1v[0] + R12[1][c] * g1v[1] + R12[2][c] * g1v[2])
                for c in range(3)
            ]

        def to_b2_from_b1(y):
            return [
                R12[0][c] * (y[0] - t12[0])
                + R12[1][c] * (y[1] - t12[1])
                + R12[2][c] * (y[2] - t12[2])
                for c in range(3)
            ]

        if b1_is_sdf and polish_iters > 0:
            # contact-point polish (ops/polish.py semantics, fused here):
            # projected tangential descent of sdf2 along b1's level set,
            # geometric step shrink, best-iterate tracking. Same VMEM-
            # resident plane layout as the FW loop — ~polish_iters extra
            # fused iterations instead of an XLA post-pass op chain.
            xb1 = to_b1(xf)
            s1b, g1b = q1_query(xb1)
            bx = [xb1[i] - s1b * g1b[i] for i in range(3)]
            bs2, _ = q2_query(to_b2_from_b1(bx), need_grad=False)

            def pol_body(carry):
                etaf, px0, px1, px2, bx0, bx1, bx2, bs2 = carry
                px = [px0, px1, px2]
                bxv = [bx0, bx1, bx2]
                x1c = to_b1(px)
                s1v, g1v = q1_query(x1c)
                x1p = [x1c[i] - s1v * g1v[i] for i in range(3)]
                xp = to_b2_from_b1(x1p)
                s2v, g2 = q2_query(xp)
                bf = (candf * (s2v < bs2).astype(dtype))
                bxv = [bf * x1p[i] + (1.0 - bf) * bxv[i] for i in range(3)]
                bs2 = bf * s2v + (1.0 - bf) * bs2
                # b1 normal in b2 frame: R12^T g1
                n1 = [
                    R12[0][c] * g1v[0] + R12[1][c] * g1v[1] + R12[2][c] * g1v[2]
                    for c in range(3)
                ]
                dot = g2[0] * n1[0] + g2[1] * n1[1] + g2[2] * n1[2]
                t = [g2[c] - dot * n1[c] for c in range(3)]
                tl = _norm3(t[0], t[1], t[2])
                eta = rads * etaf
                xn = [xp[c] - eta * t[c] / tl for c in range(3)]
                px = [candf * xn[c] + (1.0 - candf) * px[c] for c in range(3)]
                return (etaf * 0.5, px[0], px[1], px[2], bxv[0], bxv[1], bxv[2], bs2)

            # while_loop (all-f32 carries) instead of a fixed fori: a block
            # with NO candidates (free flight, the far direction of a gated
            # pair) exits before the first iteration instead of paying
            # polish_iters wasted query rounds — same early-exit rule as the
            # FW loop above
            one = jnp.ones((bb, 1), dtype=dtype)
            pol_active = jnp.max(candf, axis=-1, keepdims=True)  # (bb,1)

            def pol_cond(carry):
                itf = carry[0]
                return (jnp.min(itf) < polish_iters) & (jnp.max(pol_active) > 0.0)

            def pol_step(carry):
                itf = carry[0]
                return (itf + 1.0,) + pol_body(carry[1:])

            _, _, _, _, _, bx0, bx1, bx2, bs2 = jax.lax.while_loop(
                pol_cond, pol_step,
                (
                    jnp.zeros((bb, 1), dtype=dtype),
                    one, xf[0], xf[1], xf[2], bx[0], bx[1], bx[2], bs2,
                ),
            )
            cb1a = [bx0, bx1, bx2]
            fsdf = bs2
        else:
            fsdf, _ = q2_query(xf, need_grad=False)
            cb1a = None

        cmask = cand & (fsdf <= eps)
        cmaskf = cmask.astype(dtype)

        # no-grad contact quantities (contacts.py:161-214, stability test
        # deferred to the differentiable recompute — it only selects which
        # body's normal is reported, never distances)
        if b1_is_sdf:
            if cb1a is None:
                cb1a = to_b1(x)
            pd1, pn1 = q1_query(cb1a)
            cb1 = [cb1a[c] - pd1 * pn1[c] for c in range(3)]
        else:
            # mesh body: contact point is the FW point expressed in b1 local
            # frame (no surface projection)
            cb1 = to_b1(x)

        # p1 world offset = R1 cp_b1
        p1w = [
            R1[3 * i + 0] * cb1[0] + R1[3 * i + 1] * cb1[1] + R1[3 * i + 2] * cb1[2]
            for i in range(3)
        ]
        # cp_b2 = R2^T (p1w - d21)
        w = [p1w[i] - d21[i] for i in range(3)]
        cb2 = [
            R2[0 + i] * w[0] + R2[3 + i] * w[1] + R2[6 + i] * w[2] for i in range(3)
        ]
        d2v, n2v = q2_query(cb2)
        nrm = [
            R2[3 * i + 0] * n2v[0] + R2[3 * i + 1] * n2v[1] + R2[3 * i + 2] * n2v[2]
            for i in range(3)
        ]
        pen = -d2v

        x1a = cb1a if b1_is_sdf else cb1
        for c in range(3):
            abc_out[:, c, :] = a[c]
            nrm_out[:, c, :] = nrm[c] * cmaskf
            p1_out[:, c, :] = p1w[c] * cmaskf
            x1_out[:, c, :] = x1a[c]
        pen_out[:] = jnp.where(cmask, pen, -1.0)
        cand_out[:] = candf
        cmask_out[:] = cmaskf
        mp_out[:] = jnp.max(
            jnp.where(cmask, pen, jnp.asarray(-3e38, dtype=dtype)),
            axis=-1,
            keepdims=True,
        )

    return kernel


def _fw_pallas_flat(
    pqr, consts, kind1, kind2, F_real, iters, eps, tol, polish_iters, interpret
):
    """Unbatched-layout entry: pqr (B, 9, Fp), consts (B, NCONST)."""
    B, _, Fp = pqr.shape
    dtype = pqr.dtype

    # whole batch in one grid step when VMEM allows: grid steps re-run the
    # serial FW loop, so fewer+wider programs win. Mosaic's measured scoped
    # stack: a (24, 9, 768) block allocated 18.61MB = ~252 live (bb, F) f32
    # planes per lane (inputs + outputs + the FW loop's temporaries'
    # live-range union; an earlier (40, 9, 768) kind1=SDF variant measured
    # ~167/lane — size to the worst observed). Budget 14MB of the 16MB
    # scoped limit.
    per_lane = Fp * 300 * 4
    # grid steps are SERIAL, so fewer+wider blocks win — but each step's FW
    # loop over a (block_b, Fp) tile is only ~tens of us, so modest widths
    # are acceptable at seed-batch x probe-ladder scale.
    # hard cap 32: wider blocks (56 lanes at Fp=384) crash the Mosaic
    # compile even when the VMEM estimate fits
    block_b = max(8, min(_round_up(B, 8), 32, (14_000_000 // per_lane) // 8 * 8))
    if _FORCED_BLOCK is not None:  # benchmarking override
        block_b = _FORCED_BLOCK
    Bp = _round_up(max(B, block_b), block_b)

    def padb(x):
        if Bp == B:
            return x
        return jnp.concatenate(
            [x, jnp.broadcast_to(x[-1:], (Bp - B,) + x.shape[1:])], axis=0
        )

    pqr_p, consts_p = padb(pqr), padb(consts)
    kernel = _make_kernel(kind1, kind2, F_real, iters, eps, tol, polish_iters)

    mat3 = pl.BlockSpec((block_b, 3, Fp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, 9, Fp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, NCONST), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            mat3, mat3, mat3, mat3,
            pl.BlockSpec((block_b, Fp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Fp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, Fp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 3, Fp), dtype),
            jax.ShapeDtypeStruct((Bp, 3, Fp), dtype),
            jax.ShapeDtypeStruct((Bp, 3, Fp), dtype),
            jax.ShapeDtypeStruct((Bp, 3, Fp), dtype),
            jax.ShapeDtypeStruct((Bp, Fp), dtype),
            jax.ShapeDtypeStruct((Bp, Fp), dtype),
            jax.ShapeDtypeStruct((Bp, Fp), dtype),
            jax.ShapeDtypeStruct((Bp, 1), dtype),
        ],
        interpret=interpret,
    )(pqr_p, consts_p)
    return tuple(o[:B] for o in out)


@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _fw_pallas_impl(
    pqr, consts, kind1, kind2, F_real, iters, eps, tol, polish_iters, interpret
):
    @jax.custom_batching.custom_vmap
    def impl(pqr, consts):
        return _fw_pallas_flat(
            pqr, consts, kind1, kind2, F_real, iters, eps, tol, polish_iters,
            interpret,
        )

    @impl.def_vmap
    def _vmap_rule(axis_size, in_batched, pqr, consts):
        args = []
        for x, batched in zip((pqr, consts), in_batched):
            if not batched:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            args.append(x.reshape((-1,) + x.shape[2:]))
        out = impl(*args)
        out = tuple(o.reshape((axis_size, -1) + o.shape[1:]) for o in out)
        return out, tuple(True for _ in out)

    return impl(pqr, consts)


@_fw_pallas_impl.defjvp
def _fw_pallas_jvp(
    kind1, kind2, F_real, iters, eps, tol, polish_iters, interpret,
    primals, tangents,
):
    """Zero tangents: this is the gradient-free SEARCH phase (the reference
    runs it under torch.no_grad, contacts.py:255); gradients come from the
    differentiable contact recompute."""
    out = _fw_pallas_impl(
        *primals, kind1, kind2, F_real, iters, eps, tol, polish_iters, interpret
    )
    return out, jax.tree_util.tree_map(jnp.zeros_like, out)


# --------------------------------------------------------------------------
# packing + public entry
# --------------------------------------------------------------------------


def shape_kind(shape) -> int | None:
    """Kernel kind tag for a shape, or None if unsupported."""
    name = type(shape).__name__
    return {
        "SphereShape": KIND_SPHERE,
        "BoxShape": KIND_BOX,
        "RoundedBoxShape": KIND_ROUNDED_BOX,
        "CylinderShape": KIND_CYLINDER,
        "BrickShape": KIND_BRICK,
    }.get(name)


def _shape_params(shape, dtype):
    """Normalized (by scale) param vector, padded to _NPARAMS."""
    kind = shape_kind(shape)
    s = shape.scale()
    if kind == KIND_SPHERE:
        prm = [shape.rad / s]
    elif kind == KIND_BOX:
        d = shape.dims / s
        prm = [d[0], d[1], d[2]]
    elif kind == KIND_ROUNDED_BOX:
        inner = (shape.dims - 2 * shape.r) / s
        prm = [shape.r / s, inner[0], inner[1], inner[2]]
    elif kind == KIND_CYLINDER:
        prm = [shape.rad / s, shape.height / s]
    elif kind == KIND_BRICK:
        d = shape.dims / s
        prm = [d[0], d[1], d[2], shape.r / s]
    else:
        raise ValueError
    prm = [jnp.asarray(v, dtype=dtype) for v in prm]
    prm += [jnp.zeros((), dtype=dtype)] * (_NPARAMS - len(prm))
    return jnp.stack(prm), s


def supported_pair(bd1, bd2) -> bool:
    """True when this directed pair can run through the kernel."""
    if shape_kind(bd2.shape) is None or not bd2.is_sdf:
        return False
    if bd1.is_sdf and shape_kind(bd1.shape) is None:
        return False
    return True


def fw_search_pair(bd1s, q1, pos1, bd2s, q2, pos2, cfg, interpret=False):
    """Run the fused search for one directed pair (all inputs already
    stop-gradient, b1's surface mesh vs b2's SDF).

    Returns (abc (F,3), n_ng (F,3), p1_ng (F,3), x1 (F,3) b1-frame polished
    anchors, pen (F,), cand (F,) bool, contact_mask (F,) bool, max_pen ()) —
    the no-grad quantities physics/contacts._search_pair_raw_xla derives on
    the XLA path (incl. the ops/polish.py polish stage, fused in-kernel)."""
    from ..utils.quaternion import quat_apply, quat_invert, quat_to_matrix

    dtype = q1.dtype
    kind2 = shape_kind(bd2s.shape)
    kind1 = shape_kind(bd1s.shape) if bd1s.is_sdf else KIND_NONE

    verts_b2 = quat_apply(quat_invert(q2), quat_apply(q1, bd1s.verts) + pos1 - pos2)
    tri = verts_b2[jnp.asarray(bd1s.faces)]  # (F, 3, 3)
    F_real = tri.shape[0]
    Fp = _round_up(F_real, 128)
    pqr = jnp.transpose(tri, (1, 2, 0)).reshape(9, F_real)
    if Fp != F_real:
        pqr = jnp.pad(pqr, ((0, 0), (0, Fp - F_real)))

    R1 = quat_to_matrix(q1).reshape(9)
    R2 = quat_to_matrix(q2).reshape(9)
    d21 = pos2 - pos1
    if bd1s.is_sdf:
        prm1, s1 = _shape_params(bd1s.shape, dtype)
    else:
        prm1 = jnp.zeros((_NPARAMS,), dtype=dtype)
        s1 = jnp.ones((), dtype=dtype)
    prm2, s2 = _shape_params(bd2s.shape, dtype)
    consts = jnp.concatenate(
        [
            R1.astype(dtype), R2.astype(dtype), d21.astype(dtype),
            jnp.stack([s1, s2]).astype(dtype),
            jnp.zeros((1,), dtype=dtype),
            prm1, prm2,
        ]
    )
    consts = jnp.pad(consts, (0, NCONST - consts.shape[0]))

    abc, nrm, p1w, x1, pen, cand, cmask, mp = _fw_pallas_impl(
        pqr[None], consts[None], kind1, kind2, F_real, cfg.fw_iters,
        float(cfg.eps), float(cfg.tol),
        int(cfg.contact_polish_iters) if bd1s.is_sdf else 0, interpret,
    )
    take = lambda x: x[0, :, :F_real].T  # (F, 3)
    max_pen = jnp.where(
        mp[0, 0] <= -1e30, jnp.asarray(-jnp.inf, dtype=dtype), mp[0, 0]
    )
    return (
        take(abc), take(nrm), take(p1w), take(x1), pen[0, :F_real],
        cand[0, :F_real] > 0.5, cmask[0, :F_real] > 0.5, max_pen,
    )
