"""Analytic 2D narrowphase: circle-circle, circle-hull (closest-point +
deep-penetration SAT), and hull-hull SAT with incident-edge clipping.

TPU-native re-derivation of the reference 2D `DiffContactHandler`
(`lcp_physics/physics/contacts.py:55-210`): where the reference walks edges
in data-dependent Python loops with early exits (GJK simplex loop, SAT with
`last_sat_idx` warm starts, variable-length clip lists), this evaluates ALL
edge axes / vertex supports in one fixed-shape vectorized pass and selects
by masked argmax — the same mathematical contact manifold, compiler-friendly
control flow, no host syncs.

Role in the pipeline: a CANDIDATE GENERATOR that replaces the Frank-Wolfe
mesh search for planar worlds (cfg.narrowphase2d, physics2d.make_world_2d
``narrowphase="analytic"``). It emits up to 2 world-frame contact candidates
per directed pair; the standard differentiable recompute
(physics/contacts._compute_contacts) then projects them onto body 1's exact
surface and derives normals/penetrations from the SDFs — identical
downstream semantics (filtering, LCP assembly, TOC) to the FW path it
replaces.

Conventions: CCW polygons; for a CCW edge e = v_next - v, the outward
normal is ``left_orthogonal(e) = [e_y, -e_x]`` (reference utils.py:124-127).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


K2D = 2  # max candidates per directed pair (hull-hull clip emits 2)


def _left_orthogonal(v):
    return jnp.stack([v[..., 1], -v[..., 0]], axis=-1)


def _safe_norm(v, eps=1e-24):
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), eps))


def _edges(verts):
    """(V,2) CCW world verts -> (starts, unit outward normals, lengths)."""
    nxt = jnp.roll(verts, -1, axis=0)
    e = nxt - verts
    ln = _safe_norm(e)
    n = _left_orthogonal(e) / ln[..., None]
    return e, n, ln


def circle_circle(c1, r1, c2, r2):
    """One candidate: the point of circle 1's surface toward circle 2
    (reference contacts.py:72-84 places the manifold on the center line).
    Returns (pts (K2D,2) world, valid (K2D,), sep ())."""
    d = c2 - c1
    dist = _safe_norm(d)
    dirn = d / dist
    sep = dist - (r1 + r2)
    pts = jnp.stack([c1 + r1 * dirn, jnp.zeros_like(c1)])
    valid = jnp.array([True, False])
    return pts, valid, sep


def circle_hull(c, r, hull_verts):
    """One candidate: the hull-boundary point nearest the circle center
    (shallow, reference GJK branch contacts.py:86-118) or the projection of
    the center onto the least-penetrating SAT edge (deep, center inside the
    hull, contacts.py:120-143). Both are points ON the hull boundary; the
    recompute projects them onto whichever body is `b1`."""
    _, n, _ = _edges(hull_verts)
    # signed distance of the center to each edge line (positive outside)
    d = jnp.sum(n * (c[None, :] - hull_verts), axis=-1)  # (V,)
    inside = jnp.all(d < 0.0)

    # shallow: closest point on the boundary (clamped per-edge projection)
    nxt = jnp.roll(hull_verts, -1, axis=0)
    e = nxt - hull_verts
    t = jnp.clip(
        jnp.sum((c[None, :] - hull_verts) * e, axis=-1)
        / jnp.maximum(jnp.sum(e * e, axis=-1), 1e-24),
        0.0,
        1.0,
    )
    q = hull_verts + t[:, None] * e  # (V,2)
    dq = _safe_norm(c[None, :] - q)
    j = jnp.argmin(dq)
    closest = q[j]

    # deep: least-penetrating edge (max signed distance), center projection
    jj = jnp.argmax(d)
    proj = c - n[jj] * d[jj]

    pt = jnp.where(inside, proj, closest)
    sep = jnp.where(inside, d[jj], dq[j]) - r
    pts = jnp.stack([pt, jnp.zeros_like(pt)])
    valid = jnp.array([True, False])
    return pts, valid, sep


def _sat_best_axis(vertsA, vertsB):
    """Best (least-penetrating) face axis of hull A against hull B:
    returns (sep, edge index, outward normal (2,), support-vertex index of
    B) — the reference's test_separations (contacts.py:226-255) without the
    warm start / early exit."""
    _, n, _ = _edges(vertsA)  # (V,2)
    # support of B along -n_i: the vertex minimizing n_i . u
    du = n @ vertsB.T  # (Va, Vb)
    sup = jnp.argmin(du, axis=-1)  # (Va,)
    sep_i = jnp.min(du, axis=-1) - jnp.sum(n * vertsA, axis=-1)  # (Va,)
    i = jnp.argmax(sep_i)
    return sep_i[i], i, n[i], sup[i]


def hull_hull(vertsA, vertsB):
    """Up to two candidates from SAT + incident-edge clipping (reference
    contacts.py:151-210): pick the reference face as the LARGER of the two
    hulls' best separations, find the incident edge on the other hull (the
    adjacent edge of the support vertex whose normal is most anti-parallel,
    get_incident_edge contacts.py:257-272), and clip it to the reference
    edge's extent. The reference clips to a center-symmetric slab of the
    edge's half-length (clip_segment_to_line with ±half_edge_norm offsets);
    clipping to the actual edge interval is the exact version of the same
    operation and only relocates candidates along the incident edge.

    Returns (pts (2,2) world points on the INCIDENT hull's edge, valid (2,),
    sep (), ref_is_A () bool)."""
    sepA, iA, nA, supA = _sat_best_axis(vertsA, vertsB)
    sepB, iB, nB, supB = _sat_best_axis(vertsB, vertsA)
    ref_is_A = sepA >= sepB  # reference picks contact2 only if strictly better
    sep = jnp.maximum(sepA, sepB)

    # hull vertex counts are static but may differ, so both reference-frame
    # choices are evaluated and selected at the end (cheap fixed-shape math)

    def _clip(vertsRef, iRef, nRef, vertsInc, supInc):
        v0 = vertsRef[iRef]
        v1 = jnp.roll(vertsRef, -1, axis=0)[iRef]
        tangent = _left_orthogonal(nRef)  # along the reference edge

        # incident edge: of the two edges adjacent to the support vertex,
        # the one whose outward normal is most anti-parallel to nRef
        Vi = vertsInc.shape[0]
        _, nI, _ = _edges(vertsInc)
        eprev = (supInc - 1) % Vi
        use_prev = jnp.sum(nRef * nI[eprev]) < jnp.sum(nRef * nI[supInc])
        ei = jnp.where(use_prev, eprev, supInc)
        p0 = vertsInc[ei]
        p1 = jnp.roll(vertsInc, -1, axis=0)[ei]

        # clip the incident segment to the reference edge's tangent interval
        lo = jnp.minimum(jnp.dot(tangent, v0), jnp.dot(tangent, v1))
        hi = jnp.maximum(jnp.dot(tangent, v0), jnp.dot(tangent, v1))
        t0 = jnp.dot(tangent, p0)
        t1 = jnp.dot(tangent, p1)
        dseg = jnp.where(jnp.abs(t1 - t0) < 1e-12, 1e-12, t1 - t0)
        a0 = jnp.clip((lo - t0) / dseg, 0.0, 1.0)
        a1 = jnp.clip((hi - t0) / dseg, 0.0, 1.0)
        c0 = p0 + a0 * (p1 - p0)
        c1 = p0 + a1 * (p1 - p0)
        pts = jnp.stack([c0, c1])  # (2,2) on the incident edge
        # keep points at or below the reference face (dist <= eps is applied
        # by the caller's penetration test; here just order validity)
        dist = jnp.sum((pts - v0[None]) * nRef[None], axis=-1)
        return pts, dist

    ptsA, distA = _clip(vertsA, iA, nA, vertsB, supA)  # ref = A, inc = B
    ptsB, distB = _clip(vertsB, iB, nB, vertsA, supB)  # ref = B, inc = A
    pts = jnp.where(ref_is_A, ptsA, ptsB)
    dist = jnp.where(ref_is_A, distA, distB)
    valid = jnp.ones((2,), dtype=bool)
    return pts, valid, sep, dist


def _shape2d(bd):
    """Static classification of a body's planar cross-section:
    ("circle", radius) | ("hull", local CCW verts (V,2)) | None."""
    from ..physics.shapes import BoxShape, CylinderShape
    from .facade import HullShape

    s = bd.shape
    if isinstance(s, CylinderShape):
        return ("circle", s.rad)
    if isinstance(s, BoxShape):
        w, h = s.dims[0] / 2.0, s.dims[1] / 2.0
        verts = jnp.stack(
            [
                jnp.stack([w, h]),
                jnp.stack([-w, h]),
                jnp.stack([-w, -h]),
                jnp.stack([w, -h]),
            ]
        )
        return ("hull", verts)
    if isinstance(s, HullShape):
        return ("hull", s.verts2d * s.scale_)
    return None


def supported_pair(bd1, bd2) -> bool:
    return _shape2d(bd1) is not None and _shape2d(bd2) is not None


def _theta(q):
    """Planar rotation angle of a z-axis quaternion [w,x,y,z]."""
    return 2.0 * jnp.arctan2(q[3], q[0])


def _rot2(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])


def pair_candidates(bd1, q1, pos1, bd2, q2, pos2):
    """World-frame contact candidates for one directed pair of planar
    bodies. Returns (pts (K2D,2), valid (K2D,), sep ()): `pts` lie on a body
    surface near the contact (exactly which body's depends on the case —
    the downstream recompute projects them onto bd1's SDF), `sep` is the
    analytic separation (negative = penetrating)."""
    k1, a1 = _shape2d(bd1)
    k2, a2 = _shape2d(bd2)
    c1, c2 = pos1[:2], pos2[:2]

    if k1 == "circle" and k2 == "circle":
        return circle_circle(c1, a1, c2, a2)

    if k1 == "circle":
        hull_w = c2[None, :] + a2 @ _rot2(_theta(q2)).T
        return circle_hull(c1, a1, hull_w)

    hull1_w = c1[None, :] + a1 @ _rot2(_theta(q1)).T
    if k2 == "circle":
        pts, valid, sep = circle_hull(c2, a2, hull1_w)
        return pts, valid, sep

    hull2_w = c2[None, :] + a2 @ _rot2(_theta(q2)).T
    pts, valid, sep, _ = hull_hull(hull1_w, hull2_w)
    return pts, valid, sep
