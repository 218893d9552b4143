"""Contact filtering: normal clustering + deterministic support selection.

Replaces the reference `_filter_contacts` (`sdf_physics/physics3d/
contacts.py:97-158`: greedy normal-angle clustering, then scipy Qhull convex
hull vertices per cluster) with a fixed-shape, host-sync-free equivalent:

- greedy clustering by normal angle < 1e-2 rad over a fixed number of
  cluster rounds (first unassigned valid contact seeds each cluster, matching
  the reference's index-order greediness)
- per cluster, instead of Qhull vertices, keep the support points (argmax of
  p . d) along 8 fixed tangential directions in the plane orthogonal to the
  cluster normal — for the planar point sets produced by contact manifolds
  this recovers exactly the extreme points Qhull would keep (e.g. the 4
  corners of a box-floor patch), deterministically and differentiability-free
  (runs under stop_gradient like the reference's no-grad filter phase)
- exact-duplicate removal + stable compaction to a fixed K output slots.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.spherical import normalize, orthogonal

_SQ2 = 0.7071067811865476


def filter_contacts(
    normals: jnp.ndarray,
    p1: jnp.ndarray,
    valid: jnp.ndarray,
    k_out: int,
    n_clusters: int = 4,
    angle_thresh: float = 1e-2,
    dedup_eps: float = 1e-3,
):
    """Select up to k_out representative contact indices.

    `n_clusters` bounds the greedy clustering rounds; the reference clusters
    until EVERY contact is assigned (contacts.py:110-130) — with a fixed
    shape we unroll up to `n_clusters` rounds (cfg.max_filter_clusters),
    which covers manifolds touching at up to that many distinct normal
    directions (e.g. a nonconvex shape resting in a corner).

    Returns (sel_idx (k_out,) int32, sel_valid (k_out,) bool)."""
    nf = normals.shape[0]
    f_idx = jnp.arange(nf)
    valid = valid & (jnp.linalg.norm(normals, axis=-1) > 1e-12)
    n_unit = normalize(normals)

    unassigned = valid
    slot_idx = []
    slot_valid = []
    for _ in range(n_clusters):
        # first unassigned valid contact seeds the cluster (reference takes
        # normals[0] of the remaining set, contacts.py:110-111)
        first = jnp.argmin(jnp.where(unassigned, f_idx, nf))
        has = jnp.any(unassigned)
        n_ref = n_unit[first]
        cosang = jnp.clip(jnp.einsum("fc,c->f", n_unit, n_ref), -1.0, 1.0)
        member = unassigned & (jnp.arccos(cosang) < angle_thresh) & has

        t1r = normalize(orthogonal(n_ref))
        t2r = normalize(jnp.cross(n_ref, t1r))
        # rotate the direction fan by a fixed ~7 deg off the frame axes: an
        # axis-aligned fan ties its argmax along every edge of an
        # axis-aligned contact face (a box resting on a floor — the common
        # case), and tie-breaking on O(1e-14) score noise then selects
        # DIFFERENT far-apart edge points across numerically equivalent
        # execution paths (single vs batched-native), i.e. materially
        # different contact manifolds. Off-axis directions make the argmax
        # a unique face corner — exactly the hull vertices the reference's
        # Qhull keeps — and stable under path jitter.
        _c0, _s0 = 0.992197667229329, 0.124674733385228  # cos/sin(0.125)
        t1 = _c0 * t1r + _s0 * t2r
        t2 = -_s0 * t1r + _c0 * t2r
        dirs = jnp.stack(
            [
                t1, t2, -t1, -t2,
                _SQ2 * (t1 + t2), _SQ2 * (t1 - t2),
                -_SQ2 * (t1 + t2), -_SQ2 * (t1 - t2),
            ]
        )  # (8,3)
        scores = jnp.einsum("fc,dc->fd", p1, dirs)
        scores = jnp.where(member[:, None], scores, -jnp.inf)
        picks = jnp.argmax(scores, axis=0)  # (8,)
        for d in range(8):
            slot_idx.append(picks[d])
            slot_valid.append(member[picks[d]])
        unassigned = unassigned & ~member

    slot_idx = jnp.stack(slot_idx).astype(jnp.int32)  # (S,)
    slot_valid = jnp.stack(slot_valid)

    # duplicate removal, keep first occurrence: same face index OR contact
    # point within dedup_eps (the reference's hull/min-max filter collapses
    # sub-eps point clusters to one representative, contacts.py:139-147;
    # with the polish stage several faces converge to the SAME point, and
    # keeping the near-coincident copies would put degenerate duplicate rows
    # into the LCP)
    s = slot_idx.shape[0]
    p1s = p1[slot_idx]
    d2 = jnp.sum((p1s[None, :, :] - p1s[:, None, :]) ** 2, axis=-1)  # [i, j]
    eq = (slot_idx[None, :] == slot_idx[:, None]) | (d2 < dedup_eps * dedup_eps)
    earlier = jnp.tril(jnp.ones((s, s), dtype=bool), k=-1)  # i < j as [j, i]? -> use transpose
    dup = jnp.any(eq & earlier.T & slot_valid[:, None], axis=0)
    unique = slot_valid & ~dup

    # stable compaction: valid-unique slots first, original order preserved
    keys = jnp.where(unique, jnp.arange(s), s + jnp.arange(s))
    order = jnp.argsort(keys)
    top = order[:k_out]
    return slot_idx[top], unique[top]
