"""Contact generation: per-pair Frank-Wolfe search + differentiable recompute.

Port of the reference `FWContactHandler` pipeline
(`sdf_physics/physics3d/contacts.py:161-273`) to fixed-shape masked buffers:

- per *directed* body pair (b1 surface mesh vs b2 SDF), run the gradient-free
  FW search + filtering, then RECOMPUTE the selected contacts differentiably
  (`_search_contacts` runs FW under no_grad and recomputes with grad,
  contacts.py:255-264)
- contact normal selected by SDF-stability: 6-point Laplacian comparison of
  both SDFs at the contact (contacts.py:184-202)
- SDF-SDF pairs run both directions, direction 2 gated on direction 1
  producing a penetration-free step (contacts.py:233-240); both gated by the
  `_overlap` OBB test (contacts.py:27-36)
- all per-pair results are compacted into one global fixed-K contact buffer
  (validity-sorted), which the engine consumes.

Contact record convention matches the reference: ``normal`` (world frame,
pointing from b1 into b2's outside), ``p1``/``p2`` world-*oriented* offsets
from each body's origin, ``pen`` = -dist (contacts.py:204-212).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import struct

from ..config import SimConfig
from ..ops.filtering import filter_contacts
from ..ops.frank_wolfe import finalize_fw, frank_wolfe_multi
from ..ops.polish import polish_pair
from ..utils.quaternion import quat_apply, quat_invert, quat_multiply
from .bodies import BodyDef


@struct.dataclass
class Contacts:
    """Global padded contact buffer (K slots)."""

    normal: jnp.ndarray  # (K,3)
    p1: jnp.ndarray  # (K,3)
    p2: jnp.ndarray  # (K,3)
    pen: jnp.ndarray  # (K,)
    valid: jnp.ndarray  # (K,) bool
    i1: jnp.ndarray  # (K,) int32 body index of body 1
    i2: jnp.ndarray  # (K,) int32
    pair_id: jnp.ndarray  # (K,) int32 unordered-pair id
    max_pen_all: jnp.ndarray  # () max penetration across ALL candidates
    pair_active: jnp.ndarray  # (n_pairs,) any valid contact per unordered pair


class DirectedPair(NamedTuple):
    """Static contact-pair descriptor (built once at world construction)."""

    b1: int  # body whose surface mesh provides candidates
    b2: int  # body whose SDF is queried
    pair_id: int  # unordered pair index
    gated: bool  # True for the second direction of an SDF-SDF pair
    overlap_test: bool  # True for SDF-SDF pairs (reference _overlap gate)


def _overlap(bd1: BodyDef, q1, pos1, bd2: BodyDef, q2, pos2):
    """Broadphase gate (reference _overlap, contacts.py:27-36), upgraded
    from the reference's vertex-in-scale-box test to a true AABB
    intersection: the reference requires some VERTEX of one mesh to fall
    inside the other's scale box, which silently misses contacts when one
    mesh is coarse relative to the other body (a small sphere penetrating a
    large floor between the floor mesh's vertices — masked in the reference
    by its dense marching-cubes surfaces). Intersecting each mesh's AABB (in
    the other body's frame) with the scale box is a conservative superset:
    it never skips a genuinely touching pair."""
    v1_b2 = quat_apply(quat_invert(q2), quat_apply(q1, bd1.verts) + pos1 - pos2)
    v2_b1 = quat_apply(quat_invert(q1), quat_apply(q2, bd2.verts) + pos2 - pos1)
    s1, s2 = bd1.scale(), bd2.scale()
    ov1 = jnp.all((jnp.max(v1_b2, axis=0) >= -s2) & (jnp.min(v1_b2, axis=0) <= s2))
    ov2 = jnp.all((jnp.max(v2_b1, axis=0) >= -s1) & (jnp.min(v2_b1, axis=0) <= s1))
    return ov1 & ov2


def _compute_contacts(
    bd1: BodyDef,
    q1,
    pos1,
    bd2: BodyDef,
    q2,
    pos2,
    abc,
    face_idx,
    valid,
    eps: float,
    detach_contact_b2: bool,
    with_stability: bool = True,
    anchor_b1=None,
):
    """Differentiable contact recompute (reference _compute_contacts,
    contacts.py:161-214) for a masked set of (abc, face) candidates.

    With `anchor_b1` (N,3, stop-gradient body-1-frame points from the polish
    stage, ops/polish.py), the barycentric point is replaced by the anchor;
    gradients w.r.t. shape/pose flow through the differentiable surface
    projection below exactly as for the bary point (to first order at the
    surface the two parametrizations have the same derivative — the bary
    path's vertex motion is radial through sdf1 too)."""
    if anchor_b1 is not None:
        cp_b1 = jax.lax.stop_gradient(anchor_b1)
    else:
        faces = jnp.asarray(bd1.faces)[face_idx]  # (N,3)
        tri = bd1.verts[faces]  # (N,3,3)
        cp_b1 = jnp.sum(tri * abc[..., None], axis=1)

    if bd1.is_sdf:
        d1, n1 = bd1.query_sdfs(cp_b1)
        cp_b1 = cp_b1 - d1[..., None] * n1
        d1, n1 = bd1.query_sdfs(cp_b1)

    contact_pts = quat_apply(q1, cp_b1) + pos1

    cp_b2 = quat_apply(quat_invert(q2), contact_pts - pos2)
    if detach_contact_b2:
        cp_b2 = jax.lax.stop_gradient(cp_b2)

    d2, n2 = bd2.query_sdfs(cp_b2)

    if bd1.is_sdf and with_stability:
        # 6-point Laplacian stability test (contacts.py:184-202), all six
        # offsets batched into ONE SDF query per body (the sequential
        # per-axis queries would be 12 latency-bound tiny ops on TPU)
        eye = jnp.eye(3, dtype=cp_b1.dtype) * eps
        offs = jnp.concatenate([eye, -eye], axis=0)  # (6,3)
        n = cp_b1.shape[0]
        pts1 = (cp_b1[None, :, :] + offs[:, None, :]).reshape(-1, 3)
        pts2 = (cp_b2[None, :, :] + offs[:, None, :]).reshape(-1, 3)
        s1 = bd1.query_sdfs(pts1, return_grads=False).reshape(6, n)
        s2 = bd2.query_sdfs(pts2, return_grads=False).reshape(6, n)
        lap1 = jnp.sum(s1, axis=0) - 6 * d1
        lap2 = jnp.sum(s2, axis=0) - 6 * d2
        stable = (jnp.abs(lap2) < jnp.abs(lap1))[..., None]
        normals = quat_apply(q2, n2) * stable - quat_apply(q1, n1) * (~stable)
    else:
        normals = quat_apply(q2, n2)

    p1 = quat_apply(q1, cp_b1)
    p2 = quat_apply(q2, cp_b2 - d2[..., None] * n2)
    pen = -d2
    vm = valid
    return (
        jnp.where(vm[..., None], normals, 0.0),
        jnp.where(vm[..., None], p1, 0.0),
        jnp.where(vm[..., None], p2, 0.0),
        jnp.where(vm, pen, -1.0),
    )


class PairCache(NamedTuple):
    """Gradient-free outputs of one directed pair's FW search + filtering —
    everything the differentiable recompute needs (all stop-grad data)."""

    abc_sel: jnp.ndarray  # (K,3)
    sel_idx: jnp.ndarray  # (K,) int32 face indices
    sel_valid: jnp.ndarray  # (K,) bool
    max_pen: jnp.ndarray  # () over ALL candidates (step acceptance)
    # (K,3) polished body-1-frame anchors (ops/polish.py); consumed by the
    # recompute instead of bary(abc) when the pair polishes (zeros otherwise)
    x1_sel: jnp.ndarray = None


class RawPairSearch(NamedTuple):
    """Per-face search results of one directed pair BEFORE filtering.

    The probe ladder (world._probe_ladder) needs only `max_pen` per trial dt
    to pick the accepted rung; filtering to K representatives is deferred to
    the single selected rung (`cache_from_raw`) instead of paying it D times
    under the ladder vmap."""

    abc: jnp.ndarray  # (F,3)
    n_ng: jnp.ndarray  # (F,3) world normals (no-grad)
    p1_ng: jnp.ndarray  # (F,3) world-oriented p1 offsets (no-grad)
    pen: jnp.ndarray  # (F,)
    cmask: jnp.ndarray  # (F,) bool contact mask
    max_pen: jnp.ndarray  # ()
    # (F,3) polished body-1-frame anchors (zeros when the pair cannot polish)
    x1: jnp.ndarray = None


def _pair_polishes(bd1: BodyDef, cfg: SimConfig) -> bool:
    """Static: does this directed pair run the contact polish (ops/polish.py)?
    Needs body 1 queryable as an SDF (the tangential descent projects onto
    body 1's level set each iteration)."""
    return cfg.contact_polish_iters > 0 and bd1.is_sdf


def _use_narrowphase2d(bd1: BodyDef, bd2: BodyDef, cfg: SimConfig) -> bool:
    """Static: does this directed pair use the analytic 2D narrowphase
    (physics2d/narrowphase.py) instead of the Frank-Wolfe mesh search?"""
    if not cfg.narrowphase2d or not bd1.is_sdf:
        return False
    from ..physics2d import narrowphase as np2d

    return np2d.supported_pair(bd1, bd2)


def _pair_uses_anchors(bd1: BodyDef, bd2: BodyDef, cfg: SimConfig) -> bool:
    """Static: does the differentiable recompute consume cached body-1-frame
    anchor points (x1_sel) instead of barycentric face points? True for
    polishing pairs and for the analytic 2D narrowphase (whose candidates
    are anchor points by construction)."""
    return _pair_polishes(bd1, cfg) or _use_narrowphase2d(bd1, bd2, cfg)


def _fw_setup(bd1: BodyDef, q1, pos1, bd2: BodyDef, q2, pos2):
    """Stop-gradient inputs of one directed pair's FW search: triangles of
    bd1's surface in bd2's local metric frame + bd2's SDF query."""
    sg = jax.lax.stop_gradient
    q1s, p1s, q2s, p2s = sg(q1), sg(pos1), sg(q2), sg(pos2)
    bd1s = jax.tree_util.tree_map(sg, bd1)
    bd2s = jax.tree_util.tree_map(sg, bd2)
    verts_b2 = quat_apply(quat_invert(q2s), quat_apply(q1s, bd1s.verts) + p1s - p2s)
    pqr = verts_b2[jnp.asarray(bd1.faces)]
    return pqr, (lambda p: bd2s.query_sdfs(p)), (q1s, p1s, q2s, p2s, bd1s, bd2s)


def _search_pair_raw_xla(
    bd1: BodyDef, q1, pos1, bd2: BodyDef, q2, pos2, cfg: SimConfig
) -> RawPairSearch:
    """XLA backend of one directed pair's gradient-free search: FW over all
    faces, surface push + contact test, no-grad contact quantities. The
    reference runs exactly this under torch.no_grad (contacts.py:255-264)."""
    sg = jax.lax.stop_gradient
    pqr, query_fn, sg_frames = _fw_setup(bd1, q1, pos1, bd2, q2, pos2)
    fw = frank_wolfe_multi([pqr], [query_fn], cfg.eps, cfg.tol, cfg.fw_iters)[0]
    if bd1.face_valid is not None:
        # marching-mesher bodies: faces of invalid (parked-at-origin)
        # triangles must never be contact candidates — the zero-vertex
        # sentinel alone passes the centroid-ball gate whenever the body
        # origin penetrates the other body (ADVICE r2)
        fv = jax.lax.stop_gradient(bd1.face_valid)
        fw = fw._replace(cand=fw.cand & fv, contact_mask=fw.contact_mask & fv)
    q1s, p1s, q2s, p2s, bd1s, bd2s = sg_frames
    F = fw.abc.shape[0]
    dtype = fw.abc.dtype

    push_fn = None
    if bd1.is_sdf:
        q21 = quat_multiply(quat_invert(q2s), q1s)
        tri1 = bd1s.verts[jnp.asarray(bd1.faces)]

        def push_fn(abc):
            x_b1 = jnp.sum(tri1 * abc[..., None], axis=1)
            s1, g1 = bd1s.query_sdfs(x_b1)
            return -s1[..., None] * quat_apply(q21, g1)

    # the contact-quantity phase only matters when some face is a candidate;
    # the common far-apart frame skips it at runtime (under vmap both
    # branches execute — unavoidable cond semantics)
    def with_candidates(_):
        fwf = finalize_fw(fw, lambda p: bd2s.query_sdfs(p), cfg.eps, push_fn)
        x1 = jnp.zeros((F, 3), dtype=dtype)
        cmask = fwf.contact_mask
        if _pair_polishes(bd1, cfg):
            # polish each candidate's FW point along bd1's analytic surface;
            # step scale = face circumradius (the FW point's error bound)
            rads = jnp.max(
                jnp.linalg.norm(jnp.mean(pqr, axis=1)[:, None, :] - pqr, axis=-1),
                axis=1,
            )
            x1, s2p = polish_pair(
                fwf.x, fw.cand, rads, bd1s, q1s, p1s, bd2s, q2s, p2s,
                cfg.contact_polish_iters,
            )
            cmask = fw.cand & (s2p <= cfg.eps)
        # no-grad contact quantities over all faces (filtering + acceptance).
        # The Laplacian stability test is skipped here: it selects WHICH
        # body's normal to report (contacts.py:184-202) but never changes
        # distances, so the penetration acceptance (pen = -dist2) is exact,
        # and for touching surfaces -R1 n1 ≈ R2 n2 so normal clustering is
        # unaffected. The differentiable recompute applies the exact test.
        n_ng, p1_ng, _, pen_ng = _compute_contacts(
            bd1s, q1s, p1s, bd2s, q2s, p2s,
            sg(fwf.abc), jnp.arange(F), cmask,
            cfg.eps, cfg.detach_contact_b2, with_stability=False,
            anchor_b1=x1 if _pair_polishes(bd1, cfg) else None,
        )
        max_pen = jnp.max(jnp.where(cmask, pen_ng, -jnp.inf))
        return RawPairSearch(
            abc=sg(fwf.abc), n_ng=n_ng, p1_ng=p1_ng, pen=pen_ng,
            cmask=cmask, max_pen=max_pen, x1=x1,
        )

    def without_candidates(_):
        return RawPairSearch(
            abc=jnp.zeros((F, 3), dtype=dtype),
            n_ng=jnp.zeros((F, 3), dtype=dtype),
            p1_ng=jnp.zeros((F, 3), dtype=dtype),
            pen=jnp.full((F,), -1.0, dtype=dtype),
            cmask=jnp.zeros((F,), dtype=bool),
            max_pen=jnp.asarray(-jnp.inf, dtype=dtype),
            x1=jnp.zeros((F, 3), dtype=dtype),
        )

    raw = jax.lax.cond(jnp.any(fw.cand), with_candidates, without_candidates, None)
    # sever: every leaf is already gradient-free data, but consuming cond
    # outputs downstream in a differentiated context otherwise pulls the
    # cond (and its masked-NaN interior arithmetic) onto the transpose path
    # (see CLAUDE.md autodiff landmine #2)
    return jax.tree_util.tree_map(jax.lax.stop_gradient, raw)


def _use_fw_pallas(bd1: BodyDef, bd2: BodyDef, cfg: SimConfig) -> bool:
    from ..ops import fw_pallas

    if cfg.fw_backend == "xla":
        return False
    if not fw_pallas.supported_pair(bd1, bd2):
        return False
    return cfg.fw_backend == "pallas" or jax.default_backend() == "tpu"


def _search_pair_raw_pallas(
    bd1: BodyDef, q1, pos1, bd2: BodyDef, q2, pos2, cfg: SimConfig
) -> RawPairSearch:
    """Fused-kernel backend: one Pallas launch (ops/fw_pallas.py) replaces
    the FW while_loop + finalize + no-grad contact quantities."""
    from ..ops import fw_pallas

    sg = jax.lax.stop_gradient
    q1s, p1s, q2s, p2s = sg(q1), sg(pos1), sg(q2), sg(pos2)
    bd1s = jax.tree_util.tree_map(sg, bd1)
    bd2s = jax.tree_util.tree_map(sg, bd2)
    interpret = jax.default_backend() != "tpu"

    abc, n_ng, p1_ng, x1, pen, cand, cmask, max_pen = fw_pallas.fw_search_pair(
        bd1s, q1s, p1s, bd2s, q2s, p2s, cfg, interpret=interpret
    )
    if bd1.face_valid is not None:
        fv = sg(bd1.face_valid)
        cmask = cmask & fv
        max_pen = jnp.max(jnp.where(cmask, pen, -jnp.inf))
    return RawPairSearch(
        abc=abc, n_ng=n_ng, p1_ng=p1_ng, pen=pen, cmask=cmask,
        max_pen=max_pen, x1=x1,
    )


def _search_pair_raw_2d(
    bd1: BodyDef, q1, pos1, bd2: BodyDef, q2, pos2, cfg: SimConfig
) -> RawPairSearch:
    """Analytic 2D narrowphase backend (physics2d/narrowphase.py, reference
    lcp_physics/physics/contacts.py:55-210): up to K2D world candidates from
    the circle/SAT/clipping algorithms, then the standard no-grad contact
    quantities at those anchors — same downstream contract as the FW
    backends, with the per-face arrays replaced by K2D anchor slots."""
    from ..physics2d import narrowphase as np2d

    sg = jax.lax.stop_gradient
    q1s, p1s, q2s, p2s = sg(q1), sg(pos1), sg(q2), sg(pos2)
    bd1s = jax.tree_util.tree_map(sg, bd1)
    bd2s = jax.tree_util.tree_map(sg, bd2)

    pts2, valid, _sep = np2d.pair_candidates(bd1s, q1s, p1s, bd2s, q2s, p2s)
    F = pts2.shape[0]
    dtype = pts2.dtype
    # world 3D candidate (planar worlds contact at z = 0) -> body-1 frame
    w3 = jnp.concatenate([pts2, jnp.zeros((F, 1), dtype=dtype)], axis=-1)
    x1 = quat_apply(quat_invert(q1s), w3 - p1s)

    n_ng, p1_ng, _, pen_ng = _compute_contacts(
        bd1s, q1s, p1s, bd2s, q2s, p2s,
        jnp.zeros((F, 3), dtype=dtype), jnp.zeros((F,), dtype=jnp.int32),
        valid, cfg.eps, cfg.detach_contact_b2, with_stability=False,
        anchor_b1=x1,
    )
    cmask = valid & (pen_ng >= -cfg.eps)
    max_pen = jnp.max(jnp.where(cmask, pen_ng, -jnp.inf))
    return jax.tree_util.tree_map(
        jax.lax.stop_gradient,
        RawPairSearch(
            abc=jnp.zeros((F, 3), dtype=dtype), n_ng=n_ng, p1_ng=p1_ng,
            pen=pen_ng, cmask=cmask, max_pen=max_pen, x1=x1,
        ),
    )


def search_pair_raw(
    bd1: BodyDef, q1, pos1, bd2: BodyDef, q2, pos2, cfg: SimConfig
) -> RawPairSearch:
    """One directed pair's gradient-free search phase (no filtering)."""
    if _use_narrowphase2d(bd1, bd2, cfg):
        return _search_pair_raw_2d(bd1, q1, pos1, bd2, q2, pos2, cfg)
    if _use_fw_pallas(bd1, bd2, cfg):
        return _search_pair_raw_pallas(bd1, q1, pos1, bd2, q2, pos2, cfg)
    return _search_pair_raw_xla(bd1, q1, pos1, bd2, q2, pos2, cfg)


def cache_from_raw(raw: RawPairSearch, cfg: SimConfig) -> PairCache:
    """Filter a raw search down to K = cfg.max_contacts_per_pair
    representative candidates (Qhull-replacement clustering). Deferred out
    of the probe-ladder vmap: only the accepted rung pays it."""
    k = cfg.max_contacts_per_pair

    def with_candidates(_):
        sel_idx, sel_valid = filter_contacts(
            raw.n_ng, raw.p1_ng, raw.cmask, k_out=k,
            n_clusters=cfg.max_filter_clusters,
        )
        return PairCache(
            abc_sel=raw.abc[sel_idx], sel_idx=sel_idx, sel_valid=sel_valid,
            max_pen=raw.max_pen, x1_sel=raw.x1[sel_idx],
        )

    def without_candidates(_):
        dtype = raw.abc.dtype
        return PairCache(
            abc_sel=jnp.zeros((k, 3), dtype=dtype),
            sel_idx=jnp.zeros((k,), dtype=jnp.int32),
            sel_valid=jnp.zeros((k,), dtype=bool),
            max_pen=raw.max_pen,
            x1_sel=jnp.zeros((k, 3), dtype=dtype),
        )

    cache = jax.lax.cond(
        jnp.any(raw.cmask), with_candidates, without_candidates, None
    )
    return jax.tree_util.tree_map(jax.lax.stop_gradient, cache)


def search_contacts_pair(
    bd1: BodyDef,
    q1,
    pos1,
    bd2: BodyDef,
    q2,
    pos2,
    cfg: SimConfig,
) -> PairCache:
    """One directed pair's gradient-free phase: FW search over all faces,
    then push/penetration/filtering."""
    raw = search_pair_raw(bd1, q1, pos1, bd2, q2, pos2, cfg)
    return cache_from_raw(raw, cfg)


def find_contacts_pair(
    bd1: BodyDef,
    q1,
    pos1,
    bd2: BodyDef,
    q2,
    pos2,
    cfg: SimConfig,
    cache: PairCache | None = None,
):
    """One directed pair: (cached) FW search -> differentiable recompute.
    Returns per-slot (normal, p1, p2, pen, valid, max_pen)."""
    if cache is None:
        cache = search_contacts_pair(bd1, q1, pos1, bd2, q2, pos2, cfg)
    normals, p1c, p2c, pens = _compute_contacts(
        bd1, q1, pos1, bd2, q2, pos2,
        cache.abc_sel, cache.sel_idx, cache.sel_valid,
        cfg.eps, cfg.detach_contact_b2, with_stability=True,
        anchor_b1=cache.x1_sel if _pair_uses_anchors(bd1, bd2, cfg) else None,
    )
    return normals, p1c, p2c, pens, cache.sel_valid, cache.max_pen


class ContactCache(NamedTuple):
    """Gradient-free contact-search results for ALL directed pairs."""

    caches: tuple  # tuple[PairCache]
    gates: tuple  # tuple[() bool]
    max_pen_all: jnp.ndarray  # ()


class RawContactSearch(NamedTuple):
    """Pre-filter search results for ALL directed pairs (probe-ladder
    intermediate; `finish_contacts` turns the selected rung into a
    ContactCache)."""

    raws: tuple  # tuple[RawPairSearch]
    gates: tuple  # tuple[() bool]
    max_pen_all: jnp.ndarray  # ()


def search_contacts_raw(
    bodies: Sequence[BodyDef],
    quat,
    pos,
    directed_pairs: Sequence[DirectedPair],
    cfg: SimConfig,
) -> RawContactSearch:
    """Gradient-free search for all pairs WITHOUT per-pair filtering,
    including the SDF-SDF overlap and direction-2 gating
    (contacts.py:233-240).

    The pairs run as independent while_loops (like the reference's per-pair
    calls, contacts.py:233-240): a fused lockstep loop was measured SLOWER
    on TPU because every iteration pays every pair's SDF queries until the
    slowest pair converges, while independent loops exit per pair."""
    raws, gates = [], []
    pair_pens = {}
    for dp in directed_pairs:
        bd1, bd2 = bodies[dp.b1], bodies[dp.b2]
        raw = search_pair_raw(
            bd1, quat[dp.b1], pos[dp.b1], bd2, quat[dp.b2], pos[dp.b2], cfg
        )
        gate = jnp.asarray(True)
        if dp.overlap_test:
            gate = _overlap(bd1, quat[dp.b1], pos[dp.b1], bd2, quat[dp.b2], pos[dp.b2])
        if dp.gated:
            gate = gate & (pair_pens[dp.pair_id] <= cfg.tol)
        max_pen = jnp.where(gate, raw.max_pen, -jnp.inf)
        prev = pair_pens.get(dp.pair_id, -jnp.inf)
        pair_pens[dp.pair_id] = jnp.maximum(prev, max_pen)
        raws.append(raw)
        gates.append(gate)
    if pair_pens:
        max_pen_all = jnp.max(jnp.stack([pair_pens[pid] for pid in sorted(pair_pens)]))
    else:
        max_pen_all = jnp.asarray(-jnp.inf, dtype=quat.dtype)
    return RawContactSearch(raws=tuple(raws), gates=tuple(gates), max_pen_all=max_pen_all)


def finish_contacts(raw: RawContactSearch, cfg: SimConfig) -> ContactCache:
    """Filter each pair's raw search into its PairCache (run on the single
    ladder rung that was accepted, not on all D trials)."""
    caches = tuple(cache_from_raw(r, cfg) for r in raw.raws)
    return ContactCache(
        caches=caches, gates=raw.gates, max_pen_all=raw.max_pen_all
    )


def search_contacts(
    bodies: Sequence[BodyDef],
    quat,
    pos,
    directed_pairs: Sequence[DirectedPair],
    cfg: SimConfig,
) -> ContactCache:
    """Gradient-free search for all pairs: raw search + per-pair filtering
    (see search_contacts_raw / finish_contacts)."""
    return finish_contacts(
        search_contacts_raw(bodies, quat, pos, directed_pairs, cfg), cfg
    )


def find_contacts(
    bodies: Sequence[BodyDef],
    quat,
    pos,
    directed_pairs: Sequence[DirectedPair],
    n_unordered: int,
    cfg: SimConfig,
    cache: ContactCache | None = None,
) -> Contacts:
    """All pairs -> global compacted contact buffer (K_total slots).

    With `cache` (from search_contacts at the SAME pose), the gradient-free
    search is skipped and only the differentiable recompute runs — this is
    how the step reuses the bisection probe's work."""
    dtype = quat.dtype
    if cache is None:
        cache = search_contacts(bodies, quat, pos, directed_pairs, cfg)
    per_pair = []
    for dp, pc, gate in zip(directed_pairs, cache.caches, cache.gates):
        bd1, bd2 = bodies[dp.b1], bodies[dp.b2]
        n, p1c, p2c, pens, valid, _ = find_contacts_pair(
            bd1, quat[dp.b1], pos[dp.b1], bd2, quat[dp.b2], pos[dp.b2], cfg, cache=pc
        )
        valid = valid & gate
        k = valid.shape[0]
        per_pair.append(
            dict(
                normal=n, p1=p1c, p2=p2c, pen=pens, valid=valid,
                i1=jnp.full((k,), dp.b1, dtype=jnp.int32),
                i2=jnp.full((k,), dp.b2, dtype=jnp.int32),
                pair_id=jnp.full((k,), dp.pair_id, dtype=jnp.int32),
            )
        )

    if not per_pair:
        kt = cfg.max_contacts_total
        zero3 = jnp.zeros((kt, 3), dtype=dtype)
        return Contacts(
            normal=zero3, p1=zero3, p2=zero3,
            pen=jnp.full((kt,), -1.0, dtype=dtype),
            valid=jnp.zeros((kt,), dtype=bool),
            i1=jnp.zeros((kt,), dtype=jnp.int32),
            i2=jnp.zeros((kt,), dtype=jnp.int32),
            pair_id=jnp.zeros((kt,), dtype=jnp.int32),
            max_pen_all=jnp.asarray(-jnp.inf, dtype=dtype),
            pair_active=jnp.zeros((max(n_unordered, 1),), dtype=bool),
        )

    cat = {key: jnp.concatenate([p[key] for p in per_pair]) for key in per_pair[0]}
    s = cat["valid"].shape[0]
    kt = cfg.max_contacts_total

    # stable compaction: valid slots first
    keys = jnp.where(cat["valid"], jnp.arange(s), s + jnp.arange(s))
    order = jnp.argsort(keys)[:kt]
    take = lambda a: a[order]

    valid = take(cat["valid"])
    pair_id = take(cat["pair_id"])
    max_pen_all = cache.max_pen_all
    pair_active = jnp.zeros((max(n_unordered, 1),), dtype=bool).at[pair_id].max(valid)

    return Contacts(
        normal=take(cat["normal"]),
        p1=take(cat["p1"]),
        p2=take(cat["p2"]),
        pen=take(cat["pen"]),
        valid=valid,
        i1=take(cat["i1"]),
        i2=take(cat["i2"]),
        pair_id=pair_id,
        max_pen_all=max_pen_all,
        pair_active=pair_active,
    )
