"""Randomized parity of ops/filtering.filter_contacts against a
scipy-Qhull-based transcription of the reference filter
(`/root/reference/sdf_physics/physics3d/contacts.py:96-155`): greedy
normal-angle clustering until every contact is assigned, then per-cluster
convex-hull vertex selection (with the reference's lower-dimension fallback).

The repo filter replaces Qhull with support points along 8 fixed tangential
directions; for contact patches whose hull vertices have normal cones >= 45
degrees (rectangles, well-conditioned triangles, segments, points — the
manifolds SDF contact generation produces) the two must select the SAME
support set. Also checks the bug VERDICT weak #6 flagged: manifolds with 3+
distinct normal clusters must not silently drop clusters.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from diffsdfsim_tpu.ops.filtering import filter_contacts

scipy_spatial = pytest.importorskip("scipy.spatial")
from scipy.spatial import ConvexHull, QhullError  # noqa: E402


def reference_filter(normals, p1, eps=1e-3):
    """Numpy transcription of the reference _filter_contacts."""
    contact_inds = np.arange(normals.shape[0])
    if normals.shape[0] <= 1:
        return set(contact_inds.tolist())
    valid = np.linalg.norm(normals, axis=1) > 1e-12
    normals, p1, contact_inds = normals[valid], p1[valid], contact_inds[valid]

    clusters = []
    while normals.shape[0] > 0:
        n = normals[0]
        ang = np.arccos(np.minimum(normals @ n, 1.0))
        m = ang < 1e-2
        clusters.append((p1[m], contact_inds[m]))
        normals, p1, contact_inds = normals[~m], p1[~m], contact_inds[~m]

    out = []
    for ps, inds in clusters:
        ps = ps.copy()
        while True:
            if ps.shape[1] > 1:
                try:
                    hull = ConvexHull(ps)
                    sel = hull.vertices
                    break
                except QhullError:
                    var = ps.var(axis=0)
                    keep = np.ones(ps.shape[1], dtype=bool)
                    keep[var.argmin()] = False
                    ps = ps[:, keep]
            else:
                lo, hi = ps.min(0), ps.max(0)
                if hi - lo > eps:
                    sel = np.array([ps.argmin(), ps.argmax()])
                else:
                    sel = np.array([ps.argmin()])
                break
        out.extend(inds[sel].tolist())
    return set(out)


def _rot(rng):
    """Random rotation matrix."""
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def _cluster_points(rng, kind, n_pts):
    """Planar point set in the z=0 plane (local frame), wide normal cones."""
    if kind == "rect":
        w, h = rng.uniform(0.2, 2.0, size=2)
        corners = np.array([[w, h], [-w, h], [-w, -h], [w, -h]]) * 0.5
        th = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(th), np.sin(th)
        corners = corners @ np.array([[c, -s], [s, c]]).T
        # interior points never become hull vertices / support picks
        inner = corners.mean(0) + rng.uniform(-0.05, 0.05, size=(max(n_pts - 4, 0), 2))
        pts2 = np.concatenate([corners, inner])
    elif kind == "tri":
        while True:
            pts2 = rng.uniform(-1, 1, size=(3, 2))
            # all interior angles < 120 deg -> vertex normal cones > 60 deg
            ok = True
            for i in range(3):
                a = pts2[(i + 1) % 3] - pts2[i]
                b = pts2[(i + 2) % 3] - pts2[i]
                cosang = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
                ok &= cosang > -0.5
            e1, e2 = pts2[1] - pts2[0], pts2[2] - pts2[0]
            if ok and np.abs(e1[0] * e2[1] - e1[1] * e2[0]) > 0.1:
                break
    elif kind == "segment":
        d = rng.standard_normal(2)
        d /= np.linalg.norm(d)
        ts = np.concatenate([[-1.0, 1.0], rng.uniform(-0.9, 0.9, size=max(n_pts - 2, 0))])
        pts2 = ts[:, None] * d[None, :]
    else:  # point
        pts2 = np.tile(rng.uniform(-1, 1, size=(1, 2)), (1, 1))
    return np.concatenate([pts2, np.zeros((pts2.shape[0], 1))], axis=1)


def _make_manifold(rng, n_clusters, kinds):
    """Contacts across n_clusters distinct normal directions (>60 deg apart)."""
    normals, points, cluster_of = [], [], []
    base_dirs = [np.array([0.0, 1, 0]), np.array([1.0, 0, 0]),
                 np.array([0.0, 0, 1]), np.array([-1.0, 0, 0])]
    for ci in range(n_clusters):
        kind = kinds[ci % len(kinds)]
        local = _cluster_points(rng, kind, n_pts=rng.integers(4, 7))
        n_dir = base_dirs[ci] + rng.uniform(-0.05, 0.05, size=3)
        n_dir /= np.linalg.norm(n_dir)
        # rotate the z=0 plane onto the plane orthogonal to n_dir
        z = np.array([0.0, 0, 1])
        v = np.cross(z, n_dir)
        sv, cv = np.linalg.norm(v), z @ n_dir
        if sv < 1e-12:
            rot = np.eye(3) * np.sign(cv)
        else:
            vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
            rot = np.eye(3) + vx + vx @ vx * ((1 - cv) / sv**2)
        pts = local @ rot.T + n_dir * rng.uniform(-2, 2)
        # tight per-contact normal jitter (well inside the 1e-2 rad threshold)
        for p in pts:
            nj = n_dir + rng.uniform(-1e-4, 1e-4, size=3)
            normals.append(nj / np.linalg.norm(nj))
            points.append(p)
            cluster_of.append(ci)
    return np.array(normals), np.array(points), np.array(cluster_of)


def _run_repo_filter(normals, p1, n_clusters=4, k_out=32):
    idx, val = filter_contacts(
        jnp.asarray(normals), jnp.asarray(p1),
        jnp.ones((normals.shape[0],), dtype=bool),
        k_out=k_out, n_clusters=n_clusters,
    )
    idx, val = np.asarray(idx), np.asarray(val)
    return set(idx[val].tolist())


@pytest.mark.parametrize("seed", range(25))
def test_parity_random_manifolds(seed):
    rng = np.random.default_rng(seed)
    n_clusters = int(rng.integers(1, 5))
    normals, p1, _ = _make_manifold(rng, n_clusters, kinds=["rect", "tri", "segment", "point"])
    got = _run_repo_filter(normals, p1)
    want = reference_filter(normals, p1)
    assert got == want, f"repo {sorted(got)} vs reference {sorted(want)}"


@pytest.mark.parametrize("seed", range(25, 50))
def test_parity_rect_manifolds(seed):
    """Pure box-style patches — the common physical case."""
    rng = np.random.default_rng(seed)
    n_clusters = int(rng.integers(1, 5))
    normals, p1, _ = _make_manifold(rng, n_clusters, kinds=["rect"])
    got = _run_repo_filter(normals, p1)
    want = reference_filter(normals, p1)
    assert got == want


@pytest.mark.parametrize("seed", range(50, 75))
def test_three_plus_clusters_not_dropped(seed):
    """VERDICT weak #6: with >= 3 distinct normal directions every cluster
    must contribute at least one contact (the old n_clusters=2 cap dropped
    whole manifolds)."""
    rng = np.random.default_rng(seed)
    n_clusters = int(rng.integers(3, 5))
    normals, p1, cluster_of = _make_manifold(rng, n_clusters, kinds=["rect", "tri"])
    got = _run_repo_filter(normals, p1)
    covered = {int(cluster_of[i]) for i in got}
    assert covered == set(range(n_clusters))


def test_duplicate_points_single_kept():
    """All contacts coincident: one representative survives."""
    normals = np.tile(np.array([[0.0, 1, 0]]), (5, 1))
    p1 = np.tile(np.array([[0.3, 0.5, -0.2]]), (5, 1))
    got = _run_repo_filter(normals, p1)
    assert len(got) == 1
