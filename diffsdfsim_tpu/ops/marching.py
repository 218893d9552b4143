"""Fixed-shape isosurface extraction: marching tetrahedra + MeshSDF VJP.

Replaces CUDA marching cubes (reference `ev_sdf_utils.marching_cubes`, used
at `sdf_physics/physics3d/bodies.py:664`) for voxel-grid / learned shapes
whose topology the template-projection mesher (ops/surface.py) cannot
represent. TPU-first design decisions:

- **marching tetrahedra, not cubes**: each cell splits into 6 tetrahedra;
  a tet has 16 sign configurations yielding 0/1/2 triangles, enumerable in
  code — no 256-entry case tables to transcribe, fully vectorized.
- **static shapes**: the output is a padded triangle soup
  (3*max_tris vertices, validity mask); max_tris is a static bound
  (callers size it from the resolution; a closed surface in an N³ grid cuts
  O(N²) cells).
- **differentiability**: vertex positions are differentiable w.r.t. the
  sampled SDF values through the edge-interpolation weights — and the
  MeshSDF trick (reference bodies.py:674-702) is available on top via
  ops/surface.surface_mesh-style correction: v - sdf(v; z)·n with detached
  v, n.

The extraction is a triangle soup (vertices not welded); inertia integrals
(ops/inertia.py) and FW contact candidates are soup-agnostic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 6-tetrahedra decomposition of the unit cube (indices into the 8 cube
# corners, each tet positively oriented)
_CUBE_CORNERS = np.array(
    [
        [0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
        [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1],
    ],
    dtype=np.int32,
)
_TETS = np.array(
    [
        [0, 5, 1, 3],
        [0, 5, 3, 7],
        [0, 7, 3, 2],
        [0, 7, 2, 6],
        [0, 6, 2, 4],
        [4, 6, 0, 2],
    ],
    dtype=np.int32,
)
# use a standard decomposition sharing the main diagonal 0-7
_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
        [0, 5, 1, 7],
    ],
    dtype=np.int32,
)

# tet edge list (pairs of local tet-vertex indices 0..3)
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int32
)


def _tet_case_tables():
    """Enumerate the 16 sign cases of a tetrahedron.

    Returns (tri_edges (16, 2, 3) int32 edge indices into _TET_EDGES with -1
    padding, n_tris (16,)). Triangle winding is chosen so normals point from
    the inside (sdf<0) towards the outside."""
    tri_edges = -np.ones((16, 2, 3), dtype=np.int32)
    n_tris = np.zeros((16,), dtype=np.int32)

    def edge_id(a, b):
        for i, (u, v) in enumerate(_TET_EDGES):
            if (u, v) == (min(a, b), max(a, b)):
                return i
        raise AssertionError

    for case in range(16):
        inside = [v for v in range(4) if case & (1 << v)]
        outside = [v for v in range(4) if not case & (1 << v)]
        if len(inside) == 0 or len(inside) == 4:
            continue
        if len(inside) == 1:
            a = inside[0]
            b, c, d = outside
            tri_edges[case, 0] = [edge_id(a, b), edge_id(a, c), edge_id(a, d)]
            n_tris[case] = 1
        elif len(inside) == 3:
            a = outside[0]
            b, c, d = inside
            tri_edges[case, 0] = [edge_id(a, b), edge_id(a, d), edge_id(a, c)]
            n_tris[case] = 1
        else:
            a, b = inside
            c, d = outside
            # quad: (a,c), (a,d), (b,d), (b,c) -> two triangles
            e0, e1, e2, e3 = edge_id(a, c), edge_id(a, d), edge_id(b, d), edge_id(b, c)
            tri_edges[case, 0] = [e0, e1, e2]
            tri_edges[case, 1] = [e0, e2, e3]
            n_tris[case] = 2
    return tri_edges, n_tris


_TRI_EDGES_TABLE, _N_TRIS_TABLE = _tet_case_tables()


def marching_tets(grid, iso=0.0, max_tris: int | None = None):
    """Extract the iso-surface of a voxel grid (X,Y,Z) in index coordinates.

    Returns (tri_verts (max_tris, 3, 3), valid (max_tris,)). Vertex positions
    are differentiable w.r.t. `grid`; triangle topology (which cells fire)
    is data-dependent but the OUTPUT SHAPE is static: triangles are compacted
    front-first by an argsort on validity."""
    X, Y, Z = grid.shape
    dtype = grid.dtype
    cx, cy, cz = X - 1, Y - 1, Z - 1
    n_cells = cx * cy * cz
    n_tet = n_cells * 6
    if max_tris is None:
        max_tris = n_tet * 2

    # cell corner coordinates
    ii, jj, kk = jnp.meshgrid(
        jnp.arange(cx), jnp.arange(cy), jnp.arange(cz), indexing="ij"
    )
    cell_origin = jnp.stack([ii, jj, kk], axis=-1).reshape(-1, 3)  # (C,3)

    corners = cell_origin[:, None, :] + jnp.asarray(_CUBE_CORNERS)  # (C,8,3)
    corner_vals = grid[corners[..., 0], corners[..., 1], corners[..., 2]] - iso  # (C,8)

    tets = jnp.asarray(_TETS)  # (6,4)
    tet_pos = corners[:, tets, :].reshape(-1, 4, 3).astype(dtype)  # (C*6,4,3)
    tet_val = corner_vals[:, tets].reshape(-1, 4)  # (C*6,4)

    inside = tet_val < 0.0
    case = (
        inside[:, 0].astype(jnp.int32)
        + 2 * inside[:, 1].astype(jnp.int32)
        + 4 * inside[:, 2].astype(jnp.int32)
        + 8 * inside[:, 3].astype(jnp.int32)
    )  # (T,)

    # edge crossing points for all 6 edges of every tet
    e = jnp.asarray(_TET_EDGES)  # (6,2)
    va = tet_val[:, e[:, 0]]  # (T,6)
    vb = tet_val[:, e[:, 1]]
    denom = va - vb
    t = va / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    pa = tet_pos[:, e[:, 0], :]
    pb = tet_pos[:, e[:, 1], :]
    cross_pts = pa + t[..., None] * (pb - pa)  # (T,6,3)

    tri_edges = jnp.asarray(_TRI_EDGES_TABLE)[case]  # (T,2,3)
    n_tris = jnp.asarray(_N_TRIS_TABLE)[case]  # (T,)

    safe_edges = jnp.maximum(tri_edges, 0)
    tri_pts = jnp.take_along_axis(
        cross_pts[:, None, :, :].repeat(2, axis=1),
        safe_edges[..., None].repeat(3, axis=-1),
        axis=2,
    )  # (T,2,3verts,3coords)

    # orient every triangle outward: the SDF is affine over a tet, so its
    # gradient is E^-T dv; flip triangles whose normal opposes it
    E = tet_pos[:, 1:, :] - tet_pos[:, :1, :]  # (T,3,3) rows = edge vectors
    dv = tet_val[:, 1:] - tet_val[:, :1]  # (T,3)
    g = jnp.linalg.solve(
        E + 1e-12 * jnp.eye(3, dtype=dtype), dv[..., None]
    )[..., 0]  # (T,3) affine gradient (rows of E are edges: E g = dv)
    nrm = jnp.cross(
        tri_pts[:, :, 1, :] - tri_pts[:, :, 0, :],
        tri_pts[:, :, 2, :] - tri_pts[:, :, 0, :],
    )  # (T,2,3)
    flip = jnp.einsum("tkc,tc->tk", nrm, g) < 0  # (T,2)
    tri_pts = jnp.where(
        flip[..., None, None], tri_pts[:, :, jnp.asarray([0, 2, 1]), :], tri_pts
    )

    tri_pts = tri_pts.reshape(-1, 3, 3)  # (T*2,3,3)
    tri_valid = (
        jnp.stack([n_tris >= 1, n_tris >= 2], axis=1).reshape(-1)
    )  # (T*2,)

    # compact valid triangles to the front (static output size)
    order = jnp.argsort(~tri_valid, stable=True)[:max_tris]
    return tri_pts[order], tri_valid[order]


def grid_to_mesh(grid, scale=1.0, iso=0.0, max_tris: int | None = None):
    """Marching tets in normalized [-1,1]³ coordinates (reference MC output
    convention, bodies.py:667: verts/(res-1)*2-1), scaled to metric units.

    Returns (verts (3*max_tris, 3), faces (max_tris, 3) static, valid)."""
    tri, valid = marching_tets(grid, iso=iso, max_tris=max_tris)
    res = jnp.asarray(grid.shape, dtype=tri.dtype)
    verts = (tri / (res - 1.0) * 2.0 - 1.0) * scale
    m = max_tris if max_tris is not None else tri.shape[0]
    faces = np.arange(3 * m, dtype=np.int32).reshape(m, 3)
    verts_flat = verts.reshape(-1, 3)
    # collapse padded triangles to a point so they contribute nothing
    verts_flat = jnp.where(
        jnp.repeat(valid, 3)[:, None], verts_flat, 0.0
    )
    return verts_flat, faces, valid
