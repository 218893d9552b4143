"""Analytic surface meshes (the reference's `custom_mesh` body options).

The reference optionally replaces marching-cubes meshes with analytic ones
(`custom_mesh=True`: box grid bodies.py:799-854, cylinder :914-949, icosphere
:973-1009, bowl lat-long shell :1028-1060). Here the default mesher is
template projection (ops/surface.py); these analytic constructors cover the
same option — topology is built host-side once (numpy indices), vertex
positions are differentiable functions of the shape parameters.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..config import default_dtype
from ..utils.meshes import icosphere


def box_mesh(dims, n: int = 4):
    """Axis-aligned box with an n×n grid per face (reference
    _custom_create_mesh, bodies.py:799-854). Verts differentiable in dims."""
    dtype = default_dtype()
    dims = jnp.asarray(dims, dtype=dtype)
    lin = np.linspace(-0.5, 0.5, n + 1)
    u, v = np.meshgrid(lin, lin, indexing="ij")
    u = u.reshape(-1)
    v = v.reshape(-1)
    half = np.full_like(u, 0.5)
    faces_param = [
        np.stack([half, u, v], 1), np.stack([-half, v, u], 1),
        np.stack([u, half, -v], 1), np.stack([v, -half, -u], 1),
        np.stack([u, v, half], 1), np.stack([v, u, -half], 1),
    ]
    idx = np.arange((n + 1) * (n + 1)).reshape(n + 1, n + 1)
    a = idx[:-1, :-1].reshape(-1)
    b = idx[1:, :-1].reshape(-1)
    c = idx[:-1, 1:].reshape(-1)
    d = idx[1:, 1:].reshape(-1)
    tris = np.concatenate([np.stack([a, b, d], 1), np.stack([a, d, c], 1)])
    verts_n, faces = [], []
    off = 0
    for pts in faces_param:
        verts_n.append(pts)
        faces.append(tris + off)
        off += pts.shape[0]
    verts_n = jnp.asarray(np.concatenate(verts_n), dtype=dtype)
    faces = np.concatenate(faces).astype(np.int32)
    return verts_n * dims, faces


def sphere_mesh(rad, subdivisions: int = 4):
    """Icosphere scaled by rad (reference bodies.py:973-1009)."""
    tv, tf = icosphere(subdivisions)
    return jnp.asarray(tv, dtype=default_dtype()) * rad, tf.astype(np.int32)


def cylinder_mesh(rad, height, numsegs: int = 32, nh: int = 4):
    """Capped cylinder along z (reference bodies.py:914-949)."""
    dtype = default_dtype()
    rad = jnp.asarray(rad, dtype=dtype)
    height = jnp.asarray(height, dtype=dtype)
    thetas = np.linspace(0, 2 * np.pi, numsegs, endpoint=False)
    hs = np.linspace(-0.5, 0.5, nh + 1)
    tg, hg = np.meshgrid(thetas, hs, indexing="ij")  # (S, H+1)
    cx = jnp.asarray(np.cos(tg).reshape(-1), dtype=dtype)
    sx = jnp.asarray(np.sin(tg).reshape(-1), dtype=dtype)
    hz = jnp.asarray(hg.reshape(-1), dtype=dtype)
    side = jnp.stack([rad * cx, rad * sx, height * hz], axis=-1)
    top = jnp.stack([jnp.zeros((), dtype) * rad, jnp.zeros((), dtype), height * 0.5])
    bot = jnp.stack([jnp.zeros((), dtype) * rad, jnp.zeros((), dtype), -height * 0.5])
    verts = jnp.concatenate([side, top[None], bot[None]])

    idx = np.arange(numsegs * (nh + 1)).reshape(numsegs, nh + 1)
    idx_w = np.concatenate([idx, idx[:1]], axis=0)  # wrap
    a = idx_w[:-1, :-1].reshape(-1)
    b = idx_w[1:, :-1].reshape(-1)
    c = idx_w[:-1, 1:].reshape(-1)
    d = idx_w[1:, 1:].reshape(-1)
    faces = np.concatenate([np.stack([a, b, d], 1), np.stack([a, d, c], 1)])
    ti = numsegs * (nh + 1)
    bi = ti + 1
    top_f = np.stack([np.full(numsegs, ti), idx_w[:-1, -1], idx_w[1:, -1]], 1)
    bot_f = np.stack([np.full(numsegs, bi), idx_w[1:, 0], idx_w[:-1, 0]], 1)
    faces = np.concatenate([faces, top_f, bot_f]).astype(np.int32)
    return verts, faces


def bowl_mesh(r, d, numsegs: int = 32, nlat: int = 8):
    """Hemispherical shell opening +z (reference bodies.py:1028-1060
    conventions: shell mid-radius r, half-thickness d, center shifted +r/2
    like bowl_sdf). Watertight: outer surface, inner surface, rim annulus.
    Verts differentiable in (r, d)."""
    dtype = default_dtype()
    r = jnp.asarray(r, dtype=dtype)
    d = jnp.asarray(d, dtype=dtype)
    thetas = np.linspace(0.0, -np.pi / 2, nlat + 1)  # rim -> bottom pole
    phis = np.linspace(0, 2 * np.pi, numsegs, endpoint=False)
    tg, pg = np.meshgrid(thetas[:-1], phis, indexing="ij")  # exclude pole ring
    ct = jnp.asarray(np.cos(tg).reshape(-1), dtype=dtype)
    st = jnp.asarray(np.sin(tg).reshape(-1), dtype=dtype)
    cp = jnp.asarray(np.cos(pg).reshape(-1), dtype=dtype)
    sp = jnp.asarray(np.sin(pg).reshape(-1), dtype=dtype)

    def shell(rad):
        return jnp.stack([rad * ct * cp, rad * ct * sp, rad * st], axis=-1)

    outer = shell(r + d)
    inner = shell(r - d)
    pole_o = jnp.stack([r * 0, r * 0, -(r + d)])
    pole_i = jnp.stack([r * 0, r * 0, -(r - d)])
    verts = jnp.concatenate([outer, inner, pole_o[None], pole_i[None]])
    # shift like bowl_sdf (+r/2 along z)
    verts = verts + jnp.stack([r * 0, r * 0, r / 2.0])

    nring = nlat  # rings per shell (excluding pole)
    grid = np.arange(nring * numsegs).reshape(nring, numsegs)
    grid_w = np.concatenate([grid, grid[:, :1]], axis=1)
    a = grid_w[:-1, :-1].reshape(-1)
    b = grid_w[1:, :-1].reshape(-1)
    c = grid_w[:-1, 1:].reshape(-1)
    dd = grid_w[1:, 1:].reshape(-1)
    quad_o = np.concatenate([np.stack([a, b, dd], 1), np.stack([a, dd, c], 1)])
    off_i = nring * numsegs
    quad_i = np.concatenate(
        [np.stack([a, dd, b], 1), np.stack([a, c, dd], 1)]
    ) + off_i
    po = 2 * nring * numsegs
    pi = po + 1
    last_o = grid_w[-1]
    last_i = grid_w[-1] + off_i
    cap_o = np.stack([np.full(numsegs, po), last_o[1:], last_o[:-1]], 1)
    cap_i = np.stack([np.full(numsegs, pi), last_i[:-1], last_i[1:]], 1)
    rim_o = grid_w[0]
    rim_i = grid_w[0] + off_i
    rim = np.concatenate(
        [
            np.stack([rim_o[:-1], rim_o[1:], rim_i[1:]], 1),
            np.stack([rim_o[:-1], rim_i[1:], rim_i[:-1]], 1),
        ]
    )
    faces = np.concatenate([quad_o, quad_i, cap_o, cap_i, rim]).astype(np.int32)
    return verts, faces
