"""Signed distance functions: analytic primitives, voxel grids, and wrappers.

TPU-native re-derivation of the reference SDF library
(`sdf_physics/physics3d/bodies.py:38-257`). All functions take points of shape
(..., 3) in the *normalized* local frame (body local coordinates divided by
the body `scale`, so the shape lives inside [-1, 1]^3) and shape parameters
already divided by `scale` — the same convention the reference uses
(`SDF3D.query_sdfs`, bodies.py:721-760). Values are normalized distances;
callers multiply by `scale` to get metric distances.

Each primitive has a hand-derived gradient (`*_sdf_grad`) matching the
reference's "failsafe" diagonal gradients at edges/corners
(bodies.py:51-72 box, :103-125 cylinder), plus autodiff is valid everywhere
the SDF is smooth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.spherical import normalize



def _safe_norm(v, axis=-1):
    """sqrt(max(sum v², tiny)) — NaN-free gradient at v = 0 (the surface
    kink of max(q, 0) norms, where shape-parameter gradients are taken)."""
    n2 = jnp.sum(v * v, axis=axis)
    return jnp.sqrt(jnp.maximum(n2, 1e-24))

def _sign_nonzero(x):
    """sign(x) with sign(0) = 1, matching reference bodies.py:56-57."""
    return jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)


# --------------------------------------------------------------------------
# analytic primitives (reference bodies.py:38-201)
# --------------------------------------------------------------------------


def box_sdf(pts, dims):
    """Axis-aligned box of side lengths `dims` centered at origin."""
    q = jnp.abs(pts) - dims / 2.0
    max_dist = jnp.max(q, axis=-1)
    m = jnp.maximum(q, 0.0)
    return _safe_norm(m) + jnp.minimum(max_dist, 0.0)


def box_sdf_grad(pts, dims):
    """Box gradient with diagonal "failsafe" at ties (reference :51-72)."""
    q = jnp.abs(pts) - dims / 2.0
    signs = _sign_nonzero(pts)
    max_dist = jnp.max(q, axis=-1, keepdims=True)
    max_dirs = (q == max_dist).astype(pts.dtype)
    m = jnp.maximum(q, 0.0)
    grads_ov = (normalize(m) + (max_dist <= 0).astype(pts.dtype) * max_dirs) * signs
    return normalize(grads_ov)


def sphere_sdf(pts, rad):
    return _safe_norm(pts) - rad


def sphere_sdf_grad(pts, rad):
    return normalize(pts)


def cylinder_sdf(pts, rad, height):
    """Capped cylinder along z (reference :87-100)."""
    r_xy = _safe_norm(pts[..., :2])
    ps = jnp.stack([r_xy, pts[..., 2]], axis=-1)
    lim = jnp.stack([jnp.broadcast_to(rad, r_xy.shape), jnp.broadcast_to(height / 2.0, r_xy.shape)], axis=-1)
    q = jnp.abs(ps) - lim
    max_dist = jnp.max(q, axis=-1)
    m = jnp.maximum(q, 0.0)
    return _safe_norm(m) + jnp.minimum(max_dist, 0.0)


def cylinder_sdf_grad(pts, rad, height):
    """Cylinder gradient with failsafe ties (reference :103-125)."""
    r_xy = _safe_norm(pts[..., :2])
    ps = jnp.stack([r_xy, pts[..., 2]], axis=-1)
    lim = jnp.stack([jnp.broadcast_to(rad, r_xy.shape), jnp.broadcast_to(height / 2.0, r_xy.shape)], axis=-1)
    q = jnp.abs(ps) - lim
    signs = _sign_nonzero(pts[..., 2])
    max_dist = jnp.max(q, axis=-1, keepdims=True)
    max_dirs = (q == max_dist).astype(pts.dtype)
    m = jnp.maximum(q, 0.0)
    g2 = normalize(m) + (max_dist <= 0).astype(pts.dtype) * max_dirs
    grads = jnp.concatenate(
        [g2[..., 0:1] * normalize(pts[..., :2]), (g2[..., 1] * signs)[..., None]],
        axis=-1,
    )
    return normalize(grads)


def bowl_sdf(pts, r, d):
    """Hemispherical shell (open top), thickness 2d, radius r (reference :128-142).

    The bowl opens along +z; its center is shifted by r/2 along z.
    """
    z = pts[..., 2] - r / 2.0
    r_xy = _safe_norm(pts[..., :2])
    ps = jnp.stack([r_xy, z], axis=-1)
    ps_norm = _safe_norm(ps)
    p0 = jnp.where(z < 0, ps_norm, r_xy)
    p0 = jnp.abs(p0 - r) - d
    q = jnp.stack([p0, z], axis=-1)
    return _safe_norm(jnp.maximum(q, 0.0)) + jnp.minimum(jnp.max(q, axis=-1), 0.0)


def bowl_sdf_grad(pts, r, d):
    """Bowl gradient (reference :145-163)."""
    z = pts[..., 2] - r / 2.0
    pts_s = jnp.concatenate([pts[..., :2], z[..., None]], axis=-1)
    r_xy = _safe_norm(pts[..., :2])
    ps = jnp.stack([r_xy, z], axis=-1)
    ps_norm = _safe_norm(ps)
    p0 = jnp.where(z < 0, ps_norm, r_xy)
    p0 = jnp.abs(p0 - r) - d

    grads = pts_s * _sign_nonzero(ps_norm - r)[..., None]
    inside_rim = (z >= 0) & (p0 < 0)
    grads = grads.at[..., :2].set(jnp.where(inside_rim[..., None], 0.0, grads[..., :2]))
    grads = grads.at[..., 2].set(jnp.where(z >= 0, jnp.abs(grads[..., 2]), grads[..., 2]))
    return normalize(grads)


def rounded_sdf(base_func):
    """Corner-rounding wrapper: sdf(p) - r (reference :166-172)."""

    def round_corners(pts, r, *base_params):
        return base_func(pts, *base_params) - r

    return round_corners


def rounded_sdf_grad(base_grad_func):
    def round_grad(pts, r, *base_params):
        return base_grad_func(pts, *base_params)

    return round_grad


def brick_sdf(pts, dims, r):
    """Box with rounded in-plane (xy) corners (reference :184-200)."""
    half = dims / 2.0
    half = half.at[..., :2].add(-r)
    q = jnp.abs(pts) - half
    max01 = jnp.max(q[..., :2], axis=-1)
    m01 = jnp.maximum(q[..., :2], 0.0)
    sdf01 = _safe_norm(m01) + jnp.minimum(max01, 0.0) - r
    q2 = jnp.stack([sdf01, q[..., 2]], axis=-1)
    maxd = jnp.max(q2, axis=-1)
    m = jnp.maximum(q2, 0.0)
    return _safe_norm(m) + jnp.minimum(maxd, 0.0)


# --------------------------------------------------------------------------
# voxel-grid SDF (replaces ev_sdf_utils.grid_interp CUDA kernel;
# reference bodies.py:203-257)
# --------------------------------------------------------------------------


def grid_interp(grid, inds):
    """Trilinear interpolation of `grid` ((...C,) X,Y,Z) at fractional voxel
    indices `inds` (N,3). Pure-JAX gather formulation — XLA lowers this to
    the TPU's native gather, measured faster than hand-rolled alternatives
    (an experimental Pallas variant lives in ops/pallas_kernels.py).
    """
    shape = jnp.asarray(grid.shape[-3:], dtype=inds.dtype)
    i0 = jnp.clip(jnp.floor(inds), 0.0, shape - 2.0)
    frac = inds - i0
    i0 = i0.astype(jnp.int32)
    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]

    def g(dx, dy, dz):
        return grid[..., x0 + dx, y0 + dy, z0 + dz]

    c00 = g(0, 0, 0) * (1 - fx) + g(1, 0, 0) * fx
    c10 = g(0, 1, 0) * (1 - fx) + g(1, 1, 0) * fx
    c01 = g(0, 0, 1) * (1 - fx) + g(1, 0, 1) * fx
    c11 = g(0, 1, 1) * (1 - fx) + g(1, 1, 1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def _grid_inds(pts, res, dtype):
    shape = jnp.asarray(res, dtype=dtype)
    inds = (pts + 1.0) * 0.5 * (shape - 1.0)
    valid = jnp.all((inds <= shape - 1.0) & (inds >= 0.0), axis=-1)
    return inds, valid


def grid_sdf_raw(pts, grid):
    """Trilinear SDF sample; out-of-bounds points get sdf=1 (reference :203-211)."""
    inds, valid = _grid_inds(pts, grid.shape, pts.dtype)
    vals = grid_interp(grid, jnp.where(valid[..., None], inds, 0.0))
    return jnp.where(valid, vals, 1.0)


def grid_grad_volume(grid):
    """Central-difference gradient volume (3, X, Y, Z) (reference :224-234),
    with ONE-SIDED differences on the boundary slabs (np.gradient-style).
    Zeroed boundary slabs left template projection (ops/surface.py) and the
    contact polish with grad=0 for points exactly on the grid-domain faces —
    axis-direction template verts then never projected onto the surface and
    the body rested on phantom vertices 50% outside its true surface."""
    gx = jnp.concatenate(
        [grid[1:2] - grid[:1], (grid[2:] - grid[:-2]) / 2.0, grid[-1:] - grid[-2:-1]],
        axis=0,
    )
    gy = jnp.concatenate(
        [grid[:, 1:2] - grid[:, :1], (grid[:, 2:] - grid[:, :-2]) / 2.0,
         grid[:, -1:] - grid[:, -2:-1]],
        axis=1,
    )
    gz = jnp.concatenate(
        [grid[:, :, 1:2] - grid[:, :, :1], (grid[:, :, 2:] - grid[:, :, :-2]) / 2.0,
         grid[:, :, -1:] - grid[:, :, -2:-1]],
        axis=2,
    )
    return jnp.stack([gx, gy, gz], axis=0)


def grid_sdf_grad(pts, grid):
    """Normalized trilinear sample of the central-difference gradient volume
    (reference :214-243). OOB points get zero gradient."""
    grads_vol = grid_grad_volume(grid)
    inds, valid = _grid_inds(pts, grid.shape, pts.dtype)
    safe = jnp.where(valid[..., None], inds, 0.0)
    g = jnp.stack([grid_interp(grads_vol[i], safe) for i in range(3)], axis=-1)
    g = normalize(g)
    return jnp.where(valid[..., None], g, 0.0)


@jax.custom_vjp
def grid_sdf(pts, grid):
    """Differentiable grid SDF: value by trilinear interp; the VJP w.r.t. pts
    is the (normalized) sampled gradient volume — the grid itself is treated
    as non-differentiable, exactly like the reference `DiffGridSDF`
    (bodies.py:246-257)."""
    return grid_sdf_raw(pts, grid)


def _grid_sdf_fwd(pts, grid):
    return grid_sdf_raw(pts, grid), (pts, grid)


def _grid_sdf_bwd(res, d_sdf):
    pts, grid = res
    grads = grid_sdf_grad(pts, grid)
    return grads * d_sdf[..., None], jnp.zeros_like(grid)


grid_sdf.defvjp(_grid_sdf_fwd, _grid_sdf_bwd)
