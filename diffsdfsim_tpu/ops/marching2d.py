"""2D grid-SDF ops: bilinear interpolation + marching squares.

TPU-native re-design of the reference's legacy 2D SDF layer
(`sdf_physics/physics/bodies.py:91-283` ``SDFGrid``): the reference builds a
dynamically-sized vertex/edge list with cumsum offset bookkeeping on a
16-case edge table; here every cell emits a FIXED two-segment buffer with a
validity mask (no scatter, no dynamic shapes — the masked-buffer idiom the
whole framework uses), and interpolation is a gather-based bilinear stencil
that vmaps/shards cleanly.

Grid convention matches the reference: node (i, j) sits at
(linspace(-0.5, 0.5, H)[i], linspace(-0.5, 0.5, W)[j]) in the body's
normalized frame; values are normalized signed distances.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_interp(grid, pts):
    """Bilinear interpolation of a (H, W) grid at pts (..., 2) in the
    [-0.5, 0.5]^2 normalized frame (reference SDFGrid.query grid lookup,
    bodies.py:203-247). Out-of-range points clamp to the border value plus
    their (component-wise) distance outside — keeps the field increasing
    away from the body so far-away queries never report contact."""
    H, W = grid.shape
    dtype = grid.dtype
    x = (pts[..., 0] + 0.5) * (H - 1)
    y = (pts[..., 1] + 0.5) * (W - 1)
    out = (
        jnp.maximum(-x, 0.0) + jnp.maximum(x - (H - 1), 0.0)
        + jnp.maximum(-y, 0.0) + jnp.maximum(y - (W - 1), 0.0)
    ) / jnp.asarray(max(H - 1, W - 1), dtype)
    x = jnp.clip(x, 0.0, H - 1.0)
    y = jnp.clip(y, 0.0, W - 1.0)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, H - 2)
    j0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, W - 2)
    fx = x - i0
    fy = y - j0
    g00 = grid[i0, j0]
    g01 = grid[i0, j0 + 1]
    g10 = grid[i0 + 1, j0]
    g11 = grid[i0 + 1, j0 + 1]
    v = (
        g00 * (1 - fx) * (1 - fy)
        + g01 * (1 - fx) * fy
        + g10 * fx * (1 - fy)
        + g11 * fx * fy
    )
    return v + out


def marching_squares(grid, iso=0.0):
    """Extract the iso-contour of a (H, W) grid as masked fixed-size
    segments.

    Returns (segs, valid): segs ((H-1)*(W-1)*2, 2, 2) segment endpoints in
    the [-0.5, 0.5]^2 frame, valid (...,) bool. Every cell owns two segment
    slots; the 16-case table (reference marching_squares edgeTable,
    bodies.py:117-196) fills 0, 1, or 2 of them. Saddle cases (5, 10) emit
    both segments with the reference's same (asymptotic-free) pairing."""
    H, W = grid.shape
    dtype = grid.dtype
    g = grid - iso

    xs = jnp.linspace(-0.5, 0.5, H, dtype=dtype)
    ys = jnp.linspace(-0.5, 0.5, W, dtype=dtype)
    px, py = jnp.meshgrid(xs, ys, indexing="ij")
    pts = jnp.stack([px, py], axis=-1)  # (H, W, 2)

    # cell corners in the reference's order: tl, tr, br, bl
    # (tl = [i, j], tr = [i, j+1], br = [i+1, j+1], bl = [i+1, j])
    c = [g[:-1, :-1], g[:-1, 1:], g[1:, 1:], g[1:, :-1]]
    p = [pts[:-1, :-1], pts[:-1, 1:], pts[1:, 1:], pts[1:, :-1]]
    c = [v.reshape(-1) for v in c]
    p = [v.reshape(-1, 2) for v in p]
    n_cells = c[0].shape[0]

    inner = [(v < 0) for v in c]
    cls = (
        inner[0].astype(jnp.int32) * 8
        + inner[1].astype(jnp.int32) * 4
        + inner[2].astype(jnp.int32) * 2
        + inner[3].astype(jnp.int32) * 1
    )

    def interp(i, j):
        """Zero crossing on the edge corner_i -> corner_j."""
        t = c[i] / jnp.where(jnp.abs(c[i] - c[j]) < 1e-30, 1e-30, c[i] - c[j])
        t = jnp.clip(t, 0.0, 1.0)
        return p[i] + t[:, None] * (p[j] - p[i])

    # edge k joins corner k and corner (k+1) % 4
    edge_pts = jnp.stack([interp(k, (k + 1) % 4) for k in range(4)])  # (4, N, 2)

    # 16-case table: per class, up to two segments as (edge_a, edge_b) pairs
    # (reference edgeTable, bodies.py:118-133); -1 = unused slot
    table = np.array(
        [
            [-1, -1, -1, -1], [2, 3, -1, -1], [1, 2, -1, -1], [1, 3, -1, -1],
            [0, 1, -1, -1], [0, 3, 1, 2], [0, 2, -1, -1], [0, 3, -1, -1],
            [0, 3, -1, -1], [0, 2, -1, -1], [0, 1, 2, 3], [0, 1, -1, -1],
            [1, 3, -1, -1], [1, 2, -1, -1], [2, 3, -1, -1], [-1, -1, -1, -1],
        ],
        dtype=np.int32,
    )
    tab = jnp.asarray(table)[cls]  # (N, 4)

    segs = []
    valids = []
    cell_idx = jnp.arange(n_cells)
    for s in range(2):
        ea = tab[:, 2 * s]
        eb = tab[:, 2 * s + 1]
        val = ea >= 0
        a = edge_pts[jnp.maximum(ea, 0), cell_idx]  # (N, 2)
        b = edge_pts[jnp.maximum(eb, 0), cell_idx]
        segs.append(jnp.stack([a, b], axis=1))  # (N, 2, 2)
        valids.append(val)

    segs = jnp.concatenate(segs, axis=0)
    valid = jnp.concatenate(valids, axis=0)
    zero = jnp.zeros_like(segs)
    return jnp.where(valid[:, None, None], segs, zero), valid


def grid_from_sdf_fn(fn, res, dtype=None):
    """Sample a normalized-frame 2D SDF callable on the reference's
    res x res node lattice."""
    xs = jnp.linspace(-0.5, 0.5, res, dtype=dtype)
    px, py = jnp.meshgrid(xs, xs, indexing="ij")
    return fn(jnp.stack([px, py], axis=-1))
