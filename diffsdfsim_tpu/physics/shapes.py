"""Shape pytrees: tagged SDF shapes with scale conventions and meshes.

Replaces the reference SDF body subclasses (`sdf_physics/physics3d/bodies.py:
763-1060` SDFSphere/SDFBox/SDFBoxRounded/SDFBrick/SDFCylinder/SDFBowl/
SDFGrid3D) with small flax.struct pytrees. Each shape knows:

- its `scale` (local->normalized frame factor, same conventions as the
  reference: box `max(dims)*1.5/2`, sphere `rad*1.5`, cylinder
  `max(rad, h/2)*1.5`, bowl `(r+d)*4/3`)
- its normalized-frame SDF and analytic gradient
- its analytic inertia (where the reference has one)

`query_sdfs` reproduces `SDF3D.query_sdfs` (bodies.py:721-760): metric local
points in, metric sdf values + normalized local gradients out, with the
bounding-scale overlap mask (OOB => sdf = scale, grad = 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..ops import sdf as sdf_ops
from ..ops import inertia as inertia_ops
from ..utils.spherical import normalize


class ShapeBase:
    """Mixin interface; subclasses are flax.struct dataclasses (pytrees)."""

    def scale(self):
        raise NotImplementedError

    def sdf(self, pts_norm):
        """Normalized-frame SDF (pts and values in units of `scale`)."""
        raise NotImplementedError

    def sdf_grad(self, pts_norm):
        """Analytic normalized-frame gradient (unnormalized length ok)."""
        # default: autodiff (reference query_sdfs autograd path,
        # bodies.py:731-745)
        return jax.grad(lambda p: jnp.sum(self.sdf(p)))(pts_norm)

    def ang_inertia(self, mass):
        """Analytic inertia, or None -> derive from mesh (Mirtich)."""
        return None


@struct.dataclass
class SphereShape(ShapeBase):
    rad: jnp.ndarray

    def scale(self):
        return self.rad * 1.5

    def sdf(self, pts):
        return sdf_ops.sphere_sdf(pts, self.rad / self.scale())

    def sdf_grad(self, pts):
        return sdf_ops.sphere_sdf_grad(pts, self.rad / self.scale())

    def ang_inertia(self, mass):
        return inertia_ops.sphere_inertia(self.rad, mass)


@struct.dataclass
class BoxShape(ShapeBase):
    dims: jnp.ndarray  # (3,)

    def scale(self):
        return jnp.max(self.dims) * 1.5 / 2.0

    def sdf(self, pts):
        return sdf_ops.box_sdf(pts, self.dims / self.scale())

    def sdf_grad(self, pts):
        return sdf_ops.box_sdf_grad(pts, self.dims / self.scale())

    def ang_inertia(self, mass):
        return inertia_ops.box_inertia(self.dims, mass)


@struct.dataclass
class RoundedBoxShape(ShapeBase):
    dims: jnp.ndarray  # (3,) outer dims
    r: jnp.ndarray

    def scale(self):
        return jnp.max(self.dims) * 1.5 / 2.0

    def sdf(self, pts):
        s = self.scale()
        return sdf_ops.rounded_sdf(sdf_ops.box_sdf)(pts, self.r / s, (self.dims - 2 * self.r) / s)

    def sdf_grad(self, pts):
        s = self.scale()
        return sdf_ops.box_sdf_grad(pts, (self.dims - 2 * self.r) / s)


@struct.dataclass
class BrickShape(ShapeBase):
    dims: jnp.ndarray  # (3,)
    r: jnp.ndarray

    def scale(self):
        return jnp.max(self.dims) * 1.5 / 2.0

    def sdf(self, pts):
        s = self.scale()
        return sdf_ops.brick_sdf(pts, self.dims / s, self.r / s)

    def sdf_grad(self, pts):
        return sdf_ops.box_sdf_grad(pts, self.dims / self.scale())


@struct.dataclass
class CylinderShape(ShapeBase):
    rad: jnp.ndarray
    height: jnp.ndarray

    def scale(self):
        return jnp.maximum(self.rad, self.height / 2.0) * 1.5

    def sdf(self, pts):
        s = self.scale()
        return sdf_ops.cylinder_sdf(pts, self.rad / s, self.height / s)

    def sdf_grad(self, pts):
        s = self.scale()
        return sdf_ops.cylinder_sdf_grad(pts, self.rad / s, self.height / s)

    def ang_inertia(self, mass):
        return inertia_ops.cylinder_inertia(self.rad, self.height, mass)


@struct.dataclass
class BowlShape(ShapeBase):
    r: jnp.ndarray
    d: jnp.ndarray

    def scale(self):
        return (self.r + self.d) * 1.3333

    def sdf(self, pts):
        s = self.scale()
        return sdf_ops.bowl_sdf(pts, self.r / s, self.d / s)

    def sdf_grad(self, pts):
        s = self.scale()
        return sdf_ops.bowl_sdf_grad(pts, self.r / s, self.d / s)


@struct.dataclass
class GridShape(ShapeBase):
    """Voxel-grid SDF body (reference SDFGrid3D, bodies.py:763-775).

    `grid` holds normalized-frame distances on a regular lattice over
    [-1,1]^3; `scale_` is the metric half-extent."""

    grid: jnp.ndarray  # (X, Y, Z)
    scale_: jnp.ndarray  # ()

    def scale(self):
        return self.scale_

    def sdf(self, pts):
        return sdf_ops.grid_sdf(pts, self.grid)

    def sdf_grad(self, pts):
        return sdf_ops.grid_sdf_grad(pts, self.grid)


@struct.dataclass
class LatentShape(ShapeBase):
    """Learned shape-space SDF (reference IGR decoder bodies, utils.py:286-350).

    `decoder` is a static callable (pts_norm (N,3), latent) -> (N,) built from
    models/igr.py; `latent` is the differentiable code."""

    latent: jnp.ndarray
    scale_: jnp.ndarray
    decoder: callable = struct.field(pytree_node=False)

    def scale(self):
        return self.scale_

    def sdf(self, pts):
        return self.decoder(pts, self.latent)

    def sdf_grad(self, pts):
        fn = lambda p: jnp.sum(self.decoder(p, self.latent))
        return jax.grad(fn)(pts)


def query_sdfs(shape: ShapeBase, pts_loc: jnp.ndarray, return_grads: bool = True):
    """Metric local-frame SDF query (reference SDF3D.query_sdfs,
    bodies.py:721-760): bounding-scale mask, normalized gradient, metric
    distances (sdf * scale)."""
    scale = shape.scale()
    overlap = jnp.all(jnp.abs(pts_loc) <= scale, axis=-1)
    pts_in = pts_loc / scale
    sdfs_n = shape.sdf(pts_in)
    sdfs = jnp.where(overlap, sdfs_n, 1.0) * scale
    if not return_grads:
        return sdfs
    grads = normalize(shape.sdf_grad(pts_in))
    grads = jnp.where(overlap[..., None], grads, 0.0)
    return sdfs, grads
