"""Body definitions: shape + surface mesh + mass properties as one pytree.

Replaces the reference `Body3D` / `SDF3D` object hierarchy
(`sdf_physics/physics3d/bodies.py:398-760`) with a data-oriented `BodyDef`:
construction is a pure, differentiable function of shape parameters so that
(like the reference, which rebuilds worlds every optimizer iteration,
optim_sphere.py:238) world construction can live inside the jitted loss.

The surface mesh comes from template projection (`ops/surface.py`); faces are
static topology. Inertia is analytic where the reference has an analytic
path (custom_inertia) or Mirtich mesh integrals otherwise.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import Defaults3D, default_dtype
from ..ops.inertia import ang_inertia_from_mesh
from ..ops.surface import surface_mesh
from ..utils import meshes
from .shapes import ShapeBase, query_sdfs


@struct.dataclass
class BodyDef:
    shape: ShapeBase
    verts: jnp.ndarray  # (V,3) metric local frame
    faces: np.ndarray = struct.field(pytree_node=False)  # (F,3) static topology
    mass: jnp.ndarray  # ()
    ang_inertia: jnp.ndarray  # (3,3) body frame
    restitution: jnp.ndarray  # ()
    fric_coeff: jnp.ndarray  # ()
    is_sdf: bool = struct.field(pytree_node=False, default=True)
    # (F,) bool mask of genuinely extracted faces for marching-mesher bodies
    # (None = all faces valid). Threaded into the FW candidate gate so
    # degenerate parked-at-origin triangles can never become phantom contact
    # candidates when the body origin penetrates the other body (ADVICE r2).
    face_valid: Optional[jnp.ndarray] = None

    def scale(self):
        return self.shape.scale()

    def query_sdfs(self, pts_loc, return_grads=True):
        return query_sdfs(self.shape, pts_loc, return_grads=return_grads)


def make_body(
    shape: ShapeBase,
    mass=1.0,
    restitution=Defaults3D.RESTITUTION,
    fric_coeff=Defaults3D.FRIC_COEFF,
    custom_inertia: bool = Defaults3D.CUSTOM_INERTIA,
    custom_mesh: bool = Defaults3D.CUSTOM_MESH,
    template: str = "auto",
    subdiv: int = 3,
    project_iters: int = 12,
    verts: Optional[jnp.ndarray] = None,
    faces: Optional[np.ndarray] = None,
    mesher: str = "template",
    grid_res: int = 16,
    max_tris: Optional[int] = None,
) -> BodyDef:
    """Build a BodyDef from a shape (differentiable w.r.t. shape params/mass).

    `template` picks the projection template: 'ico' (icosphere) or 'cube'
    (cube-sphere, better coverage of large flat faces); 'auto' selects by
    shape type. `custom_mesh=True` uses the analytic mesh for the shape
    (reference custom_mesh option; required for BowlShape, whose shell the
    star-shaped projection cannot represent). Pass explicit `verts`/`faces`
    for a Mesh3D-style explicit mesh body (reference bodies.py:596-624).

    `mesher='marching'` extracts the surface with marching tetrahedra
    (ops/marching.py) instead of star-shaped template projection — required
    for non-genus-0 shapes (torus-like grids, nonconvex latents) whose
    surface the projection provably cannot represent (reference uses CUDA
    marching cubes here, bodies.py:652-704). The SDF is sampled on a
    `grid_res`^3 normalized lattice (GridShape uses its own grid directly)
    and the extracted triangle-soup vertices get the MeshSDF differentiable
    correction, so d(verts)/d(shape params) matches the reference backward."""
    dtype = default_dtype()
    mass = jnp.asarray(mass, dtype=dtype)

    kind = type(shape).__name__
    if verts is None and (custom_mesh or kind == "BowlShape"):
        from . import analytic_meshes as am

        if kind == "BoxShape":
            verts_m, faces_m = am.box_mesh(shape.dims, n=2**subdiv)
        elif kind == "SphereShape":
            verts_m, faces_m = am.sphere_mesh(shape.rad, subdivisions=subdiv + 1)
        elif kind == "CylinderShape":
            verts_m, faces_m = am.cylinder_mesh(shape.rad, shape.height)
        elif kind == "BowlShape":
            verts_m, faces_m = am.bowl_mesh(shape.r, shape.d)
        else:
            verts_m = None
        if verts_m is not None:
            if custom_inertia:
                inertia = shape.ang_inertia(mass)
                if inertia is None:
                    inertia = ang_inertia_from_mesh(verts_m, jnp.asarray(faces_m), mass)
            else:
                inertia = ang_inertia_from_mesh(verts_m, jnp.asarray(faces_m), mass)
            return BodyDef(
                shape=shape, verts=verts_m, faces=np.asarray(faces_m), mass=mass,
                ang_inertia=inertia,
                restitution=jnp.asarray(restitution, dtype=dtype),
                fric_coeff=jnp.asarray(fric_coeff, dtype=dtype),
                is_sdf=True,
            )

    face_valid = None
    if verts is None and mesher == "marching":
        import jax

        from ..ops.marching import grid_to_mesh

        sg = jax.lax.stop_gradient
        if kind == "GridShape":
            grid = shape.grid
            res = grid.shape[0]
        else:
            lin = jnp.linspace(-1.0, 1.0, grid_res, dtype=dtype)
            gx, gy, gz = jnp.meshgrid(lin, lin, lin, indexing="ij")
            pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
            grid = shape.sdf(pts).reshape(grid_res, grid_res, grid_res)
            res = grid_res
        if max_tris is None:
            # a closed surface in an N^3 grid cuts O(N^2) cells; 6 tets x
            # up-to-2 tris per cut cell, with slack for oblique surfaces
            max_tris = 8 * res * res
        # gradient-free extraction + MeshSDF differentiable correction:
        # v_out = sg(v) - sdf(sg(v); params) * sg(n)  (ops/surface.py docs)
        verts_soup, faces, valid = grid_to_mesh(
            sg(grid), scale=sg(shape.scale()), max_tris=max_tris
        )
        v_sg = sg(verts_soup)
        d, n = query_sdfs(shape, v_sg)
        corrected = v_sg - d[:, None] * sg(n)
        vmask = jnp.repeat(valid, 3)[:, None]
        verts = jnp.where(vmask, corrected, 0.0)
        face_valid = valid
        is_sdf = True
    elif verts is None:
        if template == "auto":
            template = "ico" if type(shape).__name__ == "SphereShape" else "cube"
        if template == "ico":
            tv, tf = meshes.icosphere(subdiv)
        else:
            tv, tf = meshes.cube_template(2**subdiv)
        tv = jnp.asarray(tv, dtype=dtype)
        v_norm = surface_mesh(
            tv,
            lambda p, s: s.sdf(p),
            lambda p, s: s.sdf_grad(p),
            (shape,),
            iters=project_iters,
        )
        verts = v_norm * shape.scale()
        faces = tf
        is_sdf = True
    else:
        faces = np.asarray(faces)
        is_sdf = False

    if custom_inertia:
        inertia = shape.ang_inertia(mass)
        if inertia is None:
            inertia = ang_inertia_from_mesh(verts, jnp.asarray(faces), mass)
    else:
        inertia = ang_inertia_from_mesh(verts, jnp.asarray(faces), mass)

    return BodyDef(
        shape=shape,
        verts=verts,
        faces=faces,
        mass=mass,
        ang_inertia=inertia,
        restitution=jnp.asarray(restitution, dtype=dtype),
        fric_coeff=jnp.asarray(fric_coeff, dtype=dtype),
        is_sdf=is_sdf,
        face_valid=face_valid,
    )
