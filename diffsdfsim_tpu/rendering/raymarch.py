"""SDF ray-marching depth + segmentation renderer.

TPU-native replacement for the reference's pyrender/EGL offscreen renderer
(`sdf_physics/physics3d/utils.py:107-154` Recorder3D): the losses only need
depth, segmentation masks, and point clouds — all of which fall out of
sphere-tracing the scene's SDFs directly, in one jittable program, with no
OpenGL/host round-trip, and differentiably if desired.

Conventions match pyrender (OpenGL): camera looks along -z, y up; pixel rays
are built from intrinsics (fx, fy, cx, cy); `camera_pose` is cam-to-world.
Depth images are the positive -z distance (pyrender depth buffer semantics),
so the reference's unprojection (`optim_pointcloud.py:184-187` OpenGL flip)
ports unchanged.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..utils.quaternion import quat_apply, quat_invert


class PinholeCamera(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    @staticmethod
    def from_yfov(yfov: float, width: int, height: int) -> "PinholeCamera":
        """pyrender.PerspectiveCamera(yfov, aspectRatio) equivalent."""
        fy = height / (2.0 * jnp.tan(yfov / 2.0))
        fx = fy
        return PinholeCamera(float(fx), float(fy), width / 2.0, height / 2.0, width, height)


def _pixel_rays(cam: PinholeCamera, dtype):
    x = jnp.arange(cam.width, dtype=dtype)
    y = jnp.arange(cam.height, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y)  # (H, W)
    # OpenGL: +x right, +y up, looking along -z
    dx = (xx + 0.5 - cam.cx) / cam.fx
    dy = -(yy + 0.5 - cam.cy) / cam.fy
    dirs = jnp.stack([dx, dy, -jnp.ones_like(dx)], axis=-1)
    return dirs.reshape(-1, 3)  # (H*W, 3), unnormalized (z = -1 plane)


def scene_sdf(bodies, quat, pos, pts_w):
    """min over bodies of each body's world-frame SDF at pts (N,3);
    returns (sdf (N,), body_idx (N,)).

    Outside a body's bounding cube, `query_sdfs` returns the constant
    `scale` (reference semantics), which is NOT a conservative march step;
    substitute the exact distance to that cube (a lower bound on the body
    distance since the body lies inside it)."""
    vals = []
    for b, bd in enumerate(bodies):
        loc = quat_apply(quat_invert(quat[b]), pts_w - pos[b])
        scale = bd.scale()
        inside = jnp.all(jnp.abs(loc) <= scale, axis=-1)
        sdf_in = bd.query_sdfs(loc, return_grads=False)
        box_d = jnp.linalg.norm(jnp.maximum(jnp.abs(loc) - scale, 0.0), axis=-1)
        # floor the OOB distance above the hit threshold so crossing the
        # bounding cube never registers as a surface hit
        vals.append(jnp.where(inside, sdf_in, jnp.maximum(box_d, 2.5e-3)))
    stack = jnp.stack(vals, axis=0)  # (B, N)
    return jnp.min(stack, axis=0), jnp.argmin(stack, axis=0)


def render_depth_seg(
    bodies: Sequence,
    quat,
    pos,
    cam: PinholeCamera,
    camera_pose,  # (4,4) cam-to-world
    n_steps: int = 64,
    max_depth: float = 40.0,
    hit_eps: float = 1e-3,
):
    """Sphere-trace depth (H, W) and per-pixel body segmentation (H, W,
    int32; -1 = background)."""
    dtype = quat.dtype
    dirs_cam = _pixel_rays(cam, dtype)
    R = camera_pose[:3, :3].astype(dtype)
    origin = camera_pose[:3, 3].astype(dtype)
    dirs_w = dirs_cam @ R.T
    # normalize but remember scale: depth buffer = distance along -z_cam = t
    # in units of the unnormalized ray (z=-1 plane) parameterization
    norm = jnp.linalg.norm(dirs_w, axis=-1, keepdims=True)
    dirs_u = dirs_w / norm

    def body_fn(_, carry):
        t, hit = carry
        pts = origin + t[:, None] * dirs_u
        sd, _ = scene_sdf(bodies, quat, pos, pts)
        t_new = jnp.where(hit, t, t + jnp.maximum(sd, hit_eps * 0.5))
        hit_new = hit | (sd < hit_eps)
        return t_new, hit_new

    t0 = jnp.zeros((dirs_u.shape[0],), dtype=dtype)
    hit0 = jnp.zeros_like(t0, dtype=bool)
    t, hit = jax.lax.fori_loop(0, n_steps, body_fn, (t0, hit0))
    hit = hit & (t < max_depth)

    pts = origin + t[:, None] * dirs_u
    _, seg_idx = scene_sdf(bodies, quat, pos, pts)

    # pyrender depth = -z in camera frame
    pts_cam = (pts - origin) @ R
    depth = jnp.where(hit, -pts_cam[:, 2], 0.0)
    seg = jnp.where(hit, seg_idx, -1)
    return (
        depth.reshape(cam.height, cam.width),
        seg.reshape(cam.height, cam.width).astype(jnp.int32),
    )


def get_pointcloud(depth, cam: PinholeCamera, key=None, noise_factor: float = 0.0):
    """Unproject a depth image to a camera-frame point cloud (H, W, 3) with
    the reference's depth-noise model std = noise_factor * d²
    (utils.py:81-105: x right, y DOWN, z forward in its pixel convention)."""
    dtype = depth.dtype
    x = jnp.arange(cam.width, dtype=dtype)
    y = jnp.arange(cam.height, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y)
    nx = (xx + 0.5 - cam.cx) / cam.fx
    ny = (yy + 0.5 - cam.cy) / cam.fy
    if noise_factor > 0.0 and key is not None:
        depth = depth + jax.random.normal(key, depth.shape, dtype) * noise_factor * depth**2
    return jnp.stack([nx * depth, ny * depth, depth], axis=-1)


def render_color(
    bodies: Sequence,
    quat,
    pos,
    cam: PinholeCamera,
    camera_pose,
    colors=None,  # (B, 3) per-body RGB in [0,1]; default distinct hues
    light_dir=(0.3, -1.0, -0.5),  # world frame, pointing FROM the light
    ambient: float = 0.25,
    bg_color=(1.0, 1.0, 1.0),
    n_steps: int = 64,
    max_depth: float = 40.0,
    hit_eps: float = 1e-3,
):
    """Lambertian color rendering (H, W, 3) on top of the sphere tracer.

    Replaces the reference's pyrender color pass
    (`sdf_physics/physics3d/utils.py:107-154`: Recorder3D renders
    color+depth+seg with a DirectionalLight) for qualitative outputs:
    per-body albedo, one directional light, ambient floor. Surface normals
    come from the hit body's SDF gradient — no mesh, no rasterizer.

    Returns (color (H, W, 3), depth (H, W), seg (H, W))."""
    dtype = quat.dtype
    nb = len(bodies)
    if colors is None:
        base = jnp.asarray(
            [[0.85, 0.35, 0.25], [0.25, 0.55, 0.85], [0.35, 0.75, 0.35],
             [0.85, 0.75, 0.25], [0.65, 0.35, 0.75], [0.75, 0.75, 0.75]],
            dtype=dtype,
        )
        colors = jnp.stack([base[b % base.shape[0]] for b in range(nb)])
    colors = jnp.asarray(colors, dtype=dtype)

    depth, seg = render_depth_seg(
        bodies, quat, pos, cam, camera_pose, n_steps, max_depth, hit_eps
    )

    # reconstruct world hit points from the depth buffer
    R = camera_pose[:3, :3].astype(dtype)
    origin = camera_pose[:3, 3].astype(dtype)
    dirs_cam = _pixel_rays(cam, dtype)
    dirs_w = dirs_cam @ R.T
    d_flat = depth.reshape(-1)
    # depth is -z_cam; the unnormalized ray has z_cam = -1, so pts = o + d*dir
    pts = origin + d_flat[:, None] * dirs_w

    # per-pixel normal from the hit body's SDF gradient (world frame)
    seg_flat = seg.reshape(-1)
    normals = jnp.zeros_like(pts)
    for b, bd in enumerate(bodies):
        loc = quat_apply(quat_invert(quat[b]), pts - pos[b])
        _, g = bd.query_sdfs(loc)
        g_w = quat_apply(quat[b], g)
        normals = jnp.where((seg_flat == b)[:, None], g_w, normals)

    light = -jnp.asarray(light_dir, dtype=dtype)
    light = light / jnp.linalg.norm(light)
    lam = jnp.clip(jnp.einsum("nc,c->n", normals, light), 0.0, 1.0)
    shade = ambient + (1.0 - ambient) * lam

    albedo = jnp.where(
        (seg_flat >= 0)[:, None],
        colors[jnp.clip(seg_flat, 0, nb - 1)],
        jnp.asarray(bg_color, dtype=dtype),
    )
    rgb = jnp.where(
        (seg_flat >= 0)[:, None], albedo * shade[:, None], albedo
    )
    return rgb.reshape(cam.height, cam.width, 3), depth, seg
