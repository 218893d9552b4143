"""Observation recorder: the reference Recorder3D re-imagined for ray-march.

Reference: `sdf_physics/physics3d/utils.py:65-154` — records (color, depth,
pointcloud, segmentation, camera poses) every `dt` of sim time, optionally
rotating the camera around an axis, with depth noise std = factor * d².

This version records color/depth/seg/pointcloud from the SDF ray-marcher
(color via the Lambertian pass in raymarch.render_color, matching the
reference's pyrender color output for qualitative results). Frames accumulate on host as numpy arrays.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.quaternion import so3_exp_map
from .raymarch import PinholeCamera, get_pointcloud, render_color, render_depth_seg


class Recorder3D:
    def __init__(
        self,
        dt: float,
        cam: PinholeCamera,
        camera_pose,
        rotate: bool = False,
        rotate_rate: float = math.pi / 3.0,
        rotate_axis=(0, 0, 1),
        record_points: bool = False,
        record_seg: bool = False,
        record_color: bool = False,
        body_colors=None,
        noise_factor: float = 0.0,
        rng_seed: int = 0,
    ):
        self.dt = dt
        self.cam = cam
        self.camera_pose = np.asarray(camera_pose, dtype=np.float64)
        self.rotate = rotate
        self.rotate_rate = rotate_rate
        self.rotate_axis = np.asarray(rotate_axis, dtype=np.float64)
        self.record_points = record_points
        self.record_seg = record_seg
        self.record_color = record_color
        self.body_colors = body_colors
        self.noise_factor = noise_factor
        self._key = jax.random.PRNGKey(rng_seed)
        self.prev_t = -1e9
        self.frames: list = []

    def record(self, t, bodies, quat, pos):
        """Returns (depth, pc, seg, camera_pose) or None if not yet due."""
        if t - self.prev_t < self.dt:
            return None
        self.prev_t += self.dt if self.prev_t > -1e8 else (t + self.dt) * 0 + self.dt
        if self.rotate:
            ang = self.dt * self.rotate_rate
            R = np.asarray(so3_exp_map(jnp.asarray(self.rotate_axis * ang)))
            T = np.eye(4)
            T[:3, :3] = R
            self.camera_pose = T @ self.camera_pose

        cam_pose = jnp.asarray(self.camera_pose, dtype=quat.dtype)
        color = None
        if self.record_color:
            color, depth, seg = render_color(
                bodies, quat, pos, self.cam, cam_pose, colors=self.body_colors
            )
            color = np.asarray(color)
        else:
            depth, seg = render_depth_seg(bodies, quat, pos, self.cam, cam_pose)
        pc = None
        if self.record_points:
            self._key, sub = jax.random.split(self._key)
            pc = np.asarray(
                get_pointcloud(depth, self.cam, key=sub, noise_factor=self.noise_factor)
            )
        frame = (
            float(t),
            np.asarray(depth),
            pc,
            np.asarray(seg) if self.record_seg else None,
            self.camera_pose.copy(),
            color,
        )
        self.frames.append(frame)
        return frame
