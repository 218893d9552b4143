"""Real-world RGB-D fitting: recover object size + per-frame poses.

Re-creation of `experiments/trajectory_fitting/optim_pointcloud_real.py`:
recorded RGB-D frames (point clouds + segmentation + camera poses, pickled)
are fitted with a simulated scene whose static geometry (floor/walls) is
built from planes estimated in the data (reference :98-149 poses SDFBox
walls from plane parameters), and whose moving body's size and initial pose
are optimized with the squared-SDF pointcloud loss, stepping the simulation
frame-indexed against the recording timestamps (reference :199-225).

Data format (pickle): dict with
    frames: list of {t, points (N,3 cam frame), seg (N,) bool, cam_pose (4,4)}
    planes: optional list of (normal (3,), offset) world-frame planes
If planes are absent they are estimated from non-object points by
least-squares (dominant plane).
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import SimConfig, default_dtype
from ..physics import (
    BoxShape,
    SphereShape,
    TotalConstraint3D,
    Gravity3D,
    make_body,
    make_world,
    rollout,
)
from ..physics.shapes import query_sdfs
from ..utils.quaternion import quat_apply, quat_exp_map, quat_invert, quat_multiply
from .common import Run, parse_cli

DEFAULTS = dict(
    seed=0,
    data_path="real_world_data.pkl",
    max_iter=80,
    lr=1e-2,
    mesh_subdiv=2,
    wall_thickness=1.0,
    base_dir="outputs",
)


def estimate_plane(points: np.ndarray):
    """Least-squares dominant plane (normal, offset): n.x = d."""
    c = points.mean(axis=0)
    u, s, vt = np.linalg.svd(points - c, full_matrices=False)
    n = vt[-1]
    if n[1] < 0:  # orient +y-ish (floor up)
        n = -n
    return n, float(n @ c)


def wall_from_plane(normal, offset, thickness, extent=20.0):
    """An SDFBox whose +normal face lies on the plane n.x = d (reference
    :98-149). Returns (BodyDef, pose7)."""
    dtype = default_dtype()
    n = np.asarray(normal, dtype=np.float64)
    n = n / np.linalg.norm(n)
    # rotation taking +y to n
    y = np.array([0.0, 1.0, 0.0])
    v = np.cross(y, n)
    s = np.linalg.norm(v)
    cth = float(y @ n)
    if s < 1e-9:
        R = np.eye(3) if cth > 0 else np.diag([1.0, -1.0, -1.0])
    else:
        vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        R = np.eye(3) + vx + vx @ vx * ((1 - cth) / s**2)
    # quaternion from R
    from ..utils.quaternion import matrix_to_quat

    q = matrix_to_quat(jnp.asarray(R, dtype=dtype))
    center = n * (offset - thickness / 2.0)
    body = make_body(
        BoxShape(jnp.asarray([extent, thickness, extent], dtype=dtype)), subdiv=3
    )
    pose = jnp.concatenate([q, jnp.asarray(center, dtype=dtype)])
    return body, pose


def load_data(path):
    with open(path, "rb") as f:
        data = pickle.load(f)
    return data


def main(argv=None):
    c = parse_cli(DEFAULTS, argv)
    dtype = default_dtype()
    f32 = not jax.config.read("jax_enable_x64")
    cfg = SimConfig(
        fric_dirs=4, max_contacts_per_pair=4, max_contacts_total=4,
        mesh_subdiv=c["mesh_subdiv"], max_substeps=3, max_bisect=6,
        tol=1e-5 if f32 else 1e-8,
    )
    run = Run("pointcloud_real", c, base_dir=c["base_dir"])
    data = load_data(c["data_path"])
    frames = data["frames"]

    # static geometry from planes
    planes = data.get("planes")
    if not planes:
        bg = np.concatenate(
            [np.asarray(f["points"])[~np.asarray(f["seg"])] for f in frames[:3]]
        )
        planes = [estimate_plane(bg)]
    walls, poses = [], []
    for n, d in planes:
        b, p = wall_from_plane(n, d, c["wall_thickness"])
        walls.append(b)
        poses.append(p)

    # object observations in world frame per frame
    obs = []
    for f in frames:
        pts = jnp.asarray(np.asarray(f["points"]), dtype=dtype)
        seg = jnp.asarray(np.asarray(f["seg"]))
        T = jnp.asarray(np.asarray(f["cam_pose"]), dtype=dtype)
        pts_gl = pts * jnp.asarray([1.0, -1.0, -1.0], dtype=dtype)
        pts_w = pts_gl @ T[:3, :3].T + T[:3, 3]
        obs.append((float(f["t"]), pts_w, seg))

    # initial pose estimate: centroid of the object's first-frame points
    first_pts = obs[0][1][obs[0][2]]
    init_pos = jnp.mean(first_pts, axis=0)

    def sim_traj(size, pos0, rotv):
        body = make_body(SphereShape(size), subdiv=c["mesh_subdiv"])
        quat0 = quat_exp_map(rotv)
        all_bodies = walls + [body]
        all_poses = jnp.stack(poses + [jnp.concatenate([quat0, pos0])])
        vels = jnp.zeros((len(all_bodies), 6), dtype=dtype)
        spec, state = make_world(
            all_bodies, all_poses, vels,
            joints=tuple(TotalConstraint3D(body1=i) for i in range(len(walls))),
            forces=tuple(() for _ in walls) + ((Gravity3D(10.0),),),
            cfg=cfg,
        )
        n_frames = max(int(round((obs[-1][0] - obs[0][0]) / cfg.dt)) + 1, 1)
        _, traj = rollout(spec, state, n_frames=n_frames)
        return traj

    def loss_fn(params):
        size, pos0, rotv = params
        traj = sim_traj(size, pos0, rotv)
        shape = SphereShape(size)
        sim_t = traj.t[:, 0] + obs[0][0]
        total = 0.0
        for t_o, pts_w, seg in obs:
            i = jnp.argmin(jnp.abs(sim_t - t_o))
            body_pos = traj.pos[i, 0, len(walls)]
            body_quat = traj.quat[i, 0, len(walls)]
            pts_b = quat_apply(quat_invert(body_quat), pts_w - body_pos)
            sdfs = query_sdfs(shape, pts_b, return_grads=False)
            sq = jnp.where(seg, sdfs**2, 0.0)
            total = total + jnp.sum(sq) / jnp.maximum(jnp.sum(seg), 1)
        return total / len(obs)

    params = (
        jnp.asarray(0.5, dtype=dtype),
        init_pos,
        jnp.zeros(3, dtype=dtype),
    )
    opt = optax.adam(c["lr"])
    opt_state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    for i in range(c["max_iter"]):
        val, g = vg(params)
        upd, opt_state = opt.update(g, opt_state)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
        run.log_scalar("loss", float(val), i)

    out = dict(size=jax.device_get(params[0]), pos0=jax.device_get(params[1]),
               rot0=jax.device_get(params[2]))
    run.save_output(out)
    run.finish()
    print("fitted size:", float(params[0]))
    return out


if __name__ == "__main__":
    main()
