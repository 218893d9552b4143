"""End-to-end run of the real-world RGB-D fitting pipeline on a SYNTHETIC
recording (the reference's `real_world_data.pkl` is not in this image;
VERDICT r1 row 40 flagged the pipeline as never executed). The fixture
mimics the recorded format: camera-frame point clouds + segmentation +
camera poses for a sphere resting on a floor plane."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.experiments.optim_pointcloud_real import main


def _make_fixture(path, r_target=0.62, n_frames=5):
    rng = np.random.default_rng(0)
    frames = []
    # sphere resting on the floor: center at (0.1, r, -0.2), static
    center = np.array([0.1, r_target, -0.2])
    for i in range(n_frames):
        t = i * (1.0 / 30.0)
        # object surface points (upper hemisphere, what a camera would see)
        dirs = rng.standard_normal((160, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        dirs[:, 1] = np.abs(dirs[:, 1])
        obj_pts_w = center + r_target * dirs
        # floor points around the object (seg = False)
        fx = rng.uniform(-2, 2, size=(120, 1))
        fz = rng.uniform(-2, 2, size=(120, 1))
        floor_pts_w = np.concatenate([fx, np.zeros_like(fx), fz], axis=1)
        pts_w = np.concatenate([obj_pts_w, floor_pts_w])
        seg = np.concatenate([np.ones(160, bool), np.zeros(120, bool)])
        # cam_pose = identity; the loader applies the GL flip [1,-1,-1]
        pts_cam = pts_w * np.array([1.0, -1.0, -1.0])
        frames.append(dict(t=t, points=pts_cam.astype(np.float64), seg=seg,
                           cam_pose=np.eye(4)))
    data = dict(frames=frames)  # no planes -> exercises plane estimation
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return r_target


def test_real_pipeline_synthetic_recording(tmp_path):
    r_target = _make_fixture(tmp_path / "rec.pkl")
    out = main([
        "with", f"data_path={tmp_path / 'rec.pkl'}", "max_iter=30",
        "mesh_subdiv=1", f"base_dir={tmp_path / 'out'}",
    ])
    fitted = float(np.asarray(out["size"]))
    # starts at 0.5; must move decisively toward the true 0.62
    assert abs(fitted - r_target) < 0.06, f"fitted {fitted} vs {r_target}"
