"""Re-render a finished run's start/final/target worlds as depth/seg frames.

Replaces the reference `experiments/render_result.py` (reload a sacred run's
config and invoke its `record_results` command, optim_sphere.py:180-207):
loads a run directory written by experiments/common.Run, rebuilds the worlds
for the stored start/final/target parameters, rolls them out, and records
depth + segmentation frames with the SDF ray-marcher into
<run_dir>/render/{start,final,target}/.

Run: python -m diffsdfsim_tpu.experiments.render_result outputs/trajectory_fitting_sphere/1
"""

from __future__ import annotations

import json
import math
import pickle
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_dtype
from ..physics.world import rollout
from ..rendering.raymarch import PinholeCamera, render_depth_seg
from . import optim_sphere


def render_world(spec, traj, out_dir: Path, every: int = 5):
    dtype = default_dtype()
    cam = PinholeCamera.from_yfov(math.pi / 3, 160, 120)
    theta = math.pi / 4
    ct, st = math.cos(theta), math.sin(theta)
    pose = jnp.asarray(
        [[1, 0, 0, 0.0], [0, ct, -st, 8.0], [0, st, ct, 12.0], [0, 0, 0, 1.0]],
        dtype=dtype,
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    t = np.asarray(traj.t[:, 0])
    for i in range(0, t.shape[0], every):
        depth, seg = render_depth_seg(
            spec.bodies, traj.quat[i, 0], traj.pos[i, 0], cam, pose
        )
        np.save(out_dir / f"depth_{i:04d}.npy", np.asarray(depth))
        np.save(out_dir / f"seg_{i:04d}.npy", np.asarray(seg))
    print("wrote", t.shape[0] // every, "frames to", out_dir)


def main(argv=None):
    argv = argv or sys.argv[1:]
    if not argv:
        raise SystemExit("usage: render_result <run_dir>")
    run_dir = Path(argv[0])
    cfg_dict = json.loads((run_dir / "config.json").read_text())
    with open(run_dir / "output.pkl", "rb") as f:
        out = pickle.load(f)

    c = dict(optim_sphere.DEFAULTS)
    c.update({k: v for k, v in cfg_dict.items() if k in c})
    sim_cfg = optim_sphere.build_cfg(c)
    n_frames = int(round(c["run_time"] / sim_cfg.dt))

    for name in ["start", "final", "target"]:
        rad = jnp.asarray(np.asarray(out[f"{name}_rad"]).reshape(-1)[0])
        final, traj, idx, _ = optim_sphere.simulate(rad, c, sim_cfg)
        # need the spec for rendering: rebuild
        spec_state = optim_sphere.simulate.__wrapped__ if hasattr(optim_sphere.simulate, "__wrapped__") else None
        # simulate() already returns trajectory; rebuild spec via make-world
        # by re-running the constructor path
        from ..physics import (BoxShape, SphereShape, TotalConstraint3D,
                               Gravity3D, make_body, make_world)
        dtype = default_dtype()
        bodies = [
            make_body(BoxShape(jnp.array([20.0, 1.0, 20.0], dtype=dtype)), subdiv=3),
            make_body(SphereShape(rad), subdiv=2),
        ]
        poses = jnp.asarray(
            [[1.0, 0, 0, 0, 0.0, -0.5, 0.0], [1.0, 0, 0, 0, 0.0, 5.0, 0.0]], dtype=dtype
        )
        spec, _ = make_world(
            bodies, poses, jnp.zeros((2, 6), dtype=dtype),
            joints=(TotalConstraint3D(body1=0),),
            forces=((), (Gravity3D(10.0),)), cfg=sim_cfg,
        )
        render_world(spec, traj, run_dir / "render" / name)


if __name__ == "__main__":
    main()
