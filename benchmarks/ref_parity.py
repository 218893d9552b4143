"""Trajectory parity vs the ACTUAL reference implementation.

Runs the optim_sphere scenario (floor + wall + thrown sphere,
reference optim_sphere.py:78-111) through BOTH engines on CPU float64:

  - the reference code at /root/reference via benchmarks/ref_oracle.py
    (pure-Python shims for its binary deps), and
  - diffsdfsim_tpu's rollout at the same tolerances (tol=1e-8, dt=1/30).

and prints the sphere position error at each frame time (nearest-time
matching — the reference trajectory is recorded at variable substep times).
This is the SURVEY §4 "trajectory parity vs reference traces" obligation,
measured against the reference itself rather than a re-implementation.

Usage: python benchmarks/ref_parity.py [rad] [run_time]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def run_reference(rad, run_time):
    """Reference trajectory [(t, pos3), ...] for the thrown sphere."""
    import torch

    from benchmarks.ref_oracle import _install_stubs, make_sphere_world, run_fixed_dt

    _install_stubs()
    torch.set_default_dtype(torch.float64)
    w, sphere = make_sphere_world(torch.tensor(float(rad)))
    run_fixed_dt(w, run_time, detach_2nd_bounce=False)
    # world.trajectory records (t, p_all) per frame; sphere is the last body
    out = []
    # trajectory records are (t, p, v, contacts, rot_joints) — world.py:377
    for rec in w.trajectory:
        t, p = rec[0], rec[1]
        out.append((float(t), np.asarray(p[-3:].detach())))
    return out


def run_ours(rad, run_time):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from diffsdfsim_tpu.experiments.optim_sphere import DEFAULTS, build_cfg, simulate

    c = dict(DEFAULTS)
    c["run_time"] = run_time
    c["detach_2nd_bounce"] = False
    cfg = build_cfg(c)
    final, traj, sphere_idx, _ = jax.jit(
        lambda r: simulate(r, c, cfg)[:2], static_argnums=()
    )(jnp.asarray(float(rad)))
    ts = np.asarray(traj.t).reshape(-1)
    pos = np.asarray(traj.pos[:, :, sphere_idx, :]).reshape(-1, 3)
    valid = np.asarray(traj.valid).reshape(-1)
    return [(float(t), p) for t, p, v in zip(ts, pos, valid) if v]


def main():
    rad = float(sys.argv[1]) if len(sys.argv) > 1 else 0.6
    run_time = float(sys.argv[2]) if len(sys.argv) > 2 else 1.2

    ours = run_ours(rad, run_time)
    ref = run_reference(rad, run_time)
    print(f"records: ours {len(ours)} ref {len(ref)}")

    rts = np.array([t for t, _ in ref])
    worst_pre, worst_post = 0.0, 0.0
    for t, p in ours:
        j = int(np.argmin(np.abs(rts - t)))
        dtm = abs(rts[j] - t)
        err = float(np.linalg.norm(ref[j][1] - p))
        phase = "pre " if t < 0.88 else "post"
        if phase == "pre ":
            worst_pre = max(worst_pre, err)
        else:
            worst_post = max(worst_post, err)
        print(f"t {t:.4f} (ref t {rts[j]:.4f} dt {dtm:.1e}) {phase} |dpos| {err:.3e}")
    print(f"\nworst pre-impact {worst_pre:.3e}  worst post-impact {worst_post:.3e}")


if __name__ == "__main__":
    main()
