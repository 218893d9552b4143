#!/usr/bin/env python
"""Substep/halving histogram of the bench workloads: how many substeps per
frame actually execute, which bisection rungs get selected, how often the
deep ladder stage fires, and whether frames truncate.

    python benchmarks/diag_histogram.py [freefly|bench|resting ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

N_FRAMES = 100


def build(y0):
    from diffsdfsim_tpu.config import SimConfig
    from diffsdfsim_tpu.physics import (
        BoxShape,
        Gravity3D,
        SphereShape,
        TotalConstraint3D,
        make_body,
        make_world,
        rollout,
    )

    cfg = SimConfig(
        fric_dirs=8, max_contacts_per_pair=4, max_contacts_total=4,
        mesh_subdiv=2, max_substeps=4, max_bisect=8, tol=1e-5,
        strict_no_penetration=False,
    )
    floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=3, fric_coeff=0.25)
    sphere = make_body(SphereShape(0.5), subdiv=2, fric_coeff=0.25)
    poses = jnp.array([[1.0, 0, 0, 0, 0.0, -0.5, 0.0], [1.0, 0, 0, 0, 0.0, y0, 0.0]])
    spec, state = make_world(
        [floor, sphere], poses, jnp.zeros((2, 6)),
        joints=(TotalConstraint3D(body1=0),),
        forces=((), (Gravity3D(10.0),)), cfg=cfg,
    )

    def run(st):
        final, traj = rollout(spec, st, n_frames=N_FRAMES)
        return traj

    return jax.jit(run), state, cfg


def main():
    names = sys.argv[1:] or ["freefly", "bench", "resting"]
    y0s = {"freefly": 60.0, "bench": 1.2, "resting": 0.4999}
    for name in names:
        fn, state, cfg = build(y0s[name])
        traj = jax.tree_util.tree_map(np.asarray, fn(state))
        valid = traj.valid  # (T, S)
        nh = traj.n_halvings
        bf = traj.bisect_failed
        n_exec = int(valid.sum())
        subs_per_frame = valid.sum(axis=1)
        hist_subs = np.bincount(subs_per_frame, minlength=cfg.max_substeps + 1)
        ks = nh[valid]
        hist_k = np.bincount(ks, minlength=cfg.max_bisect + 1)
        deep = int((ks > 2).sum())
        print(f"\n== {name}: {n_exec} executed substeps / {N_FRAMES} frames")
        print(f"   substeps-per-frame histogram (0..{cfg.max_substeps}): {hist_subs.tolist()}")
        print(f"   selected-rung histogram (k=0..{cfg.max_bisect}): {hist_k.tolist()}")
        print(f"   deep-stage selections (k>2): {deep}; bisect_failed: {int(bf[valid].sum())}; truncated frames: {int(traj.truncated.sum())}")


if __name__ == "__main__":
    main()
