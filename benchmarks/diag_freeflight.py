#!/usr/bin/env python
"""Isolate where the bench rollout's forward time goes: free flight vs impact.

Times three 100-frame fwd-only rollouts at bench scale (marginal cost,
pipelined):
  - bench   : the exact bench.py bounce (drop from 1.2, several impacts)
  - freefly : sphere starts 60 units up — never touches the floor in 100
              frames; every frame is pure free flight
  - resting : sphere starts in resting contact — every frame is a contact
              solve with no ladder pressure (non-worsening acceptance)

If freefly/frame is a large share of bench/frame, the per-substep fixed cost
(FW launch + glue + no-contact solve) is the lever; if resting dominates,
the PDIPM/contact path is.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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
        fric_dirs=8,
        max_contacts_per_pair=4,
        max_contacts_total=4,
        mesh_subdiv=2,
        max_substeps=4,
        max_bisect=8,
        tol=1e-5,
        strict_no_penetration=False,
    )

    def loss_fn(rad):
        floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=3, fric_coeff=0.25)
        sphere = make_body(SphereShape(rad), subdiv=2, fric_coeff=0.25)
        poses = jnp.array([[1.0, 0, 0, 0, 0.0, -0.5, 0.0], [1.0, 0, 0, 0, 0.0, y0, 0.0]])
        vels = jnp.zeros((2, 6))
        spec, state = make_world(
            [floor, sphere],
            poses,
            vels,
            joints=(TotalConstraint3D(body1=0),),
            forces=((), (Gravity3D(10.0),)),
            cfg=cfg,
        )
        final, traj = rollout(spec, state, n_frames=N_FRAMES)
        return jnp.sum(final.pos[1] ** 2)

    return jax.jit(loss_fn)


def marginal(fn, n_big=8):
    rad = jnp.asarray(0.5)
    _ = float(fn(rad))  # compile
    def run_n(n, base):
        t0 = time.perf_counter()
        outs = [fn(rad + 1e-4 * (base + i)) for i in range(n)]
        _ = [float(o) for o in outs]
        return time.perf_counter() - t0
    ests = []
    for k in range(3):
        t1 = run_n(1, 10 * k)
        tb = run_n(n_big, 10 * k + 1)
        ests.append((tb - t1) / (n_big - 1))
    dt = max(sorted(ests)[1], 1e-9)  # median
    return dt


def main():
    for name, y0 in [("freefly", 60.0), ("bench", 1.2), ("resting", 0.4999)]:
        fn = build(y0)
        dt = marginal(fn)
        print(f"{name:8s}  {dt / N_FRAMES * 1e6:8.1f} us/frame   ({N_FRAMES / dt:7.1f} steps/s fwd-only)")


if __name__ == "__main__":
    main()
