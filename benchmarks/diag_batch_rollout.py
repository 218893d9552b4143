"""Diagnose where the batched-native bench rollout spends substeps.

Runs the bench.py --batch world (bouncing sphere, 16 radii) forward-only and
reports, per frame: how many substeps were active for any lane, how many
lanes were active, and how many lanes' bisection selected k>0 (a lower bound
on whole-batch ladder triggers). Then times the same rollout with the ladder
FORCED on every substep (monkeypatched gate) to bound what the whole-batch
rung-0 gate is worth on this workload.

    python benchmarks/diag_batch_rollout.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.config import SimConfig
from diffsdfsim_tpu.physics import (
    BoxShape,
    Gravity3D,
    SphereShape,
    TotalConstraint3D,
    make_body,
    make_world,
    make_world_batched,
    rollout_batched,
)
from diffsdfsim_tpu.physics import batched as B

print("backend:", jax.default_backend(), flush=True)

cfg = SimConfig(fric_dirs=8, max_contacts_per_pair=4, max_contacts_total=4,
                mesh_subdiv=2, max_substeps=4, max_bisect=8, tol=1e-5)


def build(rad):
    floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=3,
                      fric_coeff=0.25)
    sphere = make_body(SphereShape(rad), subdiv=2, fric_coeff=0.25)
    poses = jnp.array([[1.0, 0, 0, 0, 0.0, -0.5, 0.0],
                       [1.0, 0, 0, 0, 0.0, 1.2, 0.0]])
    return make_world([floor, sphere], poses, jnp.zeros((2, 6)),
                      joints=(TotalConstraint3D(body1=0),),
                      forces=((), (Gravity3D(10.0),)), cfg=cfg)


rads = jnp.linspace(0.42, 0.58, 16)
spec, bodies_b, state_b = make_world_batched(build, rads)

N = 100


@jax.jit
def fwd(state_b):
    final, traj = rollout_batched(spec, bodies_b, state_b, N)
    return traj.valid, traj.n_halvings, traj.t


valid, nh, t = fwd(state_b)
valid = np.asarray(valid)  # (T, S, B)
nh = np.asarray(nh)

sub_any = valid.any(axis=2)  # (T, S) substep ran (some lane active)
print(f"substeps executed (any-lane): {sub_any.sum()} / {N} frames "
      f"(mean {sub_any.sum()/N:.2f}/frame)")
print(f"lane-substeps active: {valid.sum()} (mean {valid.sum()/N/16:.2f} "
      f"per lane-frame)")
k_pos = (nh > 0) & valid
print(f"substeps with some lane k>0 (ladder definitely ran): "
      f"{(k_pos.any(axis=2)).sum()}; lane-substeps k>0: {k_pos.sum()}")
# per-10-frame breakdown of executed substeps
per10 = sub_any.reshape(10, 10 * sub_any.shape[1]).sum(axis=1)
print("substeps per 10-frame block:", per10.tolist())


def timeit(fn, arg, n=3):
    r = fn(arg)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = fn(arg)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        ts.append(time.time() - t0)
    return min(ts)


t_gate = timeit(fwd, state_b)
print(f"fwd rollout (gated):      {t_gate*1e3:8.1f} ms "
      f"({t_gate/N/16*1e6:.0f} us/lane-frame)", flush=True)

# force the full ladder on every substep: bounds the gate's value
orig = B._probe_batched


def forced(spec, bodies_b, state_b, dtf):
    sg = jax.lax.stop_gradient
    bodies_s = jax.tree_util.tree_map(sg, bodies_b)
    state_s = jax.tree_util.tree_map(sg, state_b)

    def ladder(bd, st, dtf_):
        s = B._spec_with_bodies(spec, bd)
        from diffsdfsim_tpu.physics.world import _probe_ladder_full

        k, any_ok, cc, sol_k = _probe_ladder_full(
            s, st, dtf_, B._accept_thresh(s, st)
        )
        return k, any_ok, (cc, sol_k)

    k, ok, cache = jax.vmap(ladder)(bodies_s, state_s, sg(dtf))
    return k, ok, jax.tree_util.tree_map(sg, cache)


B._probe_batched = forced


@jax.jit
def fwd_forced(state_b):
    final, traj = rollout_batched(spec, bodies_b, state_b, N)
    return traj.valid, traj.n_halvings, traj.t


t_forced = timeit(fwd_forced, state_b)
print(f"fwd rollout (ladder-always): {t_forced*1e3:8.1f} ms "
      f"({t_forced/N/16*1e6:.0f} us/lane-frame)", flush=True)
B._probe_batched = orig
