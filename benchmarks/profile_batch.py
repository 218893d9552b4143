"""Seed-batch scaling profile: per-frame cost of the vmapped step at
B = 1/4/16 under the three ladder modes (single-rollout fast path, full
ladder, whole-batch custom_vmap gate), fwd and fwd+bwd.

The round-2 finding was near-flat batch scaling (16 lanes -> 1.33x
aggregate); this isolates where the batched step loses. Run on the TPU:

    python benchmarks/profile_batch.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from diffsdfsim_tpu.config import SimConfig
from diffsdfsim_tpu.physics import (
    BoxShape,
    Gravity3D,
    SphereShape,
    TotalConstraint3D,
    make_body,
    make_world,
)
from diffsdfsim_tpu.physics.world import step_frame

print("backend:", jax.default_backend(), flush=True)

BASE = dict(fric_dirs=8, max_contacts_per_pair=4, max_contacts_total=4,
            mesh_subdiv=2, max_substeps=4, max_bisect=8, tol=1e-5,
            strict_no_penetration=False)


def make(rad, **kw):
    cfg = SimConfig(**{**BASE, **kw})
    floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=3,
                      fric_coeff=0.25)
    sphere = make_body(SphereShape(rad), subdiv=2, fric_coeff=0.25)
    # resting contact: the regime where ladder cost differences show
    poses = jnp.array([[1.0, 0, 0, 0, 0.0, -0.5, 0.0],
                       [1.0, 0, 0, 0, 0.0, 0.4999, 0.0]])
    return make_world([floor, sphere], poses, jnp.zeros((2, 6)),
                      joints=(TotalConstraint3D(body1=0),),
                      forces=((), (Gravity3D(10.0),)), cfg=cfg)


def bstate(state, B):
    return jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (B,) + (1,) * x.ndim), state)


def _fetch(r):
    # the axon tunnel's block_until_ready is a no-op on proxies; only
    # fetching a value synchronizes (see bench.py measurement note)
    import numpy as np

    return float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])


def timeit(run, arg, n=3):
    _fetch(run(arg))
    ts = []
    for _ in range(n):
        t0 = time.time()
        _fetch(run(arg))
        ts.append(time.time() - t0)
    return min(ts)


def chain(body, k):
    @jax.jit
    def run(st):
        out, _ = jax.lax.scan(lambda c, _: (body(c), None), st, None, length=k)
        return out

    return run


def perframe(body, st, k1=8, k2=32):
    f1, f2 = chain(body, k1), chain(body, k2)
    return (timeit(f2, st) - timeit(f1, st)) / (k2 - k1)


MODES = (
    ("fast", dict()),  # default: rung-0 lax.cond (single-rollout mode)
    ("gate", dict(ladder_fast_path=False, ladder_batch_gate=True)),
)


def make_builder(**kw):
    cfg = SimConfig(**{**BASE, **kw})

    def build(rad):
        floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=3,
                          fric_coeff=0.25)
        sphere = make_body(SphereShape(rad), subdiv=2, fric_coeff=0.25)
        poses = jnp.array([[1.0, 0, 0, 0, 0.0, -0.5, 0.0],
                           [1.0, 0, 0, 0, 0.0, 0.4999, 0.0]])
        return make_world([floor, sphere], poses, jnp.zeros((2, 6)),
                          joints=(TotalConstraint3D(body1=0),),
                          forces=((), (Gravity3D(10.0),)), cfg=cfg)

    return build


# ---- forward (vmap path) ----
for tag, kw in MODES:
    spec, state0 = make(jnp.asarray(0.5), **kw)
    per = perframe(lambda st: step_frame(spec, st)[0], state0)
    print(f"fwd  B=1  [{tag:7s}]: {per*1e6:8.0f} us/frame", flush=True)
    if tag == "fast":
        continue  # per-lane cond mode is not meant for vmap
    for B in (16,):
        st = bstate(state0, B)
        per = perframe(jax.vmap(lambda s: step_frame(spec, s)[0]), st)
        print(f"fwd  B={B:<2d} [{tag:7s}]: {per*1e6:8.0f} us/frame "
              f"({per*1e6/B:.0f} us/lane)", flush=True)

# ---- batched-native (explicit batch axis, physics/batched.py) ----
from diffsdfsim_tpu.physics import make_world_batched, step_frame_batched

build = make_builder()
for B in (1, 4, 16):
    rads = jnp.full((B,), 0.5)
    spec, bodies_b, state_b = make_world_batched(build, rads)
    per = perframe(lambda st: step_frame_batched(spec, bodies_b, st)[0], state_b)
    print(f"fwd  B={B:<2d} [bnative]: {per*1e6:8.0f} us/frame "
          f"({per*1e6/B:.0f} us/lane)", flush=True)


def fb_bnative(spec, bodies_b):
    def fb(st):
        def loss(s):
            s2 = step_frame_batched(spec, bodies_b, s)[0]
            return jnp.sum(s2.pos ** 2), s2

        (l, s2), g = jax.value_and_grad(loss, has_aux=True, allow_int=True)(st)
        return s2

    return fb


per1 = None
for B in (1, 4, 16):
    rads = jnp.full((B,), 0.5)
    spec, bodies_b, state_b = make_world_batched(build, rads)
    per = perframe(fb_bnative(spec, bodies_b), state_b)
    if B == 1:
        per1 = per
    print(f"f+b  B={B:<2d} [bnative]: {per*1e6:8.0f} us/frame "
          f"({per*1e6/B:.0f} us/lane, scaling {per1/(per/B):.2f}x eff)",
          flush=True)
