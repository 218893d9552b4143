#!/usr/bin/env python
"""Component-level profile of the BATCHED-NATIVE step at B=16 on the bench
bounce workload (physics/batched.py) — where does the 244 us/lane-frame go?

Methodology: chain K dependent iterations of each component inside one jit
and take the marginal cost over two chain lengths (cancels the axon tunnel's
per-call RPC overhead; see bench.py).

Two representative states:
  - rest : all 16 lanes resting on the floor (contact, rung-0 accept)
  - mixed: lanes mid-rollout at frame 30 (staggered bounce/roll/flight —
           the regime the batched bench actually spends its time in)

    python benchmarks/profile_batch2.py [rest mixed ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

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
from diffsdfsim_tpu.physics import batched as BT
from diffsdfsim_tpu.physics.world import _accept_thresh, _probe_rung0, _probe_rungs, _replay, _spec_with_bodies

B = 16
K_SMALL, K_BIG = 8, 32


def _chain(body_fn, k):
    def chained(x):
        def f(c, _):
            return body_fn(c), None

        out, _ = jax.lax.scan(f, x, None, length=k)
        return out

    return jax.jit(chained)


def _timed_call(fn, arg, n=4):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(arg)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter_time(body_fn, arg, k_small=K_SMALL, k_big=K_BIG):
    f_small = _chain(body_fn, k_small)
    f_big = _chain(body_fn, k_big)
    _timed_call(f_small, arg, n=2)
    _timed_call(f_big, arg, n=2)
    t_small = _timed_call(f_small, arg)
    t_big = _timed_call(f_big, arg)
    return max(t_big - t_small, 1e-12) / (k_big - k_small)



def _perturb(st, x):
    """state + 1e-12 * per-lane scalar (keeps the chain dependent)."""
    v = jnp.sum(jnp.reshape(x.astype(st.pos.dtype), (x.shape[0], -1)), axis=-1)
    return st.replace(pos=st.pos + 1e-12 * v[:, None, None])

def build(rad, y0=1.2):
    cfg = SimConfig(fric_dirs=8, max_contacts_per_pair=4, max_contacts_total=4,
                    mesh_subdiv=2, max_substeps=4, max_bisect=8, tol=1e-5,
                    strict_no_penetration=False)
    floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=3,
                      fric_coeff=0.25)
    sphere = make_body(SphereShape(rad), subdiv=2, fric_coeff=0.25)
    poses = jnp.array([[1.0, 0, 0, 0, 0.0, -0.5, 0.0],
                       [1.0, 0, 0, 0, 0.0, y0, 0.0]])
    return make_world([floor, sphere], poses, jnp.zeros((2, 6)),
                      joints=(TotalConstraint3D(body1=0),),
                      forces=((), (Gravity3D(10.0),)), cfg=cfg)


def main():
    want = set(a for a in sys.argv[1:]) or {"rest", "mixed"}
    print(f"backend={jax.default_backend()}", flush=True)

    rads = jnp.linspace(0.42, 0.58, B)
    spec, bodies_b, state_drop = make_world_batched(lambda r: build(r), rads)
    cfg = spec.cfg
    dtf = jnp.full((B,), cfg.dt, state_drop.pos.dtype)

    states = {}
    if "rest" in want:
        _, bb2, st_rest = make_world_batched(
            lambda r: build(r, y0=0.4999), jnp.full((B,), 0.5)
        )
        states["rest"] = (bb2, st_rest)
    if "mixed" in want:
        mixed, _ = jax.jit(
            lambda st: rollout_batched(spec, bodies_b, st, 30)
        )(state_drop)
        states["mixed"] = (bodies_b, mixed)

    for tag, (bb, st0) in states.items():
        print(f"--- state: {tag} ---", flush=True)
        results = {}

        class _R(dict):
            def __setitem__(self, name, t):
                print(f"{name:42s} {t*1e6:9.0f} us  ({t*1e6/B:6.1f} us/lane)",
                      flush=True)
                dict.__setitem__(self, name, t)

        results = _R()

        def probe_body(st):
            k, ok, cache = BT._probe_batched(spec, bb, st, dtf)
            return _perturb(st, k)

        results["probe_batched (rung0 + ladder cond)"] = per_iter_time(probe_body, st0)

        def rung0_body(st):
            def r0(bd, s, d):
                sp = _spec_with_bodies(spec, bd)
                return _probe_rung0(sp, s, d, _accept_thresh(sp, s))

            ok, cache = jax.vmap(r0)(bb, st, dtf)
            return _perturb(st, ok)

        results["vmapped rung0 only"] = per_iter_time(rung0_body, st0)

        def rungs_body(st):
            def rr(bd, s, d):
                sp = _spec_with_bodies(spec, bd)
                return _probe_rungs(sp, s, d, _accept_thresh(sp, s), 1, 2)

            f, k, raw, sol = jax.vmap(rr)(bb, st, dtf)
            return _perturb(st, k)

        results["vmapped rungs 1-2 (D=2)"] = per_iter_time(rungs_body, st0)

        from diffsdfsim_tpu.physics.contacts import search_contacts_raw

        def fw_body(st):
            def sr(bd, q, p):
                return search_contacts_raw(bd, q, p, spec.directed_pairs, cfg)

            raw = jax.vmap(sr)(bb, st.quat, st.pos)
            mp = jnp.where(jnp.isfinite(raw.max_pen_all), raw.max_pen_all, 0.0)
            return _perturb(st, mp)

        results["vmapped FW search (both pairs)"] = per_iter_time(fw_body, st0)

        from diffsdfsim_tpu.physics.engine import probe_dynamics_batch

        def pd_body(st):
            def one(bd, s, d):
                sp = _spec_with_bodies(spec, bd)
                return probe_dynamics_batch(
                    sp.bodies, sp.joints, sp.forces, s, s.contacts, d[None], cfg
                )

            nv, sol = jax.vmap(one)(bb, st, dtf)
            return _perturb(st, jnp.sum(nv, axis=(1, 2)))

        results["vmapped PDIPM probe (D=1)"] = per_iter_time(pd_body, st0)

        def finish_body(st):
            """finish_step_batched with a FIXED probe cache (built once from
            st0): isolates the differentiable replay + TOC + record glue."""
            k, ok, cache = BT._probe_batched(spec, bb, st, dtf)
            st2, rec = BT.finish_step_batched(spec, bb, st, dtf, k, ok, cache)
            return st2.replace(t=st.t)

        # probe+finish chained is step_dt; subtract probe_batched for finish
        def replay_body(st):
            k, ok, cache = BT._probe_batched(spec, bb, st, dtf)

            def rep(bd, s, d, ca):
                from diffsdfsim_tpu.physics.world import _replay as _rp
                return _rp(_spec_with_bodies(spec, bd), s, d, ca)

            dt_k = dtf * 0.5 ** k.astype(st.pos.dtype)
            new_v, q2, p2, contacts = jax.vmap(rep)(bb, st, dt_k, cache)
            return st.replace(pos=q2[..., :3] * 0 + p2)

        results["probe + vmapped replay only"] = per_iter_time(replay_body, st0)

        def stepdt_body(st):
            st2, rec = BT.step_dt_batched(spec, bb, st, dtf)
            return st2.replace(t=st.t)  # keep t fixed so the chain state is stationary

        results["step_dt_batched (full substep)"] = per_iter_time(stepdt_body, st0)

        def frame_body(st):
            st2, had, recs, trunc = BT.step_frame_batched(spec, bb, st)
            return st2.replace(t=st.t)

        results["step_frame_batched (fwd)"] = per_iter_time(frame_body, st0)

        def frame_fb_body(st):
            def loss(s):
                s2, had, recs, trunc = BT.step_frame_batched(spec, bb, s)
                return jnp.sum(s2.pos ** 2), s2

            (l, s2), g = jax.value_and_grad(loss, has_aux=True, allow_int=True)(st)
            return s2.replace(t=st.t, pos=s2.pos + 0.0 * g.pos)

        results["step_frame_batched (fwd+bwd)"] = per_iter_time(frame_fb_body, st0)



if __name__ == "__main__":
    main()
