#!/usr/bin/env python
"""Component-level TPU profiling of the hot step path.

Times each hot component by chaining K dependent iterations inside one jit
(lax.scan) and measuring the MARGINAL cost across N pipelined launches —
the same tunnel-latency-robust methodology as bench.py.

Usage: python benchmarks/profile_step.py [component ...]
Components: linalg pdipm fw recompute stepframe rollout
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

K_SMALL = 64
K_BIG = 256


def _chain(body_fn, k):
    """K dependent iterations of body_fn inside one jit."""
    def chained(x):
        def f(c, _):
            return body_fn(c), None

        out, _ = jax.lax.scan(f, x, None, length=k)
        return out

    return jax.jit(chained)


def _timed_call(fn, arg, n=4):
    # min over n pipelined-call timings; each call is launch+fetch, so the
    # ~30 ms tunnel per-call overhead is constant and cancels in the K-diff
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(arg)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter_time(body_fn, arg, k_small=K_SMALL, k_big=K_BIG):
    """Seconds per iteration of body_fn: difference of two chain lengths
    cancels the fixed per-launch tunnel overhead (~30 ms)."""
    f_small = _chain(body_fn, k_small)
    f_big = _chain(body_fn, k_big)
    _timed_call(f_small, arg, n=2)  # warmup/compile
    _timed_call(f_big, arg, n=2)
    t_small = _timed_call(f_small, arg)
    t_big = _timed_call(f_big, arg)
    return max(t_big - t_small, 1e-12) / (k_big - k_small)


def build_scene(drop=False, remat_frames=False):
    from diffsdfsim_tpu.config import SimConfig
    from diffsdfsim_tpu.physics import (
        BoxShape,
        Gravity3D,
        SphereShape,
        TotalConstraint3D,
        make_body,
        make_world,
    )

    cfg = SimConfig(
        fric_dirs=8,
        max_contacts_per_pair=4,
        max_contacts_total=4,
        mesh_subdiv=2,
        max_substeps=4,
        max_bisect=8,
        tol=1e-5,
        remat_frames=remat_frames,
        # the resting pose (y=0.4999) starts 1e-4 penetrated on purpose —
        # worst-case bisection pressure — so skip the construction assert
        strict_no_penetration=False,
    )
    floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=3, fric_coeff=0.25)
    sphere = make_body(SphereShape(0.5), subdiv=2, fric_coeff=0.25)
    # resting-contact pose: sphere just touching the floor top (y = 0.5);
    # drop=True starts at bench.py's drop height (the bounce workload)
    y0 = 1.2 if drop else 0.4999
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
    return spec, state


def main():
    argv = [a for a in sys.argv[1:] if a not in ("drop", "remat")]
    drop = "drop" in sys.argv[1:]
    remat = "remat" in sys.argv[1:]
    want = set(argv) or {
        "linalg",
        "pdipm",
        "fw",
        "recompute",
        "stepframe",
        "rollout",
    }
    if "rollout_fwd" in want or "rollout_bwd" in want:
        want.add("rollout")
    print(f"backend={jax.default_backend()} devices={len(jax.devices())} drop={drop}")
    results = {}

    if "linalg" in want:
        key = jax.random.PRNGKey(0)
        n = 46
        S = jax.random.normal(key, (n, n)) + n * jnp.eye(n)
        Sb = jax.random.normal(key, (16, n, n)) + n * jnp.eye(n)
        SPD = S @ S.T + n * jnp.eye(n)

        def lu_body(x):
            y = jnp.linalg.solve(S + x[0] * 1e-30, x)
            return y / jnp.linalg.norm(y)

        def lub_body(x):
            y = jnp.linalg.solve(Sb + x[:, 0, None, None] * 1e-30, x[..., None])[..., 0]
            return y / jnp.linalg.norm(y, axis=-1, keepdims=True)

        def inv_body(x):
            y = jnp.linalg.inv(S + x[0] * 1e-30) @ x
            return y / jnp.linalg.norm(y)

        def chol_body(x):
            c = jnp.linalg.cholesky(SPD + x[0] * 1e-30)
            y = jax.scipy.linalg.cho_solve((c, True), x)
            return y / jnp.linalg.norm(y)

        x0 = jnp.ones((n,))
        xb0 = jnp.ones((16, n))
        results["lu_solve 46x46"] = per_iter_time(lu_body, x0)
        results["lu_solve b16 46x46"] = per_iter_time(lub_body, xb0)
        results["inv+matvec 46x46"] = per_iter_time(inv_body, x0)
        results["chol+solve 46x46"] = per_iter_time(chol_body, x0)

    if want & {"pdipm", "fw", "recompute", "stepframe", "rollout", "probe",
               "ladder", "stepdt", "finish", "stepframebwd"}:
        spec, state = build_scene(drop=drop, remat_frames=remat)
        from diffsdfsim_tpu.physics.contacts import find_contacts, search_contacts
        from diffsdfsim_tpu.physics.engine import solve_dynamics
        from diffsdfsim_tpu.physics.world import step_frame

        cfg = spec.cfg

    if "probe" in want:
        from diffsdfsim_tpu.physics.world import _accept_thresh, _probe_rung0

        def pr_body(st):
            ok, (cc, sol) = _probe_rung0(
                spec, st, jnp.asarray(cfg.dt, st.pos.dtype), _accept_thresh(spec, st)
            )
            return st.replace(pos=st.pos + 1e-12 * jnp.where(ok, 1.0, 0.0))

        results["probe rung0 (solve+search)"] = per_iter_time(
            pr_body, state, k_small=16, k_big=64
        )

    if "ladder" in want:
        from diffsdfsim_tpu.physics.world import _accept_thresh, _probe_rungs

        def ld_body(st):
            found, k, raw_k, sol_k = _probe_rungs(
                spec, st, jnp.asarray(cfg.dt, st.pos.dtype),
                _accept_thresh(spec, st), 1, 2,
            )
            return st.replace(pos=st.pos + 1e-12 * k.astype(st.pos.dtype))

        results["ladder stage1 (rungs 1-2, D=2)"] = per_iter_time(
            ld_body, state, k_small=16, k_big=64
        )

        def ld_full_body(st):
            found, k, raw_k, sol_k = _probe_rungs(
                spec, st, jnp.asarray(cfg.dt, st.pos.dtype),
                _accept_thresh(spec, st), 0, cfg.max_bisect,
            )
            return st.replace(pos=st.pos + 1e-12 * k.astype(st.pos.dtype))

        results[f"ladder full (rungs 0-{cfg.max_bisect}, D={cfg.max_bisect+1})"] = per_iter_time(
            ld_full_body, state, k_small=16, k_big=64
        )

    if "pdipm" in want:
        contacts = jax.jit(
            lambda q, p: find_contacts(
                spec.bodies, q, p, spec.directed_pairs, spec.n_unordered, cfg
            )
        )(state.quat, state.pos)
        print("valid contacts:", int(jnp.sum(contacts.valid)))

        def pd_body(v):
            st = state.replace(v=v.reshape(-1, 6))
            nv = solve_dynamics(
                spec.bodies, spec.joints, spec.forces, st, contacts, cfg.dt, cfg
            )
            return 0.9 * nv + 0.1 * v

        results["solve_dynamics (PDIPM, 4 contacts)"] = per_iter_time(
            pd_body, state.v.reshape(-1), k_small=16, k_big=64
        )

    if "fw" in want:

        def fw_body(pos):
            cache = search_contacts(spec.bodies, state.quat, pos, spec.directed_pairs, cfg)
            mp = jnp.where(jnp.isfinite(cache.max_pen_all), cache.max_pen_all, 0.0)
            return pos + 1e-12 * mp

        results["search_contacts (FW both pairs)"] = per_iter_time(
            fw_body, state.pos, k_small=16, k_big=64
        )

    if "recompute" in want:
        cache0 = jax.jit(
            lambda q, p: search_contacts(spec.bodies, q, p, spec.directed_pairs, cfg)
        )(state.quat, state.pos)

        def rc_body(pos):
            cts = find_contacts(
                spec.bodies, state.quat, pos, spec.directed_pairs,
                spec.n_unordered, cfg, cache=cache0,
            )
            return pos + 1e-12 * jnp.sum(cts.pen)

        results["find_contacts recompute (cached)"] = per_iter_time(
            rc_body, state.pos, k_small=16, k_big=64
        )

    if "stepdt" in want:
        from diffsdfsim_tpu.physics.world import step_dt

        def sd_body(st):
            st2, _rec = step_dt(spec, st, jnp.asarray(cfg.dt, st.pos.dtype))
            return st2

        results["step_dt (probe + finish)"] = per_iter_time(
            sd_body, state, k_small=8, k_big=32
        )

    if "finish" in want:
        from diffsdfsim_tpu.physics.world import (
            _accept_thresh,
            _probe_ladder,
            finish_step,
        )

        dt0 = jnp.asarray(cfg.dt, state.pos.dtype)
        k0, ok0, cache0 = jax.jit(
            lambda st: _probe_ladder(spec, st, dt0, _accept_thresh(spec, st))
        )(state)

        def fin_body(st):
            st2, _rec = finish_step(spec, st, dt0, k0, ok0, cache0)
            return st2

        results["finish_step (replay tail, cached probe)"] = per_iter_time(
            fin_body, state, k_small=8, k_big=32
        )

        def fin_grad_body(st):
            def loss(pos):
                st2, _rec = finish_step(
                    spec, st.replace(pos=pos), dt0, k0, ok0, cache0
                )
                return jnp.sum(st2.pos**2) + jnp.sum(st2.v**2)

            g = jax.grad(loss)(st.pos)
            return st.replace(pos=st.pos + 0.0 * g)

        results["finish_step (fwd+bwd, cached probe)"] = per_iter_time(
            fin_grad_body, state, k_small=8, k_big=32
        )

    if "stepframebwdgeom" in want or "finishbwdgeom" in want:
        # isolate the geometry-cotangent backward (bench.py differentiates
        # wrt sphere radius, so verts + SDF params carry cotangents through
        # every substep's contact recompute — the pos-grad profile misses it)
        from diffsdfsim_tpu.physics.world import _spec_with_bodies

        def _scaled_spec(s):
            b = spec.bodies[1]
            b2 = b.replace(
                verts=b.verts * s,
                shape=jax.tree_util.tree_map(lambda x: x * s, b.shape),
            )
            return _spec_with_bodies(spec, (spec.bodies[0], b2))

    if "stepframebwdgeom" in want:

        def sf_geom_body(st):
            def loss(s):
                st2, _, _, _ = step_frame(_scaled_spec(s), st)
                return jnp.sum(st2.pos**2) + jnp.sum(st2.v**2)

            g = jax.grad(loss)(jnp.asarray(1.0, st.pos.dtype))
            return st.replace(pos=st.pos + 0.0 * g)

        results["step_frame (fwd+bwd wrt geometry)"] = per_iter_time(
            sf_geom_body, state, k_small=8, k_big=32
        )

    if "finishbwdgeom" in want:
        from diffsdfsim_tpu.physics.world import (
            _accept_thresh as _ath,
            _probe_ladder as _pl,
            finish_step as _fs,
        )

        dt0g = jnp.asarray(cfg.dt, state.pos.dtype)
        k0g, ok0g, cache0g = jax.jit(
            lambda st: _pl(spec, st, dt0g, _ath(spec, st))
        )(state)

        def fin_geom_body(st):
            def loss(s):
                st2, _rec = _fs(_scaled_spec(s), st, dt0g, k0g, ok0g, cache0g)
                return jnp.sum(st2.pos**2) + jnp.sum(st2.v**2)

            g = jax.grad(loss)(jnp.asarray(1.0, st.pos.dtype))
            return st.replace(pos=st.pos + 0.0 * g)

        results["finish_step (fwd+bwd wrt geometry)"] = per_iter_time(
            fin_geom_body, state, k_small=8, k_big=32
        )

    if "stepframebwdfull" in want:
        # seed cotangents on the FULL output state (incl. stored contacts
        # and last_dt) — what the rollout chain actually demands of each
        # frame's transpose; the pos/v-only loss lets XLA DCE the stored-
        # contacts and TOC-pairing cotangent paths
        def sf_grad_full_body(st):
            def loss(pos):
                st2, _, _, _ = step_frame(spec, st.replace(pos=pos))
                leaves = jax.tree_util.tree_leaves(st2)
                return sum(
                    jnp.sum(x.astype(st.pos.dtype) ** 2)
                    for x in leaves
                    if jnp.issubdtype(x.dtype, jnp.floating)
                )

            g = jax.grad(loss)(st.pos)
            return st.replace(pos=st.pos + 0.0 * g)

        results["step_frame (fwd+bwd, full-state cotangents)"] = per_iter_time(
            sf_grad_full_body, state, k_small=8, k_big=32
        )

    if "stepframebwd" in want:

        def sf_grad_body(st):
            def loss(pos):
                st2, _, _, _ = step_frame(spec, st.replace(pos=pos))
                return jnp.sum(st2.pos**2) + jnp.sum(st2.v**2)

            g = jax.grad(loss)(st.pos)
            return st.replace(pos=st.pos + 0.0 * g)

        results["step_frame (fwd+bwd)"] = per_iter_time(
            sf_grad_body, state, k_small=8, k_big=32
        )

    if "stepframe" in want:

        def sf_body(st):
            st2, _, _, _ = step_frame(spec, st)
            return st2

        results["step_frame (fwd)"] = per_iter_time(
            sf_body, state, k_small=8, k_big=32
        )

    if "rollout" in want:
        from diffsdfsim_tpu.physics import rollout

        def make_loss(n):
            def loss(st):
                final, traj = rollout(spec, st, n_frames=n)
                return jnp.sum(traj.pos[:, :, 1, :] ** 2 * traj.valid[:, :, None])

            return loss

        def frames_diff(make_fn):
            f_small = jax.jit(make_fn(make_loss(16)))
            f_big = jax.jit(make_fn(make_loss(64)))
            _timed_call(f_small, state, n=2)
            _timed_call(f_big, state, n=2)
            return max(
                _timed_call(f_big, state) - _timed_call(f_small, state), 1e-12
            ) / (64 - 16)

        if "rollout_bwd" not in want:
            results["rollout frame (fwd only)"] = frames_diff(lambda l: l)
        if "rollout_fwd" not in want:
            results["rollout frame (fwd+bwd)"] = frames_diff(
                lambda l: (lambda st: jax.grad(lambda p: l(st.replace(pos=p)))(st.pos))
            )

    print()
    for k, v in results.items():
        print(f"{k:42s} {v * 1e6:10.1f} us")


if __name__ == "__main__":
    main()
