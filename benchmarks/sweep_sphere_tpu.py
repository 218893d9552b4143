"""50-seed sphere-radius sweeps on TPU (RESULTS_TPU.md tables).

Run from the repo root:
    python benchmarks/sweep_sphere_tpu.py [cfg ...] [k=v ...]
e.g. python benchmarks/sweep_sphere_tpu.py g1_t0 mesh_subdiv=3 out=sweeps_r3

Why this shape: one jitted gd_step per CONFIG, reused across seed chunks of
10 — a single 50-lane vmapped rollout+grad graph hangs the remote XLA
compiler, per-chunk processes re-pay the ~20 min compile (the persistent
cache does not intercept the axon plugin's AOT path), and re-created jit
closures miss the in-process cache. Chunked keys through one jit object is
the only arrangement that compiles once and runs 50 seeds.

Early stop matches the reference (optim_sphere.py:272-276): break when
|last_loss - loss| < conv_thresh BEFORE applying the step — per-lane frozen
(rad, opt_state) under vmap. Load-bearing for the no-TOC ablations, whose
staircase loss otherwise keeps GD wandering after convergence.
"""
import sys, time, pickle
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if "cpu_x64=1" in sys.argv[1:]:
    # reference-precision ablation mode (VERDICT r2 weak #3): f64 + tol=1e-8
    # on CPU, same sweep protocol. Must run before backend init — the axon
    # plugin ignores JAX_PLATFORMS (CLAUDE.md).
    sys.argv.remove("cpu_x64=1")
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp, numpy as np
import optax
from diffsdfsim_tpu.experiments.optim_sphere import (DEFAULTS, build_cfg,
                                                     make_loss_batched,
                                                     sample_params)

ALL_CONFIGS = {
    "g1_t0": dict(use_gravity=True, use_toc_diff=False),
    "g1_t1": dict(use_gravity=True, use_toc_diff=True),
    "g0_t1": dict(use_gravity=False, use_toc_diff=True),
    "g0_t0": dict(use_gravity=False, use_toc_diff=False),
}

names, overrides, outdir = [], {}, "sweeps_r2c"
for a in sys.argv[1:]:
    if "=" in a:
        k, v = a.split("=", 1)
        if k == "out":
            outdir = v
        else:
            overrides[k] = type(DEFAULTS.get(k, ""))(v) if k in DEFAULTS else int(v)
    else:
        names.append(a)
names = names or list(ALL_CONFIGS)

OUT = Path("outputs") / outdir
OUT.mkdir(parents=True, exist_ok=True)
N_CHUNKS, CHUNK = 5, 10
CHUNK0 = int(overrides.pop("chunk0", 0))  # resume: skip chunks < CHUNK0, append to pkl
for tag in names:
    c = dict(DEFAULTS)
    c.update(ALL_CONFIGS[tag])
    c.update(overrides)
    c["n_par"] = CHUNK  # seed batch size per chunk
    cfg = build_cfg(c)
    # batched-native rollout (physics/batched.py): whole-batch substep +
    # staged-ladder gating instead of vmap's run-both-branches
    target_traj_fn, losses = make_loss_batched(c, cfg)
    tgt_j = jax.jit(target_traj_fn)
    opt = optax.sgd(c["lr"]) if c["optimizer"] == "GD" else optax.adam(c["lr"])
    lo, hi = c["min_dim"], c["max_dim"]
    thresh = c["conv_thresh"]

    @jax.jit
    def gd_step(rad, opt_state, last, done, tgt):
        def f(r):
            l = losses(r, tgt)
            return jnp.sum(l), l

        (_, val), g = jax.value_and_grad(f, has_aux=True)(rad)
        done = done | (jnp.abs(last - val) < thresh)
        upd, new_opt_state = opt.update(g, opt_state)
        new_rad = jnp.clip(rad + upd, lo, hi)
        rad = jnp.where(done, rad, new_rad)
        opt_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), opt_state, new_opt_state
        )
        return rad, opt_state, val, done

    all_err = []
    if CHUNK0 > 0 and (OUT / f"{tag}.pkl").exists():
        prev = pickle.load(open(OUT / f"{tag}.pkl", "rb"))["errs"]
        all_err.append(prev[: CHUNK0 * CHUNK])
        print(f"{tag}: resuming at chunk {CHUNK0} with {all_err[0].size} prior errs",
              flush=True)
    for chunk in range(CHUNK0, N_CHUNKS):
        t0 = time.time()
        keys = jax.random.split(jax.random.PRNGKey(100 + chunk), CHUNK)
        target_rad, start_rad = jax.vmap(lambda k: sample_params(k, c))(keys)
        tgt = tgt_j(target_rad)
        rad = start_rad
        opt_state = opt.init(rad)
        last = jnp.full_like(rad, 1e10)
        done = jnp.zeros(rad.shape, dtype=bool)
        for _ in range(c["max_iter"]):
            rad, opt_state, last, done = gd_step(rad, opt_state, last, done, tgt)
            if bool(jnp.all(done)):
                break
        err = np.abs(np.asarray(rad) - np.asarray(target_rad))
        all_err.append(err)
        print(f"{tag} chunk {chunk}: {time.time()-t0:.0f}s "
              f"mean {err.mean():.4f}", flush=True)
        with open(OUT / f"{tag}.pkl", "wb") as f:
            pickle.dump(dict(config=c, errs=np.concatenate(all_err)), f)
    e = np.concatenate(all_err)
    print(f"== {tag}: n={e.size} min={e.min():.2e} mean={e.mean():.4f} "
          f"max={e.max():.3f}", flush=True)
print("ALL DONE")
