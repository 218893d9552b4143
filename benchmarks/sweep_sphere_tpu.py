"""50-seed sphere-radius sweeps on TPU (RESULTS_TPU.md tables).

Run from the repo root: python benchmarks/sweep_sphere_tpu.py

Why this shape: one jitted gd_step per CONFIG, reused across seed chunks of
10 — a single 50-lane vmapped rollout+grad graph hangs the remote XLA
compiler, per-chunk processes re-pay the ~20 min compile (the persistent
cache does not intercept the axon plugin's AOT path), and re-created jit
closures miss the in-process cache. Chunked keys through one jit object is
the only arrangement that compiles once and runs 50 seeds.
"""
import sys, time, pickle
from pathlib import Path
import jax, jax.numpy as jnp, numpy as np
import optax
from diffsdfsim_tpu.experiments.optim_sphere import (DEFAULTS, build_cfg, make_loss,
                                                     sample_params)

OUT = Path("outputs/sweeps_r2c"); OUT.mkdir(parents=True, exist_ok=True)
CONFIGS = [
    ("g1_t0", dict(use_gravity=True, use_toc_diff=False)),
    ("g1_t1", dict(use_gravity=True, use_toc_diff=True)),
    ("g0_t1", dict(use_gravity=False, use_toc_diff=True)),
    ("g0_t0", dict(use_gravity=False, use_toc_diff=False)),
]
N_CHUNKS, CHUNK = 5, 10
for tag, over in CONFIGS:
    c = dict(DEFAULTS); c.update(over)
    cfg = build_cfg(c)
    target_traj_fn, loss_fn = make_loss(c, cfg)
    tgt_j = jax.jit(jax.vmap(target_traj_fn))
    opt = optax.sgd(c["lr"]) if c["optimizer"] == "GD" else optax.adam(c["lr"])
    lo, hi = c["min_dim"], c["max_dim"]

    @jax.jit
    def gd_step(rad, opt_state, tgt):
        val, g = jax.vmap(jax.value_and_grad(loss_fn))(rad, tgt)
        upd, opt_state = opt.update(g, opt_state)
        return jnp.clip(rad + upd, lo, hi), opt_state, val

    all_err = []
    for chunk in range(N_CHUNKS):
        t0 = time.time()
        keys = jax.random.split(jax.random.PRNGKey(100 + chunk), CHUNK)
        target_rad, start_rad = jax.vmap(lambda k: sample_params(k, c))(keys)
        tgt = tgt_j(target_rad)
        rad = start_rad
        opt_state = opt.init(rad)
        for _ in range(c["max_iter"]):
            rad, opt_state, val = gd_step(rad, opt_state, tgt)
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
