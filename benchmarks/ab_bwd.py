#!/usr/bin/env python
"""A/B harness for backward-pass perf knobs on the bench workload.

Measures single-rollout fwd+bwd (and fwd-only) marginal cost for a list of
SimConfig overrides, using bench.py's tunnel-robust marginal-cost timing.
One jit object per config, run strictly sequentially (one TPU process).

    python benchmarks/ab_bwd.py [name ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

import bench

# bench._build bakes the SHIPPED knob values (substep_unroll=4,
# replay_mode="emit") into its base dict, so re-measuring a knob requires an
# override that explicitly RESETS it — an empty dict would compare the
# shipped config against itself (ADVICE r4 medium).
CONFIGS = {
    "base": {"substep_unroll": 1},
    "sub4": {"substep_unroll": 4},
    "frame2": {"frame_unroll": 2},
    "sub4frame2": {"substep_unroll": 4, "frame_unroll": 2},
    "dots": {"remat_policy": "dots"},
    "sub4dots": {"substep_unroll": 4, "remat_policy": "dots"},
    "noremat": {"remat_replay": False},
    # round-5 replay-emission A/B (world._replay_emit vs legacy inline)
    "inline": {"replay_mode": "inline"},
    "emit": {"replay_mode": "emit"},
    "emit_noremat": {"replay_mode": "emit", "remat_replay": False},
}

N_BIG = 10


def measure(loss_fn):
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    fwd_fn = jax.jit(loss_fn)
    rad = jnp.asarray(bench.RAD)
    t_c0 = time.perf_counter()
    for w in range(3):
        _, g = grad_fn(rad + 1e-5 * w)
        _ = float(g)
    compile_s = time.perf_counter() - t_c0
    for w in range(2):
        _ = float(fwd_fn(rad + 1e-5 * w))

    def run_n(fn, n, scalar):
        def run(base):
            t0 = time.perf_counter()
            outs = [fn(rad + 1e-4 * (base + i)) for i in range(n)]
            for o in outs:
                _ = float(scalar(o))
            return time.perf_counter() - t0

        return run

    dt, _, spread = bench._marginal_cost(
        run_n(grad_fn, 1, lambda o: o[1]), run_n(grad_fn, N_BIG, lambda o: o[1]),
        N_BIG, k=2,
    )
    dt_f, _, _ = bench._marginal_cost(
        run_n(fwd_fn, 1, lambda o: o), run_n(fwd_fn, N_BIG, lambda o: o),
        N_BIG, k=2,
    )
    return dict(
        steps_per_sec=round(bench.N_FRAMES / dt, 1),
        fwd_steps_per_sec=round(bench.N_FRAMES / dt_f, 1),
        bwd_share=round(max(1.0 - dt_f / dt, 0.0), 3),
        spread=round(spread, 3),
        compile_s=round(compile_s, 1),
    )


def measure_batch(batch_loss_fn, nb=16):
    """Aggregate lane-steps/s of the batched-native path under the same
    overrides — the knob must be validated on BOTH paths before shipping it
    as a default (ADVICE r3: substep_unroll=4 was only A/B'd single)."""
    grad_fn = jax.jit(jax.value_and_grad(batch_loss_fn))
    rads = jnp.linspace(0.42, 0.58, nb)
    for w in range(3):
        _, g = grad_fn(rads + 1e-5 * w)
        _ = float(g[0])

    def run_n(n):
        def run(base):
            t0 = time.perf_counter()
            outs = [grad_fn(rads + 1e-4 * (base + i)) for i in range(n)]
            for _, g in outs:
                _ = float(g[0])
            return time.perf_counter() - t0

        return run

    dt, _, spread = bench._marginal_cost(run_n(1), run_n(6), 6, k=2)
    return {
        f"batch{nb}_steps_per_sec": round(bench.N_FRAMES * nb / dt, 1),
        f"batch{nb}_spread": round(spread, 3),
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    with_batch = "--batch" in sys.argv[1:]
    names = args or list(CONFIGS)
    print(f"backend={jax.default_backend()}")
    for name in names:
        over = CONFIGS[name]
        loss_fn, batch_loss_fn = bench._build(over)
        try:
            r = measure(loss_fn)
            if with_batch:
                r.update(measure_batch(batch_loss_fn))
        except Exception as e:  # keep the sweep going past one bad config
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}")
            continue
        print(f"{name:12s} {r}", flush=True)


if __name__ == "__main__":
    main()
