"""Parity of the sysid sweep backends (VERDICT r4 #3): the batched-native
rollout with per-lane Push-force leaves (run_sweep_batched: bodies_b AND
forces_b batched pytrees) must reproduce the legacy vmapped per-lane GD
(run_one under jax.vmap) — reference protocol:
experiments/system_identification/optim_sysid.py:86-101."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsdfsim_tpu.experiments.optim_sysid import (
    build_cfg,
    run_one,
    run_sweep_batched,
)


@pytest.mark.parametrize("param", ["force", "friction"])
def test_sweep_backend_parity(param):
    c = dict(
        seed=0, param=param, run_time=0.3, max_iter=3, lr=1e-1,
        min_val=0.0, max_val=0.0, mesh_subdiv=1, n_par=2,
    )
    cfg = build_cfg(c)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)

    out_v = jax.jit(jax.vmap(functools.partial(run_one, c=c, cfg=cfg)))(keys)
    out_b = jax.jit(lambda ks: run_sweep_batched(ks, c, cfg))(keys)

    np.testing.assert_allclose(
        np.array(out_b["target_theta"]), np.array(out_v["target_theta"]),
        rtol=1e-12,
    )
    # loss_hist: vmap is (B, iters), batched is (iters, B)
    np.testing.assert_allclose(
        np.array(out_b["loss_hist"]).T, np.array(out_v["loss_hist"]),
        rtol=1e-4, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.array(out_b["final_theta"]), np.array(out_v["final_theta"]),
        rtol=1e-4, atol=1e-6,
    )
