"""Smoke + gradient-signal test for the inertia-fitting shapespace experiment
(reference `experiments/inertia_fitting/optim_shapespace.py`)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.experiments.optim_shapespace_inertia import (
    DEFAULTS,
    build_cfg,
    run_one,
    simulate,
)
from diffsdfsim_tpu.experiments.optim_shapespace import load_decoder


def _tiny_config(**kw):
    c = dict(DEFAULTS)
    c.update(run_time=0.4, max_iter=3, mesh_subdiv=1, latent_size=2)
    c.update(kw)
    return c


def test_spin_response_latent_gradient():
    """d(final angular velocity)/d(latent) must be finite and nonzero — the
    whole experiment's signal flows through the Mirtich inertia integrals."""
    c = _tiny_config()
    cfg = build_cfg(c)
    decoder, codes = load_decoder(c)
    torque_dir = jnp.asarray([0.0, 0.0, 1.0])

    def omega_norm(z):
        final, _ = simulate(z, torque_dir, decoder, c, cfg)
        return jnp.sum(final.v[0, :3] ** 2)

    z0 = codes[0]
    val, g = jax.jit(jax.value_and_grad(omega_norm))(z0)
    assert np.isfinite(float(val)) and float(val) > 0.0  # body does spin
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.linalg.norm(g) > 0.0


def test_run_one_improves_loss():
    c = _tiny_config(max_iter=4, lr=5e-3)
    cfg = build_cfg(c)
    decoder, codes = load_decoder(c)
    out = jax.jit(
        lambda k: run_one(k, decoder, codes, c, cfg)
    )(jax.random.PRNGKey(0))
    loss = np.asarray(out["loss_hist"])
    dist = np.asarray(out["dist_hist"])
    assert np.all(np.isfinite(loss)) and np.all(np.isfinite(dist))
    assert loss.shape == (4,)
    # final chamfer recorded and finite
    assert np.isfinite(float(out["final_chamfer"]))
