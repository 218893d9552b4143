import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsdfsim_tpu.models.igr import init_implicit_net, implicit_net_apply
from diffsdfsim_tpu.ops.pallas_kernels import grid_interp_pallas, igr_mlp_pallas
from diffsdfsim_tpu.ops.sdf import grid_interp, sphere_sdf


def test_igr_mlp_pallas_matches_reference():
    params = init_implicit_net(
        jax.random.PRNGKey(0), d_in=5, dims=(32,) * 6, skip_in=(3,), dtype=jnp.float32
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (300, 5), dtype=jnp.float32)
    ref = implicit_net_apply(params, x)
    out = igr_mlp_pallas(
        x, params.weights, params.biases, skip_in=(3,), tile=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_grid_interp_pallas_matches_gather():
    res = 17
    lin = jnp.linspace(-1, 1, res)
    gp = jnp.stack(jnp.meshgrid(lin, lin, lin, indexing="ij"), axis=-1)
    grid = sphere_sdf(gp.reshape(-1, 3), 0.5).reshape(res, res, res).astype(jnp.float32)
    inds = jax.random.uniform(
        jax.random.PRNGKey(2), (50, 3), minval=0.0, maxval=res - 1.001
    ).astype(jnp.float32)
    ref = grid_interp(grid, inds)
    out = grid_interp_pallas(grid, inds, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
