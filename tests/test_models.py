import jax
import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.models.igr import (
    init_implicit_net,
    implicit_net_apply,
    make_decoder,
    softplus_beta,
)


def test_softplus_matches_torch_semantics():
    import torch

    x = np.linspace(-1, 1, 101)
    ours = np.asarray(softplus_beta(jnp.asarray(x)))
    theirs = torch.nn.functional.softplus(torch.tensor(x), beta=100).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-7)


def test_geometric_init_approximates_sphere():
    """IGR geometric init: net(latent=0, x) ≈ |x| - r."""
    key = jax.random.PRNGKey(0)
    latent_size = 2
    params = init_implicit_net(key, d_in=3 + latent_size, radius_init=0.7)
    dec = make_decoder(params)
    pts = jax.random.normal(jax.random.PRNGKey(1), (256, 3)) * 0.8
    sdf = dec(pts, jnp.zeros(latent_size))
    expected = jnp.linalg.norm(pts, axis=-1) - 0.7
    # geometric init is approximate (random hidden layers); require strong
    # monotone agreement with the target sphere SDF
    c = np.corrcoef(np.asarray(sdf), np.asarray(expected))[0, 1]
    assert c > 0.75, c


def test_skip_connection_shapes():
    params = init_implicit_net(jax.random.PRNGKey(0), d_in=5, dims=(16,) * 8, skip_in=(4,))
    out = implicit_net_apply(params, jnp.ones((7, 5)))
    assert out.shape == (7,)
    # layer 3 output must leave room for the concat at layer 4
    assert params.weights[4].shape[1] == 16
    assert params.weights[3].shape[0] == 16 - 5


def test_torch_checkpoint_roundtrip(tmp_path):
    """Save a fake IGR torch checkpoint and convert it."""
    import torch

    from diffsdfsim_tpu.models.igr import load_torch_checkpoint

    dims = [8, 16, 16, 1]
    sd = {}
    for i in range(len(dims) - 1):
        sd[f"lin{i}.weight"] = torch.randn(dims[i + 1], dims[i], dtype=torch.float64)
        sd[f"lin{i}.bias"] = torch.randn(dims[i + 1], dtype=torch.float64)
    mp = tmp_path / "model.pth"
    lp = tmp_path / "latent.pth"
    torch.save({"model_state_dict": sd}, mp)
    lat = torch.randn(5, 2, dtype=torch.float64)
    torch.save({"latent_codes": lat}, lp)

    params, codes = load_torch_checkpoint(str(mp), str(lp), skip_in=())
    assert codes.shape == (5, 2)
    x = jnp.ones((3, 8))
    out = implicit_net_apply(params, x)
    # compare against torch forward
    with torch.no_grad():
        tx = torch.ones(3, 8, dtype=torch.float64)
        for i in range(len(dims) - 1):
            tx = torch.nn.functional.linear(tx, sd[f"lin{i}.weight"], sd[f"lin{i}.bias"])
            if i < len(dims) - 2:
                tx = torch.nn.functional.softplus(tx, beta=100)
    np.testing.assert_allclose(np.asarray(out), tx.numpy()[:, 0], atol=1e-10)


def test_latent_shape_in_body():
    """LatentShape end-to-end: a sphere-initialized IGR decoder works as a
    simulation body shape with differentiable latent."""
    from diffsdfsim_tpu.physics.shapes import LatentShape, query_sdfs

    latent_size = 2
    params = init_implicit_net(jax.random.PRNGKey(0), d_in=3 + latent_size, radius_init=0.5)
    dec = make_decoder(params)
    shape = LatentShape(
        latent=jnp.zeros(latent_size), scale_=jnp.asarray(1.0), decoder=dec
    )
    pts = jnp.array([[0.3, 0.0, 0.0], [0.9, 0.0, 0.0]])
    sdfs, grads = query_sdfs(shape, pts)
    assert sdfs.shape == (2,)
    assert np.all(np.isfinite(np.asarray(grads)))

    g = jax.grad(lambda z: jnp.sum(query_sdfs(
        LatentShape(latent=z, scale_=jnp.asarray(1.0), decoder=dec), pts,
        return_grads=False)))(jnp.zeros(latent_size))
    assert np.all(np.isfinite(np.asarray(g)))
