"""In-repo tiny IGR shape-space training (models/igr_train.py): the trained
codes must decode to genuinely distinct shapes (sphere vs box), unlike the
geometric-init fallback."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.models.igr import make_decoder
from diffsdfsim_tpu.models.igr_train import (
    default_shape_fns,
    load_or_train,
    train_tiny_shapespace,
)


def test_trained_space_decodes_distinct_shapes(tmp_path):
    params, codes = load_or_train(
        str(tmp_path / "space.pkl"), key=jax.random.PRNGKey(7),
        n_steps=600, n_pts=256,
    )
    dec = make_decoder(params)
    fns = default_shape_fns()
    pts = jax.random.uniform(jax.random.PRNGKey(0), (256, 3), minval=-1, maxval=1)
    errs = []
    for i, fn in enumerate(fns):
        pred = np.asarray(dec(pts, codes[i]))
        true = np.asarray(fn(pts))
        errs.append(np.sqrt(np.mean((pred - true) ** 2)))
    assert max(errs) < 0.12, f"decode rmse too high: {errs}"
    # the two codes decode to DIFFERENT fields
    d0 = np.asarray(dec(pts, codes[0]))
    d1 = np.asarray(dec(pts, codes[1]))
    assert np.sqrt(np.mean((d0 - d1) ** 2)) > 0.05

    # cache round-trip gives identical decode
    params2, codes2 = load_or_train(str(tmp_path / "space.pkl"))
    dec2 = make_decoder(params2)
    np.testing.assert_allclose(
        np.asarray(dec2(pts, codes2[0])), np.asarray(dec(pts, codes[0])), rtol=1e-6
    )
