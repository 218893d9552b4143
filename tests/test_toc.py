"""Unit tests for the time-of-contact differential (ops/toc.py) against
hand-derived closed forms for a 1D falling contact."""

import jax
import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.ops.toc import TocArgs, gap_function, toc_dt


def falling_args(v=-3.0, y=0.95, r=0.5, a=-10.0):
    """Sphere (body1) center at height y falling at v onto floor (body2):
    contact point on sphere bottom (body frame (0,-r,0)), floor contact at
    its surface offset (0, 0.5, 0) in a floor whose origin is at -0.5, normal
    +y. With identity rotations, D(h) = n·(c2 - (c1 + pos1(h) - pos2)):
    D(h) = 0.5 - (-r + y + h v + a h²/2 - (-0.5)) = r - y - h v - a h²/2
    ... sign conventions follow the reference gap (world.py:150-171)."""
    eye = jnp.eye(3)[None]
    z3 = jnp.zeros((1, 3))
    z6 = jnp.zeros((1, 6))
    args = TocArgs(
        cs1=jnp.asarray([[0.0, -r, 0.0]]),
        cs2=jnp.asarray([[0.0, 0.5, 0.0]]),
        vs1=jnp.asarray([[0.0, 0, 0, 0, v, 0]]),
        vs2=z6,
        poss1=jnp.asarray([[0.0, y, 0.0]]),
        poss2=jnp.asarray([[0.0, -0.5, 0.0]]),
        rots1=eye,
        rots2=eye,
        ns2=jnp.asarray([[0.0, 1.0, 0.0]]),
        as1=jnp.asarray([[0.0, 0, 0, 0, a, 0]]),
        as2=z6,
    )
    return args


def test_gap_function_closed_form():
    v, y, r, a = -3.0, 0.95, 0.5, -10.0
    args = falling_args(v, y, r, a)
    for h in [0.0, 0.01, 0.05]:
        d = float(gap_function(jnp.asarray(h), args)[0])
        expected = 0.5 - (-r + y + h * v + 0.5 * a * h * h + 0.5)
        np.testing.assert_allclose(d, expected, atol=1e-12)


def test_toc_backward_ift():
    """dL/d(y) through toc_dt must equal dL_dh * (-dD/dy / dD/dh):
    dD/dh = -(v + a h), dD/dy = -1 -> dL/dy = -dL_dh / (v + a h)."""
    v, y, r, a = -3.0, 0.95, 0.5, -10.0
    h = jnp.asarray(0.02)

    def f(y_):
        args = falling_args(v, float(0) + y_, r, a)
        mask = jnp.asarray([True])
        return toc_dt(h, args, mask)

    g = float(jax.grad(lambda y_: f(y_))(jnp.asarray(y)))
    dD_dh = -(v + a * float(h))  # = 3.2 > 0: "into collision", kept by mask
    expected = -(-1.0) / dD_dh * 1.0  # -w * dD/dy * dL_dh with w = 1/dD_dh
    np.testing.assert_allclose(g, expected, rtol=1e-9)


def test_toc_backward_radius_direction():
    """Larger sphere radius -> earlier contact: dL/dr = +1/dD_dh via
    cs1 = (0,-r,0): dD/dcs1_y = -n·(R2ᵀR1 ...) = ... sign check only."""
    v, y, r, a = -3.0, 0.95, 0.5, -10.0
    h = jnp.asarray(0.02)

    def f(r_):
        args = falling_args(v, y, float(0) + r_, a)
        return toc_dt(h, args, jnp.asarray([True]))

    g = float(jax.grad(f)(jnp.asarray(r)))
    # D = r - y - hv - ah²/2 -> dD/dr = +1 -> dh/dr = -1/dD_dh < 0
    dD_dh = -(v + a * float(h))
    np.testing.assert_allclose(g, -1.0 / dD_dh, rtol=1e-9)


def test_toc_masked_contact_no_grads():
    v, y, r, a = -3.0, 0.95, 0.5, -10.0
    h = jnp.asarray(0.02)

    def f(y_):
        args = falling_args(v, y_, r, a)
        return toc_dt(h, args, jnp.asarray([False]))

    g = float(jax.grad(f)(jnp.asarray(y)))
    assert g == 0.0


def test_toc_separating_contact_masked():
    """Motion OUT of collision (dD/dh < TOL/h) is masked (world.py:204)."""
    v, y, r, a = +3.0, 0.95, 0.5, 0.0  # moving up
    h = jnp.asarray(0.02)

    def f(y_):
        args = falling_args(v, y_, r, a)
        return toc_dt(h, args, jnp.asarray([True]))

    g = float(jax.grad(f)(jnp.asarray(y)))
    assert g == 0.0
