"""External forces (reference `sdf_physics/physics3d/forces.py`).

A force is a callable ``f(t) -> (6,)`` 6-vector ``[torque, force]`` in world
frame; bodies hold a static tuple of them. Gravity caches ``m * g * DOWN``
(DOWN = -y, forces.py:54-63). Impulse helpers match the reference windows
(force only for t < 0.1 s).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import default_dtype


def _v6(vals):
    return jnp.asarray(vals, dtype=default_dtype())


def UP():
    return _v6([0, 0, 0, 0, 1, 0])


def DOWN():
    return _v6([0, 0, 0, 0, -1, 0])


def RIGHT():
    return _v6([0, 0, 0, 1, 0, 0])


def LEFT():
    return _v6([0, 0, 0, -1, 0, 0])


def FRONT():
    return _v6([0, 0, 0, 0, 0, 1])


def BACK():
    return _v6([0, 0, 0, 0, 0, -1])


def ROTX():
    return _v6([1, 0, 0, 0, 0, 0])


def ROTY():
    return _v6([0, 1, 0, 0, 0, 0])


def ROTZ():
    return _v6([0, 0, 1, 0, 0, 0])


def ZERO6():
    return _v6([0, 0, 0, 0, 0, 0])


class ExternalForce3D:
    """force(t) = force_func(t) * multiplier (reference forces.py:48-66)."""

    def __init__(self, force_func=None, multiplier=1.0):
        self.force_func = force_func if force_func is not None else (lambda t: DOWN())
        self.multiplier = multiplier

    def force(self, t, body):
        return self.force_func(t) * self.multiplier


class Gravity3D(ExternalForce3D):
    """m * g * DOWN (reference forces.py:69-85)."""

    def __init__(self, g=10.0):
        self.g = g

    def force(self, t, body):
        return DOWN() * body.mass * self.g


def vert_impulse(t):
    return jnp.where(t < 0.1, 1.0, 0.0) * DOWN()


def hor_impulse(t):
    return jnp.where(t < 0.1, 1.0, 0.0) * RIGHT()


def rot_impulse(t):
    return jnp.where(t < 0.1, 1.0, 0.0) * ROTX()
