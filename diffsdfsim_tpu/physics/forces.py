"""External forces (reference `sdf_physics/physics3d/forces.py`).

A force is a callable ``f(t) -> (6,)`` 6-vector ``[torque, force]`` in world
frame; bodies hold a static tuple of them. Gravity caches ``m * g * DOWN``
(DOWN = -y, forces.py:54-63). Impulse helpers match the reference windows
(force only for t < 0.1 s).

Force objects are registered JAX pytrees: instance attributes holding
arrays/tracers flatten as leaves, everything else (callables, python
scalars) is static aux data. This lets the stepping core pass
``spec.forces`` as explicit traced operands — required both by the
replay-emission ``custom_vjp`` (world.py; closed-over tracers are illegal
in custom_vjp) and by the batched-native rollout's per-lane force
parameters (physics/batched.py, e.g. sysid's optimized push magnitude).
Subclasses are registered automatically; a differentiable/per-lane
parameter must be stored as an instance ATTRIBUTE (not captured in a
closure) to be visible as a leaf.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_dtype


def _register_force_class(cls):
    """Register a force class as a pytree: array-valued instance attributes
    (jax arrays, tracers, numpy arrays) are leaves; the rest is aux data."""

    def flatten(obj):
        items = sorted(obj.__dict__.items())
        leaf_names, leaves, aux_items = [], [], []
        for k, v in items:
            if isinstance(v, (jax.Array, jax.core.Tracer, np.ndarray)):
                leaf_names.append(k)
                leaves.append(v)
            else:
                aux_items.append((k, v))
        return leaves, (tuple(leaf_names), tuple(aux_items))

    def unflatten(aux, leaves):
        leaf_names, aux_items = aux
        obj = object.__new__(cls)
        for k, v in aux_items:
            object.__setattr__(obj, k, v)
        for k, v in zip(leaf_names, leaves):
            object.__setattr__(obj, k, v)
        return obj

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


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

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        _register_force_class(cls)

    def __init__(self, force_func=None, multiplier=1.0):
        self.force_func = force_func if force_func is not None else (lambda t: DOWN())
        self.multiplier = multiplier

    def force(self, t, body):
        return self.force_func(t) * self.multiplier


_register_force_class(ExternalForce3D)


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
