"""Contact-point polish (ops/polish.py): exact contact geometry from coarse
meshes.

Regression anchor: the round-3 landscape comparison found our FW-over-coarse-
mesh search missing shallow penetrations the reference (res-128 marching-cubes
meshes, sdf_physics/physics3d/bodies.py:653-664) measures — a sphere at true
penetration 1.46e-3 was invisible to a subdiv-2 icosphere search. The polish
must recover the analytic contact point/penetration at ANY mesh resolution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsdfsim_tpu.config import SimConfig
from diffsdfsim_tpu.physics import BoxShape, SphereShape, make_body
from diffsdfsim_tpu.physics.contacts import (
    find_contacts,
    search_contacts,
)
from diffsdfsim_tpu.physics.world import make_world


def _sphere_floor(rad, y, subdiv, polish=10, rot=None):
    cfg = SimConfig(
        mesh_subdiv=subdiv, max_contacts_per_pair=4, max_contacts_total=8,
        contact_polish_iters=polish, fw_backend="xla",
        strict_no_penetration=False,
    )
    floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=3)
    sphere = make_body(SphereShape(rad), subdiv=subdiv)
    poses = jnp.array([[1.0, 0, 0, 0, 0.0, -0.5, 0.0], [1.0, 0, 0, 0, 0.0, y, 0.0]])
    if rot is not None:
        poses = poses.at[1, :4].set(rot)
    vels = jnp.zeros((2, 6))
    spec, state = make_world([floor, sphere], poses, vels, cfg=cfg)
    return spec, state


@pytest.mark.parametrize("subdiv", [2, 3])
@pytest.mark.parametrize("y", [0.55854, 0.5595])
def test_polished_pen_exact_at_any_subdiv(subdiv, y):
    """True penetration rad - y recovered to ~1e-8 regardless of mesh
    resolution (unpolished subdiv-2 missed the 0.55854 pose entirely)."""
    rad = 0.56
    # a non-identity rotation so no mesh vertex points straight down
    rot = jnp.array([np.cos(0.4), 0.0, 0.0, np.sin(0.4)])
    spec, state = _sphere_floor(rad, y, subdiv, rot=rot)
    cc = search_contacts(
        spec.bodies, state.quat, state.pos, spec.directed_pairs, spec.cfg
    )
    np.testing.assert_allclose(float(cc.max_pen_all), rad - y, atol=2e-8)


def test_polished_contact_point_below_center():
    spec, state = _sphere_floor(0.56, 0.5588, 2)
    contacts = find_contacts(
        spec.bodies, state.quat, state.pos, spec.directed_pairs,
        spec.n_unordered, spec.cfg,
    )
    v = np.asarray(contacts.valid)
    assert v.any()
    p1 = np.asarray(contacts.p1)[v]
    i1 = np.asarray(contacts.i1)[v]
    # sphere-side contacts sit at the bottom pole: world-oriented offset
    # (0, -rad, 0) from the sphere COM
    sph = i1 == 1
    assert sph.any()
    # lateral convergence floor is step0 * 2^-iters ~ 1e-4; the penetration
    # error it induces is quadratic (off^2 / 2r ~ 1e-8), tested above
    np.testing.assert_allclose(
        p1[sph], np.tile([0.0, -0.56, 0.0], (p1[sph].shape[0], 1)), atol=2e-4
    )


def test_polish_preserves_box_patch():
    """Flat-on-flat contact keeps its multi-point patch (the tangential
    descent direction vanishes on flat regions)."""
    cfg = SimConfig(
        mesh_subdiv=1, max_contacts_per_pair=4, max_contacts_total=8,
        contact_polish_iters=10, fw_backend="xla",
        strict_no_penetration=False,
    )
    floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=3)
    box = make_body(BoxShape(jnp.array([1.0, 1.0, 1.0])), subdiv=1)
    poses = jnp.array(
        [[1.0, 0, 0, 0, 0.0, -0.5, 0.0], [1.0, 0, 0, 0, 0.0, 0.4999, 0.0]]
    )
    spec, state = make_world([floor, box], poses, jnp.zeros((2, 6)), cfg=cfg)
    contacts = find_contacts(
        spec.bodies, state.quat, state.pos, spec.directed_pairs,
        spec.n_unordered, spec.cfg,
    )
    v = np.asarray(contacts.valid)
    p1 = np.asarray(contacts.p1)[v]
    # the resting face patch must stay spread (several distinct support
    # points), not collapse to one polished minimum
    assert v.sum() >= 3
    spread = p1[:, [0, 2]].max(axis=0) - p1[:, [0, 2]].min(axis=0)
    assert (spread > 0.5).all()


def test_polished_pen_gradient_wrt_radius():
    """d(pen)/d(rad) == 1 for sphere-on-floor through the anchored
    differentiable recompute (the polish anchor is stop-grad; gradients flow
    through the surface projection)."""

    def deepest_pen(rad):
        spec, state = _sphere_floor(rad, 0.5588, 2)
        # rebuild bodies differentiably w.r.t. rad
        cfg = spec.cfg
        floor = make_body(BoxShape(jnp.array([20.0, 1.0, 20.0])), subdiv=3)
        sphere = make_body(SphereShape(rad), subdiv=2)
        contacts = find_contacts(
            [floor, sphere], state.quat, state.pos, spec.directed_pairs,
            spec.n_unordered, cfg,
        )
        return jnp.max(jnp.where(contacts.valid, contacts.pen, -jnp.inf))

    g = jax.grad(deepest_pen)(jnp.asarray(0.56))
    np.testing.assert_allclose(float(g), 1.0, atol=1e-6)
