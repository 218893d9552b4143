"""Analytic 2D narrowphase (physics2d/narrowphase.py) — geometry unit tests
against closed forms and end-to-end parity against the extruded-3D
Frank-Wolfe pipeline (reference algorithms:
lcp_physics/physics/contacts.py:55-210)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsdfsim_tpu.config import SimConfig
from diffsdfsim_tpu.physics import Gravity3D
from diffsdfsim_tpu.physics.contacts import find_contacts
from diffsdfsim_tpu.physics.world import rollout
from diffsdfsim_tpu.physics2d import (
    Circle,
    Hull,
    Rect,
    make_world_2d,
    to_2d_state,
)
from diffsdfsim_tpu.physics2d import narrowphase as np2d


def test_circle_circle_candidate():
    pts, valid, sep = np2d.circle_circle(
        jnp.array([0.0, 0.0]), jnp.asarray(1.0),
        jnp.array([1.8, 0.0]), jnp.asarray(1.0),
    )
    assert bool(valid[0]) and not bool(valid[1])
    np.testing.assert_allclose(np.array(pts[0]), [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(float(sep), -0.2, atol=1e-6)


def test_circle_hull_shallow_and_deep():
    square = jnp.array([[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]])
    # shallow: circle right of the square, touching the x=1 edge
    pts, valid, sep = np2d.circle_hull(jnp.array([1.4, 0.2]), jnp.asarray(0.5), square)
    np.testing.assert_allclose(np.array(pts[0]), [1.0, 0.2], atol=1e-6)
    np.testing.assert_allclose(float(sep), -0.1, atol=1e-6)
    # deep: center inside, closest to the x=1 edge
    pts, valid, sep = np2d.circle_hull(jnp.array([0.8, 0.0]), jnp.asarray(0.3), square)
    np.testing.assert_allclose(np.array(pts[0]), [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(float(sep), -0.5, atol=1e-6)  # d=-0.2 - r


def test_hull_hull_clip():
    sq = jnp.array([[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]])
    # small square resting on top of big square, penetrating 0.1
    top = sq * 0.5 + jnp.array([0.3, 1.4])
    pts, valid, sep, dist = np2d.hull_hull(sq, top)
    assert float(sep) == pytest.approx(-0.1, abs=1e-6)
    ys = np.sort(np.array(pts[:, 1]))
    np.testing.assert_allclose(ys, [0.9, 0.9], atol=1e-6)  # bottom edge of top
    xs = np.sort(np.array(pts[:, 0]))
    np.testing.assert_allclose(xs, [-0.2, 0.8], atol=1e-6)  # clipped extent


def _world_2d(narrowphase, bodies, poses, vels, **kw):
    f32 = not jax.config.read("jax_enable_x64")
    cfg = SimConfig(
        fric_dirs=4, max_contacts_per_pair=2, max_contacts_total=4,
        mesh_subdiv=1, max_substeps=4, max_bisect=6,
        tol=1e-5 if f32 else 1e-8,
        eps=1e-2, strict_no_penetration=False,
    )
    return make_world_2d(bodies, poses, vels, cfg=cfg,
                         narrowphase=narrowphase, **kw)


def test_contacts_parity_circle_on_rect():
    """Same touching configuration through both narrowphase backends: the
    analytic candidates must reproduce the FW pipeline's contact manifold
    (normal, penetration) on a circle resting on a floor rect."""
    def build(nphase):
        floor = Rect([8.0, 1.0], fric_coeff=0.3)
        ball = Circle(0.5, fric_coeff=0.3)
        spec, state = _world_2d(
            nphase, [floor, ball],
            [[0.0, 0.0, 0.0], [0.0, 0.0, 0.995]],
            jnp.zeros((2, 3)),
        )
        return spec, state

    out = {}
    for nphase in ("fw", "analytic"):
        spec, state = build(nphase)
        cts = find_contacts(
            spec.bodies, state.quat, state.pos, spec.directed_pairs,
            spec.n_unordered, spec.cfg,
        )
        out[nphase] = cts
        assert bool(jnp.any(cts.valid)), nphase

    for nphase, cts in out.items():
        v = np.array(cts.valid)
        n = np.array(cts.normal)[v]
        pen = np.array(cts.pen)[v]
        # floor is body 0: normal convention points from b2's surface toward
        # b1 side; all valid slots must agree on the vertical axis
        np.testing.assert_allclose(np.abs(n[:, 1]), 1.0, atol=1e-3)
        np.testing.assert_allclose(pen, 0.005, atol=2e-3)
    mp_fw = float(out["fw"].max_pen_all)
    mp_an = float(out["analytic"].max_pen_all)
    assert mp_an == pytest.approx(mp_fw, abs=2e-3)


@pytest.mark.parametrize("scene", ["stack", "hulls"])
def test_rollout_parity_2d(scene):
    """Resting stack (rects) and colliding hulls through both backends:
    trajectories must agree to contact-discretization tolerance (the
    analytic path localizes contacts exactly; the FW path to mesh
    resolution)."""
    if scene == "stack":
        bodies = [
            Rect([8.0, 1.0], fric_coeff=0.5),
            Rect([1.0, 1.0], fric_coeff=0.5),
        ]
        poses = [[0.0, 0.0, 0.0], [0.05, 0.0, 1.1]]
        vels = jnp.zeros((2, 3))
    else:
        bodies = [
            Rect([8.0, 1.0], fric_coeff=0.4),
            Hull([[0.5, 0.5], [-0.5, 0.5], [-0.7, -0.3], [0.0, -0.6], [0.6, -0.2]],
                 fric_coeff=0.4),
            Circle(0.4, fric_coeff=0.4),
        ]
        poses = [[0.0, 0.0, 0.0], [0.2, -0.8, 1.4], [0.0, 0.9, 1.2]]
        vels = jnp.zeros((3, 3)).at[1, 1].set(1.0).at[2, 1].set(-1.0)

    finals = {}
    for nphase in ("fw", "analytic"):
        from diffsdfsim_tpu.physics.joints import TotalConstraint3D

        spec, state = _world_2d(
            nphase, bodies, poses, vels,
            joints=(TotalConstraint3D(body1=0),),
            forces=tuple(
                () if i == 0 else (Gravity3D(10.0),)
                for i in range(len(bodies))
            ),
        )
        final, traj = jax.jit(lambda st: rollout(spec, st, 10))(state)
        assert not bool(jnp.any(~jnp.isfinite(final.pos)))
        finals[nphase] = to_2d_state(final)

    p_fw, v_fw = finals["fw"]
    p_an, v_an = finals["analytic"]
    np.testing.assert_allclose(
        np.array(p_an), np.array(p_fw), atol=5e-2,
        err_msg=f"{scene} pose divergence between narrowphase backends",
    )
