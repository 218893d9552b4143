"""2D pygame recorder (reference lcp_physics/physics/utils.py:79-97 +
per-body draw methods) and force/torque arrow rendering (reference
sdf_physics/physics3d/bodies.py:513-593)."""

import numpy as np
import jax.numpy as jnp
import pytest

from diffsdfsim_tpu.config import SimConfig
from diffsdfsim_tpu.physics import Gravity3D, TotalConstraint3D
from diffsdfsim_tpu.physics2d import Circle, Rect, make_world_2d
from diffsdfsim_tpu.physics2d.recorder import Recorder2D, draw_world_2d, make_screen

CFG = SimConfig(fric_dirs=4, max_contacts_per_pair=2, max_contacts_total=4,
                mesh_subdiv=1, max_substeps=2, max_bisect=2)


def _world2d():
    floor = Rect(jnp.array([10.0, 1.0]), subdiv=1)
    ball = Circle(0.5, subdiv=1)
    bodies = [floor, ball]
    poses = jnp.array([[0.0, 0.0, -2.0], [0.3, 0.0, 1.0]])
    vels = jnp.zeros((2, 3))
    forces = ((), (Gravity3D(10.0),))
    spec, state = make_world_2d(
        bodies, poses, vels, joints=(TotalConstraint3D(body1=0),),
        forces=forces, cfg=CFG,
    )
    return bodies, forces, spec, state


def test_draw_and_record(tmp_path):
    bodies, forces, spec, state = _world2d()
    screen = make_screen((320, 240))
    draw_world_2d(screen, bodies, state, forces=forces, t=0.0)
    rec = Recorder2D(dt=1.0 / 30, screen=screen, path=str(tmp_path),
                     save_to_disk=True)
    rec.record(1.0 / 30)
    assert rec.frame == 1
    assert (tmp_path / "0.bmp").exists()
    t, arr = rec.frames[0]
    assert arr.shape == (240, 320, 3)
    # something non-background was drawn
    assert (arr != 255).any()


def test_recorder_frame_pacing():
    bodies, forces, spec, state = _world2d()
    screen = make_screen((64, 64))
    draw_world_2d(screen, bodies, state)
    rec = Recorder2D(dt=0.1, screen=screen, save_to_disk=False)
    for t in (0.05, 0.11, 0.15, 0.21, 0.32):
        rec.record(t)
    # frames at 0.11, 0.21, 0.32 — reference pacing: save when t-prev >= dt
    assert rec.frame == 3


def test_force_arrows_render():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from diffsdfsim_tpu.rendering.arrows import force_arrows
    from diffsdfsim_tpu.rendering.raymarch import PinholeCamera, render_color

    bodies, forces, spec, state = _world2d()
    arrows, aq, ap = force_arrows(
        spec.bodies, spec.forces, 0.0, state.quat, state.pos,
        render_forces=True, force_scale=0.1,
        # thick enough that the coarse test raster can't step over the shaft
        shaft_r=0.15, head_r=0.3, head_len=0.3,
    )
    # only the ball has gravity
    assert len(arrows) == 1
    # arrow points down: quat rotates +z to -y
    cam = PinholeCamera.from_yfov(np.pi / 3, 96, 72)
    pose = jnp.asarray(np.array([[1.0, 0, 0, 0], [0, 1, 0, 0],
                                 [0, 0, 1, 6.0], [0, 0, 0, 1]]))
    all_bodies = list(spec.bodies) + list(arrows)
    quat = jnp.concatenate([state.quat, aq], axis=0)
    pos = jnp.concatenate([state.pos, ap], axis=0)
    color, depth, seg = render_color(all_bodies, quat, pos, cam, pose)
    color0, _, seg0 = render_color(list(spec.bodies), state.quat, state.pos,
                                   cam, pose)
    # the arrow occupies pixels (its body index appears in seg) and changes
    # the image vs the arrow-less render
    assert (np.asarray(seg) >= len(spec.bodies)).any()
    assert (np.asarray(color) != np.asarray(color0)).any()
