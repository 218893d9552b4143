import jax.numpy as jnp
import numpy as np

from diffsdfsim_tpu.physics import BoxShape, SphereShape, make_body
from diffsdfsim_tpu.rendering import PinholeCamera, render_depth_seg, get_pointcloud


def test_depth_of_sphere():
    """Camera at origin looking along -z at a unit sphere at z=-5."""
    sphere = make_body(SphereShape(jnp.asarray(1.0)), subdiv=1)
    quat = jnp.array([[1.0, 0, 0, 0]])
    pos = jnp.array([[0.0, 0.0, -5.0]])
    cam = PinholeCamera.from_yfov(np.pi / 3, 64, 48)
    pose = jnp.eye(4)
    depth, seg = render_depth_seg([sphere], quat, pos, cam, pose)
    center = float(depth[24, 32])
    np.testing.assert_allclose(center, 4.0, atol=0.02)
    assert int(seg[24, 32]) == 0
    assert int(seg[0, 0]) == -1
    assert float(depth[0, 0]) == 0.0


def test_seg_two_bodies():
    sphere = make_body(SphereShape(jnp.asarray(0.5)), subdiv=1)
    box = make_body(BoxShape(jnp.array([1.0, 1.0, 1.0])), subdiv=2)
    quat = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
    pos = jnp.array([[1.2, 0.0, -5.0], [-1.2, 0.0, -5.0]])
    cam = PinholeCamera.from_yfov(np.pi / 3, 64, 48)
    depth, seg = render_depth_seg([sphere, box], quat, pos, cam, jnp.eye(4))
    vals = set(np.unique(np.asarray(seg)).tolist())
    assert vals == {-1, 0, 1}


def test_pointcloud_unprojection():
    cam = PinholeCamera.from_yfov(np.pi / 3, 64, 48)
    depth = jnp.full((48, 64), 2.0)
    pc = get_pointcloud(depth, cam)
    # center pixel maps to ~(0, 0, 2)
    np.testing.assert_allclose(np.asarray(pc[24, 32]), [0.008/ cam.fx * 0, 0.0, 2.0], atol=0.05)
    assert pc.shape == (48, 64, 3)


def test_erode_mask():
    from diffsdfsim_tpu.experiments.optim_pointcloud import erode_mask

    m = jnp.zeros((9, 9), dtype=bool).at[2:7, 2:7].set(True)
    e = np.asarray(erode_mask(m))
    assert e.sum() == 9  # 5x5 block erodes to 3x3
    assert e[4, 4] and not e[2, 2]


def test_render_color_lambertian():
    """Color pass: body pixels shaded by the light, background flat white."""
    import jax.numpy as jnp
    import numpy as np
    from diffsdfsim_tpu.physics import SphereShape, make_body
    from diffsdfsim_tpu.rendering import render_color

    sphere = make_body(SphereShape(0.5), subdiv=2)
    quat = jnp.array([[1.0, 0, 0, 0]])
    pos = jnp.array([[0.0, 0.0, 0.0]])
    cam = PinholeCamera.from_yfov(jnp.pi / 3, 48, 36)
    pose = jnp.eye(4).at[2, 3].set(3.0)
    rgb, depth, seg = render_color([sphere], quat, pos, cam, pose)
    rgb, seg = np.asarray(rgb), np.asarray(seg)
    assert rgb.shape == (36, 48, 3)
    hit = seg == 0
    assert hit.any()
    # background exactly bg_color (white)
    np.testing.assert_allclose(rgb[~hit], 1.0, atol=1e-6)
    # the lit sphere shows shading variation (normals change across pixels)
    assert rgb[hit].std() > 0.02
    assert rgb[hit].max() <= 1.0 + 1e-6 and rgb[hit].min() >= 0.0
