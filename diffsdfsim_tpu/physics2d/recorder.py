"""2D pygame recorder (reference `lcp_physics/physics/utils.py:79-97`
Recorder + the per-body `draw` methods in `lcp_physics/physics/bodies.py`
and `sdf_physics/physics/bodies.py`).

The reference draws each body onto a pygame screen every step and the
Recorder saves a frame whenever sim time advances by `dt`. This module
reproduces that observation surface for the 2D facade worlds: headless
pygame surface (no display needed), per-shape draw (circle with a heading
line, polygon hull, rect, grid-SDF contour), optional force arrows
(reference `lcp_physics` draws applied-force vectors in demos), and a
Recorder2D with the reference's frame-pacing semantics.
"""

from __future__ import annotations

import os

import numpy as np

from .facade import GridShape2D, HullShape, contour_2d, to_2d_state


def _pg():
    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    import pygame

    return pygame


def make_screen(size=(640, 480)):
    """Headless pygame surface (reference uses a display screen; a plain
    Surface needs no video device)."""
    pg = _pg()
    return pg.Surface(size)


def _to_px(p_xy, screen, pixels_per_meter, origin=None):
    w, h = screen.get_size()
    if origin is None:
        origin = (w // 2, h // 2)
    return (
        int(round(origin[0] + float(p_xy[0]) * pixels_per_meter)),
        int(round(origin[1] - float(p_xy[1]) * pixels_per_meter)),
    )


def draw_world_2d(
    screen,
    bodies,
    state,
    pixels_per_meter: float = 40.0,
    origin=None,
    colors=None,
    forces=None,
    t: float = 0.0,
    force_scale: float = 0.1,
    bg=(255, 255, 255),
):
    """Draw the 2D projection of a (facade) world state.

    `bodies` are the BodyDefs handed to make_world_2d (extruded cylinders /
    boxes / hulls / 2D grids); `state` is the 3D WorldState. Shape dispatch
    mirrors the reference draw methods:
      - Circle   -> pygame.draw.circle + heading line (bodies.py:162-176)
      - Hull     -> filled polygon through the 2D verts (bodies.py:259-269)
      - Rect/box -> rotated rectangle polygon (bodies.py:313-321)
      - GridSDF  -> marching-squares zero contour segments
    With `forces`, draws the net applied force on each body as an arrow
    from the body center (reference demo force rendering)."""
    pg = _pg()
    screen.fill(bg)
    p2, _ = to_2d_state(state)
    p2 = np.asarray(p2)
    nb = len(bodies)
    if colors is None:
        base = [(217, 89, 64), (64, 140, 217), (89, 191, 89),
                (217, 191, 64), (166, 89, 191), (120, 120, 120)]
        colors = [base[i % len(base)] for i in range(nb)]

    handles = []
    for i, bd in enumerate(bodies):
        th, cx, cy = p2[i]
        c, s = np.cos(th), np.sin(th)
        R = np.array([[c, -s], [s, c]])
        ctr = _to_px((cx, cy), screen, pixels_per_meter, origin)
        shape = bd.shape
        kind = type(shape).__name__
        if kind == "CylinderShape":  # facade Circle: extruded along z
            r_px = int(round(float(shape.rad) * pixels_per_meter))
            handles.append(pg.draw.circle(screen, colors[i], ctr, max(r_px, 1), 0))
            tip = _to_px(
                (cx + float(shape.rad) * c, cy + float(shape.rad) * s),
                screen, pixels_per_meter, origin,
            )
            handles.append(pg.draw.line(screen, (0, 0, 255), ctr, tip, 2))
        elif isinstance(shape, HullShape):
            v2 = np.asarray(shape.verts2d) * float(shape.scale_)
            pts = [
                _to_px(R @ v + np.array([cx, cy]), screen, pixels_per_meter, origin)
                for v in v2
            ]
            handles.append(pg.draw.polygon(screen, colors[i], pts, 0))
        elif isinstance(shape, GridShape2D):
            segs, valid = contour_2d(np.asarray(shape.grid), float(shape.scale_))
            segs = np.asarray(segs)[np.asarray(valid)]
            for a, b in segs:
                pa = _to_px(R @ np.asarray(a) + np.array([cx, cy]), screen,
                            pixels_per_meter, origin)
                pb = _to_px(R @ np.asarray(b) + np.array([cx, cy]), screen,
                            pixels_per_meter, origin)
                handles.append(pg.draw.line(screen, colors[i], pa, pb, 2))
        else:  # BoxShape / Rect facade: draw the xy cross-section
            dims = np.asarray(shape.dims)[:2] / 2.0
            corners = np.array(
                [[-1, -1], [1, -1], [1, 1], [-1, 1]], dtype=np.float64
            ) * dims
            pts = [
                _to_px(R @ v + np.array([cx, cy]), screen, pixels_per_meter, origin)
                for v in corners
            ]
            handles.append(pg.draw.polygon(screen, colors[i], pts, 0))

    if forces is not None:
        import jax.numpy as jnp

        from ..physics.engine import apply_forces

        af = np.asarray(
            apply_forces(tuple(bodies), tuple(forces), jnp.asarray(t))
        ).reshape(nb, 6)
        for i in range(nb):
            fx, fy = af[i, 3], af[i, 4]
            if fx * fx + fy * fy < 1e-12:
                continue
            th, cx, cy = p2[i]
            a = _to_px((cx, cy), screen, pixels_per_meter, origin)
            b = _to_px(
                (cx + fx * force_scale, cy + fy * force_scale),
                screen, pixels_per_meter, origin,
            )
            handles.append(pg.draw.line(screen, (0, 0, 0), a, b, 2))
            # arrowhead: two short back-angled lines
            v = np.array([b[0] - a[0], b[1] - a[1]], dtype=np.float64)
            n = np.linalg.norm(v)
            if n > 1:
                v /= n
                w = np.array([-v[1], v[0]])
                for sgn in (1.0, -1.0):
                    tip = np.array(b, dtype=np.float64)
                    back = tip - 8 * v + sgn * 5 * w
                    handles.append(
                        pg.draw.line(screen, (0, 0, 0), b,
                                     (int(back[0]), int(back[1])), 2)
                    )
    return handles


class Recorder2D:
    """Frame recorder with the reference's pacing (utils.py:79-97): a frame
    is saved whenever sim time has advanced by `dt` since the last save.
    Saves numbered .bmp files like the reference; also keeps frames as
    arrays in memory for tests/analysis."""

    def __init__(self, dt, screen, path=None, save_to_disk=True):
        self.dt = dt
        self.prev_t = 0.0
        self.frame = 0
        self.screen = screen
        self.path = path
        self.save_to_disk = save_to_disk and path is not None
        self.frames: list = []
        if self.save_to_disk:
            os.makedirs(path, exist_ok=True)

    def record(self, t):
        pg = _pg()
        if t - self.prev_t >= self.dt:
            if self.save_to_disk:
                pg.image.save(
                    self.screen, os.path.join(self.path, f"{self.frame}.bmp")
                )
            arr = pg.surfarray.array3d(self.screen).swapaxes(0, 1).copy()
            self.frames.append((float(t), arr))
            self.frame += 1
            self.prev_t += self.dt
