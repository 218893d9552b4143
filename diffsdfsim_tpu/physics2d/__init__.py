from .facade import (
    PlanarConstraint,
    Circle,
    Rect,
    make_world_2d,
    to_2d_state,
)
