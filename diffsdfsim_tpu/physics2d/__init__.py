from .facade import (
    PlanarConstraint,
    RevoluteJoint2D,
    FixedJoint2D,
    Circle,
    Rect,
    Hull,
    HullShape,
    polygon_sdf_2d,
    make_world_2d,
    to_2d_state,
)
