from .shapes import (
    SphereShape,
    BoxShape,
    RoundedBoxShape,
    BrickShape,
    CylinderShape,
    BowlShape,
    GridShape,
    LatentShape,
    query_sdfs,
)
from .bodies import BodyDef, make_body
from .joints import (
    XConstraint3D,
    YConstraint3D,
    ZConstraint3D,
    RotConstraint3D,
    TotalConstraint3D,
    GripperJoint,
)
from .forces import Gravity3D, ExternalForce3D, DOWN, UP, RIGHT, LEFT, FRONT, BACK, ROTX, ROTY, ROTZ, ZERO6
from .world import WorldSpec, WorldState, make_world, step_frame, rollout, run_world, Trajectory
from .batched import make_world_batched, rollout_batched, step_frame_batched
