from . import quaternion, spherical, meshes
from .quaternion import (
    quat_to_matrix,
    matrix_to_quat,
    quat_multiply,
    quat_apply,
    quat_invert,
    so3_exp_map,
    so3_log_map,
    axis_angle_to_matrix,
    random_quaternions,
    so3_relative_angle,
    quat_from_euler,
    rotation_2d,
)
from .spherical import (
    cart_to_spherical,
    spherical_to_cart,
    cart_to_polar,
    polar_to_cart,
    orthogonal,
    left_orthogonal,
    skew_symmetric_mat,
    cross_2d,
)
