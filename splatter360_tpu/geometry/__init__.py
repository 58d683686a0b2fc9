from .erp import (
    erp_pixel_grid,
    erp_to_spherical,
    spherical_to_cartesian,
    cartesian_to_spherical,
    spherical_to_erp,
    erp_ray_directions,
    unproject_erp_depth,
)
from .transforms import (
    quaternion_to_matrix,
    build_covariance,
    homogenize_points,
    transform_points,
    inverse_se3,
    interpolate_pose_6d,
)
from .cubemap import (
    CUBE_FACE_ORDER_FRBLUD,
    cube_face_rotations,
    cube_face_extrinsics,
    cube_face_intrinsics,
    cube_to_erp_grid,
    erp_to_cube_grid,
    cube_to_erp,
    erp_to_cube,
    erp_distance_to_cube_zdepth_factor,
)
from .sh import num_sh_coeffs, eval_sh, rotate_sh, sh_rotation_matrices
