from ros2_mono_vo_tpu.geometry.se3 import (  # noqa: F401
    hat,
    vee,
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    rodrigues,
    rotation_angle,
    make_se3,
    se3_inverse,
    transform_points,
    CV_TO_ROS_R,
    cv_pose_to_ros,
    cv_points_to_ros,
)
from ros2_mono_vo_tpu.geometry.projection import (  # noqa: F401
    project_points,
    reprojection_error,
    pixel_to_normalized,
)
from ros2_mono_vo_tpu.geometry.triangulation import (  # noqa: F401
    triangulate_dlt,
    triangulate_and_filter,
    chirality_mask,
)
