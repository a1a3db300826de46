from forge_tpu.geometry.rotations import (
    euler2mat,
    quat2mat,
    quat2mat_transform,
    mat2quat,
    mat2quat_transform,
    rot6d2mat,
    rot9d2mat,
    symmetric_orthogonalization,
    get_relative_pose,
    canonicalize_poses,
    transform_relative_pose,
    se3_inverse,
)
from forge_tpu.geometry.frames import (
    KUBRIC_TO_CV2,
    CV2_TO_TORCH3D,
    canonical_extrinsics_cv2,
    canonical_pose_cv2,
)
from forge_tpu.geometry.cameras import (
    project_points_screen,
    pixel_rays_cv2,
    look_at_view_transform_cv2,
)
