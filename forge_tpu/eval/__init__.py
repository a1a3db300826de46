from forge_tpu.eval.metrics import (
    compute_psnr,
    compute_ssim,
    compute_img_metric,
    compute_pose_metric,
    permute_clips,
)
from forge_tpu.eval.sync import camera_chaining, camera_synchronization
