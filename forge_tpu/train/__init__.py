from forge_tpu.train.losses import (
    reconstruction_loss,
    pose_loss,
    all_loss,
    all_loss_nvs,
)
from forge_tpu.train.state import TrainState, create_train_state, make_train_step
from forge_tpu.train.curriculum import CurriculumStep, get_curriculum_step
