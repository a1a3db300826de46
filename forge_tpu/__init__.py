"""forge_tpu — a TPU-native (JAX / XLA / Pallas / pjit) few-view object
reconstruction framework with the capabilities of UT-Austin-RPL/FORGE.

The package is a ground-up redesign, not a port: the compute path is pure
functional JAX (flax.linen modules, channels-last layouts, `lax.scan` recurrences,
a fused Pallas emission-absorption ray-marcher), parallelism is expressed as
`jax.sharding` over a device mesh instead of NCCL process groups, and the
camera math works directly in the OpenCV convention instead of routing through
PyTorch3D's NDC camera stack.

Reference parity map (file:line cites into the reference repo):
  - geometry/        <- utils/geo_utils.py, dataset/kubric.py:78-104 conventions
  - ops/             <- models/rotate.py grid_sample, PyTorch3D VolumeRenderer
  - models/          <- models/*.py
  - train/           <- scripts/kubric_trainer*.py, kubric_train_*.py
  - eval/            <- kubric_eval.py, utils/sync_utils.py, utils/eval_utils.py
  - data/            <- dataset/*.py
"""

__version__ = "0.1.0"
