from forge_tpu.models.forge import FORGE, ForgeOutputs, TrainFlags
from forge_tpu.models.encoder import Encoder3D
from forge_tpu.models.fusion import ConvGRU3D
from forge_tpu.models.pose3d import PoseEstimator3D
from forge_tpu.models.pose2d import PoseEstimator2D
from forge_tpu.models.renderer import VolRender


def build_model(cfg, **overrides):
    """FORGE factory honoring cfg.network.compute_dtype (bf16 activations on
    the conv/attention stacks; BatchNorm statistics and geometry stay f32)."""
    import jax.numpy as jnp

    dtype = {"bfloat16": jnp.bfloat16, "float32": None}.get(
        cfg.network.compute_dtype, None)
    kw = dict(dtype=dtype)
    kw.update(overrides)
    return FORGE(cfg, **kw)
