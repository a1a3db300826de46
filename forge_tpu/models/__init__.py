from forge_tpu.models.forge import FORGE, ForgeOutputs, TrainFlags
from forge_tpu.models.encoder import Encoder3D
from forge_tpu.models.fusion import ConvGRU3D
from forge_tpu.models.pose3d import PoseEstimator3D
from forge_tpu.models.pose2d import PoseEstimator2D
from forge_tpu.models.renderer import VolRender
