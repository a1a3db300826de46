from forge_tpu.data.base import assemble_sample, FrameSequenceDataset
from forge_tpu.data.kubric import KubricDataset
from forge_tpu.data.gso import GSODataset
from forge_tpu.data.omniobject3d import OmniObject3DDataset
from forge_tpu.data.loader import Loader, DeviceCachedLoader, collate
from forge_tpu.data.synthetic import SyntheticVoxelDataset
