from forge_tpu.nn.layers import (
    TorchConv,
    TorchConvTranspose,
    TorchBatchNorm,
    torch_max_pool,
    leaky_relu,
)
