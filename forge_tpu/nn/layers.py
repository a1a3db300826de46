"""Layer primitives with PyTorch-compatible numerics, on flax.linen.

The reference model is plain torch Conv/BN/LeakyReLU stacks; to keep weight
conversion exact (pretrained torchvision backbones, reference: models/encoder.py:72,
models/pose_estimator_2d.py:197) these wrappers pin down the semantics where
XLA's defaults differ from torch:

  - torch pads convolutions symmetrically (p, p); XLA 'SAME' pads
    asymmetrically for even inputs under stride 2. We always pass explicit
    padding pairs.
  - torch BatchNorm: eps=1e-5, running-stat momentum 0.1 (flax EMA momentum
    0.9), biased batch variance for normalization.
  - LeakyReLU negative_slope=0.01 (both frameworks' default, stated here).

Layouts are channels-last everywhere: NHWC for 2-D, NDHWC for 3-D — the TPU
native layout (channels on vector lanes, conv lowers to MXU matmuls).
Batch statistics under `jit` over a batch-sharded mesh axis are computed
globally by XLA, which reproduces the reference's SyncBatchNorm
(kubric_train_joint.py:136) with zero extra code.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope)


def _to_tuple(v: Union[int, Sequence[int]], n: int) -> Tuple[int, ...]:
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


class TorchConv(nn.Module):
    """N-D convolution with torch-style symmetric integer padding.

    kernel layout is flax-native (spatial..., in, out); the torch->jax weight
    converter transposes torch's (out, in, spatial...) accordingly.
    """

    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ndim = x.ndim - 2  # spatial dims
        ks = _to_tuple(self.kernel_size, ndim)
        st = _to_tuple(self.strides, ndim)
        pd = _to_tuple(self.padding, ndim)
        return nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=st,
            padding=[(p, p) for p in pd],
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class TorchConvTranspose(nn.Module):
    """N-D transposed convolution matching torch's ConvTranspose semantics.

    torch output size = (in - 1) * stride - 2 * padding + kernel; we express
    torch's `padding` via lax.conv_transpose explicit padding
    (k - 1 - p, k - 1 - p) on the dilated input. Used by the decoder heads
    (reference: models/encoder.py:17,26 — k=4, s=2, p=1 exact 2x upsample;
    models/volume_render.py:30 — k=6, s=2, p=2).
    """

    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ndim = x.ndim - 2
        ks = _to_tuple(self.kernel_size, ndim)
        st = _to_tuple(self.strides, ndim)
        pd = _to_tuple(self.padding, ndim)
        pad = [(k - 1 - p, k - 1 - p) for k, p in zip(ks, pd)]
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=ks,
            strides=st,
            padding=pad,
            use_bias=self.use_bias,
            transpose_kernel=True,  # torch layout: flip kernel like torch does
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class TorchBatchNorm(nn.Module):
    """BatchNorm over all non-channel axes, torch numerics.

    `train=True` uses biased batch statistics and updates running stats with
    torch momentum 0.1; `train=False` uses running stats — this carries the
    reference's per-submodule train/eval freezing semantics
    (kubric_train_joint.py:24-44): frozen submodules are called with
    train=False even inside a training step.
    """

    momentum: float = 0.1  # torch convention
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if train:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            mean_sq = jnp.mean(xf * xf, axis=axes)
            n = 1
            for a in axes:
                n *= x.shape[a]
            if self.axis_name is not None:
                # explicit cross-replica sync (pmap/shard_map); under plain
                # jit-with-sharding the mean above is already global.
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
                n *= jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean_sq - mean * mean, 0.0)
            if not self.is_initializing():
                # torch updates running stats with the *unbiased* batch var.
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            # eval mode: fold stats into one fused multiply-add in the
            # compute dtype — avoids materializing f32 copies of every
            # activation (BN is on almost every layer; this halves the
            # activation bandwidth of frozen submodules in bf16 runs)
            dtype = self.dtype or x.dtype
            inv = (jax.lax.rsqrt(ra_var.value + self.epsilon)
                   * scale.astype(jnp.float32))
            shift = bias.astype(jnp.float32) - ra_mean.value * inv
            return (x * inv.astype(dtype) + shift.astype(dtype)).astype(dtype)

        # normalize in the compute dtype (statistics above are f32); avoids
        # f32 activation copies in bf16 training
        dtype = self.dtype or x.dtype
        inv = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
        shift = bias.astype(jnp.float32) - mean * inv
        return (x * inv.astype(dtype) + shift.astype(dtype)).astype(dtype)


def torch_max_pool(
    x: jnp.ndarray,
    kernel_size: int,
    stride: int,
    padding: int,
) -> jnp.ndarray:
    """Max pool with torch symmetric padding (pads with -inf)."""
    ndim = x.ndim - 2
    window = (1,) + (kernel_size,) * ndim + (1,)
    strides = (1,) + (stride,) * ndim + (1,)
    pads = ((0, 0),) + ((padding, padding),) * ndim + ((0, 0),)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window, strides, pads
    )


class ConvBNAct(nn.Module):
    """Conv -> BN -> LeakyReLU block, the reference's ubiquitous triple."""

    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    act: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = TorchConv(
            self.features, self.kernel_size, self.strides, self.padding,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)
        x = TorchBatchNorm(dtype=self.dtype, param_dtype=self.param_dtype)(x, train)
        if self.act:
            x = leaky_relu(x)
        return x
