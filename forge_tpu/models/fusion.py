"""Cross-view 3D convolutional GRU fusion.

Functional parity with the reference ConvGRU (models/fusion.py:7-96):
per-step sigmoid update/reset gates from one Conv3d over [x, h], tanh
candidate from a second Conv3d over [x, h*reset], returning the LAST hidden
state through a BatchNorm. The view axis is tiny (2-5) and each step is a
large conv, so the loop is unrolled — XLA pipelines the steps; a `lax.scan`
would only add trace-time savings for long sequences.

Layout: [B, t, D, H, W, C] channels-last.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from forge_tpu.nn.layers import TorchConv, TorchBatchNorm, leaky_relu

Dtype = Any


class ConvGRUCell3D(nn.Module):
    """One GRU step (reference: models/fusion.py:7-35)."""

    hidden_size: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        xh = jnp.concatenate([x, h], axis=-1)
        gates = TorchConv(self.hidden_size * 2, 3, 1, 1, name="conv_gate", **kw)(xh)
        update, reset = jnp.split(gates, 2, axis=-1)
        update = jax.nn.sigmoid(update)
        reset = jax.nn.sigmoid(reset)
        xhr = jnp.concatenate([x, h * reset], axis=-1)
        cand = jnp.tanh(TorchConv(self.hidden_size, 3, 1, 1, name="out_gate", **kw)(xhr))
        return h * (1 - update) + cand * update


class ConvGRU3D(nn.Module):
    """Multi-layer ConvGRU over the view axis (reference: models/fusion.py:39-96).

    Also owns `fusion_conv`, the two-conv stack that produces the initial
    hidden state from the mean of the views (reference: models/fusion.py:61-68,
    models/encoder.py:62).
    """

    n_layers: int = 1
    input_size: int = 128
    hidden_size: int = 128
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.cells = [
            ConvGRUCell3D(self.hidden_size, name=f"cell_{i}", **kw)
            for i in range(self.n_layers)
        ]
        self.fusion_norm = TorchBatchNorm(name="fusion_norm", **kw)
        self.fc_conv1 = TorchConv(self.input_size, 3, 1, 1, name="fusion_conv1", **kw)
        self.fc_bn1 = TorchBatchNorm(name="fusion_bn1", **kw)
        self.fc_conv2 = TorchConv(self.input_size, 3, 1, 1, name="fusion_conv2", **kw)
        self.fc_bn2 = TorchBatchNorm(name="fusion_bn2", **kw)

    def fusion_conv(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = leaky_relu(self.fc_bn1(self.fc_conv1(x), train))
        x = leaky_relu(self.fc_bn2(self.fc_conv2(x), train))
        return x

    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        """x: [B, t, D, H, W, C] -> fused [B, D, H, W, hidden]."""
        t = x.shape[1]
        h = self.fusion_conv(jnp.mean(x, axis=1), train)
        cur = [x[:, i] for i in range(t)]
        for layer in range(self.n_layers):
            hh = h if layer == 0 else None
            outputs = []
            for i in range(t):
                if hh is None:
                    hh = jnp.zeros_like(cur[i][..., : self.hidden_size])
                hh = self.cells[layer](cur[i], hh)
                outputs.append(hh)
            cur = outputs
            h_last = hh
            hh = None
        return self.fusion_norm(h_last, train)
