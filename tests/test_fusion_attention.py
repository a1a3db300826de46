"""Torch-parity tests for the ConvGRU cell and the attention Block.

These pin the recurrence/attention math against independent torch
implementations of the same equations (weights shared via the converter
layout), covering models/fusion.py:21-35 and models/model_utils.py:144-229
semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from forge_tpu.models.fusion import ConvGRUCell3D
from forge_tpu.nn.attention import Block, get_3d_sincos_pos_embed


def _conv_w(tconv):
    # torch (out,in,*k) -> flax (*k,in,out)
    w = tconv.weight.detach().numpy()
    nd = w.ndim
    return np.transpose(w, tuple(range(2, nd)) + (1, 0))


def test_convgru_cell_parity():
    torch.manual_seed(0)
    C = 6
    conv_gate = tnn.Conv3d(2 * C, 2 * C, 3, padding=1)
    out_gate = tnn.Conv3d(2 * C, C, 3, padding=1)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 5, 5, C).astype(np.float32)
    h = rng.randn(2, 5, 5, 5, C).astype(np.float32)

    # torch forward of the same equations (NCDHW)
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    ht = torch.from_numpy(h.transpose(0, 4, 1, 2, 3))
    gates = conv_gate(torch.cat([xt, ht], 1))
    update, reset = torch.split(gates, C, dim=1)
    update, reset = torch.sigmoid(update), torch.sigmoid(reset)
    cand = torch.tanh(out_gate(torch.cat([xt, ht * reset], 1)))
    ref = (ht * (1 - update) + cand * update).detach().numpy()
    ref = ref.transpose(0, 2, 3, 4, 1)

    cell = ConvGRUCell3D(hidden_size=C)
    params = {"params": {
        "conv_gate": {"Conv_0": {"kernel": jnp.asarray(_conv_w(conv_gate)),
                                 "bias": jnp.asarray(conv_gate.bias.detach().numpy())}},
        "out_gate": {"Conv_0": {"kernel": jnp.asarray(_conv_w(out_gate)),
                                "bias": jnp.asarray(out_gate.bias.detach().numpy())}},
    }}
    out = cell.apply(params, jnp.asarray(x), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


class TorchBlock(tnn.Module):
    """Reference-equation block: conv1d(k=1) projections, unscaled 1-head attn,
    value from RAW key, residual + MLP(norm2)."""

    def __init__(self, dim, mlp_ratio):
        super().__init__()
        self.dim = dim
        self.norm = tnn.LayerNorm(dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.q = tnn.Linear(dim, dim)
        self.k = tnn.Linear(dim, dim)
        self.v = tnn.Linear(dim, dim)
        hidden = int(dim * mlp_ratio)
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def get_attn(self, q_in, k_in):
        q = self.q(self.norm(q_in))
        k = self.k(self.norm(k_in))
        return torch.softmax(q @ k.transpose(-1, -2), dim=-1)

    def forward(self, q_in, k_in):
        attn = self.get_attn(q_in, k_in)
        v = self.v(k_in)
        out = q_in + attn @ v
        h = self.fc2(F.gelu(self.fc1(self.norm2(out))))
        return out + h


def test_block_parity():
    torch.manual_seed(1)
    dim, n = 8, 12
    tb = TorchBlock(dim, 2.0)
    rng = np.random.RandomState(1)
    q = rng.randn(2, n, dim).astype(np.float32)
    k = rng.randn(2, n, dim).astype(np.float32)

    ref_attn = tb.get_attn(torch.from_numpy(q), torch.from_numpy(k)).detach().numpy()
    ref_out = tb(torch.from_numpy(q), torch.from_numpy(k)).detach().numpy()

    def lin(mod):
        return {"kernel": jnp.asarray(mod.weight.detach().numpy().T),
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    def ln(mod):
        return {"scale": jnp.asarray(mod.weight.detach().numpy()),
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    blk = Block(dim=dim, mlp_ratio=2.0)
    params = {"params": {
        "norm": ln(tb.norm), "norm2": ln(tb.norm2),
        "encode_query": lin(tb.q), "encode_key": lin(tb.k),
        "encode_value": lin(tb.v),
        "mlp": {"fc1": lin(tb.fc1), "fc2": lin(tb.fc2)},
    }}
    attn = blk.apply(params, jnp.asarray(q), jnp.asarray(k), method=blk.get_attn)
    np.testing.assert_allclose(np.asarray(attn), ref_attn, atol=1e-5)
    out = blk.apply(params, jnp.asarray(q), jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=1e-5)


def test_3d_sincos_shape_and_range():
    pe = get_3d_sincos_pos_embed(64, 16, 16)
    assert pe.shape == (16 * 16 * 16, 64)
    assert np.abs(pe).max() <= 1.0 + 1e-6
    # depth-axis code broadcasts over h,w: first channel block constant per slab
    pe3 = pe.reshape(16, 16, 16, 64)
    assert np.allclose(pe3[0, :, :, 0], pe3[0, 0, 0, 0])
