"""Attention blocks and sincos positional embeddings.

Functional parity with the reference's attention library
(models/model_utils.py:9-438), rewritten channels-last ([B, N, C] tokens) so
the projections are plain Dense layers feeding the MXU. Quirks of the
reference that are load-bearing and preserved exactly:

  - `Block`/`Attention` use *unscaled* dot-product attention, a single head,
    and value projections computed from the RAW key input (no norm/pos-embed)
    (models/model_utils.py:189,216-228).
  - The Perceiver-style `CrossAttention`/`SelfAttention` apply their output
    MLP WITHOUT a residual connection (models/model_utils.py:395,427).
  - Positional embeddings are numpy-precomputed constants: 2D sincos scaled by
    0.05 as a learnable init (models/pose_estimator_2d.py:50-51), 3D sincos
    scaled by 0.1 as a fixed coordinate code (models/pose_estimator_3d.py:129).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


# ---------------------------------------------------------------------------
# sincos positional embeddings (host-side numpy; reference: model_utils.py:9-88)
# ---------------------------------------------------------------------------

def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    pos = pos.reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """[grid_size**2, embed_dim] (reference: model_utils.py:9-35)."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first
    grid = grid.reshape([2, 1, grid_size, grid_size])
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def get_3d_sincos_pos_embed(
    embed_dim: int, grid_size: int, temporal_size: int
) -> np.ndarray:
    """[temporal_size*grid_size**2, embed_dim] (reference: model_utils.py:59-88).

    Interleaved sin/cos per axis; channel thirds are (depth, height, width)
    codes broadcast over the other two axes; truncated to embed_dim.
    """

    def get_emb(sin_inp):
        emb = np.stack([np.sin(sin_inp), np.cos(sin_inp)], axis=-1)
        return emb.reshape(sin_inp.shape[0], -1)

    channels = int(np.ceil(embed_dim / 6) * 2)
    if channels % 2:
        channels += 1
    inv_freq = 1.0 / (10000 ** (np.arange(0, channels, 2, dtype=np.float64) / channels))

    pos_g = np.arange(grid_size, dtype=np.float64)
    pos_t = np.arange(temporal_size, dtype=np.float64)
    emb_h = get_emb(np.einsum("i,j->ij", pos_g, inv_freq))            # [g, c]
    emb_w = get_emb(np.einsum("i,j->ij", pos_g, inv_freq))[:, None]   # [g, 1, c]
    emb_t = get_emb(np.einsum("i,j->ij", pos_t, inv_freq))[:, None, None]  # [t,1,1,c]

    emb = np.zeros((temporal_size, grid_size, grid_size, channels * 3))
    emb[..., :channels] = emb_t
    emb[..., channels : 2 * channels] = emb_w
    emb[..., 2 * channels :] = emb_h
    return emb.reshape(-1, channels * 3)[:, :embed_dim]


# ---------------------------------------------------------------------------
# Conv1d-projected single-head block (reference: model_utils.py:144-229)
# ---------------------------------------------------------------------------

class Mlp(nn.Module):
    """fc1 -> GELU -> fc2 (reference: model_utils.py:232-255)."""

    hidden: int
    out: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        init = nn.initializers.xavier_uniform()
        binit = nn.initializers.normal(1e-6)
        x = nn.Dense(self.hidden, kernel_init=init, bias_init=binit, name="fc1", **kw)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, kernel_init=init, bias_init=binit, name="fc2", **kw)(x)
        return x


class Block(nn.Module):
    """Single-head unscaled-attention block over [B, N, C] tokens.

    `get_attn` exposes the raw softmax attention matrix — the pose transformer
    multiplies it against a positional code to read out soft 3D
    correspondences (reference: models/pose_estimator_3d.py:140-141).
    """

    dim: int
    mlp_ratio: float = 4.0
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.norm = nn.LayerNorm(epsilon=1e-5, **kw)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, **kw)
        self.encode_query = nn.Dense(self.dim, **kw)
        self.encode_key = nn.Dense(self.dim, **kw)
        self.encode_value = nn.Dense(self.dim, **kw)
        self.mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, **kw)

    def _qk(self, query, key, query_embed=None, key_embed=None):
        q = query if query_embed is None else query + query_embed
        k = key if key_embed is None else key + key_embed
        q = self.encode_query(self.norm(q))
        k = self.encode_key(self.norm(k))
        return q, k

    def get_attn(self, query, key, query_embed=None, key_embed=None):
        q, k = self._qk(query, key, query_embed, key_embed)
        attn = jnp.einsum("bnc,bmc->bnm", q, k)  # unscaled, as in reference
        return jax.nn.softmax(attn, axis=-1)

    def __call__(self, query, key, query_embed=None, key_embed=None):
        q, k = self._qk(query, key, query_embed, key_embed)
        v = self.encode_value(key)  # raw key input, reference: model_utils.py:189
        attn = jax.nn.softmax(jnp.einsum("bnc,bmc->bnm", q, k), axis=-1)
        out = query + jnp.einsum("bnm,bmc->bnc", attn, v)
        out = out + self.mlp(self.norm2(out))
        return out


# ---------------------------------------------------------------------------
# Perceiver-style attention (reference: model_utils.py:258-438)
# ---------------------------------------------------------------------------

class MultiHeadAttention(nn.Module):
    """Scaled multi-head attention (reference: model_utils.py:258-342)."""

    num_heads: int
    qk_channels: int
    v_channels: int
    out_channels: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_q, x_k, x_v):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = self.num_heads
        q = nn.Dense(self.qk_channels, name="q_proj", **kw)(x_q)
        k = nn.Dense(self.qk_channels, name="k_proj", **kw)(x_k)
        v = nn.Dense(self.v_channels, name="v_proj", **kw)(x_v)
        scale = (self.qk_channels // h) ** -0.5

        def split(t, c):
            b, n, _ = t.shape
            return t.reshape(b, n, h, c // h).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q, self.qk_channels), split(k, self.qk_channels), split(v, self.v_channels)
        attn = jnp.einsum("bhic,bhjc->bhij", qh, kh) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhij,bhjc->bhic", attn, vh)
        b, _, n, _ = o.shape
        o = o.transpose(0, 2, 1, 3).reshape(b, n, self.v_channels)
        return nn.Dense(self.out_channels, name="o_proj", **kw)(o)


class MlpAttention(nn.Module):
    """LayerNorm -> widen -> GELU -> narrow (reference: model_utils.py:345-356)."""

    channels: int
    widening: int
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.LayerNorm(epsilon=1e-5, **kw)(x)
        x = nn.Dense(self.widening * self.channels, **kw)(x)
        x = jax.nn.gelu(x, approximate=False)
        return nn.Dense(self.channels, **kw)(x)


class CrossAttention(nn.Module):
    """Pre-norm cross-attention; output MLP is NOT residual (reference quirk)."""

    num_heads: int
    q_channels: int
    kv_channels: int
    mlp_ratio: int = 1
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_q, x_k, x_v, residual=None):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        xq = nn.LayerNorm(epsilon=1e-5, name="q_norm", **kw)(x_q)
        xk = nn.LayerNorm(epsilon=1e-5, name="k_norm", **kw)(x_k)
        xv = nn.LayerNorm(epsilon=1e-5, name="v_norm", **kw)(x_v)
        attn = MultiHeadAttention(
            self.num_heads, self.q_channels, self.q_channels, self.q_channels,
            name="attention", **kw,
        )(xq, xk, xv)
        out = attn if residual is None else residual + attn
        return MlpAttention(self.q_channels, self.mlp_ratio, name="mlp", **kw)(out)


class SelfAttention(nn.Module):
    """Pre-norm self-attention; output MLP is NOT residual (reference quirk)."""

    num_heads: int
    channels: int
    mlp_ratio: int = 1
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        xn = nn.LayerNorm(epsilon=1e-5, name="norm", **kw)(x)
        attn = MultiHeadAttention(
            self.num_heads, self.channels, self.channels, self.channels,
            name="attention", **kw,
        )(xn, xn, xn)
        out = xn + attn
        return MlpAttention(self.channels, self.mlp_ratio, name="mlp", **kw)(out)
