"""UNETR (Hatamizadeh et al., arXiv:2103.10504).

The reference (model/dim3/unetr.py:22) composes MONAI's ViT backbone with
Unetr decoder blocks; MONAI isn't a dependency here, so the backbone and the
decoder blocks are implemented natively with the same architecture:

- ViT: 16^3 patches -> linear ("perceptron") embedding + learned position
  embeddings, 12 pre-norm transformer layers (hidden 768, mlp 3072, 12 heads,
  qkv without bias), skip taps after layers 4/7/10 (hidden_states[3/6/9],
  unetr.py:222-229).
- UnetrBasicBlock / UnetrPrUpBlock(conv_block=False => pure transposed-conv
  ladders) / UnetrUpBlock(res_block=True) / 1x1 out head, instance-norm
  (affine) + leaky-relu, matching the reference's instantiation
  (model/utils.py:99: feature_size 16, res_block=True, conv_block default
  False).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers.convs import torch_conv_init
from .layers.transformers import Attention, Mlp


class PatchEmbedding(nn.Module):
    """'perceptron' patch embedding: space-to-depth + Linear + pos embed."""
    hidden_size: int
    patch_size: Sequence[int] = (16, 16, 16)
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        pz, py, px = self.patch_size
        D, H, W = x.shape[1:4]
        gd, gh, gw = D // pz, H // py, W // px
        C = x.shape[-1]
        x = x.reshape(B, gd, pz, gh, py, gw, px, C)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            B, gd * gh * gw, pz * py * px * C)
        x = nn.Dense(self.hidden_size, kernel_init=torch_conv_init,
                     dtype=self.dtype)(x)
        n = gd * gh * gw
        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02), (1, n, self.hidden_size))
        x = x + pos
        return nn.Dropout(self.dropout_rate, deterministic=not train)(x)


class ViT(nn.Module):
    """12-layer pre-norm ViT returning (final, per-layer hidden states)."""
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    patch_size: Sequence[int] = (16, 16, 16)
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = PatchEmbedding(self.hidden_size, self.patch_size,
                           self.dropout_rate, dtype=self.dtype)(x, train)
        hidden = []
        head_dim = self.hidden_size // self.num_heads
        for _ in range(self.num_layers):
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
            x = x + Attention(self.num_heads, head_dim,
                              self.dropout_rate, self.dropout_rate,
                              dtype=self.dtype)(h, train)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
            x = x + Mlp(self.mlp_dim, self.hidden_size, act="gelu",
                        drop=self.dropout_rate, dtype=self.dtype)(h, train)
            hidden.append(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return x, hidden


def _instance_norm_affine(x, scale, bias, eps=1e-5):
    spatial = tuple(range(1, x.ndim - 1))
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=spatial, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=spatial, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


class _INorm(nn.Module):
    """Instance norm with affine (nnU-Net / MONAI dynunet convention)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return _instance_norm_affine(x, scale, bias)


class UnetResBlock(nn.Module):
    """conv-in-lrelu x2 with (optional) projected shortcut."""
    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        in_ch = x.shape[-1]
        k = (self.kernel_size,) * nd
        p = [(self.kernel_size // 2,) * 2] * nd
        lrelu = lambda t: jax.nn.leaky_relu(t, 0.01)  # noqa: E731

        out = nn.Conv(self.out_ch, k, strides=(self.stride,) * nd, padding=p,
                      use_bias=False, kernel_init=torch_conv_init,
                      dtype=self.dtype)(x)
        out = _INorm(dtype=self.dtype)(out)
        out = lrelu(out)
        out = nn.Conv(self.out_ch, k, padding=p, use_bias=False,
                      kernel_init=torch_conv_init, dtype=self.dtype)(out)
        out = _INorm(dtype=self.dtype)(out)
        if in_ch != self.out_ch or self.stride != 1:
            res = nn.Conv(self.out_ch, (1,) * nd, strides=(self.stride,) * nd,
                          use_bias=False, kernel_init=torch_conv_init,
                          dtype=self.dtype)(x)
            res = _INorm(dtype=self.dtype)(res)
        else:
            res = x
        return lrelu(out + res)


class _TranspConv(nn.Module):
    out_ch: int
    scale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        return nn.ConvTranspose(self.out_ch, kernel_size=(self.scale,) * nd,
                                strides=(self.scale,) * nd, padding="VALID",
                                use_bias=False, kernel_init=torch_conv_init,
                                dtype=self.dtype)(x)


class UNETR(nn.Module):
    """reference model/dim3/unetr.py:22 (feature_size 16, 96^3 default)."""
    num_classes: int
    img_size: Sequence[int] = (96, 96, 96)
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_in, train: bool = False):
        f = self.feature_size
        feat = tuple(s // 16 for s in self.img_size)

        # dec4 consumes the ViT's final (post-norm) tokens (unetr.py:220,230)
        x_final, hidden = ViT(self.hidden_size, self.mlp_dim, 12,
                              self.num_heads, dropout_rate=self.dropout_rate,
                              dtype=self.dtype)(x_in, train)

        def tokens_to_vol(t):
            B = t.shape[0]
            return t.reshape(B, *feat, self.hidden_size)

        enc1 = UnetResBlock(f, dtype=self.dtype)(x_in, train)

        # encoder2/3/4: transp-conv ladders from ViT taps (conv_block=False)
        e2 = tokens_to_vol(hidden[3])
        e2 = _TranspConv(2 * f, dtype=self.dtype)(e2)
        e2 = _TranspConv(2 * f, dtype=self.dtype)(e2)
        e2 = _TranspConv(2 * f, dtype=self.dtype)(e2)

        e3 = tokens_to_vol(hidden[6])
        e3 = _TranspConv(4 * f, dtype=self.dtype)(e3)
        e3 = _TranspConv(4 * f, dtype=self.dtype)(e3)

        e4 = tokens_to_vol(hidden[9])
        e4 = _TranspConv(8 * f, dtype=self.dtype)(e4)

        dec4 = tokens_to_vol(x_final)
        d3 = _TranspConv(8 * f, dtype=self.dtype)(dec4)
        d3 = UnetResBlock(8 * f, dtype=self.dtype)(
            jnp.concatenate([d3, e4], -1), train)
        d2 = _TranspConv(4 * f, dtype=self.dtype)(d3)
        d2 = UnetResBlock(4 * f, dtype=self.dtype)(
            jnp.concatenate([d2, e3], -1), train)
        d1 = _TranspConv(2 * f, dtype=self.dtype)(d2)
        d1 = UnetResBlock(2 * f, dtype=self.dtype)(
            jnp.concatenate([d1, e2], -1), train)
        d0 = _TranspConv(f, dtype=self.dtype)(d1)
        d0 = UnetResBlock(f, dtype=self.dtype)(
            jnp.concatenate([d0, enc1], -1), train)

        out = nn.Conv(self.num_classes, (1, 1, 1), use_bias=True,
                      kernel_init=torch_conv_init, dtype=self.dtype)(d0)
        return out.astype(jnp.float32)
