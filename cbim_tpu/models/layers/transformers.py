"""Transformer primitives (Flax), mirroring reference model/dim*/trans_layers.py.

Attention is expressed as einsums so XLA maps the contractions straight onto
the MXU; softmax/statistics run in fp32 even under bf16 compute.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .convs import get_act, torch_conv_init


class Mlp(nn.Module):
    """trans_layers.py:16-33."""
    hid_dim: int | None = None
    out_dim: int | None = None
    act: Any = "gelu"
    drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dim = x.shape[-1]
        hid = self.hid_dim or in_dim
        out = self.out_dim or in_dim
        act = get_act(self.act)
        x = nn.Dense(hid, kernel_init=torch_conv_init, dtype=self.dtype)(x)
        x = act(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(out, kernel_init=torch_conv_init, dtype=self.dtype)(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        return x


class Attention(nn.Module):
    """trans_layers.py:45-98 — plain MHSA on (B, L, C) sequences."""
    heads: int
    dim_head: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    qkv_bias: bool = False      # trans_layers.py uses bias=False; ViT True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = x.shape[-1]
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=self.qkv_bias,
                       kernel_init=torch_conv_init, dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # B, L, (h d) -> B, h, L, d
            b, l, _ = t.shape
            return t.reshape(b, l, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scale = self.dim_head ** -0.5
        attn = jnp.einsum("bhid,bhjd->bhij", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        b, h, l, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, h * d)
        out = nn.Dense(dim, kernel_init=torch_conv_init, dtype=self.dtype)(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class TransformerBlock(nn.Module):
    """trans_layers.py:101-118 — depth x (PreNorm MHSA + PreNorm MLP)."""
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.depth):
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
            x = Attention(self.heads, self.dim_head, self.attn_drop,
                          self.proj_drop, dtype=self.dtype)(h, train) + x
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
            x = Mlp(self.mlp_dim, x.shape[-1], drop=self.proj_drop,
                    dtype=self.dtype)(h, train) + x
        return x
