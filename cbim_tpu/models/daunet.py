"""Dual-Attention UNet, 2D (reference model/dim2/dual_attention_unet.py:8 +
dual_attention_utils.py): UNet with a DAHead on the bottleneck combining
position attention (PAM, pixel-pair affinity) and channel attention (CAM,
gram-matrix over channels), each with a learned zero-initialized residual
gain.  Both attention matmuls are expressed as batched einsums (MXU-mapped);
softmax statistics run in fp32.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers.convs import Norm, torch_conv_init
from .unet import DownBlock, InConv, UpBlock2D


class PAM(nn.Module):
    """Position attention (dual_attention_utils.py:75-113)."""
    reduction: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        q = nn.Conv(C // self.reduction, (1, 1), use_bias=True,
                    kernel_init=torch_conv_init, dtype=self.dtype)(x)
        k = nn.Conv(C // self.reduction, (1, 1), use_bias=True,
                    kernel_init=torch_conv_init, dtype=self.dtype)(x)
        v = nn.Conv(C, (1, 1), use_bias=True,
                    kernel_init=torch_conv_init, dtype=self.dtype)(x)
        q = q.reshape(B, H * W, -1)
        k = k.reshape(B, H * W, -1)
        v = v.reshape(B, H * W, C)
        energy = jnp.einsum("bic,bjc->bij", q, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(energy, axis=-1).astype(v.dtype)
        out = jnp.einsum("bij,bjc->bic", attn, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        gamma_p = self.param("gamma", nn.initializers.zeros, (1,))
        return (gamma_p * out.reshape(B, H, W, C) + x)


class CAM(nn.Module):
    """Channel attention (dual_attention_utils.py:116-146)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        flat = x.reshape(B, H * W, C)
        energy = jnp.einsum("bnc,bnd->bcd", flat, flat,
                            preferred_element_type=jnp.float32)
        energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = jax.nn.softmax(energy_new, axis=-1).astype(x.dtype)
        out = jnp.einsum("bcd,bnd->bnc", attn, flat,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        gamma_p = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma_p * out.reshape(B, H, W, C) + x


class DAHead(nn.Module):
    """dual_attention_utils.py:7-72; returns (fused, sasc, sa, sc) heads."""
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        inter = C // 4

        def bn_relu_conv(t, out_ch, k):
            t = Norm("bn", eps=1e-5, dtype=self.dtype)(t, train)
            t = jax.nn.relu(t)
            return nn.Conv(out_ch, (k, k), padding=[(k // 2, k // 2)] * 2,
                           use_bias=(k == 1), kernel_init=torch_conv_init,
                           dtype=self.dtype)(t)

        sa = bn_relu_conv(x, inter, 3)
        sa = PAM(dtype=self.dtype)(sa)
        sa = bn_relu_conv(sa, C, 1)

        sc = bn_relu_conv(x, inter, 3)
        sc = CAM(dtype=self.dtype)(sc)
        sc = bn_relu_conv(sc, C, 1)

        fused = sa + sc

        def head(t):
            t = nn.Dropout(0.1, deterministic=not train)(t)
            return nn.Conv(self.num_classes, (1, 1), use_bias=True,
                           kernel_init=torch_conv_init, dtype=self.dtype)(t)

        return fused, head(fused), head(sa), head(sc)


class DAUNet2D(nn.Module):
    """reference model/dim2/dual_attention_unet.py:8."""
    num_classes: int
    base_ch: int = 32
    block: str = "BasicBlock"
    pool: bool = True
    norm: Any = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_ch
        kw = dict(block=self.block, norm=self.norm, dtype=self.dtype)

        x1 = InConv(c, **kw)(x, train)
        x2 = DownBlock(2 * c, 2, down_scale=2, pool=self.pool, **kw)(x1, train)
        x3 = DownBlock(4 * c, 2, down_scale=2, pool=self.pool, **kw)(x2, train)
        x4 = DownBlock(8 * c, 2, down_scale=2, pool=self.pool, **kw)(x3, train)
        x5 = DownBlock(16 * c, 2, down_scale=2, pool=self.pool, **kw)(x4, train)

        fused, _sasc, _sa, _sc = DAHead(self.num_classes, dtype=self.dtype)(x5, train)

        out = UpBlock2D(8 * c, 2, **kw)(fused, x4, train)
        out = UpBlock2D(4 * c, 2, **kw)(out, x3, train)
        out = UpBlock2D(2 * c, 2, **kw)(out, x2, train)
        out = UpBlock2D(c, 2, **kw)(out, x1, train)
        out = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                      kernel_init=torch_conv_init, dtype=self.dtype)(out)
        return out.astype(jnp.float32)
