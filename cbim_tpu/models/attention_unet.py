"""Attention UNet, 2D + 3D (reference model/dim3/attention_unet.py:8 +
attention_unet_utils.py, model/dim2 twins): UNet encoder + additive attention
gates (W_g + W_x -> psi sigmoid) on the skip connections.

The reference's attention_up_block defines an unused ``conv_ch`` 1x1 conv
(attention_unet_utils.py:40 — dead parameters, never called in forward); it
is intentionally NOT reproduced, so parameter counts differ from the torch
reference by exactly that dead conv per decoder level (see
tests/test_models_zoo.py).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_linear
from .layers.convs import Norm, get_block_cls, torch_conv_init
from .unet import DownBlock, InConv


class AttentionGate(nn.Module):
    """additive gate (attention_unet_utils.py:6-34); InstanceNorm, no affine."""
    int_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        nd = g.ndim - 2
        g1 = nn.Conv(self.int_ch, (1,) * nd, use_bias=False,
                     kernel_init=torch_conv_init, dtype=self.dtype)(g)
        g1 = Norm("in", eps=1e-5, dtype=self.dtype)(g1, train)
        x1 = nn.Conv(self.int_ch, (1,) * nd, use_bias=False,
                     kernel_init=torch_conv_init, dtype=self.dtype)(x)
        x1 = Norm("in", eps=1e-5, dtype=self.dtype)(x1, train)
        psi = jax.nn.relu(g1 + x1)
        psi = nn.Conv(1, (1,) * nd, use_bias=False,
                      kernel_init=torch_conv_init, dtype=self.dtype)(psi)
        psi = Norm("in", eps=1e-5, dtype=self.dtype)(psi, train)
        return x * jax.nn.sigmoid(psi)


class AttentionUpBlock(nn.Module):
    """resize + gate skip + concat + blocks (attention_unet_utils.py:36-66)."""
    out_ch: int
    num_block: int
    block: str
    kernel_size: Any = 3
    norm: Any = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_low, x_skip, train: bool = False):
        x_low = resize_linear(x_low, x_skip.shape[1:-1])
        x_skip = AttentionGate(self.out_ch // 2, dtype=self.dtype)(
            x_low, x_skip, train)
        x = jnp.concatenate([x_skip, x_low], axis=-1)
        blk = get_block_cls(self.block)
        for _ in range(self.num_block):
            x = blk(self.out_ch, kernel_size=self.kernel_size, norm=self.norm,
                    dtype=self.dtype)(x, train)
        return x


class AttentionUNet3D(nn.Module):
    """reference model/dim3/attention_unet.py:8 (channels base*{1,2,4,8,10})."""
    num_classes: int
    base_ch: int = 32
    scale: Sequence = ((2, 2, 2),) * 4
    kernel_size: Sequence = ((3, 3, 3),) * 5
    block: str = "SingleConv"
    pool: bool = True
    norm: Any = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_ch
        ks = list(self.kernel_size)
        sc = list(self.scale)
        kw = dict(block=self.block, norm=self.norm, dtype=self.dtype)

        x1 = InConv(c, kernel_size=ks[0], **kw)(x, train)
        x2 = DownBlock(2 * c, 2, kernel_size=ks[1], down_scale=sc[0], pool=self.pool, **kw)(x1, train)
        x3 = DownBlock(4 * c, 2, kernel_size=ks[2], down_scale=sc[1], pool=self.pool, **kw)(x2, train)
        x4 = DownBlock(8 * c, 2, kernel_size=ks[3], down_scale=sc[2], pool=self.pool, **kw)(x3, train)
        x5 = DownBlock(10 * c, 2, kernel_size=ks[4], down_scale=sc[3], pool=self.pool, **kw)(x4, train)

        out = AttentionUpBlock(8 * c, 2, kernel_size=ks[3], **kw)(x5, x4, train)
        out = AttentionUpBlock(4 * c, 2, kernel_size=ks[2], **kw)(out, x3, train)
        out = AttentionUpBlock(2 * c, 2, kernel_size=ks[1], **kw)(out, x2, train)
        out = AttentionUpBlock(c, 2, kernel_size=ks[0], **kw)(out, x1, train)
        out = nn.Conv(self.num_classes, (1, 1, 1), use_bias=True,
                      kernel_init=torch_conv_init, dtype=self.dtype)(out)
        return out.astype(jnp.float32)


class AttentionUNet2D(nn.Module):
    """reference model/dim2/attention_unet.py:8 (channels base*{1,2,4,8,16})."""
    num_classes: int
    base_ch: int = 32
    block: str = "SingleConv"
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

        out = AttentionUpBlock(8 * c, 2, **kw)(x5, x4, train)
        out = AttentionUpBlock(4 * c, 2, **kw)(out, x3, train)
        out = AttentionUpBlock(2 * c, 2, **kw)(out, x2, train)
        out = AttentionUpBlock(c, 2, **kw)(out, x1, train)
        out = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                      kernel_init=torch_conv_init, dtype=self.dtype)(out)
        return out.astype(jnp.float32)
