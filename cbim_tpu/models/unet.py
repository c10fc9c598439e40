"""UNet / ResUNet, 2D and 3D (reference model/dim3/unet.py, model/dim2/unet.py).

The 2D and 3D references differ structurally and both are reproduced:
- 3D (unet.py:12-64): channels base*{1,2,4,8,10}, per-level anisotropic
  kernel/scale lists, decoder = trilinear-resize-to-skip-shape + concat.
- 2D (dim2/unet.py:7-42): channels base*{1,2,4,8,16}, fixed 3x3 kernels,
  decoder = bilinear x2 upsample + 1x1 channel conv + concat.
Block choice via config ('SingleConv' -> UNet, 'BasicBlock' -> ResUNet).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_linear
from .layers.convs import ConvNormAct, get_block_cls, torch_conv_init, _tuple


class InConv(nn.Module):
    """plain conv + one block (unet_utils.py:7-21)."""
    out_ch: int
    block: str
    kernel_size: Any = 3
    norm: Any = "bn"
    act: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        k = _tuple(self.kernel_size, nd)
        x = nn.Conv(self.out_ch, kernel_size=k,
                    padding=[(ki // 2, ki // 2) for ki in k], use_bias=False,
                    kernel_init=torch_conv_init, dtype=self.dtype)(x)
        x = get_block_cls(self.block)(self.out_ch, kernel_size=self.kernel_size,
                                      norm=self.norm, act=self.act,
                                      dtype=self.dtype)(x, train)
        return x


class DownBlock(nn.Module):
    """maxpool-or-strided down + num_block blocks (unet_utils.py:24-46)."""
    out_ch: int
    num_block: int
    block: str
    kernel_size: Any = 3
    down_scale: Any = 2
    pool: bool = True
    norm: Any = "bn"
    act: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        scale = _tuple(self.down_scale, nd)
        blk = get_block_cls(self.block)
        if self.pool:
            x = nn.max_pool(x, window_shape=scale, strides=scale)
            x = blk(self.out_ch, kernel_size=self.kernel_size, norm=self.norm,
                    act=self.act, dtype=self.dtype)(x, train)
        else:
            x = blk(self.out_ch, kernel_size=self.kernel_size, stride=scale,
                    norm=self.norm, act=self.act, dtype=self.dtype)(x, train)
        for _ in range(self.num_block - 1):
            x = blk(self.out_ch, kernel_size=self.kernel_size, norm=self.norm,
                    act=self.act, dtype=self.dtype)(x, train)
        return x


class UpBlock3D(nn.Module):
    """resize-to-skip + concat + blocks (dim3 unet_utils.py:48-75)."""
    out_ch: int
    num_block: int
    block: str
    kernel_size: Any = 3
    norm: Any = "bn"
    act: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_low, x_skip, train: bool = False):
        x_low = resize_linear(x_low, x_skip.shape[1:-1])
        x = jnp.concatenate([x_skip, x_low], axis=-1)
        blk = get_block_cls(self.block)
        for _ in range(self.num_block):
            x = blk(self.out_ch, kernel_size=self.kernel_size, norm=self.norm,
                    act=self.act, dtype=self.dtype)(x, train)
        return x


class UpBlock2D(nn.Module):
    """bilinear x2 + 1x1 conv + concat + blocks (dim2 unet_utils.py:41-63)."""
    out_ch: int
    num_block: int
    block: str
    norm: Any = "bn"
    act: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_low, x_skip, train: bool = False):
        target = tuple(2 * s for s in x_low.shape[1:-1])
        x_low = resize_linear(x_low, target)
        x_low = nn.Conv(self.out_ch, kernel_size=(1, 1), use_bias=True,
                        kernel_init=torch_conv_init, dtype=self.dtype)(x_low)
        x = jnp.concatenate([x_skip, x_low], axis=-1)
        blk = get_block_cls(self.block)
        for _ in range(self.num_block):
            x = blk(self.out_ch, norm=self.norm, act=self.act,
                    dtype=self.dtype)(x, train)
        return x


class UNet3D(nn.Module):
    """Reference model/dim3/unet.py:12 (UNet / ResUNet by block choice)."""
    num_classes: int
    base_ch: int = 32
    scale: Sequence = ((2, 2, 2),) * 4
    kernel_size: Sequence = ((3, 3, 3),) * 5
    block: str = "SingleConv"
    pool: bool = True
    norm: Any = "bn"
    act: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_ch
        ks = list(self.kernel_size)
        sc = list(self.scale)
        kw = dict(block=self.block, norm=self.norm, act=self.act, dtype=self.dtype)

        x1 = InConv(c, kernel_size=ks[0], **kw)(x, train)
        x2 = DownBlock(2 * c, 2, kernel_size=ks[1], down_scale=sc[0], pool=self.pool, **kw)(x1, train)
        x3 = DownBlock(4 * c, 2, kernel_size=ks[2], down_scale=sc[1], pool=self.pool, **kw)(x2, train)
        x4 = DownBlock(8 * c, 2, kernel_size=ks[3], down_scale=sc[2], pool=self.pool, **kw)(x3, train)
        x5 = DownBlock(10 * c, 2, kernel_size=ks[4], down_scale=sc[3], pool=self.pool, **kw)(x4, train)

        out = UpBlock3D(8 * c, 2, kernel_size=ks[3], **kw)(x5, x4, train)
        out = UpBlock3D(4 * c, 2, kernel_size=ks[2], **kw)(out, x3, train)
        out = UpBlock3D(2 * c, 2, kernel_size=ks[1], **kw)(out, x2, train)
        out = UpBlock3D(c, 2, kernel_size=ks[0], **kw)(out, x1, train)
        out = nn.Conv(self.num_classes, kernel_size=(1, 1, 1), use_bias=True,
                      kernel_init=torch_conv_init, dtype=self.dtype)(out)
        return out.astype(jnp.float32)


class UNet2D(nn.Module):
    """Reference model/dim2/unet.py:7."""
    num_classes: int
    base_ch: int = 32
    block: str = "SingleConv"
    pool: bool = True
    norm: Any = "bn"
    act: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_ch
        kw = dict(block=self.block, norm=self.norm, act=self.act, dtype=self.dtype)

        x1 = InConv(c, **kw)(x, train)
        x2 = DownBlock(2 * c, 2, down_scale=2, pool=self.pool, **kw)(x1, train)
        x3 = DownBlock(4 * c, 2, down_scale=2, pool=self.pool, **kw)(x2, train)
        x4 = DownBlock(8 * c, 2, down_scale=2, pool=self.pool, **kw)(x3, train)
        x5 = DownBlock(16 * c, 2, down_scale=2, pool=self.pool, **kw)(x4, train)

        out = UpBlock2D(8 * c, 2, **kw)(x5, x4, train)
        out = UpBlock2D(4 * c, 2, **kw)(out, x3, train)
        out = UpBlock2D(2 * c, 2, **kw)(out, x2, train)
        out = UpBlock2D(c, 2, **kw)(out, x1, train)
        out = nn.Conv(self.num_classes, kernel_size=(1, 1), use_bias=True,
                      kernel_init=torch_conv_init, dtype=self.dtype)(out)
        return out.astype(jnp.float32)
