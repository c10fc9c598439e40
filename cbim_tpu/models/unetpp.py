"""UNet++ (nested UNet), 2D + 3D (reference model/dim3/unetpp.py:8,
model/dim2/unetpp.py:7): dense skip grid x_{i,j}, maxpool down, linear
(align_corners=True) upsample, single output head.

3D channels are base*{1,2,4,8,10} with per-level anisotropic scales;
2D channels are base*{1,2,4,8,16} with fixed 2x pooling.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_linear
from .layers.convs import get_block_cls, torch_conv_init, _tuple


class _Stage(nn.Module):
    out_ch: int
    num_block: int
    block: str
    kernel_size: Any = 3
    norm: Any = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        blk = get_block_cls(self.block)
        for _ in range(self.num_block):
            x = blk(self.out_ch, kernel_size=self.kernel_size, norm=self.norm,
                    dtype=self.dtype)(x, train)
        return x


class _UNetPlusPlus(nn.Module):
    num_classes: int
    base_ch: int = 32
    block: str = "SingleConv"
    norm: Any = "bn"
    scale: Sequence = ((2, 2, 2),) * 4
    kernel_size: Sequence = ((3, 3, 3),) * 5
    ch_mult: Sequence[int] = (1, 2, 4, 8, 10)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        n = [self.base_ch * m for m in self.ch_mult]
        ks = list(self.kernel_size)
        sc = [_tuple(s, nd) for s in self.scale]
        kw = dict(block=self.block, norm=self.norm, dtype=self.dtype)

        def pool(t, level):
            return nn.max_pool(t, window_shape=sc[level], strides=sc[level])

        def up(t, level):
            target = tuple(d * s for d, s in zip(t.shape[1:-1], sc[level]))
            return resize_linear(t, target)

        def stage(name_in, out_ch, k):
            return _Stage(out_ch, 2, kernel_size=ks[k], **kw)

        cat = lambda *ts: jnp.concatenate(ts, axis=-1)  # noqa: E731

        x0_0 = stage(None, n[0], 0)(x, train)
        x1_0 = stage(None, n[1], 1)(pool(x0_0, 0), train)
        x0_1 = stage(None, n[0], 0)(cat(x0_0, up(x1_0, 0)), train)

        x2_0 = stage(None, n[2], 2)(pool(x1_0, 1), train)
        x1_1 = stage(None, n[1], 1)(cat(x1_0, up(x2_0, 1)), train)
        x0_2 = stage(None, n[0], 0)(cat(x0_0, x0_1, up(x1_1, 0)), train)

        x3_0 = stage(None, n[3], 3)(pool(x2_0, 2), train)
        x2_1 = stage(None, n[2], 2)(cat(x2_0, up(x3_0, 2)), train)
        x1_2 = stage(None, n[1], 1)(cat(x1_0, x1_1, up(x2_1, 1)), train)
        x0_3 = stage(None, n[0], 0)(cat(x0_0, x0_1, x0_2, up(x1_2, 0)), train)

        x4_0 = stage(None, n[4], 4)(pool(x3_0, 3), train)
        x3_1 = stage(None, n[3], 3)(cat(x3_0, up(x4_0, 3)), train)
        x2_2 = stage(None, n[2], 2)(cat(x2_0, x2_1, up(x3_1, 2)), train)
        x1_3 = stage(None, n[1], 1)(cat(x1_0, x1_1, x1_2, up(x2_2, 1)), train)
        x0_4 = stage(None, n[0], 0)(cat(x0_0, x0_1, x0_2, x0_3, up(x1_3, 0)), train)

        out = nn.Conv(self.num_classes, (1,) * nd, use_bias=True,
                      kernel_init=torch_conv_init, dtype=self.dtype)(x0_4)
        return out.astype(jnp.float32)


class UNetPlusPlus3D(_UNetPlusPlus):
    ch_mult: Sequence[int] = (1, 2, 4, 8, 10)


class UNetPlusPlus2D(_UNetPlusPlus):
    scale: Sequence = ((2, 2),) * 4
    kernel_size: Sequence = (3, 3, 3, 3, 3)
    ch_mult: Sequence[int] = (1, 2, 4, 8, 16)
