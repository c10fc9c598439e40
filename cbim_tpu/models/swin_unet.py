"""SwinUnet (Cao et al., arXiv:2105.05537) — reference model/dim2/swin_unet.py
(vendored official SwinTransformerSys), fixed 224 input, embed 96,
depths [2,2,6,2] / decoder [2,2,2,2], heads [3,6,12,24], window 7.

Symmetric 2D swin encoder-decoder: patch-4 conv embed (+abs pos off), swin
stages with PatchMerging; decoder PatchExpand (linear 2x) with linear skip
fusion, FinalPatchExpand_X4 and a 1x1 head.  Reuses the rank-generic
shifted-window machinery from swin_layers.py.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers.convs import torch_conv_init
from .swin_layers import PatchMergingLegacy, SwinBlock


class PatchExpand2D(nn.Module):
    """linear 2x upsample, halve channels (swin_unet.py PatchExpand)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = nn.Dense(2 * C, use_bias=False, kernel_init=torch_conv_init,
                     dtype=self.dtype)(x)
        x = x.reshape(B, H, W, 2, 2, C // 2)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, C // 2)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)


class FinalPatchExpandX4(nn.Module):
    """linear 4x pixel shuffle, keep dim (swin_unet.py FinalPatchExpand_X4)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = nn.Dense(16 * C, use_bias=False, kernel_init=torch_conv_init,
                     dtype=self.dtype)(x)
        x = x.reshape(B, H, W, 4, 4, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 4 * H, 4 * W, C)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)


class SwinUnet2D(nn.Module):
    """reference model/dim2/swin_unet.py:1559 (SwinUnet_config defaults)."""
    num_classes: int
    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    depths_decoder: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))      # vendored SwinUnet repeats 1->3
        ps = (self.patch_size, self.patch_size)
        total = sum(self.depths)
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total)]
        win = (self.window_size, self.window_size)
        shift = tuple(w // 2 for w in win)
        nl = len(self.depths)

        h = nn.Conv(self.embed_dim, kernel_size=ps, strides=ps,
                    padding="VALID", use_bias=True,
                    kernel_init=torch_conv_init, dtype=self.dtype)(x)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)   # patch_norm

        skips = []
        d0 = 0
        for i, depth in enumerate(self.depths):
            skips.append(h)
            for b in range(depth):
                h = SwinBlock(self.num_heads[i], win,
                              (0, 0) if b % 2 == 0 else shift, self.mlp_ratio,
                              True, 0.0, 0.0, dpr[d0 + b],
                              dtype=self.dtype)(h, train)
            d0 += depth
            if i < nl - 1:
                h = PatchMergingLegacy(dtype=self.dtype)(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)

        for inx in range(nl):
            if inx == 0:
                h = PatchExpand2D(dtype=self.dtype)(h)
                continue
            stage = nl - 1 - inx
            h = jnp.concatenate([h, skips[nl - 1 - inx]], axis=-1)
            # the vendored concat_back_dim Linear has a bias (swin_unet.py:1320)
            h = nn.Dense(self.embed_dim * 2 ** stage, use_bias=True,
                         kernel_init=torch_conv_init, dtype=self.dtype)(h)
            # the reference decoder reuses the ENCODER depths reversed
            # (swin_unet.py:1338: depth = depths[num_layers-1-i_layer]);
            # depths_decoder is printed but not used for construction
            dps = dpr[sum(self.depths[:stage]):sum(self.depths[:stage + 1])]
            for b in range(self.depths[stage]):
                h = SwinBlock(self.num_heads[stage], win,
                              (0, 0) if b % 2 == 0 else shift, self.mlp_ratio,
                              True, 0.0, 0.0, dps[b], dtype=self.dtype)(h, train)
            if inx < nl - 1:
                h = PatchExpand2D(dtype=self.dtype)(h)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)   # norm_up
        h = FinalPatchExpandX4(dtype=self.dtype)(h)
        out = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                      kernel_init=torch_conv_init, dtype=self.dtype)(h)
        return out.astype(jnp.float32)
