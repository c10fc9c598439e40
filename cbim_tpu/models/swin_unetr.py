"""SwinUNETR (Hatamizadeh et al., arXiv:2201.01266).

Reference: the vendored MONAI copy at model/dim3/swin_unetr.py:32, with its
local modifications kept: depths=(2,2,2,0) (the 4th stage is downsample-only,
swin_unetr.py:44) and the v0.9.0 'merging' PatchMerging (duplicate-slice
variant).  Encoder taps x0..x4 are layer-normed ('normalize', :1070-1086),
decoders are UnetrUpBlocks with instance-norm res blocks.

TPU notes: everything is channels-last; window masks and bias indices are
trace-time numpy constants; window attention batches all windows as one
einsum batch (MXU-friendly).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers.convs import torch_conv_init
from .swin_layers import PatchMergingLegacy, SwinBlock
from .unetr import UnetResBlock, _TranspConv


class SwinTransformer3D(nn.Module):
    """swin_unetr.py:876-1087 (backbone returning 5 normalized taps)."""
    embed_dim: int = 48
    window_size: Sequence[int] = (7, 7, 7)
    patch_size: Sequence[int] = (2, 2, 2)
    depths: Sequence[int] = (2, 2, 2, 0)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    normalize: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        # PatchEmbed: strided conv, no norm (patch_norm=False)
        x = nn.Conv(self.embed_dim, kernel_size=tuple(self.patch_size),
                    strides=tuple(self.patch_size), padding="VALID",
                    use_bias=True, kernel_init=torch_conv_init,
                    dtype=self.dtype)(x)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)

        def proj_out(t):
            if not self.normalize:
                return t
            # parameter-free layer norm over C (F.layer_norm, :1067-1080)
            mean = jnp.mean(t.astype(jnp.float32), axis=-1, keepdims=True)
            var = jnp.var(t.astype(jnp.float32), axis=-1, keepdims=True)
            return ((t.astype(jnp.float32) - mean) /
                    jnp.sqrt(var + 1e-5)).astype(t.dtype)

        total_depth = sum(self.depths)
        dpr = [float(v) for v in
               jnp.linspace(0, self.drop_path_rate, max(total_depth, 1))]

        outs = [proj_out(x)]
        shift = tuple(w // 2 for w in self.window_size)
        d0 = 0
        for i, depth in enumerate(self.depths):
            for b in range(depth):
                x = SwinBlock(self.num_heads[i], self.window_size,
                              (0,) * nd if b % 2 == 0 else shift,
                              self.mlp_ratio, self.qkv_bias, self.drop_rate,
                              self.attn_drop_rate, dpr[d0 + b],
                              dtype=self.dtype)(x, train)
            d0 += depth
            x = PatchMergingLegacy(dtype=self.dtype)(x)
            outs.append(proj_out(x))
        return outs


class SwinUNETR(nn.Module):
    """reference model/dim3/swin_unetr.py:32 (feature_size = cfg base_chan)."""
    num_classes: int
    img_size: Sequence[int] = (96, 96, 96)
    in_chan: int = 1
    feature_size: int = 24
    depths: Sequence[int] = (2, 2, 2, 0)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    dropout_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_in, train: bool = False):
        f = self.feature_size
        hs = SwinTransformer3D(embed_dim=f, depths=tuple(self.depths),
                               num_heads=tuple(self.num_heads),
                               drop_rate=self.drop_rate,
                               attn_drop_rate=self.attn_drop_rate,
                               drop_path_rate=self.dropout_path_rate,
                               dtype=self.dtype)(x_in, train)

        enc0 = UnetResBlock(f, dtype=self.dtype)(x_in, train)
        enc1 = UnetResBlock(f, dtype=self.dtype)(hs[0], train)
        enc2 = UnetResBlock(2 * f, dtype=self.dtype)(hs[1], train)
        enc3 = UnetResBlock(4 * f, dtype=self.dtype)(hs[2], train)
        dec4 = UnetResBlock(16 * f, dtype=self.dtype)(hs[4], train)

        def up(x_low, skip, out_ch):
            y = _TranspConv(out_ch, dtype=self.dtype)(x_low)
            y = jnp.concatenate([y, skip], axis=-1)
            return UnetResBlock(out_ch, dtype=self.dtype)(y, train)

        dec3 = up(dec4, hs[3], 8 * f)
        dec2 = up(dec3, enc3, 4 * f)
        dec1 = up(dec2, enc2, 2 * f)
        dec0 = up(dec1, enc1, f)
        out = up(dec0, enc0, f)
        logits = nn.Conv(self.num_classes, (1, 1, 1), use_bias=True,
                         kernel_init=torch_conv_init, dtype=self.dtype)(out)
        return logits.astype(jnp.float32)
