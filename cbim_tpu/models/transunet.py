"""TransUNet (Chen et al., arXiv:2102.04306) — reference model/dim2/transunet.py
(vendored official impl), R50-ViT-B_16 variant as instantiated by
model/utils.py:43-55.

- hybrid stem: ResNetV2 (weight-standardized convs + GroupNorm(32), pre-act
  bottlenecks, blocks (3,4,9), width 64) producing skips at /2, /4, /8
- ViT-B/16 over the /16 CNN features (1x1 patch conv, learned pos embed,
  12 layers, hidden 768, mlp 3072, heads 12, dropout 0.1)
- DecoderCup: conv_more(512) + 4 upsample blocks (channels 256,128,64,16)
  with skips [512, 256, 64, 0]; 3x3 segmentation head
- single-channel inputs are repeated to 3 channels (transunet.py:768-770)
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_linear
from .layers.convs import torch_conv_init
from .layers.transformers import Attention, Mlp


class StdConv(nn.Module):
    """Weight-standardized conv (transunet.py StdConv2d)."""
    out_ch: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = (self.kernel, self.kernel)
        w = self.param("kernel", torch_conv_init,
                       (*k, in_ch, self.out_ch))
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
        w = (w - mean) / jnp.sqrt(var + 1e-5)
        p = self.kernel // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.out_ch,))
        return y


def group_norm(x, groups, scale, bias, eps=1e-6):
    B = x.shape[0]
    C = x.shape[-1]
    g = min(groups, C)
    xg = x.reshape(B, -1, g, C // g).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xg = (xg - mean) / jnp.sqrt(var + eps)
    return (xg.reshape(x.shape) * scale + bias).astype(x.dtype)


class GN(nn.Module):
    groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return group_norm(x, self.groups, scale, bias, self.eps)


class PreActBottleneck(nn.Module):
    """transunet.py PreActBottleneck (conv-gn-relu x3 + projected residual)."""
    cout: int
    cmid: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        residual = x
        if self.stride != 1 or cin != self.cout:
            residual = StdConv(self.cout, 1, self.stride, dtype=self.dtype)(x)
            # gn_proj is constructed WITHOUT eps=1e-6 (transunet.py:1270),
            # so it gets the torch GroupNorm default 1e-5
            residual = GN(groups=self.cout, eps=1e-5)(residual)
        y = jax.nn.relu(GN()(StdConv(self.cmid, 1, dtype=self.dtype)(x)))
        y = jax.nn.relu(GN()(StdConv(self.cmid, 3, self.stride,
                                     dtype=self.dtype)(y)))
        y = GN()(StdConv(self.cout, 1, dtype=self.dtype)(y))
        return jax.nn.relu(y + residual)


class ResNetV2(nn.Module):
    """transunet.py ResNetV2 (blocks (3,4,9), width 64)."""
    block_units: Sequence[int] = (3, 4, 9)
    width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.width
        in_size = x.shape[1]
        x = StdConv(w, 7, 2, dtype=self.dtype)(x)
        x = jax.nn.relu(GN()(x))
        features = [x]                                     # /2, width
        # the vendored forward maxpools with padding=0 (transunet.py:1448),
        # so a 112 map becomes 55 and the BODY runs on the 55 grid; only the
        # SKIP features are zero-padded bottom/right to in_size/4/(i+1)
        # (transunet.py:1439-1449)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        chans = [(w * 4, w, 1), (w * 8, w * 2, 2), (w * 16, w * 4, 2)]
        for bi, (cout, cmid, stride) in enumerate(chans):
            for u in range(self.block_units[bi]):
                x = PreActBottleneck(cout, cmid, stride if u == 0 else 1,
                                     dtype=self.dtype)(x)
            if bi < 2:
                right = in_size // 4 // (bi + 1)
                ph, pw = right - x.shape[1], right - x.shape[2]
                feat = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0))) \
                    if (ph or pw) else x
                features.append(feat)                      # /4, /8
        return x, features[::-1]                           # /16 + [512@/8, 256@/4, 64@/2]


class TransUNet(nn.Module):
    """reference model/dim2/transunet.py:740 (R50-ViT-B_16)."""
    num_classes: int
    img_size: int = 224
    grid: Sequence[int] = (14, 14)
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    dropout: float = 0.1
    decoder_channels: Sequence[int] = (256, 128, 64, 16)
    n_skip: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))                  # transunet.py:768-770

        feat, skips = ResNetV2(dtype=self.dtype)(x)

        # 1x1 patch embedding over /16 CNN features
        h = nn.Conv(self.hidden_size, (1, 1), use_bias=True,
                    kernel_init=torch_conv_init, dtype=self.dtype)(feat)
        B, gh, gw, _ = h.shape
        tokens = h.reshape(B, gh * gw, self.hidden_size)
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, gh * gw, self.hidden_size))
        tokens = tokens + pos
        tokens = nn.Dropout(self.dropout, deterministic=not train)(tokens)

        hd = self.hidden_size // self.num_heads
        for _ in range(self.num_layers):
            t = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(tokens)
            # attention_dropout_rate is 0.0 in R50-ViT-B_16 (transunet.py
            # CONFIGS); only mlp/embedding dropout uses dropout_rate=0.1
            tokens = tokens + Attention(self.num_heads, hd, 0.0, 0.0,
                                        qkv_bias=True, dtype=self.dtype)(t, train)
            t = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(tokens)
            tokens = tokens + Mlp(self.mlp_dim, self.hidden_size, act="gelu",
                                  drop=self.dropout, dtype=self.dtype)(t, train)
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(tokens)

        # DecoderCup
        def conv_bn_relu(t, ch):
            t = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        kernel_init=torch_conv_init, dtype=self.dtype)(t)
            t = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(t)
            return jax.nn.relu(t)

        y = tokens.reshape(B, gh, gw, self.hidden_size)
        y = conv_bn_relu(y, 512)
        skip_list = list(skips[:self.n_skip]) + [None] * (4 - self.n_skip)
        for ch, skip in zip(self.decoder_channels, skip_list):
            y = resize_linear(y, tuple(2 * s for s in y.shape[1:-1]))
            if skip is not None:
                y = jnp.concatenate([y, skip], axis=-1)
            y = conv_bn_relu(y, ch)
            y = conv_bn_relu(y, ch)

        out = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=True, kernel_init=torch_conv_init,
                      dtype=self.dtype)(y)
        return out.astype(jnp.float32)
