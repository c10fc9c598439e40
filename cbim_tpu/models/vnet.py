"""V-Net (reference model/dim3/vnet.py, after mattmacy/vnet.pytorch).

5x5x5 convs, ELU or PReLU, strided-conv downsampling, transposed-conv
upsampling, channel-repeat input residual, and 'ContBatchNorm' — a BatchNorm
that ALWAYS normalizes with batch statistics (vnet.py:22-32), reproduced here
as a stateless batch-stat norm with learned affine (its running buffers never
influence the reference forward pass).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers.convs import torch_conv_init, _tuple


class ContBatchNorm(nn.Module):
    """Always-train-mode BatchNorm (affine, batch statistics only)."""
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        axes = tuple(range(x.ndim - 1))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class _Act(nn.Module):
    """ELU (elu=True) or per-channel PReLU (vnet.py:12-16)."""
    elu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.elu:
            return jax.nn.elu(x)
        C = x.shape[-1]
        a = self.param("prelu", nn.initializers.constant(0.25), (C,))
        return jnp.where(x >= 0, x, a * x)


class LUConv(nn.Module):
    elu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        x = nn.Conv(C, (5, 5, 5), padding=[(2, 2)] * 3, use_bias=True,
                    kernel_init=torch_conv_init, dtype=self.dtype)(x)
        x = ContBatchNorm(dtype=self.dtype)(x, train)
        return _Act(self.elu, dtype=self.dtype)(x)


class InputTransition(nn.Module):
    out_ch: int
    elu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        out = nn.Conv(self.out_ch, (5, 5, 5), padding=[(2, 2)] * 3,
                      use_bias=True, kernel_init=torch_conv_init,
                      dtype=self.dtype)(x)
        out = ContBatchNorm(dtype=self.dtype)(out, train)
        reps = self.out_ch // in_ch
        x_rep = jnp.tile(x, (1, 1, 1, 1, reps))
        return _Act(self.elu, dtype=self.dtype)(out + x_rep)


class DownTransition(nn.Module):
    n_convs: int
    scale: Any = 2
    elu: bool = True
    dropout: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = 2 * x.shape[-1]
        sc = _tuple(self.scale, 3)
        down = nn.Conv(out_ch, kernel_size=sc, strides=sc, padding="VALID",
                       use_bias=True, kernel_init=torch_conv_init,
                       dtype=self.dtype)(x)
        down = ContBatchNorm(dtype=self.dtype)(down, train)
        down = _Act(self.elu, dtype=self.dtype)(down)
        # torch nn.Dropout3d: whole-channel dropout
        out = nn.Dropout(0.5, deterministic=not train,
                         broadcast_dims=(1, 2, 3))(down) if self.dropout else down
        for _ in range(self.n_convs):
            out = LUConv(self.elu, dtype=self.dtype)(out, train)
        return _Act(self.elu, dtype=self.dtype)(out + down)


class UpTransition(nn.Module):
    out_ch: int
    n_convs: int
    scale: Any = 2
    elu: bool = True
    dropout: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        sc = _tuple(self.scale, 3)
        out = nn.Dropout(0.5, deterministic=not train,
                         broadcast_dims=(1, 2, 3))(x) if self.dropout else x
        # skip connection is ALWAYS channel-dropped in train (vnet.py:112,121)
        skip = nn.Dropout(0.5, deterministic=not train,
                          broadcast_dims=(1, 2, 3))(skip)
        out = nn.ConvTranspose(self.out_ch // 2, kernel_size=sc, strides=sc,
                               padding="VALID", use_bias=True,
                               kernel_init=torch_conv_init, dtype=self.dtype)(out)
        out = ContBatchNorm(dtype=self.dtype)(out, train)
        out = _Act(self.elu, dtype=self.dtype)(out)
        xcat = jnp.concatenate([out, skip], axis=-1)
        y = xcat
        for _ in range(self.n_convs):
            y = LUConv(self.elu, dtype=self.dtype)(y, train)
        return _Act(self.elu, dtype=self.dtype)(y + xcat)


class VNet(nn.Module):
    """reference model/dim3/vnet.py:148."""
    num_classes: int
    base_ch: int = 16
    scale: Sequence = (2, 2, 2, 2)
    elu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_ch
        sc = list(self.scale)
        out16 = InputTransition(c, self.elu, dtype=self.dtype)(x, train)
        out32 = DownTransition(1, sc[0], self.elu, dtype=self.dtype)(out16, train)
        out64 = DownTransition(2, sc[1], self.elu, dtype=self.dtype)(out32, train)
        out128 = DownTransition(3, sc[2], self.elu, dropout=True,
                                dtype=self.dtype)(out64, train)
        out256 = DownTransition(2, sc[3], self.elu, dropout=True,
                                dtype=self.dtype)(out128, train)

        out = UpTransition(16 * c, 2, sc[3], self.elu, dropout=True,
                           dtype=self.dtype)(out256, out128, train)
        out = UpTransition(8 * c, 2, sc[2], self.elu, dropout=True,
                           dtype=self.dtype)(out, out64, train)
        out = UpTransition(4 * c, 1, sc[1], self.elu, dtype=self.dtype)(out, out32, train)
        out = UpTransition(2 * c, 1, sc[0], self.elu, dtype=self.dtype)(out, out16, train)

        # OutputTransition (vnet.py:131-145)
        out = nn.Conv(self.num_classes, (5, 5, 5), padding=[(2, 2)] * 3,
                      use_bias=True, kernel_init=torch_conv_init,
                      dtype=self.dtype)(out)
        out = ContBatchNorm(dtype=self.dtype)(out, train)
        out = _Act(self.elu, dtype=self.dtype)(out)
        out = nn.Conv(self.num_classes, (1, 1, 1), use_bias=True,
                      kernel_init=torch_conv_init, dtype=self.dtype)(out)
        return out.astype(jnp.float32)
