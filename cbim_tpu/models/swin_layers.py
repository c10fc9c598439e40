"""Shared shifted-window attention machinery (Swin family).

Used by SwinUNETR, nnFormer, VT-UNet and SwinUnet.  Channels-last throughout;
window partitioning is pure reshape/transpose (layout-free on TPU), the
relative-position-bias index and the shifted-window attention mask are
precomputed with numpy at trace time (shapes are static under jit) and baked
into the program as constants — no device-side mask computation per step.

Math parity target: reference model/dim3/swin_unetr.py:296-556 (also
microsoft/Swin-Transformer): qk scaling by head_dim^-0.5, bias table of size
prod(2w-1) gathered by pairwise relative coordinates, -100 additive masks for
cross-region pairs under shifted windows.
"""

from __future__ import annotations

import itertools
import math
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
from ..ops.activations import fast_gelu

from .layers.convs import torch_conv_init, DropPath


def window_partition(x: jax.Array, window: Sequence[int]) -> jax.Array:
    """(B, *spatial, C) -> (num_windows*B, prod(window), C)."""
    nd = x.ndim - 2
    B, C = x.shape[0], x.shape[-1]
    shape = [B]
    perm_a, perm_b = [], []
    for i in range(nd):
        shape += [x.shape[1 + i] // window[i], window[i]]
        perm_a.append(1 + 2 * i)
        perm_b.append(2 + 2 * i)
    x = x.reshape(*shape, C)
    x = x.transpose(0, *perm_a, *perm_b, x.ndim - 1)
    return x.reshape(-1, math.prod(window), C)


def window_reverse(windows: jax.Array, window: Sequence[int],
                   spatial: Sequence[int]) -> jax.Array:
    nd = len(window)
    C = windows.shape[-1]
    grid = [s // w for s, w in zip(spatial, window)]
    x = windows.reshape(-1, *grid, *window, C)
    perm = [0]
    for i in range(nd):
        perm += [1 + i, 1 + nd + i]
    x = x.transpose(*perm, x.ndim - 1)
    return x.reshape(-1, *spatial, C)


def get_window_size(x_size, window_size, shift_size=None):
    """Shrink windows to the input extent (swin_unetr.py:359-382)."""
    use_w = list(window_size)
    use_s = list(shift_size) if shift_size is not None else None
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            use_w[i] = x_size[i]
            if use_s is not None:
                use_s[i] = 0
    if shift_size is None:
        return tuple(use_w)
    return tuple(use_w), tuple(use_s)


def relative_position_index(window: Sequence[int]) -> np.ndarray:
    """Pairwise relative-coordinate index into the bias table (static)."""
    coords = np.stack(np.meshgrid(*[np.arange(w) for w in window],
                                  indexing="ij"))          # (nd, *window)
    flat = coords.reshape(len(window), -1)                 # (nd, N)
    rel = flat[:, :, None] - flat[:, None, :]              # (nd, N, N)
    rel = rel.transpose(1, 2, 0)                           # (N, N, nd)
    for i, w in enumerate(window):
        rel[:, :, i] += w - 1
    mult = 1
    idx = np.zeros(rel.shape[:2], np.int64)
    for i in reversed(range(len(window))):
        idx += rel[:, :, i] * mult
        mult *= 2 * window[i] - 1
    return idx


def compute_attn_mask(spatial, window, shift) -> np.ndarray | None:
    """Shifted-window region mask (swin_unetr.py:737-771), computed in numpy.

    Returns (num_windows, N, N) float32 with 0 / -100, or None when no axis
    is shifted.
    """
    if not any(s > 0 for s in shift):
        return None
    img = np.zeros((1, *spatial, 1), np.float32)
    ranges = []
    for w, s in zip(window, shift):
        # literal transcription incl. the s==0 behavior: slice(-w, -0) is
        # empty and slice(-0, None) covers the whole axis (one region)
        ranges.append((slice(-w),
                       slice(-w, -s) if s > 0 else slice(-w, 0),
                       slice(-s, None) if s > 0 else slice(None)))
    cnt = 0
    for idxs in itertools.product(*ranges):
        sl = (slice(None), *idxs, slice(None))
        img[sl] = cnt
        cnt += 1
    # pure-numpy window partition (must stay untraced under jit)
    nd = len(spatial)
    shape, perm_a, perm_b = [1], [], []
    for i in range(nd):
        shape += [spatial[i] // window[i], window[i]]
        perm_a.append(1 + 2 * i)
        perm_b.append(2 + 2 * i)
    m = img.reshape(*shape, 1)
    m = np.transpose(m, (0, *perm_a, *perm_b, m.ndim - 1))
    mask_windows = m.reshape(-1, math.prod(window))
    diff = mask_windows[:, None, :] - mask_windows[:, :, None]
    attn_mask = np.where(diff != 0, -100.0, 0.0).astype(np.float32)
    return attn_mask


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (swin_unetr.py:384-476).

    ``table_window``: the NOMINAL window the bias table is sized for.  When
    the runtime window shrinks to the input extent, the reference keeps the
    full-size table and slices its index ``[:N, :N]`` (swin_unetr.py:467) —
    reproduced here so tables/bias values match for weight transplants.
    """
    num_heads: int
    window: Sequence[int]
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    table_window: Sequence[int] | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        tw = tuple(self.table_window or self.window)
        table_size = int(np.prod([2 * w - 1 for w in tw]))
        bias_table = self.param("relative_position_bias_table",
                                nn.initializers.truncated_normal(0.02),
                                (table_size, h))
        rel_idx = relative_position_index(tw)[:n, :n].reshape(-1)

        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias,
                       kernel_init=torch_conv_init, dtype=self.dtype)(x)
        qkv = qkv.reshape(b, n, 3, h, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        q = q * (hd ** -0.5)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        bias = bias_table[rel_idx].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b // nw, nw, h, n, n) + \
                jnp.asarray(mask)[None, :, None, :, :]
            attn = attn.reshape(b, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        attn = attn.astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.reshape(b, n, c)
        out = nn.Dense(c, kernel_init=torch_conv_init, dtype=self.dtype)(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class SwinBlock(nn.Module):
    """One (shifted-)window transformer block (swin_unetr.py:479-556)."""
    num_heads: int
    window_size: Sequence[int]
    shift_size: Sequence[int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        spatial = x.shape[1:-1]
        c = x.shape[-1]
        window, shift = get_window_size(spatial, self.window_size,
                                        self.shift_size)

        shortcut = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)

        pads = [(0, (-s) % w) for s, w in zip(spatial, window)]
        if any(p[1] for p in pads):
            h = jnp.pad(h, [(0, 0)] + pads + [(0, 0)])
        padded = h.shape[1:-1]

        if any(s > 0 for s in shift):
            h = jnp.roll(h, [-s for s in shift], axis=tuple(range(1, 1 + nd)))
        mask = compute_attn_mask(padded, window, shift)

        wins = window_partition(h, window)
        wins = WindowAttention(self.num_heads, window, self.qkv_bias,
                               self.attn_drop, self.drop,
                               table_window=tuple(self.window_size),
                               dtype=self.dtype)(wins, mask, train)
        h = window_reverse(wins, window, padded)
        if any(s > 0 for s in shift):
            h = jnp.roll(h, list(shift), axis=tuple(range(1, 1 + nd)))
        if any(p[1] for p in pads):
            h = h[(slice(None), *[slice(0, s) for s in spatial], slice(None))]

        x = shortcut + DropPath(self.drop_path)(h, train)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = nn.Dense(int(c * self.mlp_ratio), kernel_init=torch_conv_init,
                     dtype=self.dtype)(h)
        h = fast_gelu(h)
        h = nn.Dropout(self.drop, deterministic=not train)(h)
        h = nn.Dense(c, kernel_init=torch_conv_init, dtype=self.dtype)(h)
        h = nn.Dropout(self.drop, deterministic=not train)(h)
        return x + DropPath(self.drop_path)(h, train)


class PatchMergingLegacy(nn.Module):
    """MONAI v0.9.0 'merging' (swin_unetr.py:707-733) — reproduced with its
    duplicate-slice quirk (x5/x6 repeat x2/x3; (1,1,0)/(0,1,1) are skipped)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        dim = x.shape[-1]
        spatial = x.shape[1:-1]
        pads = [(0, s % 2) for s in spatial]
        if any(p[1] for p in pads):
            x = jnp.pad(x, [(0, 0)] + pads + [(0, 0)])
        if nd == 3:
            offs = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
                    (1, 0, 1), (0, 1, 0), (0, 0, 1), (1, 1, 1)]
            parts = [x[:, i::2, j::2, k::2, :] for i, j, k in offs]
        else:
            offs = [(0, 0), (0, 1), (1, 0), (1, 1)]  # (j,i) order of dim2 ref
            parts = [x[:, j::2, i::2, :] for i, j in offs]
        x = jnp.concatenate(parts, axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return nn.Dense(2 * dim, use_bias=False, kernel_init=torch_conv_init,
                        dtype=self.dtype)(x)


class PatchMergingV2(nn.Module):
    """Correct 8-neighbour merging (swin_unetr.py:659-704)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        dim = x.shape[-1]
        spatial = x.shape[1:-1]
        pads = [(0, s % 2) for s in spatial]
        if any(p[1] for p in pads):
            x = jnp.pad(x, [(0, 0)] + pads + [(0, 0)])
        parts = []
        for offs in itertools.product(*([range(2)] * nd)):
            idx = (slice(None), *[slice(o, None, 2) for o in offs], slice(None))
            parts.append(x[idx])
        x = jnp.concatenate(parts, axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return nn.Dense(2 * dim, use_bias=False, kernel_init=torch_conv_init,
                        dtype=self.dtype)(x)
