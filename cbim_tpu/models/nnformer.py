"""nnFormer (Zhou et al., arXiv:2109.03201) — reference model/dim3/nnformer.py.

Structure kept exactly:
- conv-stem PatchEmbed: two 'project' stages (conv k3 s[2,2,2] -> GELU -> LN ->
  conv k3 s1 [-> GELU -> LN]), patch [2,4,4] (nnformer.py:629-700)
- encoder: 4 swin stages (dims embed*2^i, cubic windows [4,4,8,4]), between
  stages PatchMerging = GELU -> LN -> conv k3 s2 (nnformer.py:401-422);
  per-stage LayerNormed skip outputs
- decoder: Patch_Expanding (LN -> transposed conv 2^3) then a skip-conditioned
  first block (SwinTransformerBlock_kv: q from the upsampled path, k/v from
  the skip, shared norm, residual on their SUM, nnformer.py:62-154) followed
  by shifted blocks
- deep supervision: 3 transposed-conv heads, trilinearly resized to input
  size, finest first (nnformer.py:936-955)

Quirk kept: the relative-position index uses multipliers (3*w-1, 2*w-1) —
nnFormer's nonstandard (colliding) indexing (nnformer.py:184-187) — so the
bias table layout matches the original.
"""

from __future__ import annotations


from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
from ..ops.activations import fast_gelu

from ..ops.interpolate import resize_linear
from .layers.convs import torch_conv_init, DropPath
from .swin_layers import compute_attn_mask, window_partition, window_reverse


def _nnformer_rel_index(window: Sequence[int]) -> np.ndarray:
    coords = np.stack(np.meshgrid(*[np.arange(w) for w in window], indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += window[0] - 1
    rel[:, :, 1] += window[1] - 1
    rel[:, :, 2] += window[2] - 1
    rel[:, :, 0] *= 3 * window[1] - 1          # (sic) nnformer.py:184
    rel[:, :, 1] *= 2 * window[1] - 1
    return rel.sum(-1)


class _WindowAttentionNF(nn.Module):
    """Window attention with nnFormer's bias indexing; optional kv mode."""
    num_heads: int
    window: Sequence[int]
    kv_mode: bool = False       # True: q from x_up, k/v projected from skip
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_up=None, mask=None, train: bool = False):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        table_size = int(np.prod([2 * w - 1 for w in self.window]))
        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           (table_size, h))
        idx = _nnformer_rel_index(self.window).reshape(-1)

        if self.kv_mode:
            kv = nn.Dense(c * 2, use_bias=True, kernel_init=torch_conv_init,
                          dtype=self.dtype)(x)
            kv = kv.reshape(b, n, 2, h, hd)
            k, v = jnp.moveaxis(kv, 2, 0)
            q = x_up.reshape(b, n, h, hd)
        else:
            qkv = nn.Dense(c * 3, use_bias=True, kernel_init=torch_conv_init,
                           dtype=self.dtype)(x)
            qkv = qkv.reshape(b, n, 3, h, hd)
            q, k, v = jnp.moveaxis(qkv, 2, 0)

        q = q * (hd ** -0.5)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b // nw, nw, h, n, n) + \
                jnp.asarray(mask)[None, :, None, :, :]
            attn = attn.reshape(b, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.reshape(b, n, c)
        out = nn.Dense(c, kernel_init=torch_conv_init, dtype=self.dtype)(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


def _effective(window: int, shift: int, spatial) -> tuple[int, int]:
    """nnformer.py:75-79: shrink to min(res) and drop shift when too small."""
    if min(spatial) <= window:
        return min(spatial), 0
    return window, shift


class _NFBlock(nn.Module):
    """SwinTransformerBlock / _kv (nnformer.py:62-154, 310-399)."""
    num_heads: int
    window_size: int
    shift_size: int
    kv_mode: bool = False
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, x_up=None, train: bool = False):
        spatial = x.shape[1:-1]
        c = x.shape[-1]
        w, s = _effective(self.window_size, self.shift_size, spatial)
        window = (w, w, w)
        shift = (s, s, s)

        shortcut = x
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        if self.kv_mode:
            a = norm1(skip)
            b_ = norm1(x_up)
        else:
            a = norm1(x)
            b_ = None

        pads = [(0, (-d) % w) for d in spatial]

        def prep(t):
            if any(p[1] for p in pads):
                t = jnp.pad(t, [(0, 0)] + pads + [(0, 0)])
            if s > 0:
                t = jnp.roll(t, (-s, -s, -s), axis=(1, 2, 3))
            return t

        a = prep(a)
        padded = a.shape[1:-1]
        mask = compute_attn_mask(padded, window, shift) if s > 0 else None
        a_w = window_partition(a, window)
        if self.kv_mode:
            b_w = window_partition(prep(b_), window)
            out = _WindowAttentionNF(self.num_heads, window, True,
                                     self.attn_drop, self.drop,
                                     dtype=self.dtype)(a_w, b_w, mask, train)
        else:
            out = _WindowAttentionNF(self.num_heads, window, False,
                                     self.attn_drop, self.drop,
                                     dtype=self.dtype)(a_w, None, mask, train)
        h = window_reverse(out, window, padded)
        if s > 0:
            h = jnp.roll(h, (s, s, s), axis=(1, 2, 3))
        if any(p[1] for p in pads):
            h = h[(slice(None), *[slice(0, d) for d in spatial], slice(None))]

        x = shortcut + DropPath(self.drop_path)(h, train)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = nn.Dense(int(c * self.mlp_ratio), kernel_init=torch_conv_init,
                     dtype=self.dtype)(h)
        h = fast_gelu(h)
        h = nn.Dropout(self.drop, deterministic=not train)(h)
        h = nn.Dense(c, kernel_init=torch_conv_init, dtype=self.dtype)(h)
        h = nn.Dropout(self.drop, deterministic=not train)(h)
        return x + DropPath(self.drop_path)(h, train)


class _PatchMergingNF(nn.Module):
    """GELU -> LN -> conv k3 s2 (nnformer.py:401-422)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        x = fast_gelu(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return nn.Conv(2 * dim, (3, 3, 3), strides=(2, 2, 2),
                       padding=[(1, 1)] * 3, use_bias=True,
                       kernel_init=torch_conv_init, dtype=self.dtype)(x)


class _PatchExpandingNF(nn.Module):
    """LN -> transposed conv 2 (nnformer.py:424-446)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return nn.ConvTranspose(dim // 2, (2, 2, 2), strides=(2, 2, 2),
                                padding="VALID", use_bias=True,
                                kernel_init=torch_conv_init, dtype=self.dtype)(x)


class _Project(nn.Module):
    """conv stem stage (nnformer.py:629-660)."""
    out_dim: int
    stride: Sequence[int]
    last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_dim, (3, 3, 3), strides=tuple(self.stride),
                    padding=[(1, 1)] * 3, use_bias=True,
                    kernel_init=torch_conv_init, dtype=self.dtype)(x)
        x = fast_gelu(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.Conv(self.out_dim, (3, 3, 3), padding=[(1, 1)] * 3,
                    use_bias=True, kernel_init=torch_conv_init,
                    dtype=self.dtype)(x)
        if not self.last:
            x = fast_gelu(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return x


class NNFormer(nn.Module):
    """reference model/dim3/nnformer.py:889 (embed 192, patch [2,4,4],
    windows [4,4,8,4], heads [6,12,24,48], depths [2,2,2,2])."""
    num_classes: int
    crop_size: Sequence[int] = (64, 128, 128)
    embedding_dim: int = 192
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (6, 12, 24, 48)
    patch_size: Sequence[int] = (2, 4, 4)
    window_size: Sequence[int] = (4, 4, 8, 4)
    deep_supervision: bool = True
    drop_path_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ed = self.embedding_dim
        ps = tuple(self.patch_size)
        total = sum(self.depths)
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total)]

        # PatchEmbed stem: stride1 = [p0, p1//2, p2//2], stride2 = [p0//2,...]
        s1 = (ps[0], ps[1] // 2, ps[2] // 2)
        s2 = (max(ps[0] // 2, 1), ps[1] // 2, ps[2] // 2)
        h = _Project(ed // 2, s1, last=False, dtype=self.dtype)(x)
        h = _Project(ed, s2, last=True, dtype=self.dtype)(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)   # patch_norm

        # encoder
        skips = []
        d0 = 0
        for i, depth in enumerate(self.depths):
            for b in range(depth):
                h = _NFBlock(self.num_heads[i], self.window_size[i],
                             0 if b % 2 == 0 else self.window_size[i] // 2,
                             drop_path=dpr[d0 + b], dtype=self.dtype)(
                                 h, train=train)
            d0 += depth
            skips.append(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h))
            if i < len(self.depths) - 1:
                h = _PatchMergingNF(dtype=self.dtype)(h)

        # decoder (3 up stages); window/heads/depths reversed minus the neck
        dec_windows = list(self.window_size[::-1][1:])
        dec_heads = list(self.num_heads[::-1][1:])
        dec_depths = list(self.depths[::-1][1:])
        dpr_dec = [float(v) for v in np.linspace(0, self.drop_path_rate,
                                                 sum(dec_depths))]

        # the reference builds decoder.layers REVERSED and iterates them
        # back-to-front (nnformer.py:829-869): the coarsest stage (our j=0)
        # is the layer constructed with i_layer=0, i.e. dec list index j.
        outs = []
        h = skips[-1]
        for j in range(len(dec_depths)):             # j=0 coarsest up stage
            x_up = _PatchExpandingNF(dtype=self.dtype)(h)
            skip = skips[len(dec_depths) - 1 - j]
            summed = x_up + skip
            dp = dpr_dec[sum(dec_depths[:j]):sum(dec_depths[:j + 1])]
            h = _NFBlock(dec_heads[j], dec_windows[j], 0,
                         kv_mode=True, drop_path=dp[0], dtype=self.dtype)(
                             summed, skip=skip, x_up=x_up, train=train)
            for b in range(dec_depths[j] - 1):
                h = _NFBlock(dec_heads[j], dec_windows[j],
                             dec_windows[j] // 2,
                             drop_path=dp[b + 1], dtype=self.dtype)(
                                 h, train=train)
            outs.append(h)

        def head(t, name_dim):
            return nn.ConvTranspose(self.num_classes, kernel_size=ps,
                                    strides=ps, padding="VALID", use_bias=True,
                                    kernel_init=torch_conv_init,
                                    dtype=self.dtype)(t)

        if self.deep_supervision:
            seg = []
            for i, o in enumerate(outs):            # outs[0] coarsest
                logits = head(o, None)
                logits = resize_linear(logits, x.shape[1:-1]).astype(jnp.float32)
                seg.append(logits)
            return seg[::-1]                         # finest first
        return head(outs[-1], None).astype(jnp.float32)
