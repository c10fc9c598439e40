"""VT-UNet (Peiris et al., arXiv:2111.13300) — reference model/dim3/vtunet.py
+ vtunet_utils.py (SwinTransformerSys3D).

Architecture kept exactly:
- PatchEmbed3D (strided conv + LN), 4 encoder stages (depths [2,2,2,1],
  heads [3,6,12,24]), PatchMerging that halves H/W only (D is untouched,
  vtunet_utils.py:823-860); each stage caches the windowed v/k/q of its even
  and odd blocks for the decoder's cross attention.
- decoder: PatchExpand (linear 2x HW upsample) then 3 stages of
  cross-attentive blocks: self-attention output and a cross-attention output
  (q from decoder scaled twice — a reference quirk, vtunet_utils.py:418-419 —
  against the encoder's cached k/v, same proj) fused as
  0.5*x + 0.5*x2 + MLP(LN(sin-cos positional encoding)), vtunet_utils.py:768.
- FinalPatchExpand_X4 (linear pixel-shuffle by patch_size) + 1x1 head.

The vendored code hard-codes D-grid sizes for 128^3 inputs
(vtunet_utils.py:902,959: view(B, 32//D_ratio, ...)); here the actual grid
size is used — identical results for conforming shapes, correct in general.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
from ..ops.activations import fast_gelu

from .layers.convs import torch_conv_init, DropPath
from .swin_layers import (compute_attn_mask, get_window_size,
                          relative_position_index, window_partition,
                          window_reverse)


def positional_encoding_3d(spatial, channels: int) -> np.ndarray:
    """Sin-cos 3D positional embedding (vtunet_utils.py:457-530); static."""
    ch = int(np.ceil(channels / 6) * 2)
    if ch % 2:
        ch += 1
    inv_freq = 1.0 / (10000 ** (np.arange(0, ch, 2, dtype=np.float32) / ch))
    d, h, w = spatial
    emb = np.zeros((d, h, w, ch * 3), np.float32)

    def axis_emb(n):
        s = np.einsum("i,j->ij", np.arange(n, dtype=np.float32), inv_freq)
        return np.concatenate([np.sin(s), np.cos(s)], axis=-1)

    emb[..., :ch] = axis_emb(d)[:, None, None, :]
    emb[..., ch:2 * ch] = axis_emb(h)[None, :, None, :]
    emb[..., 2 * ch:] = axis_emb(w)[None, None, :, :]
    return emb[None, ..., :channels]


class WindowAttentionVT(nn.Module):
    """WindowAttention3D with v/k/q caching + decoder cross path
    (vtunet_utils.py:243-455)."""
    num_heads: int
    window: Sequence[int]
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    table_window: Sequence[int] | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, prev_v=None, prev_k=None, prev_q=None,
                 is_decoder: bool = False, train: bool = False):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        tw = tuple(self.table_window or self.window)
        table_size = int(np.prod([2 * w - 1 for w in tw]))
        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02),
                           (table_size, h))
        idx = relative_position_index(tw)[:n, :n].reshape(-1)
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)[None]

        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias,
                       kernel_init=torch_conv_init, dtype=self.dtype)(x)
        qkv = qkv.reshape(b, n, 3, h, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)           # (b, n, h, hd)
        proj = nn.Dense(c, kernel_init=torch_conv_init, dtype=self.dtype)

        def attend(qq, kk, vv):
            attn = jnp.einsum("bnhd,bmhd->bhnm", qq, kk,
                              preferred_element_type=jnp.float32)
            attn = attn + bias.astype(attn.dtype)
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.reshape(b // nw, nw, h, n, n) + \
                    jnp.asarray(mask)[None, :, None, :, :]
                attn = attn.reshape(b, h, n, n)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(vv.dtype), vv,
                             preferred_element_type=jnp.float32).astype(vv.dtype)
            out = proj(out.reshape(b, n, c))
            return nn.Dropout(self.proj_drop, deterministic=not train)(out)

        scale = hd ** -0.5
        q_scaled = q * scale
        x_out = attend(q_scaled, k, v)
        x2 = None
        if is_decoder:
            # reference quirk: q is scaled twice for the cross path
            x2 = attend(q_scaled * scale, prev_k, prev_v)
        return x_out, x2, v, k, q_scaled


class SwinBlockVT(nn.Module):
    """SwinTransformerBlock3D (vtunet_utils.py:533-806)."""
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
    def __call__(self, x, prev_v=None, prev_k=None, prev_q=None,
                 is_decoder: bool = False, train: bool = False):
        spatial = x.shape[1:-1]
        c = x.shape[-1]

        # norm2+MLP are SHARED across the self path, cross path, and the
        # positional-encoding term (reference forward_part2/3 reuse self.mlp)
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        fc1 = nn.Dense(int(c * self.mlp_ratio), kernel_init=torch_conv_init,
                       dtype=self.dtype, name="mlp_fc1")
        fc2 = nn.Dense(c, kernel_init=torch_conv_init, dtype=self.dtype,
                       name="mlp_fc2")

        def mlp(t):
            h = fc1(norm2(t))
            h = fast_gelu(h)
            h = nn.Dropout(self.drop, deterministic=not train)(h)
            h = fc2(h)
            return nn.Dropout(self.drop, deterministic=not train)(h)
        window, shift = get_window_size(spatial, self.window_size,
                                        self.shift_size)
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        pads = [(0, (-s) % w) for s, w in zip(spatial, window)]
        if any(p[1] for p in pads):
            h = jnp.pad(h, [(0, 0)] + pads + [(0, 0)])
        padded = h.shape[1:-1]
        if any(s > 0 for s in shift):
            h = jnp.roll(h, [-s for s in shift], axis=(1, 2, 3))
        mask = compute_attn_mask(padded, window, shift)

        wins = window_partition(h, window)
        out_w, x2_w, v, k, q = WindowAttentionVT(
            self.num_heads, window, self.qkv_bias, self.attn_drop, self.drop,
            table_window=tuple(self.window_size),
            dtype=self.dtype)(wins, mask, prev_v, prev_k, prev_q, is_decoder,
                              train)

        def unpartition(t):
            t = window_reverse(t, window, padded)
            if any(s > 0 for s in shift):
                t = jnp.roll(t, list(shift), axis=(1, 2, 3))
            if any(p[1] for p in pads):
                t = t[(slice(None), *[slice(0, s) for s in spatial],
                       slice(None))]
            return t

        dp = DropPath(self.drop_path)
        x = shortcut + dp(unpartition(out_w), train)
        x = x + dp(mlp(x), train)

        if x2_w is not None:
            x2 = shortcut + dp(unpartition(x2_w), train)
            x2 = x2 + dp(mlp(x2), train)
            pe = jnp.asarray(positional_encoding_3d(spatial, c))
            x = 0.5 * x + 0.5 * x2 + mlp(pe.astype(x.dtype))
        return x, v, k, q


class PatchMergingHW(nn.Module):
    """Halve H/W only (vtunet_utils.py:823-860)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        parts = [x[:, :, 0::2, 0::2, :], x[:, :, 1::2, 0::2, :],
                 x[:, :, 0::2, 1::2, :], x[:, :, 1::2, 1::2, :]]
        x = jnp.concatenate(parts, axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return nn.Dense(2 * dim, use_bias=False, kernel_init=torch_conv_init,
                        dtype=self.dtype)(x)


class PatchExpandHW(nn.Module):
    """Double H/W, halve channels (vtunet_utils.py:939-996)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        x = nn.Dense(2 * C, use_bias=False, kernel_init=torch_conv_init,
                     dtype=self.dtype)(x)
        x = x.reshape(B, D, H, W, 2, 2, C // 2)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, D, 2 * H, 2 * W, C // 2)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)


class FinalPatchExpand(nn.Module):
    """Pixel-shuffle by patch_size, keep dim (vtunet_utils.py:997-1058)."""
    patch_size: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, D, H, W, C = x.shape
        p1, p2, p3 = self.patch_size
        x = nn.Dense(p1 * p2 * p3 * C, use_bias=False,
                     kernel_init=torch_conv_init, dtype=self.dtype)(x)
        x = x.reshape(B, D, H, W, p1, p2, p3, C)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        x = x.reshape(B, D * p1, H * p2, W * p3, C)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)


class VTUNet(nn.Module):
    """reference model/dim3/vtunet.py:32 (embed 96, depths [2,2,2,1])."""
    num_classes: int
    patch_size: Sequence[int] = (4, 4, 4)
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 1)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: Sequence[int] = (7, 7, 7)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ps = tuple(self.patch_size)
        total = sum(self.depths)
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total)]
        shift = tuple(w // 2 for w in self.window_size)

        # PatchEmbed3D + LN (patch_norm=True)
        h = nn.Conv(self.embed_dim, kernel_size=ps, strides=ps,
                    padding="VALID", use_bias=True,
                    kernel_init=torch_conv_init, dtype=self.dtype)(x)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)

        skips, caches = [], []
        d0 = 0
        for i, depth in enumerate(self.depths):
            skips.append(h)
            v1 = k1 = q1 = v2 = k2 = q2 = None
            for b in range(depth):
                h, v, k, q = SwinBlockVT(
                    self.num_heads[i], self.window_size,
                    (0, 0, 0) if b % 2 == 0 else shift, self.mlp_ratio,
                    drop_path=dpr[d0 + b], dtype=self.dtype)(h, train=train)
                if b % 2 == 0:
                    v1, k1, q1 = v, k, q
                else:
                    v2, k2, q2 = v, k, q
            caches.append((v1, k1, q1, v2, k2, q2))
            d0 += depth
            if i < len(self.depths) - 1:
                h = PatchMergingHW(dtype=self.dtype)(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)

        # decoder
        nl = len(self.depths)
        for inx in range(nl):
            if inx == 0:
                h = PatchExpandHW(dtype=self.dtype)(h)
                continue
            stage = nl - 1 - inx                  # encoder stage to fuse
            skip = skips[nl - 1 - inx]
            h = jnp.concatenate([h, skip], axis=-1)
            h = nn.Dense(self.embed_dim * 2 ** stage, use_bias=False,
                         kernel_init=torch_conv_init, dtype=self.dtype)(h)
            v1, k1, q1, v2, k2, q2 = caches[nl - 1 - inx]
            dps = dpr[sum(self.depths[:stage]):sum(self.depths[:stage + 1])]
            for b in range(self.depths[stage]):
                # every decoder block cross-attends: even blocks against the
                # encoder's even-block (unshifted) k/v cache, odd blocks
                # against the odd-block (shifted) cache
                # (vtunet_utils.py:1193-1197, both branches pass True)
                pv, pk, pq = (v1, k1, q1) if b % 2 == 0 else (v2, k2, q2)
                h, _, _, _ = SwinBlockVT(
                    self.num_heads[stage], self.window_size,
                    (0, 0, 0) if b % 2 == 0 else shift, self.mlp_ratio,
                    drop_path=dps[b], dtype=self.dtype)(
                        h, pv, pk, pq, is_decoder=True, train=train)
            if inx < nl - 1:
                h = PatchExpandHW(dtype=self.dtype)(h)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(h)
        h = FinalPatchExpand(ps, dtype=self.dtype)(h)
        out = nn.Conv(self.num_classes, (1, 1, 1), use_bias=False,
                      kernel_init=torch_conv_init, dtype=self.dtype)(h)
        return out.astype(jnp.float32)
