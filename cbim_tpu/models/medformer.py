"""MedFormer (the reference's flagship, arXiv:2203.00131).

Re-implementation of reference model/dim3/medformer.py + medformer_utils.py
and model/dim2/medformer.py + medformer_utils.py in Flax, channels-last.

Core idea (B-MHA): full-resolution features cross-attend against a tiny
learned "semantic map" (map_size ~ 2x6x6..4x4x4), so attention cost is
O(N*M) with M constant — already the right shape for TPU: the two einsums are
small dense matmuls that land on the MXU, and there is no quadratic
materialisation.  See medformer_utils.py:63-97 (3D), :40-66 (2D).

Structural notes carried over exactly:
- encoder: conv stem (inc+down1) then down2-4 with semantic-map generation
- SemanticMapFusion: cross-scale transformer over the concatenated maps
- decoder: up1/up2 carry the map shortcut; up3/up4 are pure conv
- 2D up_block applies norm+1x1 reduction on the concatenated features before
  the transformer blocks (dim2 medformer_utils.py:305-336); the 3D up_block
  feeds the concatenation straight in (dim3 medformer_utils.py:335-352) —
  both reproduced.
- deep supervision: aux 1x1 head after up2, linearly resized to input size.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.interpolate import resize_linear
from ..ops.pallas.conv3d import from_cw, to_cw
from .layers.convs import (ConvNormAct, DepthwiseSeparableConv, FusedMBConv,
                           MBConv, Norm, get_block_cls, torch_conv_init,
                           _stage_cw_ok, _tuple)
from .layers.transformers import TransformerBlock

#: block classes that understand the NDHCW stage layout (cw= field)
_CW_BLOCKS = ("BasicBlock", "SingleConv", "ConvNormAct")


class BidirectionAttention(nn.Module):
    """Feature <-> semantic-map cross attention, both directions."""
    map_dim: int
    out_dim: int
    heads: int = 4
    dim_head: int = 64
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    proj_type: str = "depthwise"
    kernel_size: Any = 3
    no_map_out: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, semantic_map, train: bool = False):
        nd = feat.ndim - 2
        inner = self.heads * self.dim_head
        spatial = feat.shape[1:-1]
        map_spatial = semantic_map.shape[1:-1]

        if self.proj_type == "linear":
            feat_qv = nn.Conv(inner * 2, (1,) * nd, use_bias=False,
                              kernel_init=torch_conv_init, dtype=self.dtype)(feat)
        else:
            feat_qv = DepthwiseSeparableConv(inner * 2, self.kernel_size,
                                             dtype=self.dtype)(feat)
        map_qv = nn.Conv(inner * 2, (1,) * nd, use_bias=False,
                         kernel_init=torch_conv_init, dtype=self.dtype)(semantic_map)

        def to_heads(t):
            b = t.shape[0]
            l = math.prod(t.shape[1:-1])
            # channels-last (dim_head*heads ordering irrelevant to math)
            return t.reshape(b, l, 2, self.heads, self.dim_head)

        fq, fv = jnp.moveaxis(to_heads(feat_qv), 2, 0)    # (B, N, h, d)
        mq, mv = jnp.moveaxis(to_heads(map_qv), 2, 0)     # (B, M, h, d)

        scale = self.dim_head ** -0.5
        attn = jnp.einsum("bihd,bjhd->bhij", fq, mq,
                          preferred_element_type=jnp.float32) * scale

        feat_map_attn = jax.nn.softmax(attn, axis=-1).astype(fq.dtype)
        map_feat_attn = jax.nn.softmax(attn, axis=-2).astype(fq.dtype)
        map_feat_attn = nn.Dropout(self.attn_drop,
                                   deterministic=not train)(map_feat_attn)

        feat_out = jnp.einsum("bhij,bjhd->bihd", feat_map_attn, mv,
                              preferred_element_type=jnp.float32).astype(fq.dtype)
        feat_out = feat_out.reshape(feat.shape[0], *spatial, inner)

        map_out = jnp.einsum("bhji,bjhd->bihd", map_feat_attn, fv,
                             preferred_element_type=jnp.float32).astype(fq.dtype)
        map_out = map_out.reshape(feat.shape[0], *map_spatial, inner)

        if self.proj_type == "linear":
            feat_out = nn.Conv(self.out_dim, (1,) * nd, use_bias=False,
                               kernel_init=torch_conv_init, dtype=self.dtype)(feat_out)
        else:
            feat_out = DepthwiseSeparableConv(self.out_dim, self.kernel_size,
                                              dtype=self.dtype)(feat_out)
        feat_out = nn.Dropout(self.proj_drop, deterministic=not train)(feat_out)

        if self.no_map_out:
            map_out_final = None
        else:
            map_out_final = nn.Conv(self.map_dim, (1,) * nd, use_bias=False,
                                    kernel_init=torch_conv_init,
                                    dtype=self.dtype)(map_out)
        return feat_out, map_out_final


class BidirectionAttentionBlock(nn.Module):
    """norm -> B-MHA -> shortcut -> MBConv feedforward; map residual."""
    map_dim: int
    out_dim: int
    heads: int
    dim_head: int
    norm: Any = "bn"
    act: Any = "relu"
    expansion: int = 4
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    proj_type: str = "depthwise"
    kernel_size: Any = 3
    no_map_out: bool = False
    ffn_drop_path: float = 0.0     # dim2 passes p=proj_drop into MBConv
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, semantic_map, train: bool = False):
        # the reference constructs these norms WITHOUT the eps=1e-4 override
        # used in ConvNormAct (medformer_utils.py:112-113) -> torch default
        feat = Norm(self.norm, eps=1e-5, dtype=self.dtype)(x, train)
        mapp = Norm(self.norm, eps=1e-5, dtype=self.dtype)(semantic_map, train)

        out, map_out = BidirectionAttention(
            self.map_dim, self.out_dim, self.heads, self.dim_head,
            self.attn_drop, self.proj_drop, self.proj_type, self.kernel_size,
            self.no_map_out, dtype=self.dtype)(feat, mapp, train)

        if x.shape[-1] != self.out_dim:
            shortcut = ConvNormAct(self.out_dim, 1, padding=0, norm=self.norm,
                                   act=self.act, preact=True,
                                   dtype=self.dtype)(x, train)
        else:
            shortcut = x
        out = out + shortcut

        if self.proj_type == "linear":
            out = FusedMBConv(self.out_dim, expansion=self.expansion,
                              kernel_size=1, act=self.act, norm=self.norm,
                              dtype=self.dtype)(out, train)
        else:
            out = MBConv(self.out_dim, expansion=self.expansion,
                         kernel_size=self.kernel_size, act=self.act,
                         norm=self.norm, p=self.ffn_drop_path,
                         dtype=self.dtype)(out, train)

        if map_out is None:
            return out, None
        return out, map_out + semantic_map


class PatchMerging(nn.Module):
    """Space-to-depth downsample + norm + (depthwise) reduction."""
    out_dim: int
    down_scale: Any = 2
    proj_type: str = "linear"
    kernel_size: Any = 3
    norm: Any = "bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        scale = _tuple(self.down_scale, nd)
        # space-to-depth as ONE reshape+transpose (vs 8 strided slices +
        # concat, which cost ~13ms each at 128^3 on v5e); channel order
        # matches the reference's nested i/j/k concat order exactly:
        # out channel = ((i*s1 + j)*s2 + k)*C + c
        B = x.shape[0]
        C = x.shape[-1]
        if nd == 3:
            s0, s1, s2 = scale
            D, H, W = x.shape[1:4]
            x = x.reshape(B, D // s0, s0, H // s1, s1, W // s2, s2, C)
            x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
            x = x.reshape(B, D // s0, H // s1, W // s2, s0 * s1 * s2 * C)
        else:
            # dim2 reference order: (0,0), (1,0), (0,1), (1,1) — j-major
            s0, s1 = scale
            H, W = x.shape[1:3]
            x = x.reshape(B, H // s0, s0, W // s1, s1, C)
            x = x.transpose(0, 1, 3, 4, 2, 5)
            x = x.reshape(B, H // s0, W // s1, s0 * s1 * C)
        # torch-default eps (reference PatchMerging norm, medformer_utils.py:158)
        x = Norm(self.norm, eps=1e-5, dtype=self.dtype)(x, train)
        if self.proj_type == "linear":
            x = nn.Conv(self.out_dim, (1,) * nd, use_bias=False,
                        kernel_init=torch_conv_init, dtype=self.dtype)(x)
        else:
            x = DepthwiseSeparableConv(self.out_dim, self.kernel_size,
                                       dtype=self.dtype)(x)
        return x


class BasicLayer(nn.Module):
    """num_blocks B-MHA blocks for one stage."""
    map_dim: int
    out_dim: int
    num_blocks: int
    heads: int = 4
    dim_head: int = 64
    expansion: int = 4
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    proj_type: str = "depthwise"
    norm: Any = "bn"
    act: Any = "gelu"
    kernel_size: Any = 3
    no_map_out: bool = False
    ffn_drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, semantic_map, train: bool = False):
        for i in range(self.num_blocks):
            nmo = self.no_map_out if i == self.num_blocks - 1 else False
            x, semantic_map = BidirectionAttentionBlock(
                self.map_dim, self.out_dim, self.heads, self.dim_head,
                norm=self.norm, act=self.act, expansion=self.expansion,
                attn_drop=self.attn_drop, proj_drop=self.proj_drop,
                proj_type=self.proj_type, kernel_size=self.kernel_size,
                no_map_out=nmo, ffn_drop_path=self.ffn_drop_path,
                dtype=self.dtype)(x, semantic_map, train)
        return x, semantic_map


class SemanticMapGeneration(nn.Module):
    """Spatial-softmax pooled semantic map (medformer_utils.py:203-228)."""
    map_dim: int
    map_size: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        b = x.shape[0]
        code_num = math.prod(self.map_size)
        feat = nn.Conv(self.map_dim, (3,) * nd, padding=[(1, 1)] * nd,
                       use_bias=False, kernel_init=torch_conv_init,
                       dtype=self.dtype)(x)
        weight = nn.Conv(code_num, (3,) * nd, padding=[(1, 1)] * nd,
                         use_bias=False, kernel_init=torch_conv_init,
                         dtype=self.dtype)(x)
        n = math.prod(x.shape[1:-1])
        weight = jax.nn.softmax(weight.reshape(b, n, code_num).astype(jnp.float32),
                                axis=1).astype(feat.dtype)
        feat = feat.reshape(b, n, self.map_dim)
        smap = jnp.einsum("bnc,bnk->bkc", feat, weight,
                          preferred_element_type=jnp.float32).astype(feat.dtype)
        return smap.reshape(b, *self.map_size, self.map_dim)


class SemanticMapFusion(nn.Module):
    """Cross-scale transformer over concatenated maps (medformer_utils.py:231-261)."""
    dim: int
    heads: int
    depth: int = 1
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, map_list, train: bool = False):
        if self.depth == 0:
            return map_list
        nd = map_list[0].ndim - 2
        b = map_list[0].shape[0]
        spatial = map_list[0].shape[1:-1]
        L = math.prod(spatial)
        in_dims = [m.shape[-1] for m in map_list]

        proj = [nn.Conv(self.dim, (1,) * nd, use_bias=False,
                        kernel_init=torch_conv_init, dtype=self.dtype)(m)
                .reshape(b, L, self.dim) for m in map_list]
        seq = jnp.concatenate(proj, axis=1)
        seq = TransformerBlock(self.depth, self.heads, self.dim // self.heads,
                               self.dim, self.attn_drop, self.proj_drop,
                               dtype=self.dtype)(seq, train)
        outs = jnp.split(seq, len(map_list), axis=1)
        return [nn.Conv(d, (1,) * nd, use_bias=False,
                        kernel_init=torch_conv_init, dtype=self.dtype)(
                    o.reshape(b, *spatial, self.dim))
                for o, d in zip(outs, in_dims)]


class InConvMF(nn.Module):
    """conv + block (medformer_utils.py:264-277)."""
    out_ch: int
    conv_block: str
    kernel_size: Any = 3
    norm: Any = "bn"
    act: Any = "gelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nd = x.ndim - 2
        k = _tuple(self.kernel_size, nd)
        x = nn.Conv(self.out_ch, kernel_size=k,
                    padding=[(ki // 2, ki // 2) for ki in k], use_bias=False,
                    kernel_init=torch_conv_init, dtype=self.dtype)(x)
        # full-res stages run their conv blocks in the dense NDHCW layout
        # (layers/convs.py _stage_cw_ok): 4x less HBM traffic at C=32
        cw = self.conv_block in _CW_BLOCKS and _stage_cw_ok(
            x, self.norm, self.kernel_size)
        if cw:
            x = to_cw(x)
        x = get_block_cls(self.conv_block)(
            self.out_ch, kernel_size=self.kernel_size, norm=self.norm,
            act=self.act, dtype=self.dtype, **({"cw": True} if cw else {}))(
                x, train)
        if cw:
            x = from_cw(x)
        return x


class DownBlockMF(nn.Module):
    """PatchMerging -> conv blocks -> (map gen) -> trans blocks."""
    out_ch: int
    conv_num: int
    trans_num: int
    conv_block: str = "BasicBlock"
    kernel_size: Any = 3
    down_scale: Any = 2
    heads: int = 4
    dim_head: int = 64
    expansion: int = 4
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    map_size: Sequence[int] = (8, 8, 8)
    proj_type: str = "depthwise"
    norm: Any = "bn"
    act: Any = "gelu"
    map_generate: bool = False
    map_dim: int | None = None
    ffn_drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        map_dim = self.out_ch if self.map_dim is None else self.map_dim
        x = PatchMerging(self.out_ch, self.down_scale, self.proj_type,
                         self.kernel_size, self.norm, dtype=self.dtype)(x, train)
        blk = get_block_cls(self.conv_block)
        cw = self.conv_num > 0 and self.conv_block in _CW_BLOCKS and \
            _stage_cw_ok(x, self.norm, self.kernel_size)
        if cw:
            x = to_cw(x)
        for _ in range(self.conv_num):
            x = blk(self.out_ch, kernel_size=self.kernel_size, norm=self.norm,
                    act=self.act, dtype=self.dtype,
                    **({"cw": True} if cw else {}))(x, train)
        if cw:
            x = from_cw(x)
        semantic_map = (SemanticMapGeneration(map_dim, self.map_size,
                                              dtype=self.dtype)(x)
                        if self.map_generate else None)
        if self.trans_num > 0:
            x, semantic_map = BasicLayer(
                map_dim, self.out_ch, self.trans_num, self.heads, self.dim_head,
                self.expansion, self.attn_drop, self.proj_drop, self.proj_type,
                self.norm, self.act, self.kernel_size,
                ffn_drop_path=self.ffn_drop_path, dtype=self.dtype)(
                    x, semantic_map, train)
        return x, semantic_map


class UpBlockMF3D(nn.Module):
    """dim3 medformer_utils.py:320-370: resize + concat feed the B-MHA stage."""
    out_ch: int
    conv_num: int
    trans_num: int
    conv_block: str = "BasicBlock"
    kernel_size: Any = 3
    heads: int = 4
    dim_head: int = 64
    expansion: int = 4
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    map_size: Sequence[int] = (8, 8, 8)
    proj_type: str = "depthwise"
    norm: Any = "bn"
    act: Any = "gelu"
    map_shortcut: bool = False
    no_map_out: bool = False
    map_dim: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_low, x_skip, map1, map2=None, train: bool = False):
        nd = x_low.ndim - 2
        map_dim = self.out_ch if self.map_dim is None else self.map_dim

        x_low = resize_linear(x_low, x_skip.shape[1:-1])

        if self.map_shortcut and map2 is not None:
            semantic_map = jnp.concatenate([map1, map2], axis=-1)
            semantic_map = nn.Conv(map_dim, (1,) * nd, use_bias=False,
                                   kernel_init=torch_conv_init,
                                   dtype=self.dtype)(semantic_map)
        else:
            semantic_map = map1

        # split entry: when the stage runs its conv blocks in cw layout and
        # the first block is a preact InstanceNorm BasicBlock, feed the
        # (x_low, x_skip) pair instead of their channel concat — the concat
        # commutes through per-channel norm + elementwise act into sliced
        # conv kernels (_SplitConvCW), so the wide entry tensor (96 ch at
        # full res in the flagship config) never exists in HBM, and the two
        # layout transposes move half the bytes.  OPT-IN (CBIM_SPLIT_ENTRY=1):
        # the batch-4 step bench measured it slower (2.681 vs 2.831
        # vols/s/chip, v5e 2026-08-19) — two half-width cw convs lose more to
        # tile-edge waste than the skipped concat saves; parity-tested in
        # tests/test_split_entry.py for callers that measure otherwise.
        import os as _os
        cat_shape = jax.ShapeDtypeStruct(
            (*x_skip.shape[:-1], x_low.shape[-1] + x_skip.shape[-1]),
            x_skip.dtype)
        split = (self.trans_num == 0 and self.conv_num > 0
                 and self.conv_block == "BasicBlock" and self.norm == "in"
                 and _stage_cw_ok(cat_shape, self.norm, self.kernel_size)
                 and x_low.shape[-1] % 8 == 0 and x_skip.shape[-1] % 8 == 0
                 and x_low.shape[-1] <= 128 and x_skip.shape[-1] <= 128
                 # the split path calls conv3d_same_cw_t unconditionally, so
                 # the output side must satisfy the same Pallas envelope
                 and self.out_ch % 8 == 0 and self.out_ch <= 128
                 # identity-shortcut blocks would re-materialize the concat
                 and x_low.shape[-1] + x_skip.shape[-1] != self.out_ch
                 and _os.environ.get("CBIM_SPLIT_ENTRY", "0") == "1")
        blk = get_block_cls(self.conv_block)
        if split:
            out = blk(self.out_ch, kernel_size=self.kernel_size,
                      norm=self.norm, act=self.act, dtype=self.dtype,
                      cw=True)((to_cw(x_low), to_cw(x_skip)), train)
            for _ in range(self.conv_num - 1):
                out = blk(self.out_ch, kernel_size=self.kernel_size,
                          norm=self.norm, act=self.act, dtype=self.dtype,
                          cw=True)(out, train)
            return from_cw(out), semantic_map

        feat = jnp.concatenate([x_low, x_skip], axis=-1)
        out = feat
        if self.trans_num > 0:
            out, semantic_map = BasicLayer(
                map_dim, self.out_ch, self.trans_num, self.heads, self.dim_head,
                self.expansion, self.attn_drop, self.proj_drop, self.proj_type,
                self.norm, self.act, self.kernel_size,
                no_map_out=self.no_map_out, dtype=self.dtype)(
                    out, semantic_map, train)
        cw = self.conv_num > 0 and self.conv_block in _CW_BLOCKS and \
            _stage_cw_ok(out, self.norm, self.kernel_size)
        if cw:
            out = to_cw(out)
        for _ in range(self.conv_num):
            out = blk(self.out_ch, kernel_size=self.kernel_size, norm=self.norm,
                      act=self.act, dtype=self.dtype,
                      **({"cw": True} if cw else {}))(out, train)
        if cw:
            out = from_cw(out)
        return out, semantic_map


class UpBlockMF2D(nn.Module):
    """dim2 medformer_utils.py:298-349: norm+1x1 reduction precedes the stage."""
    out_ch: int
    conv_num: int
    trans_num: int
    conv_block: str = "BasicBlock"
    heads: int = 4
    dim_head: int = 64
    expansion: int = 4
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    map_size: Sequence[int] = (8, 8)
    proj_type: str = "depthwise"
    norm: Any = "bn"
    act: Any = "gelu"
    map_shortcut: bool = False
    map_dim: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_low, x_skip, map1, map2=None, train: bool = False):
        map_dim = self.out_ch if self.map_dim is None else self.map_dim

        x_low = resize_linear(x_low, x_skip.shape[1:-1])
        feat = jnp.concatenate([x_low, x_skip], axis=-1)
        # reference up_block builds norm(in_ch+out_ch) with torch-default eps
        # (dim2 medformer_utils.py:306) — 1e-5, not ConvNormAct's 1e-4
        out = Norm(self.norm, eps=1e-5, dtype=self.dtype)(feat, train)
        out = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                      kernel_init=torch_conv_init, dtype=self.dtype)(out)

        if self.map_shortcut and map2 is not None:
            semantic_map = jnp.concatenate([map1, map2], axis=-1)
        else:
            semantic_map = map1
        if semantic_map is not None:
            semantic_map = nn.Conv(map_dim, (1, 1), use_bias=False,
                                   kernel_init=torch_conv_init,
                                   dtype=self.dtype)(semantic_map)

        if self.trans_num > 0:
            out, semantic_map = BasicLayer(
                map_dim, self.out_ch, self.trans_num, self.heads, self.dim_head,
                self.expansion, self.attn_drop, self.proj_drop, self.proj_type,
                self.norm, self.act, ffn_drop_path=self.proj_drop,
                dtype=self.dtype)(out, semantic_map, train)
        blk = get_block_cls(self.conv_block)
        for _ in range(self.conv_num):
            out = blk(self.out_ch, norm=self.norm, act=self.act,
                      dtype=self.dtype)(out, train)
        return out, semantic_map


class MedFormer3D(nn.Module):
    """Reference model/dim3/medformer.py:11.

    ``remat=True`` checkpoints each encoder/decoder stage (jax.checkpoint):
    activations are recomputed in the backward pass instead of stored, which
    is what lets 128^3 crops train on a single 16GB chip (HBM >> recompute
    cost on TPU; the reference leans on AMP for the same reason).
    """
    num_classes: int
    base_ch: int = 32
    remat: Any = False      # False | True/'all' | 'highres'
    map_size: Sequence[int] = (4, 8, 8)
    conv_block: str = "BasicBlock"
    conv_num: Sequence[int] = (2, 1, 0, 0, 0, 1, 2, 2)
    trans_num: Sequence[int] = (0, 1, 2, 2, 2, 1, 0, 0)
    chan_num: Sequence[int] = (64, 128, 256, 320, 256, 128, 64, 32)
    num_heads: Sequence[int] = (1, 4, 8, 16, 8, 4, 1, 1)
    fusion_depth: int = 2
    fusion_dim: int = 320
    fusion_heads: int = 4
    expansion: int = 4
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    proj_type: str = "depthwise"
    norm: Any = "in"
    act: Any = "gelu"
    kernel_size: Sequence = ((3, 3, 3),) * 5
    scale: Sequence = ((2, 2, 2),) * 4
    aux_loss: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cn = list(self.chan_num)
        dim_head = [cn[i] // self.num_heads[i] for i in range(8)]
        ks = list(self.kernel_size)
        sc = list(self.scale)
        common = dict(conv_block=self.conv_block, expansion=self.expansion,
                      attn_drop=self.attn_drop, proj_drop=self.proj_drop,
                      map_size=tuple(self.map_size), proj_type=self.proj_type,
                      norm=self.norm, act=self.act, dtype=self.dtype)

        # Per-stage remat policy — which stages recompute activations in the
        # backward pass.  'all' is the memory floor; the other modes trade
        # spare HBM for less recompute (and fewer of the layout-transpose
        # copies the backward conv pass drags in — see tools/profile_step.py):
        #   'all'            checkpoint every stage (default; fits 128^3 B=2
        #                    on one 16GB v5e chip)
        #   'highres'        checkpoint only full/half-res conv stages; store
        #                    the low-res transformer stages
        #   'store-up4'      like 'all' but store the full-res decoder stage
        #                    (the single most expensive recompute)
        #   'store-decoder'  checkpoint the encoder only; store up1-up4
        InC_r = nn.remat(InConvMF, static_argnums=(2,))
        Down_r = nn.remat(DownBlockMF, static_argnums=(2,))
        Up_r = nn.remat(UpBlockMF3D, static_argnums=(5,))
        mode = "all" if self.remat is True else (self.remat or "none")
        modes = {                   # inc, down1, low_d, up3, up4, low_u
            "all":           dict(inc=1, down1=1, low_d=1, up3=1, up4=1, low_u=1),
            "highres":       dict(inc=1, down1=1, low_d=0, up3=1, up4=1, low_u=0),
            "store-up4":     dict(inc=1, down1=1, low_d=1, up3=1, up4=0, low_u=1),
            "store-decoder": dict(inc=1, down1=1, low_d=1, up3=0, up4=0, low_u=0),
            "none":          dict(inc=0, down1=0, low_d=0, up3=0, up4=0, low_u=0),
        }
        if mode not in modes:
            raise ValueError(f"unknown remat mode {self.remat!r}")
        sel = modes[mode]
        InC = InC_r if sel["inc"] else InConvMF
        Down = Down_r if sel["down1"] else DownBlockMF
        DownLow = Down_r if sel["low_d"] else DownBlockMF
        Up3 = Up_r if sel["up3"] else UpBlockMF3D
        Up = Up_r if sel["up4"] else UpBlockMF3D
        UpLow = Up_r if sel["low_u"] else UpBlockMF3D

        x0 = InC(self.base_ch, self.conv_block, ks[0], self.norm,
                 self.act, dtype=self.dtype, name="inc")(x, train)
        x1, _ = Down(cn[0], self.conv_num[0], self.trans_num[0],
                     kernel_size=ks[1], down_scale=sc[0],
                     map_generate=False, name="down1", **common)(x0, train)
        x2, map2 = DownLow(cn[1], self.conv_num[1], self.trans_num[1],
                           kernel_size=ks[2], down_scale=sc[1],
                           heads=self.num_heads[1], dim_head=dim_head[1],
                           map_generate=True, name="down2", **common)(x1, train)
        x3, map3 = DownLow(cn[2], self.conv_num[2], self.trans_num[2],
                           kernel_size=ks[3], down_scale=sc[2],
                           heads=self.num_heads[2], dim_head=dim_head[2],
                           map_generate=True, name="down3", **common)(x2, train)
        x4, map4 = DownLow(cn[3], self.conv_num[3], self.trans_num[3],
                           kernel_size=ks[4], down_scale=sc[3],
                           heads=self.num_heads[3], dim_head=dim_head[3],
                           map_generate=True, name="down4", **common)(x3, train)

        map_list = SemanticMapFusion(self.fusion_dim, self.fusion_heads,
                                     self.fusion_depth, dtype=self.dtype)(
                                         [map2, map3, map4], train)

        out, smap = UpLow(cn[4], self.conv_num[4], self.trans_num[4],
                          kernel_size=ks[3], heads=self.num_heads[4],
                          dim_head=dim_head[4], map_shortcut=True, name="up1",
                          **common)(x4, x3, map_list[2], map_list[1], train)
        out, smap = UpLow(cn[5], self.conv_num[5], self.trans_num[5],
                          kernel_size=ks[2], heads=self.num_heads[5],
                          dim_head=dim_head[5], map_shortcut=True,
                          no_map_out=True, name="up2", **common)(
                              out, x2, smap, map_list[0], train)

        aux_out = None
        if self.aux_loss:
            aux = nn.Conv(self.num_classes, (1, 1, 1), use_bias=True,
                          kernel_init=torch_conv_init, dtype=self.dtype)(out)
            aux_out = resize_linear(aux, x.shape[1:-1]).astype(jnp.float32)

        out, smap = Up3(cn[6], self.conv_num[6], self.trans_num[6],
                        kernel_size=ks[1], map_shortcut=False, name="up3",
                        **common)(out, x1, smap, None, train)
        out, smap = Up(cn[7], self.conv_num[7], self.trans_num[7],
                       kernel_size=ks[0], map_shortcut=False, name="up4",
                       **common)(out, x0, smap, None, train)

        out = nn.Conv(self.num_classes, (1, 1, 1), use_bias=True,
                      kernel_init=torch_conv_init, dtype=self.dtype)(out)
        out = out.astype(jnp.float32)
        if self.aux_loss:
            return [out, aux_out]
        return out


class MedFormer2D(nn.Module):
    """Reference model/dim2/medformer.py:10."""
    num_classes: int
    base_ch: int = 32
    map_size: Any = 8
    conv_block: str = "BasicBlock"
    conv_num: Sequence[int] = (2, 1, 0, 0, 0, 1, 2, 2)
    trans_num: Sequence[int] = (0, 1, 2, 2, 2, 1, 0, 0)
    num_heads: Sequence[int] = (1, 4, 8, 16, 8, 4, 1, 1)
    fusion_depth: int = 2
    fusion_dim: int = 512
    fusion_heads: int = 16
    expansion: int = 4
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    proj_type: str = "depthwise"
    norm: Any = "bn"
    act: Any = "relu"
    aux_loss: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = self.base_ch
        cn = [2 * b, 4 * b, 8 * b, 16 * b, 8 * b, 4 * b, 2 * b, b]
        dim_head = [cn[i] // self.num_heads[i] for i in range(8)]
        ms = self.map_size
        map_size = (ms, ms) if isinstance(ms, int) else tuple(ms)
        common = dict(conv_block=self.conv_block, expansion=self.expansion,
                      attn_drop=self.attn_drop, proj_drop=self.proj_drop,
                      map_size=map_size, proj_type=self.proj_type,
                      norm=self.norm, act=self.act, dtype=self.dtype)

        x0 = InConvMF(b, self.conv_block, 3, self.norm, self.act,
                      dtype=self.dtype)(x, train)
        x1, _ = DownBlockMF(cn[0], self.conv_num[0], self.trans_num[0],
                            map_generate=False,
                            ffn_drop_path=self.proj_drop, **common)(x0, train)
        x2, map2 = DownBlockMF(cn[1], self.conv_num[1], self.trans_num[1],
                               heads=self.num_heads[1], dim_head=dim_head[1],
                               map_generate=True,
                               ffn_drop_path=self.proj_drop, **common)(x1, train)
        x3, map3 = DownBlockMF(cn[2], self.conv_num[2], self.trans_num[2],
                               heads=self.num_heads[2], dim_head=dim_head[2],
                               map_generate=True,
                               ffn_drop_path=self.proj_drop, **common)(x2, train)
        x4, map4 = DownBlockMF(cn[3], self.conv_num[3], self.trans_num[3],
                               heads=self.num_heads[3], dim_head=dim_head[3],
                               map_generate=True,
                               ffn_drop_path=self.proj_drop, **common)(x3, train)

        map_list = SemanticMapFusion(self.fusion_dim, self.fusion_heads,
                                     self.fusion_depth, dtype=self.dtype)(
                                         [map2, map3, map4], train)

        out, smap = UpBlockMF2D(cn[4], self.conv_num[4], self.trans_num[4],
                                heads=self.num_heads[4], dim_head=dim_head[4],
                                map_shortcut=True, **common)(
                                    x4, x3, map_list[2], map_list[1], train)
        out, smap = UpBlockMF2D(cn[5], self.conv_num[5], self.trans_num[5],
                                heads=self.num_heads[5], dim_head=dim_head[5],
                                map_shortcut=True, **common)(
                                    out, x2, smap, map_list[0], train)

        aux_out = None
        if self.aux_loss:
            aux = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                          kernel_init=torch_conv_init, dtype=self.dtype)(out)
            aux_out = resize_linear(aux, x.shape[1:-1]).astype(jnp.float32)

        out, smap = UpBlockMF2D(cn[6], self.conv_num[6], self.trans_num[6],
                                map_shortcut=False, **common)(out, x1, smap, None, train)
        out, smap = UpBlockMF2D(cn[7], self.conv_num[7], self.trans_num[7],
                                map_shortcut=False, **common)(out, x0, smap, None, train)

        out = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                      kernel_init=torch_conv_init, dtype=self.dtype)(out)
        out = out.astype(jnp.float32)
        if self.aux_loss:
            return [out, aux_out]
        return out
