"""Functional torch implementations of the MONAI blocks the reference imports.

monai is not installed in this image; the reference's UNETR
(model/dim3/unetr.py:17-19) and vendored SwinUNETR (swin_unetr.py:24-27)
import a handful of its blocks.  These reimplementations follow MONAI's
public semantics (monai.networks.blocks.dynunet_block / patchembedding /
selfattention / mlp, v0.9-1.x) so the reference models can run as the
torch oracle for forward-parity tests.  Tests only — the framework itself
never imports torch or monai.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn


def _ntuple(v, n):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * n


def _norm(norm_name, channels):
    # MONAI get_norm_layer("instance"): InstanceNorm3d(channels, affine=True)
    name = norm_name[0] if isinstance(norm_name, (tuple, list)) else norm_name
    assert str(name).lower() == "instance", norm_name
    return nn.InstanceNorm3d(channels, affine=True)


def _conv(in_ch, out_ch, kernel_size, stride, transposed=False):
    # MONAI dynunet get_conv_layer(conv_only=True): bias=False
    k = _ntuple(kernel_size, 3)
    s = _ntuple(stride, 3)
    if transposed:
        return nn.ConvTranspose3d(in_ch, out_ch, k, s, bias=False)
    p = tuple(ki // 2 for ki in k)
    return nn.Conv3d(in_ch, out_ch, k, s, padding=p, bias=False)


class UnetResBlock(nn.Module):
    """monai.networks.blocks.dynunet_block.UnetResBlock."""

    def __init__(self, spatial_dims, in_channels, out_channels, kernel_size,
                 stride, norm_name, **kw):
        super().__init__()
        assert spatial_dims == 3
        self.conv1 = _conv(in_channels, out_channels, kernel_size, stride)
        self.conv2 = _conv(out_channels, out_channels, kernel_size, 1)
        self.norm1 = _norm(norm_name, out_channels)
        self.norm2 = _norm(norm_name, out_channels)
        self.lrelu = nn.LeakyReLU(0.01, inplace=True)
        self.downsample = (in_channels != out_channels) or \
            (_ntuple(stride, 3) != (1, 1, 1))
        if self.downsample:
            self.conv3 = _conv(in_channels, out_channels, 1, stride)
            self.norm3 = _norm(norm_name, out_channels)

    def forward(self, inp):
        residual = inp
        out = self.lrelu(self.norm1(self.conv1(inp)))
        out = self.norm2(self.conv2(out))
        if self.downsample:
            residual = self.norm3(self.conv3(residual))
        return self.lrelu(out + residual)


class UnetrBasicBlock(nn.Module):
    """monai.networks.blocks.UnetrBasicBlock (res_block=True variant)."""

    def __init__(self, spatial_dims, in_channels, out_channels, kernel_size,
                 stride, norm_name, res_block=True, **kw):
        super().__init__()
        assert res_block, "only the res_block variant is stubbed"
        self.layer = UnetResBlock(spatial_dims, in_channels, out_channels,
                                  kernel_size, stride, norm_name)

    def forward(self, inp):
        return self.layer(inp)


class UnetrPrUpBlock(nn.Module):
    """monai.networks.blocks.UnetrPrUpBlock (conv_block=False variant:
    pure transposed-conv ladder)."""

    def __init__(self, spatial_dims, in_channels, out_channels, num_layer,
                 kernel_size, stride, upsample_kernel_size, norm_name,
                 conv_block=False, res_block=False, **kw):
        super().__init__()
        assert not conv_block, "only conv_block=False is stubbed"
        u = upsample_kernel_size
        self.transp_conv_init = _conv(in_channels, out_channels, u, u,
                                      transposed=True)
        self.blocks = nn.ModuleList(
            [_conv(out_channels, out_channels, u, u, transposed=True)
             for _ in range(num_layer)])

    def forward(self, x):
        x = self.transp_conv_init(x)
        for blk in self.blocks:
            x = blk(x)
        return x


class UnetrUpBlock(nn.Module):
    """monai.networks.blocks.UnetrUpBlock (res_block=True variant)."""

    def __init__(self, spatial_dims, in_channels, out_channels, kernel_size,
                 upsample_kernel_size, norm_name, res_block=True, **kw):
        super().__init__()
        assert res_block
        u = upsample_kernel_size
        self.transp_conv = _conv(in_channels, out_channels, u, u,
                                 transposed=True)
        self.conv_block = UnetResBlock(3, out_channels + out_channels,
                                       out_channels, kernel_size, 1, norm_name)

    def forward(self, inp, skip):
        out = self.transp_conv(inp)
        out = torch.cat((out, skip), dim=1)
        return self.conv_block(out)


class UnetOutBlock(nn.Module):
    """monai.networks.blocks.dynunet_block.UnetOutBlock: 1x1 conv, bias."""

    def __init__(self, spatial_dims, in_channels, out_channels, **kw):
        super().__init__()
        self.conv = nn.Conv3d(in_channels, out_channels, 1, 1, bias=True)

    def forward(self, x):
        return self.conv(x)


class MLPBlock(nn.Module):
    """monai.networks.blocks.MLPBlock (vit/swin dropout modes are identical
    in eval)."""

    def __init__(self, hidden_size, mlp_dim, dropout_rate=0.0, act="GELU",
                 dropout_mode="vit", **kw):
        super().__init__()
        self.linear1 = nn.Linear(hidden_size, mlp_dim)
        self.linear2 = nn.Linear(mlp_dim, hidden_size)
        self.fn = nn.GELU()
        self.drop1 = nn.Dropout(dropout_rate)
        self.drop2 = nn.Dropout(dropout_rate)

    def forward(self, x):
        return self.drop2(self.linear2(self.drop1(self.fn(self.linear1(x)))))


class PatchEmbed(nn.Module):
    """monai.networks.blocks.PatchEmbed (the swin patch embedding: strided
    conv; optional flatten-norm)."""

    def __init__(self, patch_size=2, in_chans=1, embed_dim=48,
                 norm_layer=None, spatial_dims=3, **kw):
        super().__init__()
        p = _ntuple(patch_size, spatial_dims)
        self.patch_size = p
        self.proj = nn.Conv3d(in_chans, embed_dim, p, p)
        self.norm = norm_layer(embed_dim) if norm_layer is not None else None

    def forward(self, x):
        import torch.nn.functional as F
        d, h, w = x.shape[2:]
        pd, ph, pw = self.patch_size
        pads = (0, (pw - w % pw) % pw, 0, (ph - h % ph) % ph,
                0, (pd - d % pd) % pd)
        if any(pads):
            x = F.pad(x, pads)
        x = self.proj(x)
        if self.norm is not None:
            shape = x.shape
            x = x.flatten(2).transpose(1, 2)
            x = self.norm(x)
            x = x.transpose(1, 2).view(shape)
        return x


class _SABlock(nn.Module):
    """monai.networks.blocks.selfattention.SABlock (qkv bias=False)."""

    def __init__(self, hidden_size, num_heads, dropout_rate=0.0):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = hidden_size // num_heads
        self.scale = self.head_dim ** -0.5
        self.qkv = nn.Linear(hidden_size, hidden_size * 3, bias=False)
        self.out_proj = nn.Linear(hidden_size, hidden_size)
        self.drop_weights = nn.Dropout(dropout_rate)
        self.drop_output = nn.Dropout(dropout_rate)

    def forward(self, x):
        b, l, c = x.shape
        qkv = self.qkv(x).reshape(b, l, 3, self.num_heads, self.head_dim)
        qkv = qkv.permute(2, 0, 3, 1, 4)            # 3, b, h, l, d
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) * self.scale
        att = self.drop_weights(att.softmax(dim=-1))
        out = (att @ v).transpose(1, 2).reshape(b, l, c)
        return self.drop_output(self.out_proj(out))


class _TransformerBlock(nn.Module):
    """monai.networks.blocks.TransformerBlock (pre-norm)."""

    def __init__(self, hidden_size, mlp_dim, num_heads, dropout_rate=0.0):
        super().__init__()
        self.mlp = MLPBlock(hidden_size, mlp_dim, dropout_rate)
        self.norm1 = nn.LayerNorm(hidden_size)
        self.attn = _SABlock(hidden_size, num_heads, dropout_rate)
        self.norm2 = nn.LayerNorm(hidden_size)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class _PatchEmbeddingBlock(nn.Module):
    """monai.networks.blocks.PatchEmbeddingBlock, pos_embed='perceptron':
    rearrange 'b c (h p1) (w p2) (d p3) -> b (h w d) (p1 p2 p3 c)' + Linear
    + learned position embeddings."""

    def __init__(self, in_channels, img_size, patch_size, hidden_size,
                 num_heads, pos_embed, dropout_rate=0.0):
        super().__init__()
        assert pos_embed == "perceptron"
        img_size = _ntuple(img_size, 3)
        patch_size = _ntuple(patch_size, 3)
        self.patch_size = patch_size
        self.n_patches = math.prod(i // p for i, p in zip(img_size, patch_size))
        patch_dim = in_channels * math.prod(patch_size)
        self.proj = nn.Linear(patch_dim, hidden_size)
        self.position_embeddings = nn.Parameter(
            torch.zeros(1, self.n_patches, hidden_size))
        nn.init.trunc_normal_(self.position_embeddings, std=0.02)
        self.dropout = nn.Dropout(dropout_rate)

    def forward(self, x):
        b, c = x.shape[:2]
        g = [s // p for s, p in zip(x.shape[2:], self.patch_size)]
        p1, p2, p3 = self.patch_size
        x = x.view(b, c, g[0], p1, g[1], p2, g[2], p3)
        # b c g1 p1 g2 p2 g3 p3 -> b (g1 g2 g3) (p1 p2 p3 c)
        x = x.permute(0, 2, 4, 6, 3, 5, 7, 1).reshape(
            b, g[0] * g[1] * g[2], p1 * p2 * p3 * c)
        x = self.proj(x) + self.position_embeddings
        return self.dropout(x)


class ViT(nn.Module):
    """monai.networks.nets.ViT (classification=False)."""

    def __init__(self, in_channels, img_size, patch_size, hidden_size=768,
                 mlp_dim=3072, num_layers=12, num_heads=12,
                 pos_embed="perceptron", classification=False,
                 dropout_rate=0.0, **kw):
        super().__init__()
        assert not classification
        self.patch_embedding = _PatchEmbeddingBlock(
            in_channels, img_size, patch_size, hidden_size, num_heads,
            pos_embed, dropout_rate)
        self.blocks = nn.ModuleList([
            _TransformerBlock(hidden_size, mlp_dim, num_heads, dropout_rate)
            for _ in range(num_layers)])
        self.norm = nn.LayerNorm(hidden_size)

    def forward(self, x):
        x = self.patch_embedding(x)
        hidden_states_out = []
        for blk in self.blocks:
            x = blk(x)
            hidden_states_out.append(x)
        x = self.norm(x)
        return x, hidden_states_out


class DropPath(nn.Module):
    """monai.networks.layers.DropPath — identity in eval."""

    def __init__(self, drop_prob=0.0, **kw):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = x.new_empty(shape).bernoulli_(keep)
        return x / keep * mask
