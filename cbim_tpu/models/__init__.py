"""Model zoo factory (reference model/utils.py:6 get_model)."""

from __future__ import annotations

import jax.numpy as jnp


def _dtype(cfg):
    return jnp.bfloat16 if getattr(cfg, "compute_dtype", "float32") == "bfloat16" \
        else jnp.float32


def get_model(cfg):
    """Build the Flax module selected by (cfg.dimension, cfg.model).

    Mirrors reference model/utils.py:6-125; every model maps
    (B, *spatial, in_chan) -> (B, *spatial, classes) or a list of such heads
    when deep supervision is on.
    """
    dt = _dtype(cfg)
    dim, name = cfg.dimension, cfg.model

    if dim == "2d":
        if name in ("unet", "resunet"):
            from .unet import UNet2D
            return UNet2D(num_classes=cfg.classes, base_ch=cfg.base_chan,
                          block=cfg.block, dtype=dt)
        if name == "unet++":
            from .unetpp import UNetPlusPlus2D
            return UNetPlusPlus2D(num_classes=cfg.classes, base_ch=cfg.base_chan,
                                  dtype=dt)
        if name == "attention_unet":
            from .attention_unet import AttentionUNet2D
            return AttentionUNet2D(num_classes=cfg.classes, base_ch=cfg.base_chan,
                                   dtype=dt)
        if name == "daunet":
            from .daunet import DAUNet2D
            return DAUNet2D(num_classes=cfg.classes, base_ch=cfg.base_chan,
                            block=cfg.block, dtype=dt)
        if name == "medformer":
            from .medformer import MedFormer2D
            return MedFormer2D(
                num_classes=cfg.classes, base_ch=cfg.base_chan,
                conv_block=cfg.conv_block, conv_num=tuple(cfg.conv_num),
                trans_num=tuple(cfg.trans_num), num_heads=tuple(cfg.num_heads),
                fusion_depth=cfg.fusion_depth, fusion_dim=cfg.fusion_dim,
                fusion_heads=cfg.fusion_heads, map_size=cfg.map_size,
                proj_type=cfg.proj_type, expansion=cfg.expansion,
                attn_drop=cfg.attn_drop, proj_drop=cfg.proj_drop,
                aux_loss=cfg.aux_loss, dtype=dt)
        if name == "transunet":
            from .transunet import TransUNet
            grid = (int(cfg.training_size[0] / 16), int(cfg.training_size[1] / 16))
            return TransUNet(num_classes=cfg.classes,
                             img_size=cfg.training_size[0], grid=grid, dtype=dt)
        if name == "swinunet":
            from .swin_unet import SwinUnet2D
            return SwinUnet2D(num_classes=cfg.classes, img_size=224, dtype=dt)

    elif dim == "3d":
        if name in ("unet", "resunet"):
            from .unet import UNet3D
            return UNet3D(num_classes=cfg.classes, base_ch=cfg.base_chan,
                          scale=tuple(map(tuple, _norm_scales(cfg.down_scale, 4))),
                          kernel_size=tuple(map(tuple, _norm_scales(cfg.kernel_size, 5))),
                          block=cfg.block, norm=cfg.norm, dtype=dt)
        if name == "unet++":
            from .unetpp import UNetPlusPlus3D
            return UNetPlusPlus3D(num_classes=cfg.classes, base_ch=cfg.base_chan,
                                  scale=tuple(map(tuple, _norm_scales(cfg.down_scale, 4))),
                                  kernel_size=tuple(map(tuple, _norm_scales(cfg.kernel_size, 5))),
                                  block=cfg.block, norm=cfg.norm, dtype=dt)
        if name == "attention_unet":
            from .attention_unet import AttentionUNet3D
            return AttentionUNet3D(num_classes=cfg.classes, base_ch=cfg.base_chan,
                                   scale=tuple(map(tuple, _norm_scales(cfg.down_scale, 4))),
                                   kernel_size=tuple(map(tuple, _norm_scales(cfg.kernel_size, 5))),
                                   block=cfg.block, norm=cfg.norm, dtype=dt)
        if name == "vnet":
            from .vnet import VNet
            return VNet(num_classes=cfg.classes, base_ch=cfg.base_chan, dtype=dt)
        if name == "medformer":
            from .medformer import MedFormer3D
            return MedFormer3D(
                num_classes=cfg.classes, base_ch=cfg.base_chan,
                map_size=tuple(cfg.map_size), conv_block=cfg.conv_block,
                conv_num=tuple(cfg.conv_num), trans_num=tuple(cfg.trans_num),
                num_heads=tuple(cfg.num_heads), fusion_depth=cfg.fusion_depth,
                fusion_dim=cfg.fusion_dim, fusion_heads=cfg.fusion_heads,
                expansion=cfg.expansion, attn_drop=cfg.attn_drop,
                proj_drop=cfg.proj_drop, proj_type=cfg.proj_type,
                norm=cfg.norm, act=cfg.act,
                kernel_size=tuple(map(tuple, _norm_scales(cfg.kernel_size, 5))),
                scale=tuple(map(tuple, _norm_scales(cfg.down_scale, 4))),
                aux_loss=cfg.aux_loss, remat=bool(cfg.get("remat", True)),
                dtype=dt)
        if name == "unetr":
            from .unetr import UNETR
            return UNETR(num_classes=cfg.classes, img_size=tuple(cfg.training_size),
                         feature_size=16, hidden_size=768, mlp_dim=3072,
                         num_heads=12, dtype=dt)
        if name == "swin_unetr":
            from .swin_unetr import SwinUNETR
            return SwinUNETR(num_classes=cfg.classes,
                             img_size=tuple(cfg.window_size),
                             feature_size=cfg.base_chan, dtype=dt)
        if name == "nnformer":
            from .nnformer import NNFormer
            # Reference wiring (model/utils.py:118-120) exposes only crop size;
            # the remaining knobs default to the paper values and are optional
            # config overrides here (used by the small synthetic recipe).
            kw = {}
            for key in ("embedding_dim", "patch_size", "drop_path_rate"):
                if cfg.get(key) is not None:
                    v = cfg.get(key)
                    kw[key] = tuple(v) if isinstance(v, list) else v
            if cfg.get("nnformer_num_heads") is not None:
                kw["num_heads"] = tuple(cfg.get("nnformer_num_heads"))
            if cfg.get("nnformer_window_size") is not None:
                kw["window_size"] = tuple(cfg.get("nnformer_window_size"))
            return NNFormer(num_classes=cfg.classes,
                            crop_size=tuple(cfg.window_size),
                            deep_supervision=cfg.aux_loss, dtype=dt, **kw)
        if name == "vtunet":
            from .vtunet import VTUNet
            return VTUNet(num_classes=cfg.classes,
                          patch_size=tuple(cfg.patch_size), dtype=dt)

    raise ValueError(f"unknown model {name!r} for dimension {dim!r}")


def _norm_scales(v, n):
    """Normalize scalar / flat-list / nested-list axis specs to n per-level lists."""
    if isinstance(v, int):
        return [[v] * 3] * n
    v = list(v)
    if all(isinstance(t, int) for t in v):
        if len(v) == n:               # [k1..kn] per level, isotropic
            return [[t] * 3 for t in v]
        return [list(v)] * n          # [kz,ky,kx] shared across levels
    assert len(v) == n, (v, n)
    return [list(t) for t in v]
