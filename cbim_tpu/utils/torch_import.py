"""Import PyTorch reference checkpoints into Flax parameter trees.

The reference ships/loads torch ``state_dict`` checkpoints (train.py:104-128,
model/utils.py pretrain paths).  Because this framework's modules are
structurally identical (param-count parity tested per model), weights
transplant directly given the name mapping and layout transposes:

    conv:    (O, I, *k)  ->  (*k, I, O)
    linear:  (O, I)      ->  (I, O)

``import_unet`` covers UNet/ResUNet (2D+3D); it is the template for further
zoo mappings.  Numerical forward parity of the transplant is verified in
tests/test_forward_parity.py.
"""

from __future__ import annotations

import numpy as np


def conv_to_flax(w) -> np.ndarray:
    w = np.asarray(w)
    nd = w.ndim
    return np.transpose(w, (*range(2, nd), 1, 0))


def linear_to_flax(w) -> np.ndarray:
    return np.asarray(w).T


def _to_np(state_dict):
    out = {}
    for k, v in state_dict.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def load_torch_state_dict(path: str) -> dict:
    """Load a torch checkpoint file (reference .pth format) as numpy arrays.

    Accepts either a bare state_dict or the reference trainer's
    {model_state_dict, ema_model_state_dict, ...} wrapper (train.py:104-109);
    the EMA weights are preferred when present (matching the reference's
    eval convention).
    """
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        sd = ckpt.get("ema_model_state_dict") or ckpt["model_state_dict"]
    else:
        sd = ckpt
    return _to_np(sd)


def import_for_model(cfg, state_dict, variables):
    """Dispatch the right transplant for (cfg.model, cfg.dimension).

    This powers ``--pretrain`` + ``init_model: <path to reference .pth>``:
    initialize training (or prediction) from a checkpoint trained with the
    PyTorch reference.

    ``variables`` may be a bare params tree or a full flax variables dict
    ({"params": ..., "batch_stats": ...}); the return mirrors the input
    structure.  Models with BatchNorm running statistics (transunet) require
    the full dict so the stats can be transplanted too.
    """
    is_vars = isinstance(variables, dict) and "params" in variables
    params = variables["params"] if is_vars else variables

    def out(p, extra=None):
        if not is_vars:
            return p
        res = dict(variables)
        res["params"] = p
        if extra:
            res.update(extra)
        return res

    name, dim = cfg.model, cfg.dimension
    if name in ("unet", "resunet"):
        block = cfg.block if name == "unet" else "BasicBlock"
        return out(import_unet(state_dict, params, block=cfg.block,
                               dimension=dim))
    if name == "medformer" and dim == "3d":
        chan_num = list(getattr(cfg, "chan_num",
                                [64, 128, 256, 320, 256, 128, 64, 32]))
        return out(import_medformer3d(state_dict, params, cfg.conv_num,
                                      cfg.trans_num, cfg.num_heads, chan_num,
                                      cfg.fusion_depth))
    if name == "medformer" and dim == "2d":
        return import_medformer2d(state_dict, variables, cfg.conv_num,
                                  cfg.trans_num, cfg.num_heads, cfg.base_chan,
                                  fusion_depth=cfg.fusion_depth,
                                  fusion_heads=cfg.fusion_heads,
                                  aux_loss=bool(getattr(cfg, "aux_loss", True)))
    if name == "nnformer":
        return out(import_nnformer3d(state_dict, params))
    if name == "vtunet":
        return out(import_vtunet(state_dict, params))
    if name == "swinunet":
        return out(import_swinunet(state_dict, params,
                                   depths=tuple(getattr(cfg, "depths",
                                                        (2, 2, 6, 2)))))
    if name == "transunet":
        if not is_vars:
            raise ValueError("transunet transplant needs the full variables "
                             "dict (params + batch_stats)")
        res = import_transunet(state_dict, variables)
        return out(res["params"], {"batch_stats": res["batch_stats"]})
    if name == "unet++":
        block = getattr(cfg, "block", "SingleConv")
        return import_unetpp(state_dict, variables, block=block)
    if name == "attention_unet":
        block = getattr(cfg, "block", "SingleConv")
        return import_attention_unet(state_dict, variables, block=block,
                                     dimension=dim)
    if name == "vnet":
        return import_vnet(state_dict, variables,
                           elu=bool(getattr(cfg, "elu", True)))
    if name == "daunet":
        return import_daunet(state_dict, variables,
                             block=getattr(cfg, "block", "BasicBlock"))
    if name == "unetr":
        return out(import_unetr(state_dict, params))
    if name == "swin_unetr":
        return out(import_swin_unetr(state_dict, params))
    raise NotImplementedError(
        f"torch-checkpoint import not implemented for {name} ({dim}); "
        f"supported: unet/resunet (2d+3d), medformer (3d), nnformer, "
        f"vtunet, swinunet, transunet, unet++, attention_unet, vnet, daunet, "
        f"unetr, swin_unetr")


def _bmha_perm(heads: int, dim_head: int) -> np.ndarray:
    """B-MHA channel permutation: the reference's rearrange1 splits the inner
    channels dim-head-major (medformer_utils.py:43-51, view(b, dim_head,
    heads, -1)); ours splits head-major.  mine[c] = torch[perm[c]]."""
    perm = np.empty(heads * dim_head, np.int64)
    for d in range(dim_head):
        for h in range(heads):
            perm[h * dim_head + d] = d * heads + h
    return perm


def import_medformer3d(state_dict, params, conv_num, trans_num, num_heads,
                       chan_num, fusion_depth: int = 2):
    """Map reference model/dim3/medformer.py weights onto our MedFormer3D.

    Assumes the shipped config family: conv_block=BasicBlock,
    proj_type=depthwise, norm='in' (parameter-free), aux_loss on.
    Verified numerically in tests/test_forward_parity.py.
    """
    sd = _to_np(state_dict)
    import jax
    p = jax.tree_util.tree_map(np.asarray, params)
    dim_head = [chan_num[i] // num_heads[i] for i in range(8)]

    def put(node_path, torch_key, is_conv=True, transform=None):
        node = p
        for part in node_path[:-1]:
            node = node[part]
        w = sd[torch_key]
        if transform is not None:
            w = transform(w)
        w = conv_to_flax(w) if is_conv else np.asarray(w)
        assert node[node_path[-1]].shape == w.shape, \
            (node_path, torch_key, node[node_path[-1]].shape, w.shape)
        node[node_path[-1]] = w

    def basic_block(prefix, tkey, has_shortcut):
        put((*prefix, "ConvNormAct_0", "Conv_0", "kernel"), f"{tkey}.conv1.conv.weight")
        put((*prefix, "ConvNormAct_1", "Conv_0", "kernel"), f"{tkey}.conv2.conv.weight")
        if has_shortcut:
            put((*prefix, "ConvNormAct_2", "Conv_0", "kernel"),
                f"{tkey}.shortcut.conv.weight")

    def dwsep(prefix, tkey, out_perm=None, in_perm=None):
        def dw(w):
            return w[in_perm] if in_perm is not None else w
        def pw(w):
            if out_perm is not None:
                w = w[out_perm]
            if in_perm is not None:
                w = w[:, in_perm]
            return w
        put((*prefix, "Conv_0", "kernel"), f"{tkey}.depthwise.weight", transform=dw)
        put((*prefix, "Conv_1", "kernel"), f"{tkey}.pointwise.weight", transform=pw)

    def mbconv(prefix, tkey):
        put((*prefix, "ConvNormAct_0", "Conv_0", "kernel"), f"{tkey}.expand_proj.conv.weight")
        put((*prefix, "ConvNormAct_1", "Conv_0", "kernel"), f"{tkey}.depthwise.conv.weight")
        put((*prefix, "SEBlock_0", "Conv_0", "kernel"), f"{tkey}.se.excitation.0.weight")
        p_ = p
        for part in (*prefix, "SEBlock_0"):
            p_ = p_[part]
        p_["Conv_0"]["bias"] = sd[f"{tkey}.se.excitation.0.bias"]
        put((*prefix, "SEBlock_0", "Conv_1", "kernel"), f"{tkey}.se.excitation.2.weight")
        p_["Conv_1"]["bias"] = sd[f"{tkey}.se.excitation.2.bias"]
        put((*prefix, "ConvNormAct_2", "Conv_0", "kernel"), f"{tkey}.pointwise.conv.weight")

    def bmha_block(prefix, tkey, heads, dh, has_shortcut, no_map_out=False):
        inner = heads * dh
        perm = _bmha_perm(heads, dh)
        qv_perm = np.concatenate([perm, inner + perm])
        attn = (*prefix, "BidirectionAttention_0")
        dwsep((*attn, "DepthwiseSeparableConv_0"), f"{tkey}.attn.feat_qv",
              out_perm=qv_perm)
        put((*attn, "Conv_0", "kernel"), f"{tkey}.attn.map_qv.weight",
            transform=lambda w: w[qv_perm])
        dwsep((*attn, "DepthwiseSeparableConv_1"), f"{tkey}.attn.feat_out",
              in_perm=perm)
        if not no_map_out:
            put((*attn, "Conv_1", "kernel"), f"{tkey}.attn.map_out.weight",
                transform=lambda w: w[:, perm])
        if has_shortcut:
            put((*prefix, "ConvNormAct_0", "Conv_0", "kernel"),
                f"{tkey}.shortcut.conv.weight")
        mbconv((*prefix, "MBConv_0"), f"{tkey}.feedforward")

    # --- encoder -----------------------------------------------------------
    put(("inc", "Conv_0", "kernel"), "inc.conv1.weight")
    basic_block(("inc", "BasicBlock_0"), "inc.conv2", False)

    for i in range(4):
        name = f"down{i + 1}"
        dwsep((name, "PatchMerging_0", "DepthwiseSeparableConv_0"),
              f"{name}.patch_merging.reduction")
        for j in range(conv_num[i]):
            basic_block((name, f"BasicBlock_{j}"), f"{name}.conv_blocks.{j}", False)
        if i > 0:
            put((name, "SemanticMapGeneration_0", "Conv_0", "kernel"),
                f"{name}.map_gen.base_proj.weight")
            put((name, "SemanticMapGeneration_0", "Conv_1", "kernel"),
                f"{name}.map_gen.semantic_proj.weight")
        for j in range(trans_num[i]):
            bmha_block((name, "BasicLayer_0", f"BidirectionAttentionBlock_{j}"),
                       f"{name}.trans_blocks.blocks.{j}",
                       num_heads[i], dim_head[i], has_shortcut=False)

    # --- map fusion ----------------------------------------------------------
    mf = "SemanticMapFusion_0"
    for i in range(3):
        put((mf, f"Conv_{i}", "kernel"), f"map_fusion.in_proj.{i}.weight")
        put((mf, f"Conv_{i + 3}", "kernel"), f"map_fusion.out_proj.{i}.weight")
    tb = (mf, "TransformerBlock_0")
    for d in range(fusion_depth):
        base = f"map_fusion.fusion.layers.{d}"
        node = p[mf]["TransformerBlock_0"]
        node[f"LayerNorm_{2 * d}"]["scale"] = sd[f"{base}.0.norm.weight"]
        node[f"LayerNorm_{2 * d}"]["bias"] = sd[f"{base}.0.norm.bias"]
        put((*tb, f"Attention_{d}", "Dense_0", "kernel"),
            f"{base}.0.fn.to_qkv.weight", is_conv=False,
            transform=linear_to_flax)
        put((*tb, f"Attention_{d}", "Dense_1", "kernel"),
            f"{base}.0.fn.to_out.weight", is_conv=False,
            transform=linear_to_flax)
        node[f"Attention_{d}"]["Dense_1"]["bias"] = sd[f"{base}.0.fn.to_out.bias"]
        node[f"LayerNorm_{2 * d + 1}"]["scale"] = sd[f"{base}.1.norm.weight"]
        node[f"LayerNorm_{2 * d + 1}"]["bias"] = sd[f"{base}.1.norm.bias"]
        put((*tb, f"Mlp_{d}", "Dense_0", "kernel"), f"{base}.1.fn.fc1.weight",
            is_conv=False, transform=linear_to_flax)
        node[f"Mlp_{d}"]["Dense_0"]["bias"] = sd[f"{base}.1.fn.fc1.bias"]
        put((*tb, f"Mlp_{d}", "Dense_1", "kernel"), f"{base}.1.fn.fc2.weight",
            is_conv=False, transform=linear_to_flax)
        node[f"Mlp_{d}"]["Dense_1"]["bias"] = sd[f"{base}.1.fn.fc2.bias"]

    # --- decoder -------------------------------------------------------------
    for u in range(4):
        name = f"up{u + 1}"
        stage = 4 + u
        if u < 2:   # map shortcut
            put((name, "Conv_0", "kernel"), f"{name}.map_reduction.weight")
        for j in range(trans_num[stage]):
            no_mo = (u == 1 and j == trans_num[stage] - 1)   # up2 last: no_map_out
            bmha_block((name, "BasicLayer_0", f"BidirectionAttentionBlock_{j}"),
                       f"{name}.trans_blocks.blocks.{j}",
                       num_heads[stage], dim_head[stage],
                       has_shortcut=(j == 0), no_map_out=no_mo)
        for j in range(conv_num[stage]):
            basic_block((name, f"BasicBlock_{j}"), f"{name}.conv_blocks.{j}",
                        has_shortcut=(j == 0))

    # aux + out heads (created in that order -> Conv_0, Conv_1)
    put(("Conv_0", "kernel"), "aux_out.weight")
    p["Conv_0"]["bias"] = sd["aux_out.bias"]
    put(("Conv_1", "kernel"), "outc.weight")
    p["Conv_1"]["bias"] = sd["outc.bias"]
    return p


def convtranspose_to_flax(w) -> np.ndarray:
    """torch ConvTranspose (I, O, *k) -> flax (*k, I, O) with spatial FLIP
    (torch's transposed conv is the conv adjoint; flax's is a fractionally
    strided correlation)."""
    w = np.asarray(w)
    nd = w.ndim
    w = np.transpose(w, (*range(2, nd), 0, 1))
    return np.ascontiguousarray(w[(slice(None, None, -1),) * (nd - 2)])


def import_nnformer3d(state_dict, params, depths=(2, 2, 2, 2)):
    """Map reference model/dim3/nnformer.py weights onto our NNFormer.

    Validates the shared shifted-window machinery numerically (see
    tests/test_forward_parity.py).
    """
    sd = _to_np(state_dict)
    import jax
    p = jax.tree_util.tree_map(np.asarray, params)

    def ln(flax_node, tkey):
        flax_node["scale"] = sd[f"{tkey}.weight"]
        flax_node["bias"] = sd[f"{tkey}.bias"]

    def dense(flax_node, tkey, bias=True):
        flax_node["kernel"] = linear_to_flax(sd[f"{tkey}.weight"])
        if bias:
            flax_node["bias"] = sd[f"{tkey}.bias"]

    def conv(flax_node, tkey):
        flax_node["kernel"] = conv_to_flax(sd[f"{tkey}.weight"])
        flax_node["bias"] = sd[f"{tkey}.bias"]

    def block(flax_blk, tkey, kv=False):
        ln(flax_blk["LayerNorm_0"], f"{tkey}.norm1")
        attn = flax_blk["_WindowAttentionNF_0"]
        dense(attn["Dense_0"], f"{tkey}.attn.kv" if kv else f"{tkey}.attn.qkv")
        attn["relative_position_bias_table"] = \
            sd[f"{tkey}.attn.relative_position_bias_table"]
        dense(attn["Dense_1"], f"{tkey}.attn.proj")
        ln(flax_blk["LayerNorm_1"], f"{tkey}.norm2")
        dense(flax_blk["Dense_0"], f"{tkey}.mlp.fc1")
        dense(flax_blk["Dense_1"], f"{tkey}.mlp.fc2")

    # stem
    for pi in (0, 1):
        proj = p[f"_Project_{pi}"]
        conv(proj["Conv_0"], f"model_down.patch_embed.proj{pi + 1}.conv1")
        ln(proj["LayerNorm_0"], f"model_down.patch_embed.proj{pi + 1}.norm1")
        conv(proj["Conv_1"], f"model_down.patch_embed.proj{pi + 1}.conv2")
        if pi == 0:
            ln(proj["LayerNorm_1"], f"model_down.patch_embed.proj{pi + 1}.norm2")
    ln(p["LayerNorm_0"], "model_down.patch_embed.norm")

    # encoder
    blk_idx = 0
    for i, depth in enumerate(depths):
        for b in range(depth):
            block(p[f"_NFBlock_{blk_idx}"],
                  f"model_down.layers.{i}.blocks.{b}")
            blk_idx += 1
        ln(p[f"LayerNorm_{1 + i}"], f"model_down.norm{i}")
        if i < len(depths) - 1:
            pm = p[f"_PatchMergingNF_{i}"]
            ln(pm["LayerNorm_0"], f"model_down.layers.{i}.downsample.norm")
            conv(pm["Conv_0"], f"model_down.layers.{i}.downsample.reduction")

    # decoder: our stage j=0 (coarsest) == torch decoder.layers[2], j=1 ==
    # layers[1], j=2 == layers[0] (reference builds the list reversed)
    dec_depths = list(depths[::-1][1:])
    for j in range(len(dec_depths)):
        tl = f"decoder.layers.{len(dec_depths) - 1 - j}"
        pe = p[f"_PatchExpandingNF_{j}"]
        ln(pe["LayerNorm_0"], f"{tl}.Upsample.norm")
        pe["ConvTranspose_0"]["kernel"] = \
            convtranspose_to_flax(sd[f"{tl}.Upsample.up.weight"])
        pe["ConvTranspose_0"]["bias"] = sd[f"{tl}.Upsample.up.bias"]
        i_layer = len(dec_depths) - 1 - j
        for b in range(dec_depths[i_layer]):
            block(p[f"_NFBlock_{blk_idx}"], f"{tl}.blocks.{b}", kv=(b == 0))
            blk_idx += 1

    # heads: our ConvTranspose_k created coarsest-first == torch final[2-k]
    n_heads = len(depths) - 1
    for k in range(n_heads):
        t = f"final.{n_heads - 1 - k}"
        p[f"ConvTranspose_{k}"]["kernel"] = \
            convtranspose_to_flax(sd[f"{t}.up.weight"])
        p[f"ConvTranspose_{k}"]["bias"] = sd[f"{t}.up.bias"]
    return p


def import_vtunet(state_dict, params, depths=(2, 2, 2, 1)):
    """Map reference model/dim3/vtunet.py weights onto our VTUNet."""
    sd = _to_np(state_dict)
    import jax
    p = jax.tree_util.tree_map(np.asarray, params)
    pre = "swin_unet"

    def ln(node, tkey):
        node["scale"] = sd[f"{tkey}.weight"]
        node["bias"] = sd[f"{tkey}.bias"]

    def dense(node, tkey, bias=True):
        node["kernel"] = linear_to_flax(sd[f"{tkey}.weight"])
        if bias:
            node["bias"] = sd[f"{tkey}.bias"]

    def block(blk, tkey):
        ln(blk["norm1"], f"{tkey}.norm1")
        attn = blk["WindowAttentionVT_0"]
        dense(attn["Dense_0"], f"{tkey}.attn.qkv")
        attn["relative_position_bias_table"] = \
            sd[f"{tkey}.attn.relative_position_bias_table"]
        dense(attn["Dense_1"], f"{tkey}.attn.proj")
        ln(blk["norm2"], f"{tkey}.norm2")
        dense(blk["mlp_fc1"], f"{tkey}.mlp.fc1")
        dense(blk["mlp_fc2"], f"{tkey}.mlp.fc2")

    p["Conv_0"]["kernel"] = conv_to_flax(sd[f"{pre}.patch_embed.proj.weight"])
    p["Conv_0"]["bias"] = sd[f"{pre}.patch_embed.proj.bias"]
    ln(p["LayerNorm_0"], f"{pre}.patch_embed.norm")

    bi = 0
    for i, depth in enumerate(depths):
        for b in range(depth):
            block(p[f"SwinBlockVT_{bi}"], f"{pre}.layers.{i}.blocks.{b}")
            bi += 1
        if i < len(depths) - 1:
            pm = p[f"PatchMergingHW_{i}"]
            ln(pm["LayerNorm_0"], f"{pre}.layers.{i}.downsample.norm")
            dense(pm["Dense_0"], f"{pre}.layers.{i}.downsample.reduction",
                  bias=False)
    ln(p["LayerNorm_1"], f"{pre}.norm")

    # decoder: layers_up.0 is the bottleneck PatchExpand; stages 1..3 carry
    # blocks + concat_back_dim + (for 1,2) a trailing upsample
    pe = p["PatchExpandHW_0"]
    dense(pe["Dense_0"], f"{pre}.layers_up.0.expand", bias=False)
    ln(pe["LayerNorm_0"], f"{pre}.layers_up.0.norm")
    for inx in range(1, len(depths)):
        dense(p[f"Dense_{inx - 1}"], f"{pre}.concat_back_dim.{inx}",
              bias=False)
        stage = len(depths) - 1 - inx
        for b in range(depths[stage]):
            block(p[f"SwinBlockVT_{bi}"], f"{pre}.layers_up.{inx}.blocks.{b}")
            bi += 1
        if inx < len(depths) - 1:
            pe = p[f"PatchExpandHW_{inx}"]
            dense(pe["Dense_0"], f"{pre}.layers_up.{inx}.upsample.expand",
                  bias=False)
            ln(pe["LayerNorm_0"], f"{pre}.layers_up.{inx}.upsample.norm")

    ln(p["LayerNorm_2"], f"{pre}.norm_up")
    fp = p["FinalPatchExpand_0"]
    dense(fp["Dense_0"], f"{pre}.up.expand", bias=False)
    ln(fp["LayerNorm_0"], f"{pre}.up.norm")
    p["Conv_1"]["kernel"] = conv_to_flax(sd[f"{pre}.output.weight"])
    return p


def import_swinunet(state_dict, params, depths=(2, 2, 6, 2),
                    strict: bool = True):
    """Map reference model/dim2/swin_unet.py weights onto our SwinUnet2D.

    strict=False skips torch keys that are missing or shape-mismatched —
    torch ``load_state_dict(strict=False)`` semantics plus the reference
    load_from's shape-based deletions (swin_unet.py:1652-1659), used by the
    official-pretrained path (:func:`import_swinunet_pth`)."""
    sd = _to_np(state_dict)
    import jax
    p = jax.tree_util.tree_map(np.asarray, params)
    pre = "swin_unet"

    def put(node, name, tkey, transform=None):
        if tkey not in sd:
            assert not strict, f"missing {tkey}"
            return
        w = sd[tkey]
        if transform is not None:
            w = transform(w)
        w = np.asarray(w)
        if node[name].shape != w.shape:
            assert not strict, (tkey, node[name].shape, w.shape)
            return
        node[name] = w

    def ln(node, tkey):
        put(node, "scale", f"{tkey}.weight")
        put(node, "bias", f"{tkey}.bias")

    def dense(node, tkey, bias=True):
        put(node, "kernel", f"{tkey}.weight", transform=linear_to_flax)
        if bias:
            put(node, "bias", f"{tkey}.bias")

    def block(blk, tkey):
        ln(blk["LayerNorm_0"], f"{tkey}.norm1")
        attn = blk["WindowAttention_0"]
        dense(attn["Dense_0"], f"{tkey}.attn.qkv")
        put(attn, "relative_position_bias_table",
            f"{tkey}.attn.relative_position_bias_table")
        dense(attn["Dense_1"], f"{tkey}.attn.proj")
        ln(blk["LayerNorm_1"], f"{tkey}.norm2")
        dense(blk["Dense_0"], f"{tkey}.mlp.fc1")
        dense(blk["Dense_1"], f"{tkey}.mlp.fc2")

    put(p["Conv_0"], "kernel", f"{pre}.patch_embed.proj.weight",
        transform=conv_to_flax)
    put(p["Conv_0"], "bias", f"{pre}.patch_embed.proj.bias")
    ln(p["LayerNorm_0"], f"{pre}.patch_embed.norm")

    bi = 0
    for i, depth in enumerate(depths):
        for b in range(depth):
            block(p[f"SwinBlock_{bi}"], f"{pre}.layers.{i}.blocks.{b}")
            bi += 1
        if i < len(depths) - 1:
            pm = p[f"PatchMergingLegacy_{i}"]
            ln(pm["LayerNorm_0"], f"{pre}.layers.{i}.downsample.norm")
            dense(pm["Dense_0"], f"{pre}.layers.{i}.downsample.reduction",
                  bias=False)
    ln(p["LayerNorm_1"], f"{pre}.norm")

    pe = p["PatchExpand2D_0"]
    dense(pe["Dense_0"], f"{pre}.layers_up.0.expand", bias=False)
    ln(pe["LayerNorm_0"], f"{pre}.layers_up.0.norm")
    for inx in range(1, len(depths)):
        dense(p[f"Dense_{inx - 1}"], f"{pre}.concat_back_dim.{inx}")
        stage = len(depths) - 1 - inx
        for b in range(depths[stage]):
            block(p[f"SwinBlock_{bi}"], f"{pre}.layers_up.{inx}.blocks.{b}")
            bi += 1
        if inx < len(depths) - 1:
            pe = p[f"PatchExpand2D_{inx}"]
            dense(pe["Dense_0"], f"{pre}.layers_up.{inx}.upsample.expand",
                  bias=False)
            ln(pe["LayerNorm_0"], f"{pre}.layers_up.{inx}.upsample.norm")

    ln(p["LayerNorm_2"], f"{pre}.norm_up")
    fp = p["FinalPatchExpandX4_0"]
    dense(fp["Dense_0"], f"{pre}.up.expand", bias=False)
    ln(fp["LayerNorm_0"], f"{pre}.up.norm")
    put(p["Conv_1"], "kernel", f"{pre}.output.weight", transform=conv_to_flax)
    return p


def import_swinunet_pth(ckpt, params, depths=(2, 2, 6, 2)):
    """Load an official swin-tiny ImageNet checkpoint ({'model': ...} .pth)
    into SwinUnet2D, replicating the reference's load_from surgery
    (swin_unet.py:1619-1669): encoder 'layers.{i}' weights are mirrored into
    decoder 'layers_up.{3-i}', then everything loads with strict=False
    (missing decoder-only params keep their fresh init; shape-mismatched
    mirrors are dropped)."""
    d = ckpt["model"] if "model" in ckpt else \
        {k[17:]: v for k, v in ckpt.items() if "output" not in k}
    d = _to_np(d)
    full = dict(d)
    for k, v in d.items():
        if k.startswith("layers."):
            nl = 3 - int(k[7])
            full["layers_up." + str(nl) + k[8:]] = v
    sd = {f"swin_unet.{k}": v for k, v in full.items()}
    return import_swinunet(sd, params, depths=depths, strict=False)


def import_unet(state_dict, params, block: str = "SingleConv",
                dimension: str = "3d"):
    """Map reference model/dim{2,3}/unet.py weights onto our UNet params.

    Supports SingleConv (UNet) and BasicBlock (ResUNet) blocks with
    InstanceNorm (the shipped 3D configs); BatchNorm scale/bias and running
    stats are mapped for 2D 'bn' models when present.
    Returns a new params tree (plain nested dict of numpy arrays).
    """
    sd = _to_np(state_dict)
    import jax
    p = jax.tree_util.tree_map(np.asarray, params)
    up_name = "UpBlock3D" if dimension == "3d" else "UpBlock2D"

    def put(path, torch_key, is_conv=True):
        node = p
        for part in path[:-1]:
            node = node[part]
        node[path[-1]] = conv_to_flax(sd[torch_key]) if is_conv else sd[torch_key]

    def map_block(flax_prefix, torch_prefix):
        """One conv block (SingleConv or BasicBlock)."""
        if block == "SingleConv":
            put((*flax_prefix, "ConvNormAct_0", "Conv_0", "kernel"),
                f"{torch_prefix}.conv.conv.weight")
        else:  # BasicBlock: conv1, conv2, optional shortcut
            put((*flax_prefix, "ConvNormAct_0", "Conv_0", "kernel"),
                f"{torch_prefix}.conv1.conv.weight")
            put((*flax_prefix, "ConvNormAct_1", "Conv_0", "kernel"),
                f"{torch_prefix}.conv2.conv.weight")
            sk = f"{torch_prefix}.shortcut.conv.weight"
            if sk in sd:
                put((*flax_prefix, "ConvNormAct_2", "Conv_0", "kernel"), sk)

    blk = "SingleConv_" if block == "SingleConv" else "BasicBlock_"

    put(("InConv_0", "Conv_0", "kernel"), "inc.conv1.weight")
    map_block(("InConv_0", f"{blk}0"), "inc.conv2")
    for i in range(4):
        for j in range(2):
            map_block((f"DownBlock_{i}", f"{blk}{j}"),
                      f"down{i + 1}.conv.{j + 1}")
        for j in range(2):
            map_block((f"{up_name}_{i}", f"{blk}{j}"),
                      f"up{i + 1}.conv.{j}")
        if dimension == "2d":
            # 2D decoder's 1x1 channel conv (dim2 unet_utils.py conv_ch)
            key = f"up{i + 1}.conv_ch.weight"
            if key in sd:
                put((f"{up_name}_{i}", "Conv_0", "kernel"), key)
                p[f"{up_name}_{i}"]["Conv_0"]["bias"] = sd[f"up{i + 1}.conv_ch.bias"]
    put(("Conv_0", "kernel"), "outc.weight")
    p["Conv_0"]["bias"] = sd["outc.bias"]
    return p


def import_transunet(state_dict, variables, strict: bool = True):
    """Map reference model/dim2/transunet.py (vendored R50-ViT-B_16) weights
    onto our TransUNet {params, batch_stats}.

    Covers the ResNetV2 hybrid stem (weight-standardized convs + GroupNorm),
    the ViT-B/16 encoder (q/k/v/out Linears fused into our qkv Dense), and
    the DecoderCup conv+BN blocks including running statistics.
    Verified numerically in tests/test_forward_parity.py.

    strict=False skips torch keys that are absent (encoder-only pretrained
    checkpoints: decoder/head keep their fresh initialization) — the backbone
    behavior of the reference's ``--pretrain`` npz path (model/utils.py:52).
    """
    sd = _to_np(state_dict)
    import jax
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    bs = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def gn(node, tkey):
        node["scale"] = sd[f"{tkey}.weight"]
        node["bias"] = sd[f"{tkey}.bias"]

    def stdconv(node, tkey):
        node["kernel"] = conv_to_flax(sd[f"{tkey}.weight"])

    # --- ResNetV2 hybrid stem -----------------------------------------------
    rn = p["ResNetV2_0"]
    hm = "transformer.embeddings.hybrid_model"
    stdconv(rn["StdConv_0"], f"{hm}.root.conv")
    gn(rn["GN_0"], f"{hm}.root.gn")
    block_units = (3, 4, 9)
    k = 0
    for bi, units in enumerate(block_units):
        for u in range(1, units + 1):
            t = f"{hm}.body.block{bi + 1}.unit{u}"
            unit = rn[f"PreActBottleneck_{k}"]
            off = 0
            if u == 1:   # first unit projects the residual
                stdconv(unit["StdConv_0"], f"{t}.downsample")
                gn(unit["GN_0"], f"{t}.gn_proj")
                off = 1
            for ci in (1, 2, 3):
                stdconv(unit[f"StdConv_{off + ci - 1}"], f"{t}.conv{ci}")
                gn(unit[f"GN_{off + ci - 1}"], f"{t}.gn{ci}")
            k += 1

    # --- ViT embeddings + encoder -------------------------------------------
    p["Conv_0"]["kernel"] = conv_to_flax(
        sd["transformer.embeddings.patch_embeddings.weight"])
    p["Conv_0"]["bias"] = sd["transformer.embeddings.patch_embeddings.bias"]
    p["position_embeddings"] = sd["transformer.embeddings.position_embeddings"]

    def ln(node, tkey):
        node["scale"] = sd[f"{tkey}.weight"]
        node["bias"] = sd[f"{tkey}.bias"]

    n_layers = 12
    for i in range(n_layers):
        t = f"transformer.encoder.layer.{i}"
        ln(p[f"LayerNorm_{2 * i}"], f"{t}.attention_norm")
        attn = p[f"Attention_{i}"]
        attn["Dense_0"]["kernel"] = np.concatenate(
            [linear_to_flax(sd[f"{t}.attn.{n}.weight"])
             for n in ("query", "key", "value")], axis=1)
        attn["Dense_0"]["bias"] = np.concatenate(
            [sd[f"{t}.attn.{n}.bias"] for n in ("query", "key", "value")])
        attn["Dense_1"]["kernel"] = linear_to_flax(sd[f"{t}.attn.out.weight"])
        attn["Dense_1"]["bias"] = sd[f"{t}.attn.out.bias"]
        ln(p[f"LayerNorm_{2 * i + 1}"], f"{t}.ffn_norm")
        mlp = p[f"Mlp_{i}"]
        mlp["Dense_0"]["kernel"] = linear_to_flax(sd[f"{t}.ffn.fc1.weight"])
        mlp["Dense_0"]["bias"] = sd[f"{t}.ffn.fc1.bias"]
        mlp["Dense_1"]["kernel"] = linear_to_flax(sd[f"{t}.ffn.fc2.weight"])
        mlp["Dense_1"]["bias"] = sd[f"{t}.ffn.fc2.bias"]
    ln(p[f"LayerNorm_{2 * n_layers}"], "transformer.encoder.encoder_norm")

    # --- DecoderCup + head ---------------------------------------------------
    def conv_bn(ci, bni, tconv, tbn):
        if f"{tconv}.weight" not in sd:
            assert not strict, f"missing {tconv}.weight"
            return
        p[f"Conv_{ci}"]["kernel"] = conv_to_flax(sd[f"{tconv}.weight"])
        p[f"BatchNorm_{bni}"]["scale"] = sd[f"{tbn}.weight"]
        p[f"BatchNorm_{bni}"]["bias"] = sd[f"{tbn}.bias"]
        bs[f"BatchNorm_{bni}"]["mean"] = sd[f"{tbn}.running_mean"]
        bs[f"BatchNorm_{bni}"]["var"] = sd[f"{tbn}.running_var"]

    conv_bn(1, 0, "decoder.conv_more.0", "decoder.conv_more.1")
    for i in range(4):
        conv_bn(2 + 2 * i, 1 + 2 * i,
                f"decoder.blocks.{i}.conv1.0", f"decoder.blocks.{i}.conv1.1")
        conv_bn(3 + 2 * i, 2 + 2 * i,
                f"decoder.blocks.{i}.conv2.0", f"decoder.blocks.{i}.conv2.1")
    if "segmentation_head.0.weight" in sd:
        p["Conv_10"]["kernel"] = conv_to_flax(sd["segmentation_head.0.weight"])
        p["Conv_10"]["bias"] = sd["segmentation_head.0.bias"]
    else:
        assert not strict, "missing segmentation_head.0.weight"
    return {"params": p, "batch_stats": bs}


# ---------------------------------------------------------------------------
# conv-block family importers (UNet++ / AttentionUNet / VNet / DAUNet)
# ---------------------------------------------------------------------------


def _node(tree, path, create=False):
    for part in path:
        if create and part not in tree:
            tree[part] = {}
        tree = tree[part]
    return tree


def _cna_mapper(sd, p, bs):
    """Returns cna(flax_path, torch_prefix) mapping one reference ConvNormAct
    (conv_layers.py:16-53: .conv + .norm) including BatchNorm affine and
    running statistics when present (bs = batch_stats tree or None)."""
    def cna(flax_path, t):
        node = _node(p, flax_path)
        node["Conv_0"]["kernel"] = conv_to_flax(sd[f"{t}.conv.weight"])
        if f"{t}.conv.bias" in sd:
            node["Conv_0"]["bias"] = sd[f"{t}.conv.bias"]
        if f"{t}.norm.weight" in sd:               # affine norm (bn)
            bn = node["Norm_0"]["BatchNorm_0"]
            bn["scale"] = sd[f"{t}.norm.weight"]
            bn["bias"] = sd[f"{t}.norm.bias"]
            if bs is not None and f"{t}.norm.running_mean" in sd:
                bnn = _node(bs, (*flax_path, "Norm_0", "BatchNorm_0"))
                bnn["mean"] = sd[f"{t}.norm.running_mean"]
                bnn["var"] = sd[f"{t}.norm.running_var"]
    return cna


def _block_mapper(sd, p, bs, block):
    """Returns map_block(flax_prefix, torch_prefix) for one SingleConv /
    BasicBlock (conv_layers.py:56-94)."""
    cna = _cna_mapper(sd, p, bs)

    def map_block(flax_prefix, t):
        if block == "SingleConv":
            cna((*flax_prefix, "ConvNormAct_0"), f"{t}.conv")
        else:   # BasicBlock
            cna((*flax_prefix, "ConvNormAct_0"), f"{t}.conv1")
            cna((*flax_prefix, "ConvNormAct_1"), f"{t}.conv2")
            if f"{t}.shortcut.conv.weight" in sd:
                cna((*flax_prefix, "ConvNormAct_2"), f"{t}.shortcut")
    return map_block


def _split_variables(variables):
    import jax
    is_vars = isinstance(variables, dict) and "params" in variables
    params = variables["params"] if is_vars else variables
    p = jax.tree_util.tree_map(np.asarray, params)
    bs = None
    if is_vars and variables.get("batch_stats"):
        bs = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    return is_vars, p, bs


def _merge_variables(variables, is_vars, p, bs):
    if not is_vars:
        return p
    out = dict(variables)
    out["params"] = p
    if bs is not None:
        out["batch_stats"] = bs
    return out


def import_unetpp(state_dict, variables, block: str = "SingleConv"):
    """Map reference model/dim{2,3}/unetpp.py weights onto UNetPlusPlus.

    The flax stages are numbered in forward-call order; the table below is
    that order for the reference's conv{i}_{j} grid (unetpp.py:55-75)."""
    sd = _to_np(state_dict)
    is_vars, p, bs = _split_variables(variables)
    map_block = _block_mapper(sd, p, bs, block)

    order = ["conv0_0", "conv1_0", "conv0_1", "conv2_0", "conv1_1", "conv0_2",
             "conv3_0", "conv2_1", "conv1_2", "conv0_3", "conv4_0", "conv3_1",
             "conv2_2", "conv1_3", "conv0_4"]
    blk = "SingleConv_" if block == "SingleConv" else "BasicBlock_"
    for si, t in enumerate(order):
        for j in range(2):
            map_block((f"_Stage_{si}", f"{blk}{j}"), f"{t}.{j}")
    p["Conv_0"]["kernel"] = conv_to_flax(sd["output.weight"])
    p["Conv_0"]["bias"] = sd["output.bias"]
    return _merge_variables(variables, is_vars, p, bs)


def import_attention_unet(state_dict, variables, block: str = "SingleConv",
                          dimension: str = "3d"):
    """Map reference model/dim{2,3}/attention_unet.py weights onto
    AttentionUNet{2,3}D.  The reference's dead ``conv_ch`` convs
    (attention_unet_utils.py:40) are skipped."""
    sd = _to_np(state_dict)
    is_vars, p, bs = _split_variables(variables)
    map_block = _block_mapper(sd, p, bs, block)
    cna = _cna_mapper(sd, p, bs)
    blk = "SingleConv_" if block == "SingleConv" else "BasicBlock_"

    p["InConv_0"]["Conv_0"]["kernel"] = conv_to_flax(sd["inc.conv1.weight"])
    map_block(("InConv_0", f"{blk}0"), "inc.conv2")
    for i in range(4):
        for j in range(2):
            map_block((f"DownBlock_{i}", f"{blk}{j}"), f"down{i+1}.conv.{j+1}")
        up = f"AttentionUpBlock_{i}"
        gate = p[up]["AttentionGate_0"]
        gate["Conv_0"]["kernel"] = conv_to_flax(sd[f"up{i+1}.attn.W_g.0.weight"])
        gate["Conv_1"]["kernel"] = conv_to_flax(sd[f"up{i+1}.attn.W_x.0.weight"])
        gate["Conv_2"]["kernel"] = conv_to_flax(sd[f"up{i+1}.attn.psi.0.weight"])
        for j in range(2):
            map_block((up, f"{blk}{j}"), f"up{i+1}.conv.{j}")
    p["Conv_0"]["kernel"] = conv_to_flax(sd["outc.weight"])
    p["Conv_0"]["bias"] = sd["outc.bias"]
    return _merge_variables(variables, is_vars, p, bs)


def import_vnet(state_dict, variables, elu: bool = True):
    """Map reference model/dim3/vnet.py weights onto VNet.

    ContBatchNorm always normalizes with batch stats (vnet.py:22-32), so only
    its affine (weight/bias) transplants — running buffers never affect the
    forward.  PReLU slopes map when elu=False."""
    sd = _to_np(state_dict)
    is_vars, p, bs = _split_variables(variables)

    def cbn(node, t):
        node["ContBatchNorm_0"]["scale"] = sd[f"{t}.bn1.weight"]
        node["ContBatchNorm_0"]["bias"] = sd[f"{t}.bn1.bias"]

    def act(node, name, tkey):
        if not elu and tkey in sd:
            node[name]["prelu"] = sd[tkey]

    it = p["InputTransition_0"]
    it["Conv_0"]["kernel"] = conv_to_flax(sd["in_tr.conv1.weight"])
    it["Conv_0"]["bias"] = sd["in_tr.conv1.bias"]
    cbn(it, "in_tr")
    act(it, "_Act_0", "in_tr.relu1.weight")

    downs = ["down_tr32", "down_tr64", "down_tr128", "down_tr256"]
    nconvs = [1, 2, 3, 2]
    for i, (t, nc) in enumerate(zip(downs, nconvs)):
        d = p[f"DownTransition_{i}"]
        d["Conv_0"]["kernel"] = conv_to_flax(sd[f"{t}.down_conv.weight"])
        d["Conv_0"]["bias"] = sd[f"{t}.down_conv.bias"]
        cbn(d, t)
        act(d, "_Act_0", f"{t}.relu1.weight")
        act(d, "_Act_1", f"{t}.relu2.weight")
        for k in range(nc):
            lu = d[f"LUConv_{k}"]
            lu["Conv_0"]["kernel"] = conv_to_flax(sd[f"{t}.ops.{k}.conv1.weight"])
            lu["Conv_0"]["bias"] = sd[f"{t}.ops.{k}.conv1.bias"]
            cbn(lu, f"{t}.ops.{k}")
            act(lu, "_Act_0", f"{t}.ops.{k}.relu1.weight")

    ups = ["up_tr256", "up_tr128", "up_tr64", "up_tr32"]
    nconvs = [2, 2, 1, 1]
    for i, (t, nc) in enumerate(zip(ups, nconvs)):
        u = p[f"UpTransition_{i}"]
        u["ConvTranspose_0"]["kernel"] = convtranspose_to_flax(
            sd[f"{t}.up_conv.weight"])
        u["ConvTranspose_0"]["bias"] = sd[f"{t}.up_conv.bias"]
        cbn(u, t)
        act(u, "_Act_0", f"{t}.relu1.weight")
        act(u, "_Act_1", f"{t}.relu2.weight")
        for k in range(nc):
            lu = u[f"LUConv_{k}"]
            lu["Conv_0"]["kernel"] = conv_to_flax(sd[f"{t}.ops.{k}.conv1.weight"])
            lu["Conv_0"]["bias"] = sd[f"{t}.ops.{k}.conv1.bias"]
            cbn(lu, f"{t}.ops.{k}")
            act(lu, "_Act_0", f"{t}.ops.{k}.relu1.weight")

    p["Conv_0"]["kernel"] = conv_to_flax(sd["out_tr.conv1.weight"])
    p["Conv_0"]["bias"] = sd["out_tr.conv1.bias"]
    p["ContBatchNorm_0"]["scale"] = sd["out_tr.bn1.weight"]
    p["ContBatchNorm_0"]["bias"] = sd["out_tr.bn1.bias"]
    act(p, "_Act_0", "out_tr.relu1.weight")
    p["Conv_1"]["kernel"] = conv_to_flax(sd["out_tr.conv2.weight"])
    p["Conv_1"]["bias"] = sd["out_tr.conv2.bias"]
    return _merge_variables(variables, is_vars, p, bs)


def import_daunet(state_dict, variables, block: str = "BasicBlock"):
    """Map reference model/dim2/dual_attention_unet.py weights onto DAUNet2D
    (UNet body + DAHead with PAM/CAM, BN affine + running stats)."""
    sd = _to_np(state_dict)
    is_vars, p, bs = _split_variables(variables)
    map_block = _block_mapper(sd, p, bs, block)
    blk = "SingleConv_" if block == "SingleConv" else "BasicBlock_"

    def bn(flax_path, t):
        node = _node(p, flax_path)
        node["BatchNorm_0"]["scale"] = sd[f"{t}.weight"]
        node["BatchNorm_0"]["bias"] = sd[f"{t}.bias"]
        if bs is not None:
            bnn = _node(bs, (*flax_path, "BatchNorm_0"))
            bnn["mean"] = sd[f"{t}.running_mean"]
            bnn["var"] = sd[f"{t}.running_var"]

    def conv(flax_path, t, bias=True):
        node = _node(p, flax_path)
        node["kernel"] = conv_to_flax(sd[f"{t}.weight"])
        if bias and f"{t}.bias" in sd:
            node["bias"] = sd[f"{t}.bias"]

    p["InConv_0"]["Conv_0"]["kernel"] = conv_to_flax(sd["inc.conv1.weight"])
    map_block(("InConv_0", f"{blk}0"), "inc.conv2")
    for i in range(4):
        for j in range(2):
            map_block((f"DownBlock_{i}", f"{blk}{j}"), f"down{i+1}.conv.{j+1}")
        for j in range(2):
            map_block((f"UpBlock2D_{i}", f"{blk}{j}"), f"up{i+1}.conv.{j}")
        if f"up{i+1}.conv_ch.weight" in sd:
            conv((f"UpBlock2D_{i}", "Conv_0"), f"up{i+1}.conv_ch")

    da = "DAHead_0"
    bn((da, "Norm_0"), "DAModule.conv_a.0")
    conv((da, "Conv_0"), "DAModule.conv_a.2")
    pam = (da, "PAM_0")
    conv((*pam, "Conv_0"), "DAModule.sa.query_conv")
    conv((*pam, "Conv_1"), "DAModule.sa.key_conv")
    conv((*pam, "Conv_2"), "DAModule.sa.value_conv")
    _node(p, pam)["gamma"] = sd["DAModule.sa.gamma"]
    bn((da, "Norm_1"), "DAModule.conv_a_1.0")
    conv((da, "Conv_1"), "DAModule.conv_a_1.2")
    bn((da, "Norm_2"), "DAModule.conv_c.0")
    conv((da, "Conv_2"), "DAModule.conv_c.2")
    _node(p, (da, "CAM_0"))["gamma"] = sd["DAModule.sc.gamma"]
    bn((da, "Norm_3"), "DAModule.conv_c_1.0")
    conv((da, "Conv_3"), "DAModule.conv_c_1.2")
    conv((da, "Conv_4"), "DAModule.fuse_out.1")
    conv((da, "Conv_5"), "DAModule.conv_a_out.1")
    conv((da, "Conv_6"), "DAModule.conv_c_out.1")

    p["Conv_0"]["kernel"] = conv_to_flax(sd["outc.weight"])
    p["Conv_0"]["bias"] = sd["outc.bias"]
    return _merge_variables(variables, is_vars, p, bs)


def import_medformer2d(state_dict, variables, conv_num, trans_num, num_heads,
                       base_ch, fusion_depth: int = 2, fusion_heads: int = 4,
                       aux_loss: bool = True):
    """Map reference model/dim2/medformer.py weights onto MedFormer2D.

    Unlike the 3D flagship (norm='in', parameter-free), the 2D variant uses
    BatchNorm everywhere (dim2 medformer.py:12 norm=nn.BatchNorm2d), so this
    transplants BN affine + running statistics through every block, the
    B-MHA pre-norms (norm1/norm2), the PatchMerging norm, and the up-block
    concat norm.  Head-channel permutations are shared with the 3D importer
    (_bmha_perm): the reference splits inner channels dim-head-major."""
    sd = _to_np(state_dict)
    is_vars, p, bs = _split_variables(variables)
    cna = _cna_mapper(sd, p, bs)
    map_block = _block_mapper(sd, p, bs, "BasicBlock")
    cn = [2 * base_ch, 4 * base_ch, 8 * base_ch, 16 * base_ch,
          8 * base_ch, 4 * base_ch, 2 * base_ch, base_ch]
    dim_head = [cn[i] // num_heads[i] for i in range(8)]

    def put(path, tkey, transform=None, is_conv=True):
        w = sd[tkey]
        if transform is not None:
            w = transform(w)
        w = conv_to_flax(w) if is_conv else np.asarray(w)
        node = _node(p, path[:-1])
        assert node[path[-1]].shape == w.shape, (path, tkey,
                                                 node[path[-1]].shape, w.shape)
        node[path[-1]] = w

    def bn(flax_path, t):
        node = _node(p, flax_path)
        node["BatchNorm_0"]["scale"] = sd[f"{t}.weight"]
        node["BatchNorm_0"]["bias"] = sd[f"{t}.bias"]
        if bs is not None:
            bnn = _node(bs, (*flax_path, "BatchNorm_0"))
            bnn["mean"] = sd[f"{t}.running_mean"]
            bnn["var"] = sd[f"{t}.running_var"]

    def dwsep(prefix, tkey, out_perm=None, in_perm=None):
        def dw(w):
            return w[in_perm] if in_perm is not None else w

        def pw(w):
            if out_perm is not None:
                w = w[out_perm]
            if in_perm is not None:
                w = w[:, in_perm]
            return w
        put((*prefix, "Conv_0", "kernel"), f"{tkey}.depthwise.weight",
            transform=dw)
        put((*prefix, "Conv_1", "kernel"), f"{tkey}.pointwise.weight",
            transform=pw)

    def mbconv(prefix, tkey):
        cna((*prefix, "ConvNormAct_0"), f"{tkey}.expand_proj")
        cna((*prefix, "ConvNormAct_1"), f"{tkey}.depthwise")
        se = _node(p, (*prefix, "SEBlock_0"))
        # dim2 MBConv names its SE module `se_block` (dim2 conv_layers.py:208)
        se_t = f"{tkey}.se_block.excitation"
        se["Conv_0"]["kernel"] = conv_to_flax(sd[f"{se_t}.0.weight"])
        se["Conv_0"]["bias"] = sd[f"{se_t}.0.bias"]
        se["Conv_1"]["kernel"] = conv_to_flax(sd[f"{se_t}.2.weight"])
        se["Conv_1"]["bias"] = sd[f"{se_t}.2.bias"]
        cna((*prefix, "ConvNormAct_2"), f"{tkey}.pointwise")

    def bmha_block(prefix, tkey, heads, dh, has_shortcut):
        inner = heads * dh
        perm = _bmha_perm(heads, dh)
        qv_perm = np.concatenate([perm, inner + perm])
        bn((*prefix, "Norm_0"), f"{tkey}.norm1")
        bn((*prefix, "Norm_1"), f"{tkey}.norm2")
        attn = (*prefix, "BidirectionAttention_0")
        dwsep((*attn, "DepthwiseSeparableConv_0"), f"{tkey}.attn.feat_qv",
              out_perm=qv_perm)
        put((*attn, "Conv_0", "kernel"), f"{tkey}.attn.map_qv.weight",
            transform=lambda w: w[qv_perm])
        dwsep((*attn, "DepthwiseSeparableConv_1"), f"{tkey}.attn.feat_out",
              in_perm=perm)
        put((*attn, "Conv_1", "kernel"), f"{tkey}.attn.map_out.weight",
            transform=lambda w: w[:, perm])
        if has_shortcut:
            cna((*prefix, "ConvNormAct_0"), f"{tkey}.shortcut")
        mbconv((*prefix, "MBConv_0"), f"{tkey}.feedforward")

    # --- encoder -------------------------------------------------------------
    put(("InConvMF_0", "Conv_0", "kernel"), "inc.conv1.weight")
    map_block(("InConvMF_0", "BasicBlock_0"), "inc.conv2")

    for i in range(4):
        t = f"down{i + 1}"
        f = f"DownBlockMF_{i}"
        bn((f, "PatchMerging_0", "Norm_0"), f"{t}.patch_merging.norm")
        dwsep((f, "PatchMerging_0", "DepthwiseSeparableConv_0"),
              f"{t}.patch_merging.reduction")
        for j in range(conv_num[i]):
            map_block((f, f"BasicBlock_{j}"), f"{t}.conv_blocks.{j}")
        if i > 0:
            put((f, "SemanticMapGeneration_0", "Conv_0", "kernel"),
                f"{t}.map_gen.base_proj.weight")
            put((f, "SemanticMapGeneration_0", "Conv_1", "kernel"),
                f"{t}.map_gen.semantic_proj.weight")
        for j in range(trans_num[i]):
            bmha_block((f, "BasicLayer_0", f"BidirectionAttentionBlock_{j}"),
                       f"{t}.trans_blocks.blocks.{j}",
                       num_heads[i], dim_head[i], has_shortcut=False)

    # --- map fusion (identical structure to 3D) -------------------------------
    mf = "SemanticMapFusion_0"
    for i in range(3):
        put((mf, f"Conv_{i}", "kernel"), f"map_fusion.in_proj.{i}.weight")
        put((mf, f"Conv_{i + 3}", "kernel"), f"map_fusion.out_proj.{i}.weight")
    tb = (mf, "TransformerBlock_0")
    # dim2 trans_layers merges attention heads dim-head-major on the way OUT
    # (einops 'b heads l dim_head -> b l (dim_head heads)', dim2
    # trans_layers.py:68) whereas the dim3 vendored rearrange2 merges
    # heads-major -- permute to_out's input columns accordingly
    inner = sd["map_fusion.fusion.layers.0.0.fn.to_out.weight"].shape[1]
    out_perm = _bmha_perm(fusion_heads, inner // fusion_heads)
    for d in range(fusion_depth):
        base = f"map_fusion.fusion.layers.{d}"
        node = _node(p, tb)
        node[f"LayerNorm_{2 * d}"]["scale"] = sd[f"{base}.0.norm.weight"]
        node[f"LayerNorm_{2 * d}"]["bias"] = sd[f"{base}.0.norm.bias"]
        put((*tb, f"Attention_{d}", "Dense_0", "kernel"),
            f"{base}.0.fn.to_qkv.weight", is_conv=False,
            transform=linear_to_flax)
        put((*tb, f"Attention_{d}", "Dense_1", "kernel"),
            f"{base}.0.fn.to_out.weight", is_conv=False,
            transform=lambda w: linear_to_flax(w[:, out_perm]))
        node[f"Attention_{d}"]["Dense_1"]["bias"] = sd[f"{base}.0.fn.to_out.bias"]
        node[f"LayerNorm_{2 * d + 1}"]["scale"] = sd[f"{base}.1.norm.weight"]
        node[f"LayerNorm_{2 * d + 1}"]["bias"] = sd[f"{base}.1.norm.bias"]
        put((*tb, f"Mlp_{d}", "Dense_0", "kernel"), f"{base}.1.fn.fc1.weight",
            is_conv=False, transform=linear_to_flax)
        node[f"Mlp_{d}"]["Dense_0"]["bias"] = sd[f"{base}.1.fn.fc1.bias"]
        put((*tb, f"Mlp_{d}", "Dense_1", "kernel"), f"{base}.1.fn.fc2.weight",
            is_conv=False, transform=linear_to_flax)
        node[f"Mlp_{d}"]["Dense_1"]["bias"] = sd[f"{base}.1.fn.fc2.bias"]

    # --- decoder --------------------------------------------------------------
    for u in range(4):
        t = f"up{u + 1}"
        f = f"UpBlockMF2D_{u}"
        stage = 4 + u
        bn((f, "Norm_0"), f"{t}.norm")
        put((f, "Conv_0", "kernel"), f"{t}.reduction.weight")
        put((f, "Conv_1", "kernel"), f"{t}.map_reduction.weight")
        for j in range(trans_num[stage]):
            bmha_block((f, "BasicLayer_0", f"BidirectionAttentionBlock_{j}"),
                       f"{t}.trans_blocks.blocks.{j}",
                       num_heads[stage], dim_head[stage], has_shortcut=False)
        for j in range(conv_num[stage]):
            map_block((f, f"BasicBlock_{j}"), f"{t}.conv_blocks.{j}")

    if aux_loss:
        put(("Conv_0", "kernel"), "aux_out.weight")
        p["Conv_0"]["bias"] = sd["aux_out.bias"]
        put(("Conv_1", "kernel"), "outc.weight")
        p["Conv_1"]["bias"] = sd["outc.bias"]
    else:
        put(("Conv_0", "kernel"), "outc.weight")
        p["Conv_0"]["bias"] = sd["outc.bias"]
    return _merge_variables(variables, is_vars, p, bs)


def import_transunet_npz(npz, variables):
    """Load the official R50+ViT-B_16 ``.npz`` pretrained weights (the
    reference's ``--pretrain`` path, model/utils.py:52 + transunet.py:786
    load_from) into our TransUNet variables.

    The npz is converted to the reference's torch state_dict naming with the
    same transforms the reference applies (HWIO->OIHW convs, fused-head qkv
    reshape + transpose, cls-token drop / bilinear grid zoom for the position
    embedding), then routed through the numerically-verified
    :func:`import_transunet` (strict=False: decoder + head keep their fresh
    init, exactly like the reference)."""
    w = {k: np.asarray(npz[k]) for k in
         (npz.files if hasattr(npz, "files") else npz.keys())}
    sd = {}

    def conv(t):
        return w[t].transpose(3, 2, 0, 1)

    hidden = w["embedding/kernel"].shape[-1]
    sd["transformer.embeddings.patch_embeddings.weight"] = conv("embedding/kernel")
    sd["transformer.embeddings.patch_embeddings.bias"] = w["embedding/bias"]
    sd["transformer.encoder.encoder_norm.weight"] = \
        w["Transformer/encoder_norm/scale"].reshape(-1)
    sd["transformer.encoder.encoder_norm.bias"] = \
        w["Transformer/encoder_norm/bias"].reshape(-1)

    posemb = w["Transformer/posembed_input/pos_embedding"]
    tgt = variables["params"]["position_embeddings"].shape
    if posemb.shape != tuple(tgt):
        if posemb.shape[1] - 1 == tgt[1]:
            posemb = posemb[:, 1:]          # drop the cls token (seg)
        else:
            # reference zoom path (transunet.py:812-830): drop cls, bilinear
            # zoom the grid to the new token count
            from scipy import ndimage
            grid = posemb[0, 1:]
            gs_old = int(np.sqrt(grid.shape[0]))
            gs_new = int(np.sqrt(tgt[1]))
            grid = grid.reshape(gs_old, gs_old, -1)
            grid = ndimage.zoom(grid, (gs_new / gs_old, gs_new / gs_old, 1),
                                order=1)
            posemb = grid.reshape(1, gs_new * gs_new, -1)
    sd["transformer.embeddings.position_embeddings"] = posemb

    n_layers = sum(1 for k in w
                   if k.startswith("Transformer/encoderblock_")
                   and k.endswith("LayerNorm_0/scale"))
    attn = "MultiHeadDotProductAttention_1"
    for i in range(n_layers):
        R = f"Transformer/encoderblock_{i}"
        t = f"transformer.encoder.layer.{i}"
        for n in ("query", "key", "value"):
            sd[f"{t}.attn.{n}.weight"] = \
                w[f"{R}/{attn}/{n}/kernel"].reshape(hidden, hidden).T
            sd[f"{t}.attn.{n}.bias"] = w[f"{R}/{attn}/{n}/bias"].reshape(-1)
        sd[f"{t}.attn.out.weight"] = \
            w[f"{R}/{attn}/out/kernel"].reshape(hidden, hidden).T
        sd[f"{t}.attn.out.bias"] = w[f"{R}/{attn}/out/bias"].reshape(-1)
        sd[f"{t}.ffn.fc1.weight"] = w[f"{R}/MlpBlock_3/Dense_0/kernel"].T
        sd[f"{t}.ffn.fc1.bias"] = w[f"{R}/MlpBlock_3/Dense_0/bias"].reshape(-1)
        sd[f"{t}.ffn.fc2.weight"] = w[f"{R}/MlpBlock_3/Dense_1/kernel"].T
        sd[f"{t}.ffn.fc2.bias"] = w[f"{R}/MlpBlock_3/Dense_1/bias"].reshape(-1)
        sd[f"{t}.attention_norm.weight"] = w[f"{R}/LayerNorm_0/scale"].reshape(-1)
        sd[f"{t}.attention_norm.bias"] = w[f"{R}/LayerNorm_0/bias"].reshape(-1)
        sd[f"{t}.ffn_norm.weight"] = w[f"{R}/LayerNorm_2/scale"].reshape(-1)
        sd[f"{t}.ffn_norm.bias"] = w[f"{R}/LayerNorm_2/bias"].reshape(-1)

    if "conv_root/kernel" in w:            # hybrid ResNetV2 stem
        hm = "transformer.embeddings.hybrid_model"
        sd[f"{hm}.root.conv.weight"] = conv("conv_root/kernel")
        sd[f"{hm}.root.gn.weight"] = w["gn_root/scale"].reshape(-1)
        sd[f"{hm}.root.gn.bias"] = w["gn_root/bias"].reshape(-1)
        block_units = (3, 4, 9)
        for bi, units in enumerate(block_units):
            for u in range(1, units + 1):
                src = f"block{bi + 1}/unit{u}"
                t = f"{hm}.body.block{bi + 1}.unit{u}"
                for ci in (1, 2, 3):
                    sd[f"{t}.conv{ci}.weight"] = conv(f"{src}/conv{ci}/kernel")
                    sd[f"{t}.gn{ci}.weight"] = w[f"{src}/gn{ci}/scale"].reshape(-1)
                    sd[f"{t}.gn{ci}.bias"] = w[f"{src}/gn{ci}/bias"].reshape(-1)
                if u == 1:
                    sd[f"{t}.downsample.weight"] = conv(f"{src}/conv_proj/kernel")
                    sd[f"{t}.gn_proj.weight"] = w[f"{src}/gn_proj/scale"].reshape(-1)
                    sd[f"{t}.gn_proj.bias"] = w[f"{src}/gn_proj/bias"].reshape(-1)

    return import_transunet(sd, variables, strict=False)


def _map_unet_res_block(blk, sd, tkey):
    """monai dynunet UnetResBlock -> our unetr.UnetResBlock params."""
    blk["Conv_0"]["kernel"] = conv_to_flax(sd[f"{tkey}.conv1.weight"])
    blk["_INorm_0"]["scale"] = sd[f"{tkey}.norm1.weight"]
    blk["_INorm_0"]["bias"] = sd[f"{tkey}.norm1.bias"]
    blk["Conv_1"]["kernel"] = conv_to_flax(sd[f"{tkey}.conv2.weight"])
    blk["_INorm_1"]["scale"] = sd[f"{tkey}.norm2.weight"]
    blk["_INorm_1"]["bias"] = sd[f"{tkey}.norm2.bias"]
    if f"{tkey}.conv3.weight" in sd:
        blk["Conv_2"]["kernel"] = conv_to_flax(sd[f"{tkey}.conv3.weight"])
        blk["_INorm_2"]["scale"] = sd[f"{tkey}.norm3.weight"]
        blk["_INorm_2"]["bias"] = sd[f"{tkey}.norm3.bias"]


def import_unetr(state_dict, params):
    """Map reference model/dim3/unetr.py (MONAI-composed UNETR) weights onto
    our UNETR (models/unetr.py)."""
    sd = _to_np(state_dict)
    import jax
    p = jax.tree_util.tree_map(np.asarray, params)

    vit = p["ViT_0"]
    pe = vit["PatchEmbedding_0"]
    pe["Dense_0"]["kernel"] = linear_to_flax(
        sd["vit.patch_embedding.proj.weight"])
    pe["Dense_0"]["bias"] = sd["vit.patch_embedding.proj.bias"]
    pe["position_embeddings"] = sd["vit.patch_embedding.position_embeddings"]
    n_layers = sum(1 for k in sd if k.endswith(".attn.qkv.weight")
                   and k.startswith("vit."))
    for i in range(n_layers):
        t = f"vit.blocks.{i}"
        vit[f"LayerNorm_{2 * i}"]["scale"] = sd[f"{t}.norm1.weight"]
        vit[f"LayerNorm_{2 * i}"]["bias"] = sd[f"{t}.norm1.bias"]
        attn = vit[f"Attention_{i}"]
        attn["Dense_0"]["kernel"] = linear_to_flax(sd[f"{t}.attn.qkv.weight"])
        attn["Dense_1"]["kernel"] = linear_to_flax(
            sd[f"{t}.attn.out_proj.weight"])
        attn["Dense_1"]["bias"] = sd[f"{t}.attn.out_proj.bias"]
        vit[f"LayerNorm_{2 * i + 1}"]["scale"] = sd[f"{t}.norm2.weight"]
        vit[f"LayerNorm_{2 * i + 1}"]["bias"] = sd[f"{t}.norm2.bias"]
        mlp = vit[f"Mlp_{i}"]
        mlp["Dense_0"]["kernel"] = linear_to_flax(sd[f"{t}.mlp.linear1.weight"])
        mlp["Dense_0"]["bias"] = sd[f"{t}.mlp.linear1.bias"]
        mlp["Dense_1"]["kernel"] = linear_to_flax(sd[f"{t}.mlp.linear2.weight"])
        mlp["Dense_1"]["bias"] = sd[f"{t}.mlp.linear2.bias"]
    vit[f"LayerNorm_{2 * n_layers}"]["scale"] = sd["vit.norm.weight"]
    vit[f"LayerNorm_{2 * n_layers}"]["bias"] = sd["vit.norm.bias"]

    _map_unet_res_block(p["UnetResBlock_0"], sd, "encoder1.layer")
    # _TranspConv creation order in models/unetr.py __call__
    tconvs = ["encoder2.transp_conv_init", "encoder2.blocks.0",
              "encoder2.blocks.1", "encoder3.transp_conv_init",
              "encoder3.blocks.0", "encoder4.transp_conv_init",
              "decoder5.transp_conv", "decoder4.transp_conv",
              "decoder3.transp_conv", "decoder2.transp_conv"]
    for i, t in enumerate(tconvs):
        p[f"_TranspConv_{i}"]["ConvTranspose_0"]["kernel"] = \
            convtranspose_to_flax(sd[f"{t}.weight"])
    for i, dec in enumerate(["decoder5", "decoder4", "decoder3", "decoder2"]):
        _map_unet_res_block(p[f"UnetResBlock_{i + 1}"], sd,
                            f"{dec}.conv_block")
    p["Conv_0"]["kernel"] = conv_to_flax(sd["out.conv.weight"])
    p["Conv_0"]["bias"] = sd["out.conv.bias"]
    return p


def import_swin_unetr(state_dict, params, depths=(2, 2, 2, 0)):
    """Map reference model/dim3/swin_unetr.py (vendored-MONAI SwinUNETR)
    weights onto our SwinUNETR (models/swin_unetr.py)."""
    sd = _to_np(state_dict)
    import jax
    p = jax.tree_util.tree_map(np.asarray, params)

    def dense(node, tkey, bias=True):
        node["kernel"] = linear_to_flax(sd[f"{tkey}.weight"])
        if bias:
            node["bias"] = sd[f"{tkey}.bias"]

    def ln(node, tkey):
        node["scale"] = sd[f"{tkey}.weight"]
        node["bias"] = sd[f"{tkey}.bias"]

    sw = p["SwinTransformer3D_0"]
    sw["Conv_0"]["kernel"] = conv_to_flax(sd["swinViT.patch_embed.proj.weight"])
    sw["Conv_0"]["bias"] = sd["swinViT.patch_embed.proj.bias"]
    blk_idx = 0
    for stage, depth in enumerate(depths):
        t = f"swinViT.layers{stage + 1}.0"
        for b in range(depth):
            blk = sw[f"SwinBlock_{blk_idx}"]
            ln(blk["LayerNorm_0"], f"{t}.blocks.{b}.norm1")
            attn = blk["WindowAttention_0"]
            dense(attn["Dense_0"], f"{t}.blocks.{b}.attn.qkv")
            attn["relative_position_bias_table"] = \
                sd[f"{t}.blocks.{b}.attn.relative_position_bias_table"]
            dense(attn["Dense_1"], f"{t}.blocks.{b}.attn.proj")
            ln(blk["LayerNorm_1"], f"{t}.blocks.{b}.norm2")
            dense(blk["Dense_0"], f"{t}.blocks.{b}.mlp.linear1")
            dense(blk["Dense_1"], f"{t}.blocks.{b}.mlp.linear2")
            blk_idx += 1
        pm = sw[f"PatchMergingLegacy_{stage}"]
        ln(pm["LayerNorm_0"], f"{t}.downsample.norm")
        dense(pm["Dense_0"], f"{t}.downsample.reduction", bias=False)

    enc_map = ["encoder1", "encoder2", "encoder3", "encoder4", "encoder10"]
    for i, t in enumerate(enc_map):
        _map_unet_res_block(p[f"UnetResBlock_{i}"], sd, f"{t}.layer")
    dec_map = ["decoder5", "decoder4", "decoder3", "decoder2", "decoder1"]
    for i, t in enumerate(dec_map):
        p[f"_TranspConv_{i}"]["ConvTranspose_0"]["kernel"] = \
            convtranspose_to_flax(sd[f"{t}.transp_conv.weight"])
        _map_unet_res_block(p[f"UnetResBlock_{i + 5}"], sd, f"{t}.conv_block")
    p["Conv_0"]["kernel"] = conv_to_flax(sd["out.conv.weight"])
    p["Conv_0"]["bias"] = sd["out.conv.bias"]
    return p


def import_swin_unetr_ssl(ckpt, params, depths=(2, 2, 2, 0)):
    """Map the self-supervised swin-vit pretrain checkpoint (the reference's
    ``model_swinvit.pt`` format: ``{"state_dict": {"module.*": ...}}``,
    loaded by model/utils.py:107-115 via SwinUNETR.load_from,
    model/dim3/swin_unetr.py:230-277) onto our SwinUNETR params.

    Only the swinViT backbone is written (patch embed, per-stage blocks and
    downsamples); encoder/decoder/out params keep their fresh init — exactly
    what the reference's load_from touches.  Note the ssl checkpoint names
    the block MLP ``mlp.fc1/fc2`` while the reference block stores it as
    ``mlp.linear1/linear2`` (swin_unetr.py:611-643); the buffers
    (relative_position_index) are deterministic and skipped.
    """
    sd = _to_np(ckpt["state_dict"] if "state_dict" in ckpt else ckpt)
    import jax
    p = jax.tree_util.tree_map(np.asarray, params)

    def dense(node, tkey, bias=True):
        node["kernel"] = linear_to_flax(sd[f"{tkey}.weight"])
        if bias:
            node["bias"] = sd[f"{tkey}.bias"]

    def ln(node, tkey):
        node["scale"] = sd[f"{tkey}.weight"]
        node["bias"] = sd[f"{tkey}.bias"]

    sw = p["SwinTransformer3D_0"]
    sw["Conv_0"]["kernel"] = conv_to_flax(sd["module.patch_embed.proj.weight"])
    sw["Conv_0"]["bias"] = sd["module.patch_embed.proj.bias"]
    blk_idx = 0
    for stage, depth in enumerate(depths):
        t = f"module.layers{stage + 1}.0"
        for b in range(depth):
            blk = sw[f"SwinBlock_{blk_idx}"]
            ln(blk["LayerNorm_0"], f"{t}.blocks.{b}.norm1")
            attn = blk["WindowAttention_0"]
            dense(attn["Dense_0"], f"{t}.blocks.{b}.attn.qkv")
            attn["relative_position_bias_table"] = \
                sd[f"{t}.blocks.{b}.attn.relative_position_bias_table"]
            dense(attn["Dense_1"], f"{t}.blocks.{b}.attn.proj")
            ln(blk["LayerNorm_1"], f"{t}.blocks.{b}.norm2")
            dense(blk["Dense_0"], f"{t}.blocks.{b}.mlp.fc1")
            dense(blk["Dense_1"], f"{t}.blocks.{b}.mlp.fc2")
            blk_idx += 1
        pm = sw[f"PatchMergingLegacy_{stage}"]
        ln(pm["LayerNorm_0"], f"{t}.downsample.norm")
        dense(pm["Dense_0"], f"{t}.downsample.reduction", bias=False)
    return p
