from .convs import (BasicBlock, Bottleneck, ConvNormAct, ConvNeXtBlock,
                    DepthwiseSeparableConv, DropPath, FusedMBConv, MBConv,
                    SEBlock, SingleConv, get_block_cls)
from .transformers import Attention, Mlp, TransformerBlock

__all__ = [
    "ConvNormAct", "SingleConv", "BasicBlock", "Bottleneck",
    "DepthwiseSeparableConv", "SEBlock", "DropPath", "MBConv", "FusedMBConv",
    "ConvNeXtBlock", "get_block_cls", "Mlp", "Attention", "TransformerBlock",
]
