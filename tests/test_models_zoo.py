"""Param-count parity + forward shape tests for the CNN zoo models."""
import numpy as np
import pytest

import conftest as cf

import jax
import jax.numpy as jnp

from test_models import init_model, n_params, torch_n_params


def test_unetpp3d_param_parity():
    torch = pytest.importorskip("torch")
    cf.add_reference_to_path()
    from model.dim3.unetpp import UNetPlusPlus as Ref

    from cbim_tpu.models.unetpp import UNetPlusPlus3D

    scale = [[1, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2]]
    ks = [[1, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3]]
    ref = Ref(1, 8, scale, ks, num_classes=4, block="SingleConv", norm="in")
    ours = UNetPlusPlus3D(num_classes=4, base_ch=8, block="SingleConv",
                          norm="in", scale=tuple(map(tuple, scale)),
                          kernel_size=tuple(map(tuple, ks)))
    v = init_model(ours, (1, 8, 16, 16, 1))
    assert n_params(v["params"]) == torch_n_params(ref)
    out = ours.apply(v, jnp.zeros((1, 8, 16, 16, 1)), train=False)
    assert out.shape == (1, 8, 16, 16, 4)


def test_unetpp2d_param_parity():
    torch = pytest.importorskip("torch")
    cf.add_reference_to_path()
    from model.dim2.unetpp import UNetPlusPlus as Ref2

    from cbim_tpu.models.unetpp import UNetPlusPlus2D

    ref = Ref2(1, 4, base_ch=8, block="SingleConv")
    ours = UNetPlusPlus2D(num_classes=4, base_ch=8, block="SingleConv", norm="bn")
    v = init_model(ours, (1, 32, 32, 1))
    assert n_params(v["params"]) == torch_n_params(ref)


def test_attention_unet3d_param_parity_minus_dead_conv():
    torch = pytest.importorskip("torch")
    cf.add_reference_to_path()
    from model.dim3.attention_unet import AttentionUNet as Ref

    from cbim_tpu.models.attention_unet import AttentionUNet3D

    scale = [[2, 2, 2]] * 4
    ks = [[3, 3, 3]] * 5
    base = 8
    ref = Ref(1, base, scale, ks, num_classes=4, block="SingleConv", norm="in")
    ours = AttentionUNet3D(num_classes=4, base_ch=base, norm="in",
                           block="SingleConv", scale=tuple(map(tuple, scale)),
                           kernel_size=tuple(map(tuple, ks)))
    v = init_model(ours, (1, 16, 16, 16, 1))

    # the reference's attention_up_block.conv_ch is dead (defined, never
    # called in forward, attention_unet_utils.py:40); subtract it per level.
    dead = 0
    for in_ch, out_ch in [(10 * base, 8 * base), (8 * base, 4 * base),
                          (4 * base, 2 * base), (2 * base, base)]:
        dead += in_ch * out_ch + out_ch     # 1x1 conv w + b
    assert n_params(v["params"]) == torch_n_params(ref) - dead

    out = ours.apply(v, jnp.zeros((1, 16, 16, 16, 1)), train=False)
    assert out.shape == (1, 16, 16, 16, 4)


@pytest.mark.slow
def test_vnet_param_parity():
    torch = pytest.importorskip("torch")
    cf.add_reference_to_path()
    from model.dim3.vnet import VNet as Ref

    from cbim_tpu.models.vnet import VNet

    ref = Ref(1, 4, scale=[2, 2, 2, 2], baseChans=8, elu=True)
    ours = VNet(num_classes=4, base_ch=8, scale=(2, 2, 2, 2), elu=True)
    v = init_model(ours, (1, 16, 16, 16, 1))
    assert n_params(v["params"]) == torch_n_params(ref)
    out = ours.apply(v, jnp.zeros((1, 16, 16, 16, 1)), train=False)
    assert out.shape == (1, 16, 16, 16, 4)


def test_daunet_param_parity():
    torch = pytest.importorskip("torch")
    cf.add_reference_to_path()
    from model.dim2.dual_attention_unet import DAUNet as Ref

    from cbim_tpu.models.daunet import DAUNet2D

    ref = Ref(1, 4, base_ch=8, block="BasicBlock")
    ours = DAUNet2D(num_classes=4, base_ch=8, block="BasicBlock", norm="bn")
    v = init_model(ours, (1, 32, 32, 1))
    assert n_params(v["params"]) == torch_n_params(ref)
    out = ours.apply(v, jnp.zeros((1, 32, 32, 1)), train=False,
                     mutable=["batch_stats"])[0]
    assert out.shape == (1, 32, 32, 4)


@pytest.mark.slow
def test_factory_builds_all_cnn_models():
    from cbim_tpu.config import config_from_dict
    from cbim_tpu.models import get_model

    common3d = dict(dataset="x", dimension="3d", classes=3, in_chan=1,
                    base_chan=4, block="SingleConv", norm="in",
                    down_scale=[[2, 2, 2]] * 4, kernel_size=[[3, 3, 3]] * 5,
                    downsample_scale=[2, 2, 2, 2], training_size=[16, 16, 16])
    for name in ["unet", "resunet", "unet++", "attention_unet", "vnet"]:
        cfg = config_from_dict(dict(common3d, model=name))
        m = get_model(cfg)
        v = init_model(m, (1, 16, 16, 16, 1))
        out = m.apply(v, jnp.zeros((1, 16, 16, 16, 1)), train=False,
                      mutable=["batch_stats"])[0]
        assert out.shape == (1, 16, 16, 16, 3), name

    common2d = dict(dataset="x", dimension="2d", classes=3, in_chan=1,
                    base_chan=4, block="SingleConv", training_size=[32, 32])
    for name in ["unet", "unet++", "attention_unet", "daunet"]:
        cfg = config_from_dict(dict(common2d, model=name,
                                    block="BasicBlock" if name == "daunet"
                                    else "SingleConv"))
        m = get_model(cfg)
        v = init_model(m, (1, 32, 32, 1))
        out = m.apply(v, jnp.zeros((1, 32, 32, 1)), train=False,
                      mutable=["batch_stats"])[0]
        assert out.shape == (1, 32, 32, 3), name
