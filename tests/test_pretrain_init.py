"""--pretrain initialization from a PyTorch-reference checkpoint."""
import os

import numpy as np
import pytest

import conftest as cf

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_trainer_initializes_from_torch_checkpoint(tmp_path):
    cf.add_reference_to_path()
    from model.dim3.unet import UNet as RefUNet

    from cbim_tpu.config import config_from_dict
    from cbim_tpu.training.trainer import train_net

    # fabricate a reference-style checkpoint
    torch.manual_seed(11)
    scale = [[1, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2]]
    ks = [[1, 3, 3]] + [[3, 3, 3]] * 4
    ref = RefUNet(1, 4, num_classes=3, scale=scale, kernel_size=ks,
                  block="SingleConv", norm="in")
    ckpt_path = str(tmp_path / "ref.pth")
    torch.save({"epoch": 5, "model_state_dict": ref.state_dict(),
                "ema_model_state_dict": None,
                "optimizer_state_dict": {}}, ckpt_path)

    cfg = config_from_dict(dict(
        dataset="synthetic", model="unet", dimension="3d", classes=3,
        in_chan=1, base_chan=4, block="SingleConv", norm="in",
        down_scale=scale, kernel_size=ks, training_size=[8, 16, 16],
        synthetic_cases=5, synthetic_shape=[10, 24, 24],
        affine_pad_size=[2, 4, 4], scale=[0.1, 0.2, 0.2], rotate=[10, 0, 0],
        translate=[0, 0, 0], gaussian_noise_std=0.02,
        additive_brightness_std=0.5, gamma_range=[0.7, 1.4],
        optimizer="adamw", base_lr=1e-3, betas=[0.9, 0.999],
        weight_decay=0.01, weight=[0.5, 1, 1], rlt=1, epochs=1,
        iter_per_epoch=1, print_freq=10, batch_size=2, ema=True,
        ema_alpha=0.99, val_freq=1, sliding_window=True,
        window_size=[8, 16, 16], k_fold=5, cp_path=str(tmp_path / "exp"),
        log_path=str(tmp_path / "log"), unique_name="p",
        pretrain=True, init_model=ckpt_path))
    # base_chan must match the checkpoint
    ref_small = RefUNet(1, 4, num_classes=3, scale=scale, kernel_size=ks,
                        block="SingleConv", norm="in")
    dice, asd, hd = train_net(cfg, fold_idx=0)
    assert np.all(np.isfinite(dice))


def test_import_for_model_roundtrip():
    """import_for_model(unet ckpt) == import_unet directly."""
    cf.add_reference_to_path()
    from model.dim3.unet import UNet as RefUNet

    from cbim_tpu.config import config_from_dict
    from cbim_tpu.models import get_model
    from cbim_tpu.utils.torch_import import (import_for_model, import_unet)

    scale = [[2, 2, 2]] * 4
    ks = [[3, 3, 3]] * 5
    torch.manual_seed(12)
    ref = RefUNet(1, 4, num_classes=3, scale=scale, kernel_size=ks,
                  block="SingleConv", norm="in")
    cfg = config_from_dict(dict(dataset="x", model="unet", dimension="3d",
                                classes=3, base_chan=4, block="SingleConv",
                                norm="in", down_scale=scale, kernel_size=ks,
                                training_size=[16, 16, 16]))
    model = get_model(cfg)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 16, 16, 16, 1)), train=False)
    sd = {k: t.detach().numpy() for k, t in ref.state_dict().items()}
    p1 = import_for_model(cfg, sd, v["params"])
    p2 = import_unet(sd, v["params"], block="SingleConv", dimension="3d")
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
