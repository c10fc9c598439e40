"""Model zoo tests: parameter-count parity vs the torch reference + shapes."""
import numpy as np
import pytest

import conftest as cf

import jax
import jax.numpy as jnp


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def init_model(model, shape):
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros(shape, jnp.float32), train=False)
    return variables


def torch_n_params(net):
    return sum(p.numel() for p in net.parameters())


@pytest.mark.slow
def test_unet2d_param_parity():
    torch = pytest.importorskip("torch")
    cf.add_reference_to_path()
    from model.dim2.unet import UNet as RefUNet

    from cbim_tpu.models.unet import UNet2D

    ref = RefUNet(1, 4, base_ch=16, block="SingleConv")
    ours = UNet2D(num_classes=4, base_ch=16, block="SingleConv", norm="bn")
    variables = init_model(ours, (1, 64, 64, 1))
    assert n_params(variables["params"]) == torch_n_params(ref)

    out = ours.apply(variables, jnp.zeros((2, 64, 64, 1)), train=False,
                     mutable=["batch_stats"])[0]
    assert out.shape == (2, 64, 64, 4)


@pytest.mark.slow
def test_resunet3d_param_parity_anisotropic():
    torch = pytest.importorskip("torch")
    cf.add_reference_to_path()
    from model.dim3.unet import UNet as RefUNet3D

    from cbim_tpu.models.unet import UNet3D

    scale = [[1, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2]]
    ksize = [[1, 3, 3], [1, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3]]
    ref = RefUNet3D(1, 16, num_classes=4, scale=scale, kernel_size=ksize,
                    block="BasicBlock", norm="in")
    ours = UNet3D(num_classes=4, base_ch=16, scale=tuple(map(tuple, scale)),
                  kernel_size=tuple(map(tuple, ksize)), block="BasicBlock",
                  norm="in")
    variables = init_model(ours, (1, 8, 32, 32, 1))
    assert n_params(variables["params"]) == torch_n_params(ref)

    out = ours.apply(variables, jnp.zeros((1, 8, 32, 32, 1)), train=False)
    assert out.shape == (1, 8, 32, 32, 4)


def test_unet3d_singleconv_shapes():
    from cbim_tpu.models.unet import UNet3D
    ours = UNet3D(num_classes=3, base_ch=8, block="SingleConv", norm="in")
    variables = init_model(ours, (1, 16, 32, 32, 1))
    out = ours.apply(variables, jnp.ones((1, 16, 32, 32, 1)), train=False)
    assert out.shape == (1, 16, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_get_model_factory_unet():
    from cbim_tpu.config import config_from_dict
    from cbim_tpu.models import get_model

    cfg = config_from_dict(dict(
        dataset="acdc", model="unet", dimension="3d", classes=4, in_chan=1,
        base_chan=8, block="SingleConv", norm="in",
        down_scale=[[1, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2]],
        kernel_size=[[1, 3, 3], [1, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3]],
        training_size=[16, 64, 64]))
    model = get_model(cfg)
    variables = init_model(model, (1, 16, 64, 64, 1))
    out = model.apply(variables, jnp.ones((1, 16, 64, 64, 1)), train=False)
    assert out.shape == (1, 16, 64, 64, 4)
