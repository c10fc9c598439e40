"""VT-UNet / TransUNet / SwinUnet structure tests."""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from test_models import init_model, n_params


@pytest.mark.slow
def test_vtunet_forward_and_factory():
    from cbim_tpu.config import config_from_dict
    from cbim_tpu.models import get_model

    cfg = config_from_dict(dict(dataset="acdc", model="vtunet", dimension="3d",
                                classes=4, in_chan=1, patch_size=[1, 4, 4],
                                training_size=[8, 64, 64]))
    m = get_model(cfg)
    v = init_model(m, (1, 8, 64, 64, 1))
    out = m.apply(v, jnp.ones((1, 8, 64, 64, 1)), train=False)
    assert out.shape == (1, 8, 64, 64, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_vtunet_positional_encoding_matches_reference():
    torch = pytest.importorskip("torch")
    import conftest as cf
    cf.add_reference_to_path()
    from model.dim3.vtunet_utils import PositionalEncoding3D

    from cbim_tpu.models.vtunet import positional_encoding_3d

    ref = PositionalEncoding3D(48)
    t = torch.zeros(1, 3, 5, 4, 48)
    ref_emb = ref(t).numpy()
    ours = positional_encoding_3d((3, 5, 4), 48)
    np.testing.assert_allclose(ours, ref_emb, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_transunet_forward():
    from cbim_tpu.models.transunet import TransUNet

    # tiny ViT for test speed, same topology
    m = TransUNet(num_classes=4, img_size=64, grid=(4, 4), hidden_size=96,
                  mlp_dim=192, num_layers=2, num_heads=4)
    v = init_model(m, (1, 64, 64, 1))
    out = m.apply(v, jnp.ones((1, 64, 64, 1)), train=False,
                  mutable=["batch_stats"])[0]
    assert out.shape == (1, 64, 64, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_transunet_resnet_param_parity():
    """ResNetV2 hybrid stem parity vs the vendored torch version."""
    torch = pytest.importorskip("torch")
    import conftest as cf
    cf.add_reference_to_path()
    from model.dim2.transunet import ResNetV2 as RefResNet

    from cbim_tpu.models.transunet import ResNetV2
    from test_models import torch_n_params

    ref = RefResNet(block_units=(3, 4, 9), width_factor=1)
    ours = ResNetV2(block_units=(3, 4, 9), width=64)
    v = ours.init({"params": jax.random.PRNGKey(0)},
                  jnp.zeros((1, 64, 64, 3)), train=False) \
        if False else ours.init({"params": jax.random.PRNGKey(0)},
                                jnp.zeros((1, 64, 64, 3)))
    assert n_params(v["params"]) == torch_n_params(ref)


@pytest.mark.slow
def test_swinunet_forward():
    from cbim_tpu.models.swin_unet import SwinUnet2D

    m = SwinUnet2D(num_classes=3, img_size=224, embed_dim=24,
                   depths=(2, 2, 2, 2), num_heads=(3, 6, 12, 24))
    v = init_model(m, (1, 224, 224, 1))
    out = m.apply(v, jnp.ones((1, 224, 224, 1)), train=False)
    assert out.shape == (1, 224, 224, 3)
    assert np.isfinite(np.asarray(out)).all()
