"""MedFormer parity tests: parameter count vs torch reference + shapes."""
import numpy as np
import pytest

import conftest as cf

import jax
import jax.numpy as jnp

from test_models import init_model, n_params, torch_n_params


@pytest.mark.slow
def test_medformer3d_acdc_config_param_parity():
    torch = pytest.importorskip("torch")
    cf.add_reference_to_path()
    import torch.nn as nn
    from model.dim3.medformer import MedFormer as RefMedFormer

    from cbim_tpu.models.medformer import MedFormer3D

    # the ACDC medformer_3d.yaml settings (config/acdc/medformer_3d.yaml)
    kw = dict(map_size=[2, 6, 6], conv_num=[2, 0, 0, 0, 0, 0, 2, 2],
              trans_num=[0, 2, 2, 2, 2, 2, 0, 0],
              num_heads=[1, 4, 4, 4, 4, 4, 1, 1], fusion_depth=2,
              fusion_dim=256, fusion_heads=4, expansion=4, attn_drop=0.0,
              proj_drop=0.0, proj_type="depthwise",
              kernel_size=[[1, 3, 3], [1, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3]],
              scale=[[1, 2, 2], [1, 2, 2], [2, 2, 2], [2, 2, 2]], aux_loss=True)

    ref = RefMedFormer(1, 4, 32, conv_block="BasicBlock", norm="in",
                       act="gelu", **kw)
    ours = MedFormer3D(num_classes=4, base_ch=32, conv_block="BasicBlock",
                       norm="in", act="gelu",
                       map_size=tuple(kw["map_size"]),
                       conv_num=tuple(kw["conv_num"]),
                       trans_num=tuple(kw["trans_num"]),
                       num_heads=tuple(kw["num_heads"]),
                       fusion_depth=2, fusion_dim=256, fusion_heads=4,
                       kernel_size=tuple(map(tuple, kw["kernel_size"])),
                       scale=tuple(map(tuple, kw["scale"])), aux_loss=True)

    variables = init_model(ours, (1, 16, 48, 48, 1))
    assert n_params(variables["params"]) == torch_n_params(ref)

    outs = ours.apply(variables, jnp.zeros((1, 16, 48, 48, 1)), train=False)
    assert isinstance(outs, list) and len(outs) == 2
    assert outs[0].shape == (1, 16, 48, 48, 4)
    assert outs[1].shape == (1, 16, 48, 48, 4)


@pytest.mark.slow
def test_medformer2d_param_parity():
    torch = pytest.importorskip("torch")
    cf.add_reference_to_path()
    from model.dim2.medformer import MedFormer as RefMedFormer2D

    from cbim_tpu.models.medformer import MedFormer2D

    ref = RefMedFormer2D(1, 4, base_chan=16, map_size=8,
                         conv_num=[2, 1, 0, 0, 0, 1, 2, 2],
                         trans_num=[0, 1, 2, 2, 2, 1, 0, 0],
                         num_heads=[1, 4, 8, 16, 8, 4, 1, 1],
                         fusion_depth=2, fusion_dim=256, fusion_heads=8,
                         aux_loss=False)
    ours = MedFormer2D(num_classes=4, base_ch=16, map_size=8,
                       conv_num=(2, 1, 0, 0, 0, 1, 2, 2),
                       trans_num=(0, 1, 2, 2, 2, 1, 0, 0),
                       num_heads=(1, 4, 8, 16, 8, 4, 1, 1),
                       fusion_depth=2, fusion_dim=256, fusion_heads=8,
                       norm="bn", act="relu", aux_loss=False)
    variables = init_model(ours, (1, 64, 64, 1))
    assert n_params(variables["params"]) == torch_n_params(ref)

    out = ours.apply(variables, jnp.zeros((1, 64, 64, 1)), train=False,
                     mutable=["batch_stats"])[0]
    assert out.shape == (1, 64, 64, 4)


@pytest.mark.slow
def test_medformer3d_finite_and_grad():
    from cbim_tpu.models.medformer import MedFormer3D
    from cbim_tpu.ops.losses import deep_supervision_loss

    model = MedFormer3D(num_classes=3, base_ch=8,
                        chan_num=(16, 32, 64, 80, 64, 32, 16, 8),
                        map_size=(2, 4, 4),
                        conv_num=(2, 0, 0, 0, 0, 0, 2, 2),
                        trans_num=(0, 1, 1, 1, 1, 1, 0, 0),
                        num_heads=(1, 4, 4, 4, 4, 4, 1, 1),
                        fusion_dim=64, fusion_heads=4, norm="in", act="gelu",
                        scale=((1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
                        kernel_size=((1, 3, 3), (1, 3, 3), (3, 3, 3),
                                     (3, 3, 3), (3, 3, 3)),
                        aux_loss=True)
    variables = init_model(model, (1, 8, 32, 32, 1))
    x = jnp.ones((1, 8, 32, 32, 1))
    t = jnp.zeros((1, 8, 32, 32), jnp.int32)

    def loss_fn(params):
        outs = model.apply({"params": params}, x, train=False)
        return deep_supervision_loss(outs, t, [0.5, 0.5])

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0
