"""Torch-checkpoint transplant parity for UNet++ / AttentionUNet / VNet /
DAUNet: reference weights imported into the flax models must reproduce the
reference forward outputs (float tolerance)."""
import numpy as np
import pytest

import conftest as cf  # noqa: F401

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _np_out(t):
    arr = t.detach().numpy()
    axes = (0, 2, 3, 1) if arr.ndim == 4 else (0, 2, 3, 4, 1)
    return np.transpose(arr, axes)


def _to_torch(x):
    axes = (0, 3, 1, 2) if x.ndim == 4 else (0, 4, 1, 2, 3)
    return torch.from_numpy(np.transpose(x, axes))


def test_unetpp3d_forward_matches_torch():
    cf.add_reference_to_path()
    from model.dim3.unetpp import UNetPlusPlus as Ref

    from cbim_tpu.models.unetpp import UNetPlusPlus3D
    from cbim_tpu.utils.torch_import import import_unetpp

    torch.manual_seed(0)
    scale = [[2, 2, 2]] * 4
    ks = [[3, 3, 3]] * 5
    ref = Ref(1, 8, scale, ks, num_classes=4, block="SingleConv",
              norm="in").eval()
    ours = UNetPlusPlus3D(num_classes=4, base_ch=8, block="SingleConv",
                          norm="in", scale=tuple(map(tuple, scale)),
                          kernel_size=tuple(map(tuple, ks)))
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 32, 32, 32, 1)), train=False)
    new_vars = import_unetpp(ref.state_dict(), variables, block="SingleConv")

    rng = np.random.RandomState(1)
    x = rng.randn(1, 32, 32, 32, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = _np_out(ref(_to_torch(x)))
    out = np.asarray(ours.apply(new_vars, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-4)


def test_attention_unet3d_forward_matches_torch():
    cf.add_reference_to_path()
    from model.dim3.attention_unet import AttentionUNet as Ref

    from cbim_tpu.models.attention_unet import AttentionUNet3D
    from cbim_tpu.utils.torch_import import import_attention_unet

    torch.manual_seed(2)
    scale = [[2, 2, 2]] * 4
    ks = [[3, 3, 3]] * 5
    ref = Ref(1, 8, scale, ks, num_classes=4, block="SingleConv",
              norm="in").eval()
    ours = AttentionUNet3D(num_classes=4, base_ch=8, block="SingleConv",
                           norm="in", scale=tuple(map(tuple, scale)),
                           kernel_size=tuple(map(tuple, ks)))
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 32, 32, 32, 1)), train=False)
    new_vars = import_attention_unet(ref.state_dict(), variables,
                                     block="SingleConv", dimension="3d")

    rng = np.random.RandomState(3)
    x = rng.randn(1, 32, 32, 32, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = _np_out(ref(_to_torch(x)))
    out = np.asarray(ours.apply(new_vars, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-4)


def test_vnet_forward_matches_torch():
    cf.add_reference_to_path()
    from model.dim3.vnet import VNet as Ref

    from cbim_tpu.models.vnet import VNet
    from cbim_tpu.utils.torch_import import import_vnet

    torch.manual_seed(4)
    ref = Ref(1, 4, scale=[2, 2, 2, 2], baseChans=8, elu=True).eval()
    ours = VNet(num_classes=4, base_ch=8, scale=(2, 2, 2, 2), elu=True)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 32, 32, 32, 1)), train=False)
    new_vars = import_vnet(ref.state_dict(), variables, elu=True)

    rng = np.random.RandomState(5)
    x = rng.randn(2, 16, 16, 16, 1).astype(np.float32)  # batch stats: B>1
    with torch.no_grad():
        ref_out = _np_out(ref(_to_torch(x)))
    out = np.asarray(ours.apply(new_vars, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-4)


def test_daunet_forward_matches_torch():
    cf.add_reference_to_path()
    from model.dim2.dual_attention_unet import DAUNet as Ref

    from cbim_tpu.models.daunet import DAUNet2D
    from cbim_tpu.utils.torch_import import import_daunet

    torch.manual_seed(6)
    ref = Ref(1, 4, base_ch=8, block="BasicBlock")
    # perturb BN running stats so the test actually checks their transplant
    with torch.no_grad():
        ref.train()
        ref(torch.randn(2, 1, 64, 64))
    ref.eval()

    ours = DAUNet2D(num_classes=4, base_ch=8, block="BasicBlock", norm="bn")
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 64, 64, 1)), train=False)
    new_vars = import_daunet(ref.state_dict(), variables, block="BasicBlock")

    rng = np.random.RandomState(7)
    x = rng.randn(1, 64, 64, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = _np_out(ref(_to_torch(x)))
    out = np.asarray(ours.apply(new_vars, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=5e-4)


def test_medformer2d_forward_matches_torch():
    """2D flagship transplant: BN affine + running stats through every block,
    B-MHA head-channel permutation, up-block concat norm."""
    cf.add_reference_to_path()
    from model.dim2.medformer import MedFormer as Ref

    from cbim_tpu.models.medformer import MedFormer2D
    from cbim_tpu.utils.torch_import import import_medformer2d

    torch.manual_seed(8)
    conv_num = [2, 1, 0, 0, 0, 1, 2, 2]
    trans_num = [0, 1, 2, 2, 2, 1, 0, 0]
    heads = [1, 4, 8, 16, 8, 4, 1, 1]
    ref = Ref(1, 4, base_chan=8, map_size=4, conv_num=conv_num,
              trans_num=trans_num, num_heads=heads, fusion_depth=2,
              fusion_dim=64, fusion_heads=4, aux_loss=True)
    # perturb BN running stats so their transplant is actually exercised
    with torch.no_grad():
        ref.train()
        ref(torch.randn(2, 1, 64, 64))
    ref.eval()

    ours = MedFormer2D(num_classes=4, base_ch=8, map_size=4,
                       conv_num=tuple(conv_num), trans_num=tuple(trans_num),
                       num_heads=tuple(heads), fusion_depth=2, fusion_dim=64,
                       fusion_heads=4, norm="bn", act="relu", aux_loss=True)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 64, 64, 1)), train=False)
    new_vars = import_medformer2d(ref.state_dict(), variables, conv_num,
                                  trans_num, heads, base_ch=8,
                                  fusion_depth=2, fusion_heads=4,
                                  aux_loss=True)

    rng = np.random.RandomState(9)
    x = rng.randn(1, 64, 64, 1).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_aux = ref(_to_torch(x))
    out, aux = ours.apply(new_vars, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), _np_out(ref_out),
                               rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(aux), _np_out(ref_aux),
                               rtol=2e-3, atol=5e-4)
