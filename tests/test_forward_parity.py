"""Numerical forward parity: torch reference weights loaded into our model.

The strongest structural check possible without training: copy a reference
UNet3D's weights into the Flax UNet3D (OIDHW -> DHWIO transposes) and require
the forward outputs to agree to float tolerance on random inputs.  This
validates conv padding, norm semantics, resize semantics, concat order, and
block wiring end to end.
"""
import numpy as np
import pytest

import conftest as cf

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _t2f(w):
    """torch conv weight (O, I, kd, kh, kw) -> flax (kd, kh, kw, I, O)."""
    return np.transpose(w.detach().numpy(), (2, 3, 4, 1, 0))


def test_unet3d_forward_matches_torch_with_same_weights():
    cf.add_reference_to_path()
    from model.dim3.unet import UNet as RefUNet

    from cbim_tpu.models.unet import UNet3D

    scale = [[1, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2]]
    ksize = [[1, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3]]
    torch.manual_seed(0)
    ref = RefUNet(1, 8, num_classes=4, scale=scale, kernel_size=ksize,
                  block="SingleConv", norm="in").eval()

    ours = UNet3D(num_classes=4, base_ch=8, scale=tuple(map(tuple, scale)),
                  kernel_size=tuple(map(tuple, ksize)), block="SingleConv",
                  norm="in")
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 8, 32, 32, 1)), train=False)

    from cbim_tpu.utils.torch_import import import_unet
    params = import_unet(ref.state_dict(), variables["params"],
                         block="SingleConv", dimension="3d")

    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 32, 32, 1).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))))
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 4, 1))

    out = np.asarray(ours.apply({"params": params}, jnp.asarray(x),
                                train=False))
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-4)


def test_unet2d_forward_matches_torch_with_same_weights():
    """2D path parity: scale-factor-2 bilinear decoder, BN eval semantics."""
    cf.add_reference_to_path()
    from model.dim2.unet import UNet as RefUNet2D

    from cbim_tpu.models.unet import UNet2D
    from cbim_tpu.utils.torch_import import import_unet

    torch.manual_seed(5)
    ref = RefUNet2D(1, 4, base_ch=8, block="SingleConv").eval()
    ours = UNet2D(num_classes=4, base_ch=8, block="SingleConv", norm="bn")
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 64, 64, 1)), train=False)
    params = import_unet(ref.state_dict(), variables["params"],
                         block="SingleConv", dimension="2d")

    rng = np.random.RandomState(6)
    x = rng.randn(1, 64, 64, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))
    out = np.asarray(ours.apply(
        {"params": params, "batch_stats": variables.get("batch_stats", {})},
        jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_medformer3d_forward_matches_torch_with_same_weights():
    """FLAGSHIP numerical parity: reference MedFormer weights transplanted."""
    cf.add_reference_to_path()
    from model.dim3.medformer import MedFormer as RefMedFormer

    from cbim_tpu.models.medformer import MedFormer3D
    from cbim_tpu.utils.torch_import import import_medformer3d

    kw = dict(map_size=[2, 4, 4], conv_num=[2, 0, 0, 0, 0, 0, 2, 2],
              trans_num=[0, 2, 2, 2, 2, 2, 0, 0],
              chan_num=[16, 32, 64, 80, 64, 32, 16, 8],
              num_heads=[1, 4, 4, 4, 4, 4, 1, 1], fusion_depth=2,
              fusion_dim=64, fusion_heads=4,
              kernel_size=[[1, 3, 3], [1, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3]],
              scale=[[1, 2, 2], [1, 2, 2], [2, 2, 2], [2, 2, 2]], aux_loss=True)
    torch.manual_seed(3)
    ref = RefMedFormer(1, 4, 8, conv_block="BasicBlock", norm="in", act="gelu",
                       **kw).eval()
    ours = MedFormer3D(num_classes=4, base_ch=8, conv_block="BasicBlock",
                       norm="in", act="gelu",
                       map_size=tuple(kw["map_size"]),
                       conv_num=tuple(kw["conv_num"]),
                       trans_num=tuple(kw["trans_num"]),
                       chan_num=tuple(kw["chan_num"]),
                       num_heads=tuple(kw["num_heads"]),
                       fusion_depth=2, fusion_dim=64, fusion_heads=4,
                       kernel_size=tuple(map(tuple, kw["kernel_size"])),
                       scale=tuple(map(tuple, kw["scale"])), aux_loss=True)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 8, 32, 32, 1)), train=False)
    params = import_medformer3d(ref.state_dict(), variables["params"],
                                kw["conv_num"], kw["trans_num"],
                                kw["num_heads"], kw["chan_num"])

    rng = np.random.RandomState(4)
    x = rng.randn(1, 8, 32, 32, 1).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))))
    outs = ours.apply({"params": params}, jnp.asarray(x), train=False)
    for ref_o, o in zip(ref_outs, outs):
        ref_np = np.transpose(ref_o.numpy(), (0, 2, 3, 4, 1))
        # fp32 accumulation noise through 10 attention/conv stages
        np.testing.assert_allclose(np.asarray(o), ref_np, rtol=5e-3, atol=2e-3)


@pytest.mark.slow
def test_nnformer_forward_matches_torch_with_same_weights():
    """Swin-stack numerical parity: windows, masks, rel-pos bias, kv decoder."""
    cf.add_reference_to_path()
    from model.dim3.nnformer import nnFormer as RefNNFormer

    from cbim_tpu.models.nnformer import NNFormer
    from cbim_tpu.utils.torch_import import import_nnformer3d

    torch.manual_seed(7)
    ref = RefNNFormer(crop_size=[16, 64, 64], embedding_dim=48,
                      input_channels=1, num_classes=4,
                      num_heads=[3, 6, 12, 24], patch_size=[2, 4, 4],
                      window_size=[4, 4, 8, 4], deep_supervision=True).eval()
    ours = NNFormer(num_classes=4, crop_size=(16, 64, 64), embedding_dim=48,
                    num_heads=(3, 6, 12, 24), patch_size=(2, 4, 4),
                    window_size=(4, 4, 8, 4), deep_supervision=True)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 16, 64, 64, 1)), train=False)
    params = import_nnformer3d(ref.state_dict(), variables["params"])

    rng = np.random.RandomState(8)
    x = rng.randn(1, 16, 64, 64, 1).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))))
    outs = ours.apply({"params": params}, jnp.asarray(x), train=False)
    assert len(ref_outs) == len(outs) == 3
    for ref_o, o in zip(ref_outs, outs):
        ref_np = np.transpose(ref_o.numpy(), (0, 2, 3, 4, 1))
        np.testing.assert_allclose(np.asarray(o), ref_np, rtol=5e-3, atol=2e-3)


@pytest.mark.slow
def test_vtunet_forward_matches_torch_with_same_weights():
    """Cross-attentive Swin decoder parity (cached k/v, PE fusion, expands)."""
    cf.add_reference_to_path()
    from model.dim3.vtunet import VTUNet as RefVT

    from cbim_tpu.models.vtunet import VTUNet
    from cbim_tpu.utils.torch_import import import_vtunet

    class Cfg:
        training_size = [16, 128, 128]
        patch_size = [1, 4, 4]
        in_chan = 1

    torch.manual_seed(9)
    ref = RefVT(Cfg(), num_classes=4, embed_dim=48, win_size=7).eval()
    ours = VTUNet(num_classes=4, patch_size=(1, 4, 4), embed_dim=48,
                  num_heads=(3, 6, 12, 24), window_size=(7, 7, 7))
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 16, 128, 128, 1)), train=False)
    from test_models import n_params, torch_n_params
    assert n_params(variables["params"]) == torch_n_params(ref)

    params = import_vtunet(ref.state_dict(), variables["params"])
    rng = np.random.RandomState(10)
    x = rng.randn(1, 16, 128, 128, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))))
    ref_np = np.transpose(ref_out.numpy(), (0, 2, 3, 4, 1))
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(x),
                                train=False))
    np.testing.assert_allclose(out, ref_np, rtol=5e-3, atol=2e-3)


@pytest.mark.slow
def test_resunet3d_forward_matches_torch_with_same_weights():
    """BasicBlock (ResUNet) transplant via the import utility."""
    cf.add_reference_to_path()
    from model.dim3.unet import UNet as RefUNet

    from cbim_tpu.models.unet import UNet3D
    from cbim_tpu.utils.torch_import import import_unet

    scale = [[2, 2, 2]] * 4
    ksize = [[3, 3, 3]] * 5
    torch.manual_seed(1)
    ref = RefUNet(1, 8, num_classes=3, scale=scale, kernel_size=ksize,
                  block="BasicBlock", norm="in").eval()
    ours = UNet3D(num_classes=3, base_ch=8, scale=tuple(map(tuple, scale)),
                  kernel_size=tuple(map(tuple, ksize)), block="BasicBlock",
                  norm="in")
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 32, 32, 32, 1)), train=False)
    params = import_unet(ref.state_dict(), variables["params"],
                         block="BasicBlock", dimension="3d")

    rng = np.random.RandomState(2)
    x = rng.randn(1, 32, 32, 32, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))))
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 4, 1))
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(x),
                                train=False))
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_swinunet_forward_matches_torch_with_same_weights():
    """SwinUnet2D transplant parity (model/dim2/swin_unet.py vendored
    SwinTransformerSys).  Covers the encoder-depths-reversed decoder, the
    biased concat_back_dim Linears, and PatchMergingLegacy."""
    cf.add_reference_to_path()
    from model.dim2.swin_unet import SwinUnet as RefSwinUnet
    from model.dim2.swin_unet import SwinUnet_config

    from cbim_tpu.models.swin_unet import SwinUnet2D
    from cbim_tpu.utils.torch_import import import_swinunet

    torch.manual_seed(13)
    ref = RefSwinUnet(SwinUnet_config(), img_size=224, num_classes=4).eval()
    ours = SwinUnet2D(num_classes=4, img_size=224, embed_dim=96,
                      depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24))
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 224, 224, 1)), train=False)

    n_ours = sum(int(np.prod(p.shape))
                 for p in jax.tree.leaves(variables["params"]))
    n_ref = sum(p.numel() for p in ref.parameters())
    assert n_ours == n_ref

    params = import_swinunet(ref.state_dict(), variables["params"])

    rng = np.random.RandomState(14)
    x = rng.randn(1, 224, 224, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(x),
                                train=False))
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_transunet_forward_matches_torch_with_same_weights():
    """TransUNet transplant parity (model/dim2/transunet.py vendored
    R50-ViT-B_16).  Covers the ResNetV2 55-grid body + zero-padded skips,
    gn_proj's torch-default eps, biased qkv, and BatchNorm running stats."""
    cf.add_reference_to_path()
    from model.dim2 import VisionTransformer as RefViT
    from model.dim2.transunet import CONFIGS

    from cbim_tpu.models.transunet import TransUNet
    from cbim_tpu.utils.torch_import import import_transunet

    rcfg = CONFIGS["R50-ViT-B_16"]
    rcfg.n_classes = 4
    rcfg.n_skip = 3
    rcfg.patches.grid = (14, 14)
    torch.manual_seed(3)
    ref = RefViT(rcfg, img_size=224, num_classes=4).eval()

    ours = TransUNet(num_classes=4, img_size=224)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 224, 224, 1)), train=False)
    n_ours = sum(int(np.prod(p.shape))
                 for p in jax.tree.leaves(variables["params"]))
    n_ref = sum(p.numel() for p in ref.parameters())
    assert n_ours == n_ref

    newv = import_transunet(ref.state_dict(), variables)

    rng = np.random.RandomState(4)
    x = rng.randn(1, 224, 224, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))
    out = np.asarray(ours.apply({"params": newv["params"],
                                 "batch_stats": newv["batch_stats"]},
                                jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=2e-4)
