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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_transunet_npz_pretrain_matches_reference_load_from():
    """Official .npz backbone loading: a synthetic R50+ViT-B_16-shaped npz is
    loaded by the reference's load_from and by import_transunet_npz; with the
    same decoder/head init both forwards must agree (backbone transplant is
    what the npz provides — decoder stays fresh in both)."""
    cf.add_reference_to_path()
    from model.dim2 import VisionTransformer as RefViT
    from model.dim2.transunet import CONFIGS

    from cbim_tpu.models.transunet import TransUNet
    from cbim_tpu.utils.torch_import import (import_transunet,
                                             import_transunet_npz)

    rng = np.random.RandomState(10)

    def r(*shape):
        return (rng.randn(*shape) * 0.05).astype(np.float32)

    hidden, mlp, heads, dh = 768, 3072, 12, 64
    w = {
        "embedding/kernel": r(1, 1, 1024, hidden),
        "embedding/bias": r(hidden),
        "Transformer/encoder_norm/scale": 1 + r(hidden),
        "Transformer/encoder_norm/bias": r(hidden),
        # 197 tokens (cls + 14x14): exercises the cls-drop path
        "Transformer/posembed_input/pos_embedding": r(1, 197, hidden),
        "conv_root/kernel": r(7, 7, 3, 64),
        "gn_root/scale": 1 + r(64),
        "gn_root/bias": r(64),
    }
    a = "MultiHeadDotProductAttention_1"
    for i in range(12):
        R = f"Transformer/encoderblock_{i}"
        for n in ("query", "key", "value"):
            w[f"{R}/{a}/{n}/kernel"] = r(hidden, heads, dh)
            w[f"{R}/{a}/{n}/bias"] = r(heads, dh)
        w[f"{R}/{a}/out/kernel"] = r(heads, dh, hidden)
        w[f"{R}/{a}/out/bias"] = r(hidden)
        w[f"{R}/MlpBlock_3/Dense_0/kernel"] = r(hidden, mlp)
        w[f"{R}/MlpBlock_3/Dense_0/bias"] = r(mlp)
        w[f"{R}/MlpBlock_3/Dense_1/kernel"] = r(mlp, hidden)
        w[f"{R}/MlpBlock_3/Dense_1/bias"] = r(hidden)
        w[f"{R}/LayerNorm_0/scale"] = 1 + r(hidden)
        w[f"{R}/LayerNorm_0/bias"] = r(hidden)
        w[f"{R}/LayerNorm_2/scale"] = 1 + r(hidden)
        w[f"{R}/LayerNorm_2/bias"] = r(hidden)
    widths = [(64, 256), (256, 512), (512, 1024)]
    for bi, units in enumerate((3, 4, 9)):
        cin, cout = widths[bi]
        cmid = cout // 4
        for u in range(1, units + 1):
            src = f"block{bi + 1}/unit{u}"
            ci = cin if u == 1 else cout
            w[f"{src}/conv1/kernel"] = r(1, 1, ci, cmid)
            w[f"{src}/conv2/kernel"] = r(3, 3, cmid, cmid)
            w[f"{src}/conv3/kernel"] = r(1, 1, cmid, cout)
            for gi, c in (("gn1", cmid), ("gn2", cmid), ("gn3", cout)):
                w[f"{src}/{gi}/scale"] = 1 + r(c)
                w[f"{src}/{gi}/bias"] = r(c)
            if u == 1:
                w[f"{src}/conv_proj/kernel"] = r(1, 1, ci, cout)
                w[f"{src}/gn_proj/scale"] = 1 + r(cout)
                w[f"{src}/gn_proj/bias"] = r(cout)

    rcfg = CONFIGS["R50-ViT-B_16"]
    rcfg.n_classes = 4
    rcfg.n_skip = 3
    rcfg.patches.grid = (14, 14)
    torch.manual_seed(11)
    ref = RefViT(rcfg, img_size=224, num_classes=4).eval()
    ref.load_from(weights=w)

    ours = TransUNet(num_classes=4, img_size=224)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 224, 224, 1)), train=False)
    # align the (randomly initialized) decoder/head first so the comparison
    # isolates the npz backbone path, then load the npz on top
    variables = import_transunet(ref.state_dict(), variables)
    newv = import_transunet_npz(w, variables)

    x = rng.randn(1, 224, 224, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))
    out = np.asarray(ours.apply(newv, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=5e-4)


@pytest.mark.slow
def test_swinunet_pth_pretrain_matches_reference_load_from(tmp_path):
    """Official swin-tiny {'model': ...} .pth loading: the reference's
    load_from mirrors encoder layers into the decoder and loads with
    strict=False; import_swinunet_pth must produce the same forward."""
    cf.add_reference_to_path()
    from model.dim2.swin_unet import SwinUnet as RefSwinUnet
    from model.dim2.swin_unet import SwinUnet_config

    from cbim_tpu.models.swin_unet import SwinUnet2D
    from cbim_tpu.utils.torch_import import (import_swinunet,
                                             import_swinunet_pth)

    torch.manual_seed(15)
    ref = RefSwinUnet(SwinUnet_config(), img_size=224, num_classes=4).eval()

    # synthetic swin-tiny checkpoint: encoder-shaped keys with random values
    rng = np.random.RandomState(16)
    fake = {}
    buffers = {"relative_position_index", "attn_mask"}
    for k, v in ref.swin_unet.state_dict().items():
        if k.startswith(("patch_embed.", "layers.", "norm.")):
            if k.split(".")[-1] in buffers:
                fake[k] = v.clone()     # real ckpts carry correct buffers
            else:
                fake[k] = torch.from_numpy(
                    (rng.randn(*v.shape) * 0.05).astype(np.float32))
    path = str(tmp_path / "swin_tiny_fake.pth")
    torch.save({"model": fake}, path)

    ours = SwinUnet2D(num_classes=4, img_size=224, embed_dim=96,
                      depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24))
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 224, 224, 1)), train=False)
    # align fresh-init params with the torch init first, so the comparison
    # isolates exactly what load_from writes
    params = import_swinunet(ref.state_dict(), variables["params"])

    ref.load_from(path)
    ref.eval()
    params = import_swinunet_pth({"model": fake}, params)

    x = rng.randn(1, 224, 224, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(x),
                                train=False))
    np.testing.assert_allclose(out, ref_out, rtol=2e-3, atol=5e-4)
