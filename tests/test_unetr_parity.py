"""Forward parity for UNETR and SwinUNETR vs the reference (VERDICT r1 #6).

The reference composes these from MONAI blocks; monai is absent in this
image, so the handful of imported blocks are provided as functional torch
implementations (tests/monai_stub.py, conftest).  The vendored swin backbone
(swin_unetr.py:876) is the reference's own code — its windowed attention,
masks, rel-pos bias and legacy PatchMerging run unmodified as the oracle.
"""
import numpy as np
import pytest

import conftest as cf

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not cf.has_reference(),
                                reason="reference not mounted")


@pytest.mark.slow
def test_unetr_forward_matches_torch_with_same_weights():
    cf.add_reference_to_path()
    from model.dim3.unetr import UNETR as RefUNETR

    from cbim_tpu.models.unetr import UNETR
    from cbim_tpu.utils.torch_import import import_unetr

    torch.manual_seed(3)
    ref = RefUNETR(1, 4, (32, 32, 32), feature_size=8, hidden_size=96,
                   mlp_dim=192, num_heads=4, pos_embed="perceptron",
                   norm_name="instance", res_block=True).eval()
    ours = UNETR(num_classes=4, img_size=(32, 32, 32), feature_size=8,
                 hidden_size=96, mlp_dim=192, num_heads=4)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 32, 32, 32, 1)), train=False)
    params = import_unetr(ref.state_dict(), variables["params"])

    rng = np.random.RandomState(4)
    x = rng.randn(2, 32, 32, 32, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))))
    out = ours.apply({"params": params}, jnp.asarray(x), train=False)
    ref_np = np.transpose(ref_out.numpy(), (0, 2, 3, 4, 1))
    np.testing.assert_allclose(np.asarray(out), ref_np, rtol=5e-3, atol=2e-3)


@pytest.mark.slow
def test_swin_unetr_forward_matches_torch_with_same_weights():
    cf.add_reference_to_path()
    from model.dim3.swin_unetr import SwinUNETR as RefSwin

    from cbim_tpu.models.swin_unetr import SwinUNETR
    from cbim_tpu.utils.torch_import import import_swin_unetr

    torch.manual_seed(5)
    ref = RefSwin((64, 64, 64), 1, 4, feature_size=12).eval()
    ours = SwinUNETR(num_classes=4, img_size=(64, 64, 64), feature_size=12)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 64, 64, 64, 1)), train=False)
    params = import_swin_unetr(ref.state_dict(), variables["params"])

    rng = np.random.RandomState(6)
    x = rng.randn(1, 64, 64, 64, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))))
    out = ours.apply({"params": params}, jnp.asarray(x), train=False)
    ref_np = np.transpose(ref_out.numpy(), (0, 2, 3, 4, 1))
    np.testing.assert_allclose(np.asarray(out), ref_np, rtol=5e-3, atol=2e-3)

@pytest.mark.slow
def test_swin_unetr_ssl_pretrain_matches_reference_load_from():
    """ssl swin-vit checkpoint (model_swinvit.pt format): the reference's
    load_from (model/dim3/swin_unetr.py:230-277) writes only the swinViT
    backbone from 'module.*' keys; import_swin_unetr_ssl must produce the
    same forward (VERDICT r4 missing #3)."""
    cf.add_reference_to_path()
    from model.dim3.swin_unetr import SwinUNETR as RefSwin

    from cbim_tpu.models.swin_unetr import SwinUNETR
    from cbim_tpu.utils.torch_import import (import_swin_unetr,
                                             import_swin_unetr_ssl)

    torch.manual_seed(7)
    ref = RefSwin((64, 64, 64), 1, 4, feature_size=12).eval()

    # synthetic ssl checkpoint: module.* backbone keys with random values
    # (the ssl format names the block MLP fc1/fc2, the module linear1/2)
    rng = np.random.RandomState(8)
    fake = {}
    buffers = {"relative_position_index", "attn_mask"}
    for k, v in ref.swinViT.state_dict().items():
        if not k.startswith(("patch_embed.", "layers")):
            continue
        k_ssl = ("module." + k).replace("mlp.linear1", "mlp.fc1") \
                               .replace("mlp.linear2", "mlp.fc2")
        if k.split(".")[-1] in buffers:
            fake[k_ssl] = v.clone()    # real ckpts carry correct buffers
        else:
            fake[k_ssl] = torch.from_numpy(
                (rng.randn(*v.shape) * 0.05).astype(np.float32))

    ours = SwinUNETR(num_classes=4, img_size=(64, 64, 64), feature_size=12)
    variables = ours.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 64, 64, 64, 1)), train=False)
    # align fresh-init params with the torch init first, so the comparison
    # isolates exactly what load_from writes
    params = import_swin_unetr(ref.state_dict(), variables["params"])

    ref.load_from({"state_dict": fake})
    ref.eval()
    params = import_swin_unetr_ssl({"state_dict": fake}, params)

    x = rng.randn(1, 64, 64, 64, 1).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))))
    out = ours.apply({"params": params}, jnp.asarray(x), train=False)
    ref_np = np.transpose(ref_out.numpy(), (0, 2, 3, 4, 1))
    np.testing.assert_allclose(np.asarray(out), ref_np, rtol=5e-3, atol=2e-3)
