"""UNETR / SwinUNETR structure tests (shape, finiteness, gradient)."""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from test_models import init_model, n_params


@pytest.mark.slow
def test_unetr_shapes_and_grad():
    from cbim_tpu.models.unetr import UNETR

    # small hidden size for test speed, same topology
    m = UNETR(num_classes=4, img_size=(32, 32, 32), feature_size=4,
              hidden_size=96, mlp_dim=192, num_heads=4)
    v = init_model(m, (1, 32, 32, 32, 1))
    out = m.apply(v, jnp.ones((1, 32, 32, 32, 1)), train=False)
    assert out.shape == (1, 32, 32, 32, 4)
    assert np.isfinite(np.asarray(out)).all()

    g = jax.grad(lambda p: jnp.sum(
        m.apply({"params": p}, jnp.ones((1, 32, 32, 32, 1)), train=False) ** 2))(
            v["params"])
    gn = float(jnp.sqrt(sum(jnp.sum(x ** 2) for x in jax.tree.leaves(g))))
    assert np.isfinite(gn) and gn > 0


def test_unetr_vit_structure():
    """12 layers, taps at 3/6/9, hidden 768-style dims scale correctly."""
    from cbim_tpu.models.unetr import ViT

    m = ViT(hidden_size=48, mlp_dim=96, num_layers=12, num_heads=4)
    v = m.init({"params": jax.random.PRNGKey(0)},
               jnp.zeros((1, 32, 32, 32, 1)), train=False)
    final, hidden = m.apply(v, jnp.ones((1, 32, 32, 32, 1)), train=False)
    assert len(hidden) == 12
    n_tokens = (32 // 16) ** 3
    assert final.shape == (1, n_tokens, 48)


def test_swin_window_partition_roundtrip():
    from cbim_tpu.models.swin_layers import window_partition, window_reverse

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 8, 8, 5), jnp.float32)
    w = (4, 4, 4)
    wins = window_partition(x, w)
    assert wins.shape == (2 * 8, 64, 5)
    back = window_reverse(wins, w, (8, 8, 8))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_swin_mask_matches_reference():
    """compute_attn_mask vs the reference's torch compute_mask."""
    torch = pytest.importorskip("torch")
    import conftest as cf
    cf.add_reference_to_path()
    from model.dim3.swin_unetr import compute_mask as ref_mask

    from cbim_tpu.models.swin_layers import compute_attn_mask

    for dims, window, shift in [((14, 14, 14), (7, 7, 7), (3, 3, 3)),
                                ((8, 12, 12), (4, 6, 6), (2, 3, 3)),
                                ((4, 14, 14), (4, 7, 7), (0, 3, 3))]:
        ref = ref_mask(list(dims), window, shift, torch.device("cpu")).numpy()
        ours = compute_attn_mask(dims, window, shift)
        np.testing.assert_allclose(ours, ref)


def test_swin_relative_position_index_matches_reference():
    torch = pytest.importorskip("torch")
    import conftest as cf
    cf.add_reference_to_path()
    from model.dim3.swin_unetr import WindowAttention as RefWA

    from cbim_tpu.models.swin_layers import relative_position_index

    ref = RefWA(dim=12, num_heads=3, window_size=(3, 4, 5))
    ref_idx = ref.relative_position_index.numpy()
    ours = relative_position_index((3, 4, 5))
    np.testing.assert_array_equal(ours, ref_idx)


@pytest.mark.slow
def test_swin_unetr_forward():
    from cbim_tpu.models.swin_unetr import SwinUNETR

    m = SwinUNETR(num_classes=3, img_size=(32, 32, 32), feature_size=12)
    v = init_model(m, (1, 32, 32, 32, 1))
    out = m.apply(v, jnp.ones((1, 32, 32, 32, 1)), train=False)
    assert out.shape == (1, 32, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_swin_unetr_param_structure():
    """Stage dims double per stage; rel-pos tables sized prod(2w-1)."""
    from cbim_tpu.models.swin_unetr import SwinUNETR
    m = SwinUNETR(num_classes=2, img_size=(32, 32, 32), feature_size=12)
    v = init_model(m, (1, 32, 32, 32, 1))
    flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    tables = [(jax.tree_util.keystr(k), p.shape) for k, p in flat
              if "relative_position_bias_table" in jax.tree_util.keystr(k)]
    assert len(tables) == 6   # depths (2,2,2,0)
