"""Split-entry decoder block: conv(concat(a, b)) == conv_a(a) + conv_b(b).

The cw-layout BasicBlock accepts a channel-split (a, b) input pair whose
virtual concat is the block input (models/layers/convs.py _SplitConvCW);
InstanceNorm stats are per-channel and the act is elementwise, so the split
arithmetic must match the materialized concat to fp-reassociation noise.
"""
import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from cbim_tpu.models.layers.convs import BasicBlock
from cbim_tpu.ops.pallas.conv3d import to_cw


def _mk(ca, cb, out_ch, act="gelu"):
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(2, 4, 8, 16, ca).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 4, 8, 16, cb).astype(np.float32))
    blk = BasicBlock(out_ch, kernel_size=3, norm="in", act=act, cw=True)
    return a, b, blk


@pytest.mark.parametrize("ca,cb,out_ch", [(16, 8, 8), (8, 16, 8)])
def test_split_matches_concat(ca, cb, out_ch):
    a, b, blk = _mk(ca, cb, out_ch)
    cat = to_cw(jnp.concatenate([a, b], axis=-1))
    pair = (to_cw(a), to_cw(b))
    params = blk.init(jax.random.PRNGKey(0), pair)
    # identical param tree: the split block must be loadable from concat ckpts
    params2 = blk.init(jax.random.PRNGKey(0), cat)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params2)
    for p1, p2 in zip(jax.tree_util.tree_leaves(params),
                      jax.tree_util.tree_leaves(params2)):
        assert p1.shape == p2.shape
    y_split = blk.apply(params, pair)
    y_cat = blk.apply(params, cat)
    np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_cat),
                               atol=2e-4, rtol=2e-4)


def test_split_gradients_match_concat():
    a, b, blk = _mk(16, 8, 8)
    cat = to_cw(jnp.concatenate([a, b], axis=-1))
    pair = (to_cw(a), to_cw(b))
    params = blk.init(jax.random.PRNGKey(1), pair)

    g_split = jax.grad(
        lambda p: jnp.sum(blk.apply(p, pair).astype(jnp.float32) ** 2))(params)
    g_cat = jax.grad(
        lambda p: jnp.sum(blk.apply(p, cat).astype(jnp.float32) ** 2))(params)
    for gs, gc in zip(jax.tree_util.tree_leaves(g_split),
                      jax.tree_util.tree_leaves(g_cat)):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gc),
                                   atol=3e-3, rtol=3e-3)


@pytest.mark.slow
def test_medformer_split_entry_matches_concat():
    """Full model: the split decoder entry (CBIM_SPLIT_ENTRY) must produce
    the same forward as the materialized-concat path, same params."""
    import os
    from cbim_tpu.config import config_from_dict
    from cbim_tpu.models import get_model

    cfg = config_from_dict(dict(
        dataset="synthetic", model="medformer", dimension="3d",
        classes=3, in_chan=1, base_chan=8, conv_block="BasicBlock",
        down_scale=[[2, 2, 2]] * 4, kernel_size=[[3, 3, 3]] * 5,
        norm="in", act="gelu", map_size=[1, 2, 2],
        conv_num=[1, 1, 0, 0, 0, 1, 1, 1], trans_num=[0, 0, 1, 1, 1, 1, 0, 0],
        num_heads=[1, 2, 2, 2, 2, 2, 1, 1], expansion=2, fusion_depth=1,
        fusion_dim=32, fusion_heads=2, attn_drop=0.0, proj_drop=0.0,
        proj_type="depthwise", aux_loss=False, aux_weight=[1.0], amp=False))
    model = get_model(cfg)
    x = jnp.asarray(np.random.RandomState(2)
                    .randn(1, 16, 128, 128, 1).astype(np.float32))

    os.environ["CBIM_CW_FORCE"] = "1"
    os.environ["CBIM_SPLIT_ENTRY"] = "1"
    try:
        params = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        y_split = model.apply(params, x, train=False)
        os.environ["CBIM_SPLIT_ENTRY"] = "0"
        y_cat = model.apply(params, x, train=False)
    finally:
        os.environ.pop("CBIM_CW_FORCE", None)
        os.environ.pop("CBIM_SPLIT_ENTRY", None)
    np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_cat),
                               atol=2e-4, rtol=2e-4)
