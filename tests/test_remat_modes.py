"""Per-stage remat modes (MedFormer3D.remat) must not change the math.

Rematerialization trades memory for recompute; losses/gradients agree
across modes up to fp reassociation (XLA fuses the recomputed subgraph
differently, so tiny reassociation noise is expected — tolerances here are
far tighter than any training-visible effect).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbim_tpu.models.medformer import MedFormer3D


def _tiny(remat):
    return MedFormer3D(
        num_classes=2, base_ch=4, chan_num=(8, 16, 32, 40, 32, 16, 8, 4),
        map_size=(2, 2, 2), conv_num=(1, 1, 0, 0, 0, 1, 1, 1),
        trans_num=(0, 0, 1, 1, 1, 0, 0, 0), num_heads=(1, 2, 2, 2, 2, 2, 1, 1),
        fusion_depth=1, fusion_dim=32, fusion_heads=2, remat=remat,
        dtype=jnp.float32)


def _loss_and_grad(remat, x, rng):
    model = _tiny(remat)
    v = model.init({"params": rng}, x, train=False)

    def loss(p):
        out = model.apply({"params": p}, x, train=True)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    l, g = jax.jit(jax.value_and_grad(loss))(v["params"])
    return float(l), g


@pytest.mark.parametrize("mode", ["store-up4", "store-decoder", "highres",
                                  "none"])
@pytest.mark.slow
def test_mode_matches_full_remat(mode):
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 16, 16, 16, 1)).astype(np.float32))
    l_all, g_all = _loss_and_grad("all", x, rng)
    l_m, g_m = _loss_and_grad(mode, x, rng)
    np.testing.assert_allclose(l_all, l_m, rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-7), g_all, g_m)


def test_unknown_mode_rejected():
    x = jnp.zeros((1, 16, 16, 16, 1))
    with pytest.raises(ValueError, match="unknown remat mode"):
        _tiny("bogus").init({"params": jax.random.PRNGKey(0)}, x, train=False)
