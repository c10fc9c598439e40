"""Native host runtime tests (threaded batch assembler vs numpy oracle)."""
import numpy as np
import pytest

import conftest  # noqa: F401


def test_native_assemble_matches_numpy():
    from cbim_tpu.data import native
    if not native.available():
        pytest.skip("native toolchain unavailable")

    rng = np.random.RandomState(0)
    B = 4
    imgs = [np.ascontiguousarray(rng.rand(20, 30, 28).astype(np.float32))
            for _ in range(B)]
    labs = [np.ascontiguousarray(rng.randint(0, 5, (20, 30, 28)).astype(np.int8))
            for _ in range(B)]
    buf = (16, 24, 24)
    wins = np.array([[2, 3, 4, 12, 20, 20, 2, 2, 2],
                     [0, 0, 0, 16, 24, 24, 0, 0, 0],
                     [4, 6, 4, 10, 18, 18, 3, 3, 3],
                     [1, 1, 1, 16, 24, 24, 0, 0, 0]], np.int64)
    di, dl = native.assemble_batch(imgs, labs, wins, buf)
    assert di.shape == (B, *buf) and dl.shape == (B, *buf)
    for i in range(B):
        z0, y0, x0, wz, wy, wx, oz, oy, ox = wins[i]
        ref_i = np.zeros(buf, np.float32)
        ref_l = np.zeros(buf, np.int32)
        ref_i[oz:oz + wz, oy:oy + wy, ox:ox + wx] = \
            imgs[i][z0:z0 + wz, y0:y0 + wy, x0:x0 + wx]
        ref_l[oz:oz + wz, oy:oy + wy, ox:ox + wx] = \
            labs[i][z0:z0 + wz, y0:y0 + wy, x0:x0 + wx]
        np.testing.assert_array_equal(di[i], ref_i)
        np.testing.assert_array_equal(dl[i], ref_l)


def test_pipeline_native_path_matches_fallback_distribution():
    """Pipeline with native on/off produces identical batches for same seed."""
    from cbim_tpu.config import config_from_dict
    from cbim_tpu.data import get_dataset
    from cbim_tpu.data.pipeline import TrainPipeline

    cfg = config_from_dict(dict(
        dataset="synthetic", model="unet", dimension="3d", classes=3,
        in_chan=1, base_chan=4, block="SingleConv", norm="in",
        training_size=[8, 16, 16], affine_pad_size=[2, 4, 4],
        scale=[0.1, 0.2, 0.2], rotate=[10, 0, 0], translate=[0, 0, 0],
        gaussian_noise_std=0.02, additive_brightness_std=0.5,
        gamma_range=[0.7, 1.4], synthetic_cases=4, k_fold=4,
        synthetic_shape=[12, 24, 24]))
    ds = get_dataset(cfg, "train", 0)

    p1 = TrainPipeline(ds, cfg, seed=7)
    i1, l1 = p1.host_batch(3)
    p2 = TrainPipeline(ds, cfg, seed=7)
    p2._native = False
    i2, l2 = p2.host_batch(3)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
