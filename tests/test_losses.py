"""Golden parity tests: cbim_tpu losses vs the PyTorch reference math."""
import numpy as np
import pytest

import conftest as cf

torch = pytest.importorskip("torch")


def _ref_losses():
    cf.add_reference_to_path()
    from training.losses import DiceLoss, FocalLoss  # reference training/losses.py
    return DiceLoss, FocalLoss


@pytest.mark.parametrize("shape,classes", [((2, 10, 24, 24), 10),
                                           ((2, 4, 8, 16, 16), 4)])
def test_dice_loss_matches_reference(shape, classes):
    from cbim_tpu.ops.losses import dice_loss
    DiceLoss, _ = _ref_losses()

    rng = np.random.RandomState(0)
    logits = rng.randn(*shape).astype(np.float32)          # B, C, *spatial
    spatial = shape[2:]
    target = rng.randint(0, classes, size=(shape[0], 1, *spatial))

    ref = DiceLoss()(torch.from_numpy(logits), torch.from_numpy(target)).item()

    # ours: channels-last logits, no channel axis on target
    logits_cl = np.moveaxis(logits, 1, -1)
    ours = float(dice_loss(logits_cl, target[:, 0]))
    assert abs(ref - ours) < 1e-5, (ref, ours)


def test_weighted_ce_matches_torch():
    from cbim_tpu.ops.losses import weighted_cross_entropy

    rng = np.random.RandomState(1)
    logits = rng.randn(2, 4, 8, 12, 12).astype(np.float32)
    target = rng.randint(0, 4, size=(2, 8, 12, 12))
    w = np.array([0.5, 1.0, 1.0, 1.0], dtype=np.float32)

    crit = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w))
    ref = crit(torch.from_numpy(logits), torch.from_numpy(target)).item()

    ours = float(weighted_cross_entropy(np.moveaxis(logits, 1, -1), target, w))
    assert abs(ref - ours) < 1e-5, (ref, ours)


def test_focal_loss_matches_reference():
    from cbim_tpu.ops.losses import focal_loss
    _, FocalLoss = _ref_losses()

    rng = np.random.RandomState(2)
    logits = rng.randn(2, 6, 16, 16).astype(np.float32)
    target = rng.randint(0, 6, size=(2, 16, 16))

    ref = FocalLoss(6)(torch.from_numpy(logits), torch.from_numpy(target)).item()
    ours = float(focal_loss(np.moveaxis(logits, 1, -1), target))
    assert abs(ref - ours) < 1e-5, (ref, ours)


def test_deep_supervision_combination():
    from cbim_tpu.ops.losses import deep_supervision_loss, segmentation_loss
    rng = np.random.RandomState(3)
    o1 = rng.randn(1, 4, 4, 6, 6).astype(np.float32)
    o2 = rng.randn(1, 4, 4, 6, 6).astype(np.float32)
    t = rng.randint(0, 4, size=(1, 4, 6, 6))
    o1c, o2c = np.moveaxis(o1, 1, -1), np.moveaxis(o2, 1, -1)
    total = float(deep_supervision_loss([o1c, o2c], t, [0.5, 0.5]))
    manual = 0.5 * float(segmentation_loss(o1c, t)) + 0.5 * float(segmentation_loss(o2c, t))
    assert abs(total - manual) < 1e-5
