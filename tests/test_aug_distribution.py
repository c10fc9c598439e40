"""Aug-distribution parity vs the reference pipeline (VERDICT r1 #7).

Runs the same phantom + nominal ACDC recipe through the reference's torch
augmentation and our jitted pipeline, comparing per-draw summary statistics
as distributions.  docs/aug_parity.md holds the full N=300 table; this test
keeps the parity from regressing with a smaller N (KS bounds are set for
N=120 per side: KS_crit(alpha=0.05) ~ 0.175).
"""
import os
import sys

import numpy as np
import pytest

import conftest as cf

sys.path.insert(0, os.path.join(cf.REPO_ROOT, "tools"))


@pytest.mark.slow
@pytest.mark.skipif(not cf.has_reference(), reason="reference not mounted")
def test_aug_statistics_match_reference_distribution():
    pytest.importorskip("torch")
    import aug_distribution_parity as ap

    n = 120
    img, lab = ap.make_phantom()
    ref = ap.run_reference(img, lab, n)
    ours = ap.run_ours(img, lab, n)

    for j, name in enumerate(ap.STAT_NAMES):
        ks, _ = ap.ks_stat(ref[:, j], ours[:, j])
        # KS_crit(0.05, 120, 120) ~= 0.175; allow headroom for the documented
        # intensity-window divergence (gamma renorm on precrop vs volume)
        limit = 0.25 if name in ("std", "p05") else 0.2
        assert ks < limit, (name, ks)

    # crop-center parity (the round-2 fix): class fractions must agree tightly
    for j, name in enumerate(ap.STAT_NAMES):
        if name.startswith("frac"):
            d = abs(ref[:, j].mean() - ours[:, j].mean())
            lim = 0.015 if name == "frac_bg" else 0.012
            assert d < lim, (name, d)
