"""Cross-validation of the stats layer against independent golden fixtures.

tests/goldens/stats_goldens.npz is produced by tools/make_goldens.py with
scipy-only direct likelihood optimization (see tests/goldens/README.md for
provenance); here the package's EMMA-formulation implementations must agree.
"""
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "stats_goldens.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def test_remle_matches_direct_optimizer(golden):
    from kmersgwas_tpu.stats import emma
    y = golden["y"]
    yc = y - y.mean()
    res = emma.remle(yc, golden["K"])
    assert np.isclose(float(res.vg), float(golden["vg"]), rtol=2e-2)
    assert np.isclose(float(res.ve), float(golden["ve"]), rtol=2e-2)
    h2 = float(res.vg / (res.vg + res.ve))
    assert np.isclose(h2, float(golden["heritability"]), atol=2e-3)


def test_lmm_scan_pvalues_match_direct_ml_lrt(golden):
    from kmersgwas_tpu.stats import lmm
    y = golden["y"]
    yc = y - y.mean()
    K = golden["K"]
    variants = golden["variants"]
    w, U = np.linalg.eigh(K)
    res = lmm.lmm_scan(variants, yc, w, U, n_grid=128, n_refine=60)
    p_pkg = np.asarray(res.p_lrt, np.float64)
    p_ref = golden["p_lrt"]
    # p-values on [0,1]: absolute agreement, plus log-space agreement for
    # the small ones that drive thresholds
    np.testing.assert_allclose(p_pkg, p_ref, atol=2e-3)
    small = p_ref < 0.05
    if small.any():
        np.testing.assert_allclose(np.log10(p_pkg[small]),
                                   np.log10(p_ref[small]), atol=2e-2)
