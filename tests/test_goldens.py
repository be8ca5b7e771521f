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


def test_emma_ml_lrt_matches_goldens(golden):
    """emma.ML.LRT (emma.R:495-741 surface) reproduces the independent
    direct-ML LRT p-values on the golden dataset."""
    from kmersgwas_tpu.stats import emma
    y = golden["y"]
    yc = y - y.mean()
    out = emma.emma_ML_LRT(yc, golden["variants"], golden["K"])
    p_pkg = np.asarray(out["ps"])[:, 0]
    np.testing.assert_allclose(p_pkg, golden["p_lrt"], atol=2e-3)


def test_emma_reml_t_formula_transcription(golden):
    """emma.REML.t Wald t statistic/p (emma.R:1080-1110,1263) against a
    NumPy/scipy transcription using the same REML delta."""
    from scipy import stats as sps
    from kmersgwas_tpu.stats import emma
    y = golden["y"]
    yc = y - y.mean()
    K = golden["K"]
    variants = golden["variants"][:6]
    out = emma.emma_REML_t(yc, variants, K)
    n = len(yc)
    xi, Q = np.linalg.eigh(K)
    xi, Q = xi[::-1], Q[:, ::-1]
    for i, x in enumerate(variants):
        X = np.column_stack([np.ones(n), x])
        res = emma.remle(yc, K, X=X)
        U = Q * np.sqrt(1.0 / (xi + float(res.delta)))[None, :]
        yt, Xt = U.T @ yc, U.T @ X
        iXX = np.linalg.inv(Xt.T @ Xt)
        beta = iXX @ (Xt.T @ yt)
        stat = beta[1] / np.sqrt(iXX[1, 1] * float(res.vg))
        p = 2 * sps.t.sf(abs(stat), df=n - 2)
        assert np.isclose(float(out["stats"][i, 0]), stat, rtol=1e-4)
        assert np.isclose(float(out["ps"][i, 0]), p, rtol=1e-3, atol=1e-6)


def test_emma_kinship_matches_pair_loop():
    """emma.kinship GEMM form == R's pair loop (emma.R:40-46), with het
    resolution and NaN mean-imputation."""
    from kmersgwas_tpu.stats import emma
    rng = np.random.default_rng(3)
    m, n = 40, 12
    S = rng.choice([0.0, 0.5, 1.0], size=(m, n), p=[0.45, 0.1, 0.45])
    S[rng.random((m, n)) < 0.05] = np.nan
    got = np.asarray(emma.emma_kinship(S, method="additive", use="all"))
    # literal transcription
    Sw = S.copy()
    rm = np.nanmean(Sw, axis=1)
    d, r = Sw.copy(), Sw.copy()
    for i in range(m):
        het = ~np.isnan(Sw[i]) & (Sw[i] == 0.5)
        d[i, het] = float(rm[i] > 0.5)
        r[i, het] = float(rm[i] < 0.5)
    Sw = np.vstack([d, r])
    rm2 = np.nanmean(Sw, axis=1)
    for i in range(Sw.shape[0]):
        Sw[i, np.isnan(Sw[i])] = rm2[i]
    expect = np.eye(n)
    for i in range(1, n):
        for j in range(i):
            x = Sw[:, i] * Sw[:, j] + (1 - Sw[:, i]) * (1 - Sw[:, j])
            expect[i, j] = expect[j, i] = x.mean()
    np.testing.assert_allclose(got, expect, atol=1e-5)
