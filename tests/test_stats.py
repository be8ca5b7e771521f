"""Statistical-layer tests: REMLE, mvnpermute, exact LMM LRT, transform."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kmersgwas_tpu.stats import emma, lmm, transform
from kmersgwas_tpu.stats.mvnpermute import mvnpermute


def make_kinship(rng, n):
    """Random PSD kinship-like matrix with unit diagonal."""
    g = rng.integers(0, 2, size=(400, n)).astype(np.float64)
    K = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            K[i, j] = np.mean(1 - np.abs(g[:, i] - g[:, j]))
    np.fill_diagonal(K, 1.0)
    return K


def simulate_phenotype(rng, K, vg, ve):
    n = K.shape[0]
    L = np.linalg.cholesky(vg * K + ve * np.eye(n) + 1e-9 * np.eye(n))
    return L @ rng.normal(size=n)


def reference_remle(y, K, ngrids=100, llim=-10, ulim=10, esp=1e-10):
    """Literal NumPy/SciPy transcription of emma.REMLE (emma.R:392-493)."""
    from scipy.optimize import brentq
    n = len(y)
    X = np.ones((n, 1))
    q = 1
    S = np.eye(n) - X @ np.linalg.solve(X.T @ X, X.T)
    w, v = np.linalg.eigh(S @ (K + np.eye(n)) @ S)
    w = w[::-1][: n - q] - 1.0
    v = v[:, ::-1][:, : n - q]
    etas = v.T @ y
    etasq = etas**2

    def dLL(logdelta):
        d = np.exp(logdelta)
        ld = w + d
        return 0.5 * d * ((n - q) * np.sum(etasq / ld**2) / np.sum(etasq / ld)
                          - np.sum(1.0 / ld))

    def LL(logdelta):
        d = np.exp(logdelta)
        ld = w + d
        nq = n - q
        return 0.5 * (nq * (np.log(nq / (2 * np.pi)) - 1 - np.log(np.sum(etasq / ld)))
                      - np.sum(np.log(ld)))

    grid = np.linspace(llim, ulim, ngrids + 1)
    dll = np.array([dLL(g) for g in grid])
    cands = []
    if dll[0] < esp:
        cands.append(llim)
    if dll[-1] > -esp:
        cands.append(ulim)
    for i in range(ngrids):
        if dll[i] * dll[i + 1] < -esp * esp and dll[i] > 0 and dll[i + 1] < 0:
            cands.append(brentq(dLL, grid[i], grid[i + 1]))
    lls = [LL(c) for c in cands]
    best = cands[int(np.argmax(lls))]
    delta = np.exp(best)
    vg = np.sum(etasq / (w + delta)) / (n - q)
    return dict(delta=delta, vg=vg, ve=vg * delta, ll=max(lls))


@pytest.mark.parametrize("vg,ve", [(1.0, 1.0), (2.0, 0.3), (0.1, 2.0)])
def test_remle_matches_reference_transcription(vg, ve):
    rng = np.random.default_rng(42)
    K = make_kinship(rng, 60)
    y = simulate_phenotype(rng, K, vg, ve)
    y = y - y.mean()
    ref = reference_remle(y, K)
    got = emma.remle(y, K)
    assert np.isclose(float(got.delta), ref["delta"], rtol=1e-3)
    assert np.isclose(float(got.vg), ref["vg"], rtol=1e-3)
    assert np.isclose(float(got.ve), ref["ve"], rtol=1e-3)
    assert np.isclose(float(got.reml_ll), ref["ll"], rtol=1e-5)


def test_remle_recovers_simulated_heritability():
    rng = np.random.default_rng(0)
    K = make_kinship(rng, 150)
    # average over replicates for a statistical check
    h2s = []
    for rep in range(5):
        y = simulate_phenotype(np.random.default_rng(rep), K, 2.0, 1.0)
        res = emma.remle(y - y.mean(), K)
        h2s.append(float(emma.heritability(res)))
    assert 0.3 < np.mean(h2s) < 0.95


def test_psd_check():
    rng = np.random.default_rng(1)
    K = make_kinship(rng, 30)
    assert emma.is_positive_semi_definite(K)
    bad = K.copy()
    bad[0, 1] = bad[1, 0] = 5.0
    assert not emma.is_positive_semi_definite(bad)


def test_mvnpermute_preserves_moments():
    rng = np.random.default_rng(2)
    n = 40
    K = make_kinship(rng, n)
    V = 1.5 * K + 0.5 * np.eye(n)
    y = simulate_phenotype(rng, K, 1.5, 0.5)
    perms = np.asarray(mvnpermute(jax.random.PRNGKey(0), jnp.asarray(y),
                                  jnp.ones((n, 1)), jnp.asarray(V), 50))
    assert perms.shape == (n, 50)
    # invariant of the algorithm: whitened residuals of every replicate are a
    # permutation (same multiset) of the original whitened residuals
    Vinv = np.linalg.inv(V)
    b_orig = (np.ones(n) @ Vinv @ y) / (np.ones(n) @ Vinv @ np.ones(n))
    fix = np.ones(n) * b_orig
    L = np.linalg.cholesky(V)
    z = np.sort(np.linalg.solve(L, y - fix))
    for r in range(perms.shape[1]):
        zr = np.sort(np.linalg.solve(L, perms[:, r] - fix))
        np.testing.assert_allclose(zr, z, rtol=1e-6, atol=1e-8)
    # and the replicates are not all identical
    assert np.std(perms, axis=1).max() > 0.1


def test_lmm_null_variant_gives_uniform_ish_pvalues():
    rng = np.random.default_rng(3)
    n = 80
    K = make_kinship(rng, n)
    y = simulate_phenotype(rng, K, 1.0, 1.0)
    w, U = np.linalg.eigh(K)
    genos = rng.integers(0, 2, size=(200, n)).astype(np.float64)
    res = lmm.lmm_scan(jnp.asarray(genos), jnp.asarray(y),
                       jnp.asarray(w), jnp.asarray(U))
    p = np.asarray(res.p_lrt)
    assert np.all((p >= 0) & (p <= 1))
    # null variants: roughly uniform p-values
    assert 0.2 < np.mean(p < 0.5) < 0.8


def test_lmm_detects_causal_variant():
    rng = np.random.default_rng(4)
    n = 100
    K = make_kinship(rng, n)
    causal = rng.integers(0, 2, size=n).astype(np.float64)
    y = simulate_phenotype(rng, K, 0.5, 0.5) + 2.0 * causal
    w, U = np.linalg.eigh(K)
    genos = np.concatenate([causal[None, :],
                            rng.integers(0, 2, size=(50, n)).astype(np.float64)])
    res = lmm.lmm_scan(jnp.asarray(genos), jnp.asarray(y - y.mean()),
                       jnp.asarray(w), jnp.asarray(U))
    p = np.asarray(res.p_lrt)
    assert p[0] < 1e-6
    assert p[0] < p[1:].min() * 1e-2
    assert abs(float(res.beta[0]) - 2.0) < 0.5


def test_lmm_matches_ols_when_no_relatedness():
    """With K = I the LMM LRT must agree with the plain linear-model LRT."""
    from scipy.stats import chi2
    rng = np.random.default_rng(5)
    n = 120
    y = rng.normal(size=n)
    x = rng.integers(0, 2, size=n).astype(np.float64)
    K = np.eye(n)
    w, U = np.linalg.eigh(K)
    res = lmm.lmm_scan(jnp.asarray(x[None, :]), jnp.asarray(y),
                       jnp.asarray(w), jnp.asarray(U))
    # OLS LRT: n log(RSS0/RSS1)
    X0 = np.ones((n, 1))
    X1 = np.stack([np.ones(n), x], axis=1)
    r0 = y - X0 @ np.linalg.lstsq(X0, y, rcond=None)[0]
    r1 = y - X1 @ np.linalg.lstsq(X1, y, rcond=None)[0]
    lrt = n * np.log(np.sum(r0**2) / np.sum(r1**2))
    p_expect = chi2.sf(lrt, 1)
    assert np.isclose(float(res.p_lrt[0]), p_expect, rtol=1e-3, atol=1e-8)


def test_chi2_sf_df1():
    from scipy.stats import chi2
    x = np.array([0.1, 1.0, 5.0, 20.0, 50.0])
    got = np.asarray(lmm.chi2_sf_df1(jnp.asarray(x)))
    np.testing.assert_allclose(got, chi2.sf(x, 1), rtol=1e-5)


def test_transform_and_permute_end_to_end():
    rng = np.random.default_rng(6)
    n = 50
    K = make_kinship(rng, n)
    y = simulate_phenotype(rng, K, 1.0, 0.5) + 10.0
    res = transform.transform_and_permute(y, K, n_permutations=20, seed=1)
    assert res.phenotypes.shape == (n, 21)
    assert res.transformed.shape == (n, 21)
    assert res.names[0] == "phenotype_value" and res.names[-1] == "P20"
    # column 0 is the centered phenotype
    np.testing.assert_allclose(res.phenotypes[:, 0], y - y.mean(), atol=1e-9)
    # transformed = V^-1 @ pheno
    V = res.vg * K + res.ve * np.eye(n)
    np.testing.assert_allclose(res.transformed, np.linalg.solve(V, res.phenotypes),
                               rtol=1e-6, atol=1e-9)
    assert 0.0 < res.heritability < 1.0


def test_permutation_threshold_order_statistic():
    best = {f"P{i}": float(i) for i in range(1, 101)}
    # sorted desc: 100, 99, ... threshold 5% -> index int(100*0.05)-1 = 4 -> 96
    assert transform.permutation_threshold(best, 100, 0.05) == 96.0
    assert transform.permutation_threshold(best, 100, 0.10) == 91.0


def test_mle_matches_reference_transcription():
    from scipy.optimize import brentq
    rng = np.random.default_rng(8)
    K = make_kinship(rng, 50)
    y = simulate_phenotype(rng, K, 1.5, 0.8)
    y = y - y.mean()
    got = emma.mle(y, K)

    # literal transcription of emma.MLE (emma.R:176-244)
    n = len(y)
    X = np.ones((n, 1))
    S = np.eye(n) - X @ np.linalg.solve(X.T @ X, X.T)
    wR, vR = np.linalg.eigh(S @ (K + np.eye(n)) @ S)
    wR = wR[::-1][: n - 1] - 1.0
    vR = vR[:, ::-1][:, : n - 1]
    xi = np.linalg.eigvalsh(K)[::-1]
    etas = vR.T @ y
    etasq = etas**2

    def LL(g):
        d = np.exp(g)
        return 0.5 * (n * (np.log(n / (2 * np.pi)) - 1
                           - np.log(np.sum(etasq / (wR + d))))
                      - np.sum(np.log(xi + d)))

    def dLL(g):
        d = np.exp(g)
        ld = wR + d
        return 0.5 * (n * np.sum(etasq / ld**2) / np.sum(etasq / ld)
                      - np.sum(1.0 / (xi + d)))

    grid = np.linspace(-10, 10, 101)
    dll = np.array([dLL(g) for g in grid])
    cands = []
    if dll[0] < 1e-10:
        cands.append(-10.0)
    if dll[-1] > -1e-10:
        cands.append(10.0)
    for i in range(100):
        if dll[i] * dll[i + 1] < -1e-20 and dll[i] > 0 and dll[i + 1] < 0:
            cands.append(brentq(dLL, grid[i], grid[i + 1]))
    best = cands[int(np.argmax([LL(c) for c in cands]))]
    delta = np.exp(best)
    vg = np.sum(etasq / (wR + delta)) / n
    assert np.isclose(float(got.delta), delta, rtol=1e-3)
    assert np.isclose(float(got.vg), vg, rtol=1e-3)


def test_emma_ml_lrt_rotated_equals_eigen_R_route():
    """The rotated one-eigh formulation (y'Py + det identities) must equal
    the per-variant eigen_R route (emma.R:574-580) it replaced."""
    import jax.numpy as jnp
    from kmersgwas_tpu.stats import emma
    rng = np.random.default_rng(11)
    n, m, g = 40, 5, 2
    G0 = rng.normal(size=(n, 3 * n))
    K = G0 @ G0.T / (3 * n)
    K = K / np.diag(K).mean()
    ys = rng.normal(size=(g, n))
    xs = (rng.random((m, n)) < 0.4).astype(float)
    out = emma.emma_ML_LRT(ys, xs, K)
    X0 = jnp.ones((n, 1))
    xi = jnp.linalg.eigvalsh(jnp.asarray(K))[::-1]
    for i in range(m):
        X = jnp.column_stack([X0, jnp.asarray(xs[i])])
        lam1, vec1 = emma.eigen_R(jnp.asarray(K), X)
        for j in range(g):
            ref = emma.mle_from_eigen(vec1.T @ jnp.asarray(ys[j]), lam1, xi)
            assert np.isclose(float(out["ML1s"][i, j]), float(ref.reml_ll),
                              rtol=1e-8, atol=1e-8)
            assert np.isclose(float(out["vgs"][i, j]), float(ref.vg),
                              rtol=1e-6)


def test_emma_missing_data_subset_semantics():
    """NaNs in ys/xs reproduce R's subset-and-rerun semantics
    (emma.R:611-614, 683-691): results equal running the complete-data
    routine on the complete individuals."""
    from kmersgwas_tpu.stats import emma
    rng = np.random.default_rng(12)
    n, m = 36, 4
    G0 = rng.normal(size=(n, 3 * n))
    K = G0 @ G0.T / (3 * n)
    K = K / np.diag(K).mean()
    y = rng.normal(size=n)
    xs = (rng.random((m, n)) < 0.4).astype(float)
    y_na = y.copy()
    y_na[[3, 7]] = np.nan
    xs_na = xs.copy()
    xs_na[1, 10] = np.nan
    xs_na[2, 10] = np.nan     # SAME NA mask as variant 1 -> one vmapped
                              # group of 2 (the r4 mask-grouped batch path)
    xs_na[3, 5] = np.nan      # different mask -> its own group

    for fn in (emma.emma_ML_LRT, emma.emma_REML_t):
        out = fn(y_na, xs_na, K)
        vids = ~np.isnan(y_na)
        # clean variant == complete-data run on the y-subset
        ref = fn(y[vids], xs[:1, vids], K[np.ix_(vids, vids)])
        np.testing.assert_allclose(np.asarray(out["ps"])[0, 0],
                                   np.asarray(ref["ps"])[0, 0], rtol=1e-6)
        # NA variants (grouped and singleton): subset both, per variant
        for i in (1, 2, 3):
            vv = vids & ~np.isnan(xs_na[i])
            ref2 = fn(y[vv], xs[i:i + 1, vv], K[np.ix_(vv, vv)])
            assert np.isclose(float(out["ps"][i, 0]),
                              float(ref2["ps"][0, 0]), rtol=1e-6), (fn, i)


def test_emma_ml_lrt_scales_to_m1000_n500():
    """m=1000 variants, n=500 individuals must run in seconds (the old
    per-variant eigen_R loop was O(m n^3) and unusable at this scale)."""
    import time
    from kmersgwas_tpu.stats import emma
    rng = np.random.default_rng(13)
    n, m = 500, 1000
    G0 = rng.normal(size=(n, 2 * n))
    K = G0 @ G0.T / (2 * n)
    K = K / np.diag(K).mean()
    y = rng.normal(size=n)
    xs = (rng.random((m, n)) < 0.3).astype(float)
    t0 = time.perf_counter()
    out = emma.emma_ML_LRT(y, xs, K, n_bisect=40)
    ps = np.asarray(out["ps"])
    dt = time.perf_counter() - t0
    assert ps.shape == (m, 1) and np.all((ps >= 0) & (ps <= 1))
    assert dt < 60, f"ML.LRT at m=1000,n=500 took {dt:.1f}s"


def test_lmm_packed_device_path_matches_host64():
    """lmm_scan_columns_packed (f32, on-device unpack) agrees with the f64
    host route to permutation-threshold resolution."""
    from kmersgwas_tpu.stats import lmm
    rng = np.random.default_rng(17)
    n, m, p = 96, 40, 3
    G0 = rng.normal(size=(n, 2 * n))
    K = G0 @ G0.T / (2 * n)
    K = K / np.diag(K).mean()
    w, U = np.linalg.eigh(K)
    genos = (rng.random((p, m, n)) < 0.4).astype(np.float64)
    ys = rng.normal(size=(p, n))
    ref = lmm.lmm_scan_columns(genos, ys, w, U, n_grid=64, n_refine=40)

    n64 = (n + 63) // 64
    bits = np.zeros((p, m, n64 * 64), np.uint8)
    bits[:, :, :n] = genos
    packed = np.packbits(bits, axis=2, bitorder="little").view("<u4")
    got = lmm.lmm_scan_columns_packed(packed, ys, w, U, n=n,
                                      n_grid=64, n_refine=40)
    p_ref = np.asarray(ref.p_lrt, np.float64)
    p_got = np.asarray(got.p_lrt, np.float64)
    np.testing.assert_allclose(p_got, p_ref, atol=2e-3)
    small = p_ref < 0.05
    if small.any():
        np.testing.assert_allclose(np.log10(p_got[small]),
                                   np.log10(p_ref[small]), atol=5e-2)


def test_emma_Z_incidence_matrix_equals_expanded_kinship():
    """Z-matrix configurations (emma.R:398-400, 55-83): Z=I reproduces the
    no-Z result exactly, and a replication incidence Z equals running with
    the manually expanded per-observation kinship Z K Z'."""
    from kmersgwas_tpu.stats import emma
    rng = np.random.default_rng(19)
    t, reps = 15, 2
    n = t * reps
    G0 = rng.normal(size=(t, 3 * t))
    Kt = G0 @ G0.T / (3 * t)
    Kt = Kt / np.diag(Kt).mean()
    Z = np.zeros((n, t))
    Z[np.arange(n), np.repeat(np.arange(t), reps)] = 1.0
    y = rng.normal(size=n)
    xs = (rng.random((3, n)) < 0.4).astype(float)

    Kn = Z @ Kt @ Z.T
    r_eye = emma.remle(y[:t], Kt, Z=np.eye(t))
    r_ref = emma.remle(y[:t], Kt)
    assert np.isclose(float(r_eye.vg), float(r_ref.vg), rtol=1e-12)

    rz = emma.remle(y, Kt, Z=Z)
    rk = emma.remle(y, Kn)
    assert np.isclose(float(rz.vg), float(rk.vg), rtol=1e-10)
    assert np.isclose(float(rz.delta), float(rk.delta), rtol=1e-10)

    oz = emma.emma_ML_LRT(y, xs, Kt, Z=Z)
    ok_ = emma.emma_ML_LRT(y, xs, Kn)
    np.testing.assert_allclose(np.asarray(oz["ps"]), np.asarray(ok_["ps"]),
                               rtol=1e-8)
    tz = emma.emma_REML_t(y, xs, Kt, Z=Z)
    tk = emma.emma_REML_t(y, xs, Kn)
    np.testing.assert_allclose(np.asarray(tz["stats"]),
                               np.asarray(tk["stats"]), rtol=1e-8)


def test_mle_noX_matches_numpy_transcription():
    """emma.MLE.noX (emma.R:291-390): grid+brentq NumPy transcription of
    the no-fixed-effects ML likelihood as oracle."""
    from scipy.optimize import brentq
    from kmersgwas_tpu.stats import emma
    rng = np.random.default_rng(31)
    n = 40
    G0 = rng.normal(size=(n, 3 * n))
    K = G0 @ G0.T / (3 * n)
    K = K / np.diag(K).mean()
    y = rng.normal(size=n)
    got = emma.mle_noX(y, K)

    xi, U = np.linalg.eigh(K)
    etasq = (U.T @ y) ** 2

    def LL(g):
        d = np.exp(g)
        return 0.5 * (n * (np.log(n / (2 * np.pi)) - 1
                           - np.log(np.sum(etasq / (xi + d))))
                      - np.sum(np.log(xi + d)))

    def dLL(g):
        d = np.exp(g)
        ld = xi + d
        return 0.5 * d * (n * np.sum(etasq / ld**2) / np.sum(etasq / ld)
                          - np.sum(1.0 / ld))

    grid = np.linspace(-10, 10, 101)
    dll = np.array([dLL(g) for g in grid])
    cands = []
    if dll[0] < 1e-10:
        cands.append(-10.0)
    if dll[-1] > -1e-10:
        cands.append(10.0)
    for i in range(100):
        if dll[i] * dll[i + 1] < -1e-20 and dll[i] > 0 and dll[i + 1] < 0:
            cands.append(brentq(dLL, grid[i], grid[i + 1]))
    best = cands[int(np.argmax([LL(c) for c in cands]))]
    delta = np.exp(best)
    vg = np.sum(etasq / (xi + delta)) / n
    assert np.isclose(float(got.delta), delta, rtol=1e-3)
    assert np.isclose(float(got.vg), vg, rtol=1e-3)


def test_emma_X0_custom_null_covariates():
    """X0 (emma.R:495,1013 signatures): the default reproduces X0=[1]
    exactly, and a covariate-augmented null changes the LRT in the
    direction a manual eigen_R-route computation predicts."""
    import jax.numpy as jnp
    from kmersgwas_tpu.stats import emma
    rng = np.random.default_rng(41)
    n, m = 36, 4
    G0 = rng.normal(size=(n, 3 * n))
    K = G0 @ G0.T / (3 * n)
    K = K / np.diag(K).mean()
    cov = rng.normal(size=n)
    y = 0.8 * cov + rng.normal(size=n)
    xs = (rng.random((m, n)) < 0.4).astype(float)

    base = emma.emma_ML_LRT(y, xs, K)
    same = emma.emma_ML_LRT(y, xs, K, X0=np.ones((n, 1)))
    np.testing.assert_allclose(np.asarray(base["ps"]), np.asarray(same["ps"]),
                               rtol=1e-12)

    X0 = np.column_stack([np.ones(n), cov])
    out = emma.emma_ML_LRT(y, xs, K, X0=X0)
    # oracle: per-variant eigen_R route with the augmented design
    xi = jnp.linalg.eigvalsh(jnp.asarray(K))[::-1]
    lam0, vec0 = emma.eigen_R(jnp.asarray(K), jnp.asarray(X0))
    ml0 = emma.mle_from_eigen(vec0.T @ jnp.asarray(y), lam0, xi).reml_ll
    for i in range(m):
        X = jnp.asarray(np.column_stack([X0, xs[i]]))
        lam1, vec1 = emma.eigen_R(jnp.asarray(K), X)
        ml1 = emma.mle_from_eigen(vec1.T @ jnp.asarray(y), lam1, xi).reml_ll
        assert np.isclose(float(out["ML1s"][i, 0]), float(ml1),
                          rtol=1e-8, atol=1e-8)
    assert np.isclose(float(out["ML0s"][0, 0]), float(ml0), rtol=1e-8)

    t_base = emma.emma_REML_t(y, xs, K)
    t_same = emma.emma_REML_t(y, xs, K, X0=np.ones((n, 1)))
    np.testing.assert_allclose(np.asarray(t_base["stats"]),
                               np.asarray(t_same["stats"]), rtol=1e-12)
    t_cov = emma.emma_REML_t(y, xs, K, X0=X0)
    assert np.all(np.asarray(t_cov["dfs"]) == n - 3)


def test_emma_Z_and_X0_combined():
    """Z and X0 compose: replication incidence + covariate null design
    equals running with the expanded kinship and the same X0."""
    from kmersgwas_tpu.stats import emma
    rng = np.random.default_rng(47)
    t, reps = 12, 2
    n = t * reps
    G0 = rng.normal(size=(t, 3 * t))
    Kt = G0 @ G0.T / (3 * t)
    Kt = Kt / np.diag(Kt).mean()
    Z = np.zeros((n, t))
    Z[np.arange(n), np.repeat(np.arange(t), reps)] = 1.0
    cov = rng.normal(size=n)
    X0 = np.column_stack([np.ones(n), cov])
    y = rng.normal(size=n)
    xs = (rng.random((3, n)) < 0.4).astype(float)
    Kn = Z @ Kt @ Z.T
    a = emma.emma_ML_LRT(y, xs, Kt, Z=Z, X0=X0)
    b = emma.emma_ML_LRT(y, xs, Kn, X0=X0)
    np.testing.assert_allclose(np.asarray(a["ps"]), np.asarray(b["ps"]),
                               rtol=1e-8)
    ta = emma.emma_REML_t(y, xs, Kt, Z=Z, X0=X0)
    tb = emma.emma_REML_t(y, xs, Kn, X0=X0)
    np.testing.assert_allclose(np.asarray(ta["stats"]),
                               np.asarray(tb["stats"]), rtol=1e-8)
    assert np.all(np.asarray(ta["dfs"]) == n - 3)


def test_emma_na_tail_size_batched_dispatches(monkeypatch):
    """VERDICT r4 #8 done-criterion: a dataset with 50 DISTINCT NA masks
    spread over 5 subset sizes runs its NA-variant tail in <= 5 gathered
    host-side dispatches per statistic, with values unchanged vs
    per-variant subsetting."""
    from kmersgwas_tpu.stats import emma
    rng = np.random.default_rng(21)
    n, m = 40, 50
    G0 = rng.normal(size=(n, 3 * n))
    K = G0 @ G0.T / (3 * n)
    K = K / np.diag(K).mean()
    y = rng.normal(size=n)
    xs = (rng.random((m, n)) < 0.4).astype(float)
    xs_na = xs.copy()
    masks = set()
    for i in range(m):
        # 1 + i%5 missing individuals, distinct mask per variant
        drop = rng.choice(n, size=1 + i % 5, replace=False)
        xs_na[i, drop] = np.nan
        masks.add(tuple(sorted(drop.tolist())))
    assert len(masks) >= 45          # genuinely distinct masks

    calls = {"ml": 0, "t": 0}
    orig_ml, orig_t = emma._ml_lrt_gathered, emma._reml_t_gathered

    def spy_ml(*a, **k):
        calls["ml"] += 1
        return orig_ml(*a, **k)

    def spy_t(*a, **k):
        calls["t"] += 1
        return orig_t(*a, **k)

    monkeypatch.setattr(emma, "_ml_lrt_gathered", spy_ml)
    monkeypatch.setattr(emma, "_reml_t_gathered", spy_t)
    out_ml = emma.emma_ML_LRT(y, xs_na, K, n_bisect=40)
    out_t = emma.emma_REML_t(y, xs_na, K, n_bisect=40)
    assert calls["ml"] <= 5 and calls["t"] <= 5, calls

    # values: spot-check variants of every size against per-variant
    # subsetting (R's emma.R:683-691 semantics)
    for i in (0, 1, 2, 3, 4, 17, 33, 49):
        vv = ~np.isnan(xs_na[i])
        ref_ml = emma.emma_ML_LRT(y[vv], xs[i:i + 1, vv],
                                  K[np.ix_(vv, vv)], n_bisect=40)
        ref_t = emma.emma_REML_t(y[vv], xs[i:i + 1, vv],
                                 K[np.ix_(vv, vv)], n_bisect=40)
        assert np.isclose(float(out_ml["ps"][i, 0]),
                          float(ref_ml["ps"][0, 0]), rtol=1e-6), i
        assert np.isclose(float(out_t["ps"][i, 0]),
                          float(ref_t["ps"][0, 0]), rtol=1e-6), i
