"""Generate tests/goldens fixtures with an INDEPENDENT statistical route.

Provenance (documented for tests/goldens/README.md): every number here is
computed WITHOUT importing kmersgwas_tpu, using a mathematically different
formulation from the package's stats layer:

  * package route (stats/emma.py, stats/lmm.py): EMMA's single-parameter
    profiled formulation — eigendecompose K once, grid + bisection over
    delta = ve/vg on the rotated data (emma.R:392-493 transcription).
  * THIS script: direct 2-parameter numerical optimization of the
    restricted / full log-likelihood in matrix form,
        V = vg K + ve I
        REML: l_R = -0.5 [ (n-q) log 2pi + log|V| + log|X' V^-1 X|
                           + y' P y ]  with  P = V^-1 - V^-1 X (X'V^-1X)^-1 X'V^-1
        ML:   l   = -0.5 [ n log 2pi + log|V| + (y-Xb)' V^-1 (y-Xb) ],
              b the GLS estimate,
    maximized over (log vg, log ve) by scipy.optimize.minimize
    (Nelder-Mead), p-values from scipy.stats.chi2.sf.

Agreement between the two routes validates the transcription of emma.REMLE
and the GEMMA `-lmm 2` ML-LRT replacement (reference contract:
/root/reference/kmers_gwas.py:162-165, /root/reference/src/R/emma.R:392-493).

Run: python tools/make_goldens.py  -> rewrites tests/goldens/stats_goldens.npz
"""
import json
import os

import numpy as np
from scipy import optimize, stats

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "goldens")


def make_dataset(seed=42, n=80, n_variants=24):
    """Structured population: two subpopulations + polygenic background, so
    vg/ve are well-identified and K is far from identity."""
    rng = np.random.default_rng(seed)
    half = n // 2
    # genome-wide background genotypes drive both K and the polygenic term
    freq = np.where(np.arange(500) % 2 == 0,
                    rng.uniform(0.1, 0.5, 500), rng.uniform(0.4, 0.9, 500))
    pop = np.repeat([0, 1], [half, n - half])
    shift = rng.uniform(-0.25, 0.25, 500)
    G = np.empty((n, 500))
    for j in range(500):
        p0 = np.clip(freq[j] + shift[j] * (1 - 2 * pop), 0.05, 0.95)
        G[:, j] = rng.binomial(1, p0)
    Gs = (G - G.mean(0)) / (G.std(0) + 1e-9)
    K = Gs @ Gs.T / G.shape[1]
    K = K / np.diag(K).mean()          # normalize like kinship matrices
    K += 1e-6 * np.eye(n)              # PSD guard
    u = Gs @ rng.normal(0, 1, 500) / np.sqrt(500)
    y = 1.3 * u + rng.normal(0, 0.8, n)
    variants = G[:, rng.choice(500, n_variants, replace=False)].T.copy()
    return y, K, variants


def reml_direct(y, K, X):
    """Direct 2-parameter REML: maximize l_R over (log vg, log ve)."""
    n, q = len(y), X.shape[1]

    def neg_llr(theta):
        vg, ve = np.exp(theta)
        V = vg * K + ve * np.eye(n)
        sign, logdetV = np.linalg.slogdet(V)
        if sign <= 0:
            return 1e10
        Vi = np.linalg.inv(V)
        XtViX = X.T @ Vi @ X
        sign2, logdetX = np.linalg.slogdet(XtViX)
        if sign2 <= 0:
            return 1e10
        P = Vi - Vi @ X @ np.linalg.inv(XtViX) @ X.T @ Vi
        return 0.5 * ((n - q) * np.log(2 * np.pi) + logdetV + logdetX
                      + y @ P @ y)

    best = None
    for s in [(0.0, 0.0), (1.0, -1.0), (-1.0, 1.0), (np.log(np.var(y)), -2.0)]:
        r = optimize.minimize(neg_llr, s, method="Nelder-Mead",
                              options=dict(xatol=1e-10, fatol=1e-12,
                                           maxiter=4000))
        if best is None or r.fun < best.fun:
            best = r
    vg, ve = np.exp(best.x)
    return vg, ve, -best.fun


def ml_direct(y, K, X):
    """Direct 2-parameter ML: maximize the full log-likelihood."""
    n = len(y)

    def neg_ll(theta):
        vg, ve = np.exp(theta)
        V = vg * K + ve * np.eye(n)
        sign, logdetV = np.linalg.slogdet(V)
        if sign <= 0:
            return 1e10
        Vi = np.linalg.inv(V)
        XtViX = X.T @ Vi @ X
        b = np.linalg.solve(XtViX, X.T @ Vi @ y)
        r = y - X @ b
        return 0.5 * (n * np.log(2 * np.pi) + logdetV + r @ Vi @ r)

    best = None
    for s in [(0.0, 0.0), (1.0, -1.0), (-1.0, 1.0), (np.log(np.var(y) + 1e-9), -2.0)]:
        r = optimize.minimize(neg_ll, s, method="Nelder-Mead",
                              options=dict(xatol=1e-10, fatol=1e-12,
                                           maxiter=4000))
        if best is None or r.fun < best.fun:
            best = r
    return -best.fun


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    y, K, variants = make_dataset()
    n = len(y)
    ones = np.ones((n, 1))

    yc = y - y.mean()
    vg, ve, llr = reml_direct(yc, K, ones)

    # per-variant GEMMA -lmm 2 contract: ML LRT of the variant effect,
    # variance components re-estimated under both null and alternative
    ll0 = ml_direct(yc, K, ones)
    p_lrt = np.empty(len(variants))
    for i, g in enumerate(variants):
        X1 = np.column_stack([ones, g])
        ll1 = ml_direct(yc, K, X1)
        p_lrt[i] = stats.chi2.sf(2.0 * max(ll1 - ll0, 0.0), df=1)

    np.savez(os.path.join(OUT_DIR, "stats_goldens.npz"),
             y=y, K=K, variants=variants, vg=vg, ve=ve,
             heritability=vg / (vg + ve), ll_null_ml=ll0, p_lrt=p_lrt)
    print(json.dumps({"vg": vg, "ve": ve, "h2": vg / (vg + ve),
                      "p_min": float(p_lrt.min()),
                      "p_max": float(p_lrt.max())}, indent=2))


if __name__ == "__main__":
    main()
