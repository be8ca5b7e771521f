"""EMMA REML variance-component estimation in JAX.

Re-implements the only piece of the vendored EMMA library the reference
pipeline calls — `emma.REMLE` (src/R/emma.R:392-493) — as a fully jittable
routine: eigendecomposition of S(K+I)S once, restricted log-likelihood and
its derivative evaluated on a 101-point log-delta grid, and a fixed-iteration
bisection replacing R's `uniroot` inside every sign-change cell
(emma.R:432-440). All grid cells are refined in parallel (masked), then the
candidate with the highest REML LL wins — identical selection logic, no
data-dependent control flow.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class REMLEResult(NamedTuple):
    reml_ll: jax.Array
    delta: jax.Array
    vg: jax.Array
    ve: jax.Array


def eigen_R(K: jax.Array, X: jax.Array):
    """Eigen-system of S(K+I)S with S = I - X(X'X)^-1 X' (emma.R:85-92).

    Returns (values (n-q,), vectors (n, n-q)) in descending eigenvalue order,
    eigenvalues shifted by -1 exactly as the reference does.
    """
    n, q = X.shape
    XtX = X.T @ X
    S = jnp.eye(n) - X @ jnp.linalg.solve(XtX, X.T)
    M = S @ (K + jnp.eye(n)) @ S
    w, v = jnp.linalg.eigh(M)           # ascending
    w = w[::-1][: n - q] - 1.0
    v = v[:, ::-1][:, : n - q]
    return w, v


def _dLL(logdelta, lam, etasq):
    """Derivative of the restricted LL wrt log-delta (emma.R:158-164)."""
    nq = lam.shape[0]
    delta = jnp.exp(logdelta)
    ld = lam + delta
    return 0.5 * delta * (
        nq * jnp.sum(etasq / (ld * ld)) / jnp.sum(etasq / ld)
        - jnp.sum(1.0 / ld))


def _LL(logdelta, lam, etasq):
    """Restricted LL at log-delta (emma.R:145-149)."""
    nq = lam.shape[0]
    delta = jnp.exp(logdelta)
    ld = lam + delta
    return 0.5 * (nq * (jnp.log(nq / (2 * jnp.pi)) - 1.0
                        - jnp.log(jnp.sum(etasq / ld)))
                  - jnp.sum(jnp.log(ld)))


@functools.partial(jax.jit, static_argnames=("ngrids", "n_bisect"))
def remle_from_eigen(etas: jax.Array, lam: jax.Array,
                     llim: float = -10.0, ulim: float = 10.0,
                     esp: float = 1e-10, ngrids: int = 100,
                     n_bisect: int = 60) -> REMLEResult:
    """REMLE given etas = R_vectors' y and eigenvalues lam (n-q,)."""
    nq = lam.shape[0]
    etasq = etas * etas
    logdelta = jnp.linspace(llim, ulim, ngrids + 1)
    dll = jax.vmap(lambda g: _dLL(g, lam, etasq))(logdelta)

    # Bisection on every grid cell with a (+,-) sign change (masked elsewhere)
    lo0, hi0 = logdelta[:-1], logdelta[1:]
    cell_ok = (dll[:-1] * dll[1:] < -esp * esp) & (dll[:-1] > 0) & (dll[1:] < 0)

    def bisect(lo, hi):
        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            d = _dLL(mid, lam, etasq)
            return jnp.where(d > 0, mid, lo), jnp.where(d > 0, hi, mid)
        lo, hi = jax.lax.fori_loop(0, n_bisect, body, (lo, hi))
        return 0.5 * (lo + hi)

    roots = jax.vmap(bisect)(lo0, hi0)
    root_ll = jax.vmap(lambda g: _LL(g, lam, etasq))(roots)

    cand_logdelta = jnp.concatenate([
        jnp.array([llim, ulim]), roots])
    cand_ll = jnp.concatenate([
        jnp.array([_LL(llim, lam, etasq), _LL(ulim, lam, etasq)]), root_ll])
    cand_ok = jnp.concatenate([
        jnp.array([dll[0] < esp, dll[-1] > -esp]), cell_ok])

    masked_ll = jnp.where(cand_ok, cand_ll, -jnp.inf)
    best = jnp.argmax(masked_ll)
    max_logdelta = cand_logdelta[best]
    max_ll = masked_ll[best]
    maxdelta = jnp.exp(max_logdelta)
    vg = jnp.sum(etasq / (lam + maxdelta)) / nq
    ve = vg * maxdelta
    return REMLEResult(reml_ll=max_ll, delta=maxdelta, vg=vg, ve=ve)


def remle(y, K, X=None) -> REMLEResult:
    """emma.REMLE(y, X, K) with X defaulting to the intercept column."""
    y = jnp.asarray(y, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    K = jnp.asarray(K, y.dtype)
    n = y.shape[0]
    if X is None:
        X = jnp.ones((n, 1), y.dtype)
    lam, vec = eigen_R(K, X)
    etas = vec.T @ y
    return remle_from_eigen(etas, lam)


def heritability(res: REMLEResult) -> jax.Array:
    return res.vg / (res.vg + res.ve)


# ---------------------------------------------------------------------------
# Full maximum likelihood (emma.MLE, emma.R:176-289) — not used by the
# pipeline (which is REML + the per-variant ML-LRT in stats/lmm.py) but part
# of the EMMA API surface.
# ---------------------------------------------------------------------------

def _ml_LL(logdelta, lam_R, etasq, xi):
    n = xi.shape[0]
    delta = jnp.exp(logdelta)
    return 0.5 * (n * (jnp.log(n / (2 * jnp.pi)) - 1.0
                       - jnp.log(jnp.sum(etasq / (lam_R + delta))))
                  - jnp.sum(jnp.log(xi + delta)))


def _ml_dLL(logdelta, lam_R, etasq, xi):
    n = xi.shape[0]
    delta = jnp.exp(logdelta)
    ld = lam_R + delta
    return 0.5 * (n * jnp.sum(etasq / (ld * ld)) / jnp.sum(etasq / ld)
                  - jnp.sum(1.0 / (xi + delta)))


@functools.partial(jax.jit, static_argnames=("ngrids", "n_bisect"))
def mle_from_eigen(etas, lam_R, xi, llim: float = -10.0, ulim: float = 10.0,
                   esp: float = 1e-10, ngrids: int = 100,
                   n_bisect: int = 60) -> REMLEResult:
    """emma.MLE search given etas, restricted eigenvalues lam_R and the
    kinship eigenvalues xi (emma.R:176-244 grid + uniroot logic)."""
    n = xi.shape[0]
    etasq = etas * etas
    logdelta = jnp.linspace(llim, ulim, ngrids + 1)
    dll = jax.vmap(lambda g: _ml_dLL(g, lam_R, etasq, xi))(logdelta)
    lo0, hi0 = logdelta[:-1], logdelta[1:]
    cell_ok = (dll[:-1] * dll[1:] < -esp * esp) & (dll[:-1] > 0) & (dll[1:] < 0)

    def bisect(lo, hi):
        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            d = _ml_dLL(mid, lam_R, etasq, xi)
            return jnp.where(d > 0, mid, lo), jnp.where(d > 0, hi, mid)
        lo, hi = jax.lax.fori_loop(0, n_bisect, body, (lo, hi))
        return 0.5 * (lo + hi)

    roots = jax.vmap(bisect)(lo0, hi0)
    root_ll = jax.vmap(lambda g: _ml_LL(g, lam_R, etasq, xi))(roots)
    cand_logdelta = jnp.concatenate([jnp.array([llim, ulim]), roots])
    cand_ll = jnp.concatenate([
        jnp.array([_ml_LL(llim, lam_R, etasq, xi),
                   _ml_LL(ulim, lam_R, etasq, xi)]), root_ll])
    cand_ok = jnp.concatenate([
        jnp.array([dll[0] < esp, dll[-1] > -esp]), cell_ok])
    masked = jnp.where(cand_ok, cand_ll, -jnp.inf)
    best = jnp.argmax(masked)
    maxdelta = jnp.exp(cand_logdelta[best])
    vg = jnp.sum(etasq / (lam_R + maxdelta)) / n
    return REMLEResult(reml_ll=masked[best], delta=maxdelta, vg=vg,
                       ve=vg * maxdelta)


def mle(y, K, X=None) -> REMLEResult:
    """emma.MLE(y, X, K): full-ML variance components."""
    y = jnp.asarray(y, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    K = jnp.asarray(K, y.dtype)
    n = y.shape[0]
    if X is None:
        X = jnp.ones((n, 1), y.dtype)
    lam_R, vec = eigen_R(K, X)
    xi = jnp.linalg.eigvalsh(K)[::-1]
    etas = vec.T @ y
    return mle_from_eigen(etas, lam_R, xi)


# ---------------------------------------------------------------------------
# Remaining emma.R public surface (pipeline-unused, kept for API parity):
# emma.kinship (emma.R:1-47), emma.ML.LRT (emma.R:495-741),
# emma.REML.t (emma.R:1013-1274). Implemented for the no-Z, complete-data
# configuration (the only one the reference ecosystem exercises), vectorized
# over variants instead of R's row loops.
# ---------------------------------------------------------------------------

def emma_kinship(snps, method: str = "additive", use: str = "all"):
    """emma.kinship: SNP matrix (m markers x n individuals, values in
    {0, 0.5, 1, NaN}) -> (n, n) similarity kinship.

    K[i,j] = mean over markers of x_i x_j + (1-x_i)(1-x_j); hets are
    resolved to major/minor per `method`; NaNs mean-imputed (`use="all"`)
    or their markers dropped (`use="complete.obs"`). The double GEMM
    replaces R's O(n^2 m) pair loop (emma.R:40-46)."""
    S = jnp.asarray(snps, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    isna = jnp.isnan(S)
    row_mean = jnp.nanmean(S, axis=1, keepdims=True)
    het = ~isna & (S == 0.5)
    if method == "dominant":
        S = jnp.where(het, (row_mean > 0.5).astype(S.dtype), S)
    elif method == "recessive":
        S = jnp.where(het, (row_mean < 0.5).astype(S.dtype), S)
    elif method == "additive":
        d = jnp.where(het, (row_mean > 0.5).astype(S.dtype), S)
        r = jnp.where(het, (row_mean < 0.5).astype(S.dtype), S)
        S = jnp.concatenate([d, r], axis=0)
        isna = jnp.concatenate([isna, isna], axis=0)
    else:
        raise ValueError(f"unknown method {method!r}")
    if use == "all":
        fill = jnp.nanmean(S, axis=1, keepdims=True)
        S = jnp.where(jnp.isnan(S), jnp.broadcast_to(fill, S.shape), S)
    elif use == "complete.obs":
        import numpy as _np
        Sh = _np.asarray(S)
        S = jnp.asarray(Sh[~_np.any(_np.isnan(Sh), axis=1)])
    else:
        raise ValueError(f"unknown use {use!r}")
    K = (S.T @ S + (1.0 - S).T @ (1.0 - S)) / S.shape[0]
    n = K.shape[0]
    return K.at[jnp.arange(n), jnp.arange(n)].set(1.0)


def emma_ML_LRT(ys, xs, K, ngrids: int = 100, llim: float = -10.0,
                ulim: float = 10.0):
    """emma.ML.LRT: per-variant ML likelihood-ratio test.

    ys (g, n) or (n,) phenotypes, xs (m, n) variants, K (n, n). Returns a
    dict with ps/stats/ML1s/ML0s/vgs/ves shaped (m, g). Monomorphic
    variants get p = 1 (emma.R:541-555); complete data, no Z."""
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    ys = jnp.atleast_2d(jnp.asarray(ys, dt))
    xs = jnp.atleast_2d(jnp.asarray(xs, dt))
    K = jnp.asarray(K, dt)
    n = ys.shape[1]
    X0 = jnp.ones((n, 1), dt)
    xi = jnp.linalg.eigvalsh(K)[::-1]
    lam0, vec0 = eigen_R(K, X0)

    ml0 = jnp.stack([mle_from_eigen(vec0.T @ y, lam0, xi,
                                    llim=llim, ulim=ulim, ngrids=ngrids).reml_ll
                     for y in ys])                               # (g,)

    def per_variant(x):
        X = jnp.column_stack([X0, x])
        lam1, vec1 = eigen_R(K, X)
        res = [mle_from_eigen(vec1.T @ y, lam1, xi, llim=llim, ulim=ulim,
                              ngrids=ngrids) for y in ys]
        ml1 = jnp.stack([r.reml_ll for r in res])
        vg = jnp.stack([r.vg for r in res])
        ve = jnp.stack([r.ve for r in res])
        return ml1, vg, ve

    from .lmm import chi2_sf_df1
    ml1s, vgs, ves, stats_, ps = [], [], [], [], []
    for x in xs:
        mono = (jnp.mean(x) <= 0) | (jnp.mean(x) >= 1)
        ml1, vg, ve = per_variant(x)
        stat = jnp.where(mono, jnp.nan, 2.0 * (ml1 - ml0))
        ps.append(jnp.where(mono, 1.0, chi2_sf_df1(jnp.maximum(stat, 0.0))))
        stats_.append(stat)
        ml1s.append(jnp.where(mono, jnp.nan, ml1))
        vgs.append(jnp.where(mono, jnp.nan, vg))
        ves.append(jnp.where(mono, jnp.nan, ve))
    return {"ps": jnp.stack(ps), "stats": jnp.stack(stats_),
            "ML1s": jnp.stack(ml1s), "ML0s": jnp.broadcast_to(ml0, (len(xs), ys.shape[0])),
            "vgs": jnp.stack(vgs), "ves": jnp.stack(ves)}


def _t_sf(t, df):
    """Student-t survival function via the regularized incomplete beta."""
    from jax.scipy.special import betainc
    x = df / (df + t * t)
    return 0.5 * betainc(df / 2.0, 0.5, x)


def emma_REML_t(ys, xs, K, ngrids: int = 100, llim: float = -10.0,
                ulim: float = 10.0):
    """emma.REML.t: per-variant REML Wald t-test.

    Per variant: REMLE under X = [1, x]; rotate by U = Q diag(1/sqrt(xi +
    delta)) from the unrestricted eigendecomposition (emma.R:1089-1101);
    stat = beta / sqrt(iXX[q,q] vg); p = 2 P(T_{n-2} > |stat|)
    (emma.R:1263). Monomorphic variants get p = 1."""
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    ys = jnp.atleast_2d(jnp.asarray(ys, dt))
    xs = jnp.atleast_2d(jnp.asarray(xs, dt))
    K = jnp.asarray(K, dt)
    n = ys.shape[1]
    q1 = 2
    X0 = jnp.ones((n, 1), dt)
    xi, Q = jnp.linalg.eigh(K)
    xi, Q = xi[::-1], Q[:, ::-1]

    out_stats, out_ps, out_vgs, out_ves, out_remls = [], [], [], [], []
    for x in xs:
        mono = (jnp.mean(x) <= 0) | (jnp.mean(x) >= 1)
        X = jnp.column_stack([X0, x])
        lam1, vec1 = eigen_R(K, X)
        st_j, p_j, vg_j, ve_j, reml_j = [], [], [], [], []
        for y in ys:
            res = remle_from_eigen(vec1.T @ y, lam1, llim=llim, ulim=ulim,
                                   ngrids=ngrids)
            U = Q * jnp.sqrt(1.0 / (xi + res.delta))[None, :]
            yt = U.T @ y
            Xt = U.T @ X
            iXX = jnp.linalg.inv(Xt.T @ Xt)
            beta = iXX @ (Xt.T @ yt)
            stat = beta[q1 - 1] / jnp.sqrt(iXX[q1 - 1, q1 - 1] * res.vg)
            st_j.append(stat)
            p_j.append(2.0 * _t_sf(jnp.abs(stat), jnp.asarray(n - q1, dt)))
            vg_j.append(res.vg)
            ve_j.append(res.ve)
            reml_j.append(res.reml_ll)
        out_stats.append(jnp.where(mono, jnp.nan, jnp.stack(st_j)))
        out_ps.append(jnp.where(mono, 1.0, jnp.stack(p_j)))
        out_vgs.append(jnp.where(mono, jnp.nan, jnp.stack(vg_j)))
        out_ves.append(jnp.where(mono, jnp.nan, jnp.stack(ve_j)))
        out_remls.append(jnp.where(mono, jnp.nan, jnp.stack(reml_j)))
    return {"ps": jnp.stack(out_ps), "stats": jnp.stack(out_stats),
            "vgs": jnp.stack(out_vgs), "ves": jnp.stack(out_ves),
            "REMLs": jnp.stack(out_remls), "dfs": jnp.full((len(xs), ys.shape[0]),
                                                           n - q1, dt)}


def is_positive_semi_definite(K, tol: float = 1e-8) -> bool:
    """PSD gate on the kinship matrix (transform_and_permute_phenotypes.R:54-57)."""
    w = jnp.linalg.eigvalsh(jnp.asarray(K))
    return bool(w.min() >= -tol * max(1.0, float(w.max())))
