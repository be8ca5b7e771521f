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


def _apply_Z(K, Z, dtype):
    """emma's Z incidence matrix (n observations x t groups, emma.R:398-400):
    the model y = X b + Z u + e with u ~ N(0, vg K_t) is identical to the
    no-Z model with K_eff = Z K Z' (n x n) — every likelihood quantity
    (y'Py, |H|, |X'Hinv X|) depends on K only through Z K Z' + delta I, so
    one dense K_eff reproduces emma.R's specialised w.Z eigen routines
    (emma.R:55-83) exactly, including the delta^(n-t) null-space factors
    (they are the ~zero eigenvalues of Z K Z')."""
    if Z is None:
        return jnp.asarray(K, dtype)
    Z = jnp.asarray(Z, dtype)
    return Z @ jnp.asarray(K, dtype) @ Z.T


def remle(y, K, X=None, Z=None) -> REMLEResult:
    """emma.REMLE(y, X, K, Z) with X defaulting to the intercept column."""
    y = jnp.asarray(y, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    K = _apply_Z(K, Z, y.dtype)
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


def mle(y, K, X=None, Z=None) -> REMLEResult:
    """emma.MLE(y, X, K, Z): full-ML variance components (Z as in remle)."""
    y = jnp.asarray(y, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    K = _apply_Z(K, Z, y.dtype)
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
# emma.REML.t (emma.R:1013-1274), for the no-Z configuration.
#
# R's loops do a fresh O(n^3) eigen_R(K, [1, x]) per variant (emma.R:574-580,
# 1139-1145). Here the per-variant eigendecomposition is eliminated with the
# standard rotated-REML identities: with H = K + delta*I and K = U Xi U'
# eigendecomposed ONCE,
#
#   sum_i etas_i^2/(lam_i+delta)  =  y'Py
#       where P = Hinv - Hinv X (X'Hinv X)^-1 X'Hinv, and
#   prod_i (lam_i+delta)          =  |H| |X'Hinv X| / |X'X|
#
# (lam_i, etas = the eigen_R system of S(K+I)S). In the rotated basis every
# quantity is an O(n q^2) weighted sum with weights w = 1/(xi+delta), so the
# grid + bisection search vmaps cleanly over (variants, phenotypes); dLL is
# jax.grad of the same expression (identical roots). Missing data follows
# R's semantics by subsetting individuals (per-phenotype-row for NAs in ys,
# per-variant for NAs in xs) and re-running the same machinery on the subset.
# ---------------------------------------------------------------------------


def _rot_stats(logdelta, xi, Xt, yt):
    """Weighted stats at one delta in the K-eigenbasis: w = 1/(xi+delta),
    G = X'Hinv X, r = X'Hinv y, beta = G^-1 r, yPy = y'Py."""
    delta = jnp.exp(logdelta)
    w = 1.0 / (xi + delta)
    Xw = Xt * w[:, None]
    G = Xt.T @ Xw                                    # (q, q)
    r = Xw.T @ yt                                    # (q,)
    beta = jnp.linalg.solve(G, r)
    yPy = jnp.sum(w * yt * yt) - r @ beta
    return w, G, beta, yPy


def _reml_ll_rot(logdelta, xi, Xt, yt, logdet_XtX):
    """Restricted LL at log-delta — equal to emma.R:145-149 evaluated on the
    eigen_R system of S(K+I)S with X = the columns of Xt (rotated)."""
    n, q = Xt.shape
    nq = n - q
    delta = jnp.exp(logdelta)
    w, G, beta, yPy = _rot_stats(logdelta, xi, Xt, yt)
    _, logdetG = jnp.linalg.slogdet(G)
    logdetSHS = jnp.sum(jnp.log(xi + delta)) + logdetG - logdet_XtX
    return 0.5 * (nq * (jnp.log(nq / (2 * jnp.pi)) - 1.0 - jnp.log(yPy))
                  - logdetSHS)


def _ml_ll_rot(logdelta, xi, Xt, yt):
    """Full-ML LL at log-delta (emma.R:120-124 on the rotated system)."""
    n = Xt.shape[0]
    delta = jnp.exp(logdelta)
    _, _, _, yPy = _rot_stats(logdelta, xi, Xt, yt)
    return 0.5 * (n * (jnp.log(n / (2 * jnp.pi)) - 1.0 - jnp.log(yPy))
                  - jnp.sum(jnp.log(xi + delta)))


def _grid_opt_rot(ll_fn, llim, ulim, esp, ngrids, n_bisect, n_cells=8):
    """Grid + sign-change bisection maximizer of ll_fn(logdelta) — the same
    search as remle_from_eigen (emma.R:414-452) with dLL = jax.grad(ll_fn).
    Up to n_cells sign-change cells are refined (R refines every one; more
    than a few stationary points never occur for these likelihoods)."""
    dll_fn = jax.grad(ll_fn)
    logdelta = jnp.linspace(llim, ulim, ngrids + 1)
    dll = jax.vmap(dll_fn)(logdelta)
    lo0, hi0 = logdelta[:-1], logdelta[1:]
    cell_ok = (dll[:-1] * dll[1:] < -esp * esp) & (dll[:-1] > 0) & (dll[1:] < 0)
    # first n_cells sign-change cells, ascending (top_k on ok minus index)
    sel = jnp.argsort(jnp.where(cell_ok, jnp.arange(ngrids),
                                ngrids + jnp.arange(ngrids)))[:n_cells]
    sel_ok = cell_ok[sel]

    def bisect(lo, hi):
        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            d = dll_fn(mid)
            return jnp.where(d > 0, mid, lo), jnp.where(d > 0, hi, mid)
        lo, hi = jax.lax.fori_loop(0, n_bisect, body, (lo, hi))
        return 0.5 * (lo + hi)

    roots = jax.vmap(bisect)(lo0[sel], hi0[sel])
    cand = jnp.concatenate([jnp.array([llim, ulim]), roots])
    cand_ll = jax.vmap(ll_fn)(cand)
    cand_ok = jnp.concatenate([
        jnp.array([dll[0] < esp, dll[-1] > -esp]), sel_ok])
    masked = jnp.where(cand_ok, cand_ll, -jnp.inf)
    best = jnp.argmax(masked)
    return cand[best], masked[best]


def _remle_rot(xi, Xt, yt, llim, ulim, esp, ngrids, n_bisect) -> REMLEResult:
    n, q = Xt.shape
    _, logdet_XtX = jnp.linalg.slogdet(Xt.T @ Xt)
    ll_fn = lambda g: _reml_ll_rot(g, xi, Xt, yt, logdet_XtX)
    best, ll = _grid_opt_rot(ll_fn, llim, ulim, esp, ngrids, n_bisect)
    delta = jnp.exp(best)
    _, _, _, yPy = _rot_stats(best, xi, Xt, yt)
    vg = yPy / (n - q)
    return REMLEResult(reml_ll=ll, delta=delta, vg=vg, ve=vg * delta)


def _mle_rot(xi, Xt, yt, llim, ulim, esp, ngrids, n_bisect) -> REMLEResult:
    n = Xt.shape[0]
    ll_fn = lambda g: _ml_ll_rot(g, xi, Xt, yt)
    best, ll = _grid_opt_rot(ll_fn, llim, ulim, esp, ngrids, n_bisect)
    delta = jnp.exp(best)
    _, _, _, yPy = _rot_stats(best, xi, Xt, yt)
    vg = yPy / n
    return REMLEResult(reml_ll=ll, delta=delta, vg=vg, ve=vg * delta)

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


@functools.partial(jax.jit, static_argnames=("ngrids", "n_bisect"))
def _ml_lrt_complete(ys, xs, K, X0, llim, ulim, ngrids: int, n_bisect: int):
    """Vectorized core of emma.ML.LRT for complete data: one eigh(K), then
    alt-model MLEs vmapped over (variants, phenotypes). X0 (n, q0) null
    covariates (the intercept by default upstream). Returns
    (ml1 (m,g), vg (m,g), ve (m,g), ml0 (g,))."""
    esp = 1e-10
    xi, U = jnp.linalg.eigh(K)                       # order irrelevant here
    yts = ys @ U                                     # (g, n)
    xts = xs @ U                                     # (m, n)
    X0t = U.T @ X0                                   # (n, q0)

    def null_one(yt):
        r = _mle_rot(xi, X0t, yt, llim, ulim, esp, ngrids, n_bisect)
        return r.reml_ll

    ml0 = jax.vmap(null_one)(yts)                    # (g,)

    def alt_one(xt, yt):
        Xt = jnp.concatenate([X0t, xt[:, None]], axis=1)
        r = _mle_rot(xi, Xt, yt, llim, ulim, esp, ngrids, n_bisect)
        return r.reml_ll, r.vg, r.ve

    ml1, vg, ve = jax.vmap(lambda xt: jax.vmap(
        lambda yt: alt_one(xt, yt))(yts))(xts)       # (m, g) each
    return ml1, vg, ve, ml0


@functools.partial(jax.jit, static_argnames=("ngrids", "n_bisect"))
def _ml_lrt_gathered(ys_b, xs_b, Ks_b, X0_b, llim, ulim,
                     ngrids: int, n_bisect: int):
    """NA-variant tail core (r5): each of the b variants carries its OWN
    gathered subset — (b, s) phenotype/genotype, (b, s, s) kinship,
    (b, s, q0) null covariates, equal subset size s — and the whole tail
    batch runs as ONE vmapped dispatch (per-variant eigh + null MLE + alt
    MLE). Replaces the per-distinct-mask Python loop: a dataset with many
    distinct NA masks costs one dispatch per distinct subset SIZE.
    Returns (ml1, vg, ve, ml0), each (b,)."""
    esp = 1e-10

    def one(y, x, Ki, X0i):
        xi, U = jnp.linalg.eigh(Ki)
        yt = y @ U
        xt = x @ U
        X0t = U.T @ X0i
        r0 = _mle_rot(xi, X0t, yt, llim, ulim, esp, ngrids, n_bisect)
        Xt = jnp.concatenate([X0t, xt[:, None]], axis=1)
        r1 = _mle_rot(xi, Xt, yt, llim, ulim, esp, ngrids, n_bisect)
        return r1.reml_ll, r1.vg, r1.ve, r0.reml_ll

    return jax.vmap(one)(ys_b, xs_b, Ks_b, X0_b)


@functools.partial(jax.jit, static_argnames=("ngrids", "n_bisect"))
def _reml_t_gathered(ys_b, xs_b, Ks_b, X0_b, llim, ulim,
                     ngrids: int, n_bisect: int):
    """REML.t twin of _ml_lrt_gathered: one vmapped dispatch per distinct
    subset size. Returns (stat, vg, ve, reml), each (b,)."""
    esp = 1e-10

    def one(y, x, Ki, X0i):
        xi, U = jnp.linalg.eigh(Ki)
        yt = y @ U
        xt = x @ U
        X0t = U.T @ X0i
        Xt = jnp.concatenate([X0t, xt[:, None]], axis=1)
        res = _remle_rot(xi, Xt, yt, llim, ulim, esp, ngrids, n_bisect)
        _, G, beta, _ = _rot_stats(jnp.log(res.delta), xi, Xt, yt)
        iXXqq = jnp.linalg.inv(G)[-1, -1]
        stat = beta[-1] / jnp.sqrt(iXXqq * res.vg)
        return stat, res.vg, res.ve, res.reml_ll

    return jax.vmap(one)(ys_b, xs_b, Ks_b, X0_b)


def _na_tail_by_size(na_idx, vids, xs_na):
    """Group NA-variant indices by their gathered subset SIZE; returns
    {size: (idxs list, masks list)} with masks = vids & ~xs_na[i]."""
    import numpy as _np
    by_size: dict = {}
    for i in na_idx:
        vv = vids & ~xs_na[i]
        by_size.setdefault(int(vv.sum()), ([], []))
        by_size[int(vv.sum())][0].append(int(i))
        by_size[int(vv.sum())][1].append(vv)
    return by_size


def emma_ML_LRT(ys, xs, K, Z=None, X0=None, ngrids: int = 100,
                llim: float = -10.0, ulim: float = 10.0, n_bisect: int = 60):
    """emma.ML.LRT: per-variant ML likelihood-ratio test (emma.R:495-741).

    ys (g, n) or (n,) phenotypes, xs (m, n) variants, K (n, n). Returns a
    dict with ps/stats/ML1s/ML0s/vgs/ves shaped (m, g). Monomorphic variants
    get p = 1 (emma.R:541-555). No per-variant eigendecomposition: one
    eigh(K) + rotated likelihoods, vmapped over (m, g). Missing data (NaN)
    follows R's subsetting semantics: NaNs in a ys row re-run the complete
    core on that row's complete individuals (emma.R:611-614); NaNs in an xs
    row additionally subset per variant (emma.R:683-691, O(n^3) each — rare
    rows only)."""
    import numpy as _np
    from .lmm import chi2_sf_df1
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    ys = jnp.atleast_2d(jnp.asarray(ys, dt))
    xs = jnp.atleast_2d(jnp.asarray(xs, dt))
    K = _apply_Z(K, Z, dt)
    m, g = xs.shape[0], ys.shape[0]
    n_obs = ys.shape[1]
    X0 = (jnp.ones((n_obs, 1), dt) if X0 is None
          else jnp.asarray(X0, dt))

    ys_na = _np.isnan(_np.asarray(ys))
    xs_na = _np.isnan(_np.asarray(xs))

    def run_rows(ys_sub, xs_sub, K_sub, X0_sub):
        ml1, vg, ve, ml0 = _ml_lrt_complete(ys_sub, xs_sub, K_sub, X0_sub,
                                            llim, ulim, ngrids, n_bisect)
        return ml1, vg, ve, jnp.broadcast_to(ml0[None, :], ml1.shape)

    if not ys_na.any() and not xs_na.any():
        ml1, vg, ve, ml0 = run_rows(ys, xs, K, X0)
    else:
        # per-phenotype-row subsets (g is small; m stays vectorized)
        cols = []
        for j in range(g):
            vids = ~ys_na[j]
            yj = ys[j, vids][None, :]
            Kj = K[_np.ix_(vids, vids)]
            X0j = X0[vids]
            clean = ~xs_na[:, vids].any(axis=1)
            o_ml1 = _np.full((m,), _np.nan)
            o_vg, o_ve, o_ml0 = o_ml1.copy(), o_ml1.copy(), o_ml1.copy()
            if clean.any():
                r = run_rows(yj, xs[_np.flatnonzero(clean)][:, vids], Kj, X0j)
                for o, v in zip((o_ml1, o_vg, o_ve, o_ml0), r):
                    o[clean] = _np.asarray(v)[:, 0]
            # NA variants: R subsets per variant (emma.R:683-691). All
            # variants whose gathered subset has the same SIZE run as ONE
            # vmapped dispatch with per-variant gathered K/y/x/X0
            # (_ml_lrt_gathered, r5) — a dataset with 50 distinct NA masks
            # over a handful of sizes costs a handful of dispatches, not a
            # per-mask Python/eigh loop
            ys_h, xs_h = _np.asarray(ys), _np.asarray(xs)
            K_h, X0_h = _np.asarray(K), _np.asarray(X0)
            for s, (idxs, masks) in _na_tail_by_size(
                    _np.flatnonzero(~clean), vids, xs_na).items():
                ys_b = _np.stack([ys_h[j, vv] for vv in masks])
                xs_b = _np.stack([xs_h[i, vv]
                                  for i, vv in zip(idxs, masks)])
                Ks_b = _np.stack([K_h[_np.ix_(vv, vv)] for vv in masks])
                X0_b = _np.stack([X0_h[vv] for vv in masks])
                r = _ml_lrt_gathered(ys_b, xs_b, Ks_b, X0_b, llim, ulim,
                                     ngrids, n_bisect)
                for o, v in zip((o_ml1, o_vg, o_ve, o_ml0), r):
                    o[idxs] = _np.asarray(v)
            cols.append((o_ml1, o_vg, o_ve, o_ml0))
        ml1, vg, ve, ml0 = (jnp.asarray(_np.stack([c[t] for c in cols], axis=1),
                                        dt) for t in range(4))

    x_mean = jnp.nanmean(xs, axis=1)
    mono = ((x_mean <= 0) | (x_mean >= 1))[:, None]  # (m, 1)
    stat = jnp.where(mono, jnp.nan, 2.0 * (ml1 - ml0))
    return {"ps": jnp.where(mono, 1.0, chi2_sf_df1(jnp.maximum(stat, 0.0))),
            "stats": stat,
            "ML1s": jnp.where(mono, jnp.nan, ml1),
            "ML0s": ml0,
            "vgs": jnp.where(mono, jnp.nan, vg),
            "ves": jnp.where(mono, jnp.nan, ve)}


def _t_sf(t, df):
    """Student-t survival function via the regularized incomplete beta."""
    from jax.scipy.special import betainc
    x = df / (df + t * t)
    return 0.5 * betainc(df / 2.0, 0.5, x)


@functools.partial(jax.jit, static_argnames=("ngrids", "n_bisect"))
def _reml_t_complete(ys, xs, K, X0, llim, ulim, ngrids: int, n_bisect: int):
    """Vectorized core of emma.REML.t for complete data. Per (variant,
    phenotype): REMLE under X = [X0, x] in the K-eigenbasis, then the Wald
    stat = beta_x / sqrt((X'Hinv X)^-1[-1,-1] vg) — identical to rotating
    by U = Q diag(1/sqrt(xi+delta)) (emma.R:1089-1101, 1160-1164) since
    Xt'Xt there equals X'Hinv X here. Returns (stat, vg, ve, reml), (m,g)."""
    esp = 1e-10
    xi, U = jnp.linalg.eigh(K)
    yts = ys @ U
    xts = xs @ U
    X0t = U.T @ X0

    def one(xt, yt):
        Xt = jnp.concatenate([X0t, xt[:, None]], axis=1)
        res = _remle_rot(xi, Xt, yt, llim, ulim, esp, ngrids, n_bisect)
        _, G, beta, _ = _rot_stats(jnp.log(res.delta), xi, Xt, yt)
        iXXqq = jnp.linalg.inv(G)[-1, -1]
        stat = beta[-1] / jnp.sqrt(iXXqq * res.vg)
        return stat, res.vg, res.ve, res.reml_ll

    return jax.vmap(lambda xt: jax.vmap(lambda yt: one(xt, yt))(yts))(xts)


def emma_REML_t(ys, xs, K, Z=None, X0=None, ngrids: int = 100,
                llim: float = -10.0, ulim: float = 10.0, n_bisect: int = 60):
    """emma.REML.t: per-variant REML Wald t-test (emma.R:1013-1274).

    stat = beta / sqrt(iXX[q,q] vg); p = 2 P(T_{n-2} > |stat|) (emma.R:1263).
    Monomorphic variants get p = 1. One eigh(K) + rotated likelihoods,
    vmapped over (m, g); NaN handling as in emma_ML_LRT (subset semantics)."""
    import numpy as _np
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    ys = jnp.atleast_2d(jnp.asarray(ys, dt))
    xs = jnp.atleast_2d(jnp.asarray(xs, dt))
    K = _apply_Z(K, Z, dt)
    m, g = xs.shape[0], ys.shape[0]
    n = ys.shape[1]
    X0 = (jnp.ones((n, 1), dt) if X0 is None else jnp.asarray(X0, dt))
    q1 = X0.shape[1] + 1

    ys_na = _np.isnan(_np.asarray(ys))
    xs_na = _np.isnan(_np.asarray(xs))

    if not ys_na.any() and not xs_na.any():
        stat, vg, ve, reml = _reml_t_complete(ys, xs, K, X0, llim, ulim,
                                              ngrids, n_bisect)
        dfs = jnp.full((m, g), n - q1, dt)
    else:
        o_stat = _np.full((m, g), _np.nan)
        o_vg, o_ve, o_reml, o_dfs = (o_stat.copy() for _ in range(4))
        for j in range(g):
            vids = ~ys_na[j]
            yj = ys[j, vids][None, :]
            Kj = K[_np.ix_(vids, vids)]
            X0j = X0[vids]
            clean = ~xs_na[:, vids].any(axis=1)
            if clean.any():
                r = _reml_t_complete(yj, xs[_np.flatnonzero(clean)][:, vids],
                                     Kj, X0j, llim, ulim, ngrids, n_bisect)
                for o, v in zip((o_stat, o_vg, o_ve, o_reml), r):
                    o[clean, j] = _np.asarray(v)[:, 0]
                o_dfs[clean, j] = int(vids.sum()) - q1
            # NA variants batched by gathered subset SIZE (see emma_ML_LRT)
            ys_h, xs_h = _np.asarray(ys), _np.asarray(xs)
            K_h, X0_h = _np.asarray(K), _np.asarray(X0)
            for s, (idxs, masks) in _na_tail_by_size(
                    _np.flatnonzero(~clean), vids, xs_na).items():
                ys_b = _np.stack([ys_h[j, vv] for vv in masks])
                xs_b = _np.stack([xs_h[i, vv]
                                  for i, vv in zip(idxs, masks)])
                Ks_b = _np.stack([K_h[_np.ix_(vv, vv)] for vv in masks])
                X0_b = _np.stack([X0_h[vv] for vv in masks])
                r = _reml_t_gathered(ys_b, xs_b, Ks_b, X0_b, llim, ulim,
                                     ngrids, n_bisect)
                for o, v in zip((o_stat, o_vg, o_ve, o_reml), r):
                    o[idxs, j] = _np.asarray(v)
                o_dfs[idxs, j] = s - q1
        stat, vg, ve, reml, dfs = (jnp.asarray(o, dt) for o in
                                   (o_stat, o_vg, o_ve, o_reml, o_dfs))

    x_mean = jnp.nanmean(xs, axis=1)
    mono = ((x_mean <= 0) | (x_mean >= 1))[:, None]
    ps = 2.0 * _t_sf(jnp.abs(stat), dfs)
    return {"ps": jnp.where(mono, 1.0, ps),
            "stats": jnp.where(mono, jnp.nan, stat),
            "vgs": jnp.where(mono, jnp.nan, vg),
            "ves": jnp.where(mono, jnp.nan, ve),
            "REMLs": jnp.where(mono, jnp.nan, reml),
            "dfs": dfs}


def mle_noX(y, K, Z=None, llim: float = -10.0, ulim: float = 10.0,
            ngrids: int = 100, n_bisect: int = 60) -> REMLEResult:
    """emma.MLE.noX (emma.R:291-390): full-ML variance components with NO
    fixed effects — the likelihood uses the unrestricted rotation
    (xi, U) = eigh(K) with etas = U'y directly."""
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    y = jnp.asarray(y, dt)
    K_eff = _apply_Z(K, Z, dt)
    n = y.shape[0]
    xi, U = jnp.linalg.eigh(K_eff)
    etasq = (U.T @ y) ** 2

    def ll_fn(logdelta):
        delta = jnp.exp(logdelta)
        return 0.5 * (n * (jnp.log(n / (2 * jnp.pi)) - 1.0
                           - jnp.log(jnp.sum(etasq / (xi + delta))))
                      - jnp.sum(jnp.log(xi + delta)))

    best, ll = _grid_opt_rot(ll_fn, llim, ulim, 1e-10, ngrids, n_bisect)
    delta = jnp.exp(best)
    vg = jnp.sum(etasq / (xi + delta)) / n
    return REMLEResult(reml_ll=ll, delta=delta, vg=vg, ve=vg * delta)


def emma_test(ys, xs, K, Z=None, X0=None, use_MLE: bool = False,
              use_LRT: bool = False, ngrids: int = 100,
              llim: float = -10.0, ulim: float = 10.0):
    """emma.test (emma.R:743-1010): dispatch wrapper over the per-variant
    tests — REML Wald t by default, ML likelihood-ratio when use_MLE or
    use_LRT. Only the single-df, no-extra-covariate configuration is
    supported: the reference function's generalized branches reference
    undefined variables (`m`, `g`, emma.R:777-784) and reject every Z
    (`stopifnot(Z == NULL)` errors on NULL itself, emma.R:766), so they are
    unrunnable as shipped; here Z is supported via K_eff = Z K Z'."""
    if use_MLE or use_LRT:
        return emma_ML_LRT(ys, xs, K, Z=Z, X0=X0, ngrids=ngrids, llim=llim,
                           ulim=ulim)
    return emma_REML_t(ys, xs, K, Z=Z, X0=X0, ngrids=ngrids, llim=llim,
                       ulim=ulim)


def is_positive_semi_definite(K, tol: float = 1e-8) -> bool:
    """PSD gate on the kinship matrix (transform_and_permute_phenotypes.R:54-57)."""
    w = jnp.linalg.eigvalsh(jnp.asarray(K))
    return bool(w.min() >= -tol * max(1.0, float(w.max())))
