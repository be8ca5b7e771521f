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


def is_positive_semi_definite(K, tol: float = 1e-8) -> bool:
    """PSD gate on the kinship matrix (transform_and_permute_phenotypes.R:54-57)."""
    w = jnp.linalg.eigvalsh(jnp.asarray(K))
    return bool(w.min() >= -tol * max(1.0, float(w.max())))
