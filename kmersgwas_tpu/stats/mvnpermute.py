"""Covariance-preserving phenotype permutations (mvnpermute equivalent).

The reference calls the R package `mvnpermute` (Abney 2015; used at
src/R/transform_and_permute_phenotypes.R:74-78) to draw permutation
replicates that preserve the phenotype's covariance structure V:

  1. GLS fit of fixed effects:  b = (X' V^-1 X)^-1 X' V^-1 y
  2. whiten the residuals:      z = L^-1 (y - Xb)   with V = L L'
  3. permute z, re-color:       y* = Xb + L P z

Implemented with a Cholesky factor and `jax.random.permutation`; all `nr`
replicates are drawn in one batched triangular matmul.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mvnpermute(key, y, X, V, nr: int):
    """-> (n, nr) permutation replicates of y under covariance V."""
    y = jnp.asarray(y)
    X = jnp.asarray(X, y.dtype)
    V = jnp.asarray(V, y.dtype)
    n = y.shape[0]
    L = jnp.linalg.cholesky(V)
    Vinv_X = jax.scipy.linalg.cho_solve((L, True), X)
    b = jnp.linalg.solve(X.T @ Vinv_X, Vinv_X.T @ y)
    fix = X @ b
    resid = y - fix
    z = jax.scipy.linalg.solve_triangular(L, resid, lower=True)
    perms = jax.vmap(lambda k: jax.random.permutation(k, z))(
        jax.random.split(key, nr))            # (nr, n)
    return fix[:, None] + L @ perms.T
