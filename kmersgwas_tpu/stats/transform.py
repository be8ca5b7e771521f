"""Phenotype transformation + permutation stage.

Equivalent of src/R/transform_and_permute_phenotypes.R: center the phenotype,
verify the kinship matrix is PSD, estimate variance components with REMLE,
build the covariance V = vg K + ve I, draw `n_permutations`
covariance-preserving permutations, and GRAMMAR-transform every column by
V^-1 (the reference uses MASS::ginv; V is PD here so a Cholesky solve is the
same inverse). Produces both the untransformed table (consumed by the exact
LMM stage) and the transformed table (consumed by the score scan), matching
the two files the R script writes (:87-88).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import emma as emma_mod
from .mvnpermute import mvnpermute


@dataclass
class TransformResult:
    vg: float
    ve: float
    heritability: float
    names: list                  # column names: phenotype_value, P1..Pn
    phenotypes: np.ndarray       # (n, 1 + n_perm) centered, untransformed
    transformed: np.ndarray      # (n, 1 + n_perm) V^-1-transformed


def transform_and_permute(y: np.ndarray, K: np.ndarray, n_permutations: int,
                          seed: int = 0, check_psd: bool = True) -> TransformResult:
    y = np.asarray(y, dtype=np.float64)
    K = np.asarray(K, dtype=np.float64)
    n = y.shape[0]
    yc = y - y.mean()

    if check_psd and not emma_mod.is_positive_semi_definite(K):
        raise ValueError("Kinship matrix is not positive semi-definite")

    res = emma_mod.remle(yc, K)
    vg, ve = float(res.vg), float(res.ve)
    V = vg * K + ve * np.eye(n)

    cols = [yc]
    if n_permutations > 0:
        key = jax.random.PRNGKey(seed)
        perms = mvnpermute(key, jnp.asarray(yc), jnp.ones((n, 1)),
                           jnp.asarray(V), n_permutations)
        cols.extend(np.asarray(perms, dtype=np.float64).T)
    pheno = np.stack(cols, axis=1)       # (n, 1 + n_perm)

    # GRAMMAR transform: one Cholesky solve for all columns
    L = np.linalg.cholesky(V)
    z = np.linalg.solve(L, pheno)
    trans = np.linalg.solve(L.T, z)

    names = ["phenotype_value"] + [f"P{i}" for i in range(1, n_permutations + 1)]
    return TransformResult(vg=vg, ve=ve, heritability=vg / (vg + ve),
                           names=names, phenotypes=pheno, transformed=trans)


def permutation_threshold(best_pvals: dict, n_permutations: int, p: float) -> float:
    """Family-wise threshold from permutation best p-values.

    Reproduces functions.py:107-112: collect -log10(best p) of permutations
    P1..Pn, sort descending, take the int(n*p)-1 order statistic.
    """
    vals = [best_pvals[f"P{i}"] for i in range(1, n_permutations + 1)]
    vals.sort(reverse=True)
    return vals[int(n_permutations * p) - 1]
