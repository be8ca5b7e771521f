"""SNP arm of the GWAS pipeline (kmers_gwas.py:170-223 equivalent).

Two modes, as in the reference:

  one_step  — exact LMM on ALL SNPs for every phenotype column (the
              reference farms GEMMA `-lmm 2` per column; here one vmapped
              ML-LRT scan per column).
  two_steps — for permutation columns, the GRAMMAR-Gamma approximate scan
              (snps/assoc.py) prefilters the top-N SNPs and the exact LMM
              runs only on those; the REAL phenotype column always gets the
              exact model on all SNPs (kmers_gwas.py:175-178).

Missing genotypes are mean-dose imputed and SNPs outside the effective MAF
band are skipped, mirroring GEMMA's `-maf x -miss 0.5` handling.
"""
from __future__ import annotations

import math
from pathlib import Path

import numpy as np

from ..snps.assoc import most_associated_snps
from ..snps.bed import load_bed_planes
from ..stats import lmm as lmm_mod


def _dose_matrix(planes, n):
    """(M, n) mean-imputed dose matrix + allele frequencies."""
    shifts = np.arange(32, dtype=np.uint32)

    def unpack(packed):
        bits = ((packed[:, :, None] >> shifts) & np.uint32(1))
        return bits.reshape(packed.shape[0], -1)[:, :n].astype(np.float64)

    pres = unpack(np.asarray(planes.presence))
    het = unpack(np.asarray(planes.het))
    nonmiss = unpack(np.asarray(planes.nonmiss))
    dose = pres + 0.5 * het
    total = nonmiss.sum(axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = np.where(total > 0, dose.sum(axis=1) / np.maximum(total, 1), 0.0)
        af = np.where(total > 0, mean, 0.0)
    dose = np.where(nonmiss > 0, dose, mean[:, None])
    miss_frac = 1.0 - total / n
    return dose, af, miss_frac


def run_snp_arm(snps_matrix: str, outdir: str, used_accessions,
                pheno_untransformed: np.ndarray,
                pheno_transformed: np.ndarray, pheno_names,
                K_eigvals, K_eigvecs, *, mode: str, n_snps: int,
                maf: float, mac: float, n_permutations: int,
                lmm_grid: int = 64, lmm_refine: int = 40) -> dict:
    """-> {"thresholds": {...}, "best_pvals": {...}}; writes snps/ artifacts."""
    assert mode in ("one_step", "two_steps")
    out = Path(outdir) / "snps"
    (out / "output").mkdir(parents=True, exist_ok=True)

    planes = load_bed_planes(snps_matrix, used_accessions)
    n = planes.n_samples
    effective_maf = max(maf, float(mac) / n)
    dose, af, miss_frac = _dose_matrix(planes, n)
    usable = ((af >= effective_maf) & (af <= 1 - effective_maf)
              & (miss_frac <= 0.5))
    bim_lines = open(snps_matrix + ".bim").read().splitlines()

    best_pvals = {}
    for j, cname in enumerate(pheno_names):
        yj = pheno_untransformed[:, j]
        if mode == "two_steps" and j > 0:
            idx_lists, _ = most_associated_snps(
                planes, pheno_transformed[:, j:j + 1].astype(np.float32),
                n_best=n_snps, maf=maf, mac=mac)
            cand = idx_lists[0]
            cand = cand[usable[cand]]
        else:
            cand = np.nonzero(usable)[0]
        if len(cand) == 0:
            best_pvals[cname] = 0.0
            continue
        res = lmm_mod.lmm_scan(dose[cand], yj - yj.mean(),
                               K_eigvals, K_eigvecs,
                               n_grid=lmm_grid, n_refine=lmm_refine)
        pvals = np.asarray(res.p_lrt, dtype=np.float64)
        lam = np.asarray(res.log10_lambda, dtype=np.float64)
        with open(out / "output" / f"{cname}.assoc.txt", "w") as f:
            f.write("chr\trs\tps\tn_miss\tallele1\tallele0\taf\tl_mle\tp_lrt\n")
            for i, s in enumerate(cand):
                tok = bim_lines[int(s)].split("\t")
                f.write(f"{tok[0]}\t{tok[1]}\t{tok[3]}\t0\t{tok[4]}\t{tok[5]}\t"
                        f"{af[s]:.6f}\t{10**lam[i]:.6e}\t{pvals[i]:.6e}\n")
        best_pvals[cname] = -math.log10(max(float(pvals.min()), 1e-300))

    from ..stats.transform import permutation_threshold
    th = {}
    if n_permutations:
        th["5per"] = permutation_threshold(best_pvals, n_permutations, 0.05)
        th["10per"] = permutation_threshold(best_pvals, n_permutations, 0.10)
        (out / "threshold_5per").write_text(f"{th['5per']:f}\n")
        (out / "threshold_10per").write_text(f"{th['10per']:f}\n")
        # pass files from the real phenotype's assoc output
        real = pheno_names[0]
        lines = open(out / "output" / f"{real}.assoc.txt").read().splitlines()[1:]
        for key, frac in (("5per", th["5per"]), ("10per", th["10per"])):
            with open(out / f"pass_threshold_{key}", "w") as f:
                for ln in lines:
                    p = float(ln.split("\t")[8])
                    if -math.log10(max(p, 1e-300)) > frac:
                        f.write(ln + "\n")
    with open(out / "best_pvals", "w") as f:
        for name, v in best_pvals.items():
            f.write(f"{name}\t{v}\n")
    return {"thresholds": th, "best_pvals": best_pvals}
