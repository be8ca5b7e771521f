"""PLINK bed genotype loading into device bit-planes.

Equivalent of MultipleSNPsDataBases' constructor
(src/snps_multiple_databases.cpp:69-150): read a .bed for a named sample
subset and split each SNP into three packed planes

  presence  — dubit 11 (homozygous alt)          -> bit 1
  nonmiss   — dubit != 01 (genotype observed)     -> bit 1
  het       — dubit 10 (heterozygous)             -> bit 1

plus per-SNP scalars: S_gi (alt dose, het = 1/2), S_gi^2, and the
observed-sample count N.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core import formats
from ..core.table import LANE_PAD


@dataclass
class SNPPlanes:
    presence: np.ndarray    # (M, W32) uint32
    nonmiss: np.ndarray     # (M, W32) uint32
    het: np.ndarray         # (M, W32) uint32
    s_gi: np.ndarray        # (M,) float32  sum of doses (het counts 1/2)
    s_gi2: np.ndarray       # (M,) float32  sum of squared doses
    total: np.ndarray       # (M,) float32  observed samples
    n_samples: int
    n_pad: int


def load_bed_planes(base_name: str, samples_to_use=None) -> SNPPlanes:
    fam_names, dubits = formats.read_bed(base_name)
    if samples_to_use is None:
        order = np.arange(len(fam_names))
        used = list(fam_names)
    else:
        pos = {n: i for i, n in enumerate(fam_names)}
        try:
            order = np.array([pos[n] for n in samples_to_use], dtype=np.int64)
        except KeyError as e:
            raise ValueError(f"sample missing from fam file: {e.args[0]}") from None
        used = list(samples_to_use)
    d = dubits[:, order]                     # (M, n) in {0,1,2,3}
    n = len(used)
    n_pad = ((n + LANE_PAD - 1) // LANE_PAD) * LANE_PAD

    presence = (d == 3)
    nonmiss = (d != 1)
    het = (d == 2)

    def pack(bits):
        padded = np.zeros((bits.shape[0], n_pad), dtype=np.uint8)
        padded[:, :n] = bits
        return np.packbits(padded, axis=1, bitorder="little").view("<u4")

    dose = presence.astype(np.float64) + 0.5 * het
    return SNPPlanes(
        presence=pack(presence), nonmiss=pack(nonmiss), het=pack(het),
        s_gi=dose.sum(axis=1).astype(np.float32),
        s_gi2=(dose * dose).sum(axis=1).astype(np.float32),
        total=nonmiss.sum(axis=1).astype(np.float32),
        n_samples=n, n_pad=n_pad)
