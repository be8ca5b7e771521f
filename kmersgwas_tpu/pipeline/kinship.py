"""Kinship-from-table driver (emma_kinship_kmers equivalent).

Streams MAC-filtered table batches into the exact int8-MXU XNOR accumulator
(ops/kinship.py). Reference: src/emma_kinship_kmers.cpp:77-111 — batches of
2^20 rows, min_count = ceil(n * maf), normalize by #used k-mers, diagonal 1.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..core.table import KmersTableReader
from ..ops.kinship import KinshipAccumulator


def kinship_from_table(table_base: str, *, maf: float = 0.05,
                       batch_size: int = 1 << 20, names_to_use=None,
                       checkpoint_path: str | None = None,
                       checkpoint_every: int = 50, progress=None) -> np.ndarray:
    from . import checkpoint as ckpt
    reader = KmersTableReader(table_base, names_to_use=names_to_use)
    min_count = math.ceil(reader.n_used * maf)
    acc = KinshipAccumulator(n_used=reader.n_used, n_pad=reader.w32 * 32)
    start_row = 0
    if checkpoint_path:
        resumed = ckpt.load_kinship_state(checkpoint_path)
        if resumed is not None:
            acc.total, acc.n_rows, start_row = resumed
    batch_i = 0
    for batch in reader.iter_batches(batch_size, min_count, start_row=start_row):
        if batch.n_rows == 0:
            continue
        # no zero-padding here: an all-zero padded row would still shift
        # every pairwise XNOR count (+1), so batches run at their true size
        # (full-size batches share one compiled program; the final partial
        # batch costs one extra compile)
        acc.add(jnp.asarray(batch.packed))
        batch_i += 1
        if checkpoint_path and batch_i % checkpoint_every == 0:
            acc.flush()
            ckpt.save_kinship_state(checkpoint_path, acc.total, acc.n_rows,
                                    int(batch.row_index[-1]) + 1)
        if progress is not None:
            progress(batch.n_rows)
    return acc.finalize()


def write_kinship(path, K: np.ndarray) -> None:
    """Tab-separated kinship matrix, like emma_kinship_kmers' stdout TSV
    (src/emma_kinship_kmers.cpp:104-111)."""
    with open(str(path), "w") as f:
        for row in K:
            f.write("\t".join(repr(float(v)) if v != int(v) else str(int(v))
                              for v in row) + "\n")


def read_kinship(path) -> np.ndarray:
    return np.loadtxt(str(path), delimiter="\t", dtype=np.float64, ndmin=2)
