"""k-mers presence/absence table construction.

Equivalent of `build_kmers_table` (src/build_kmers_table.cpp +
src/kmers_merge_multiple_databaes.cpp): align every sample's sorted k-mer
list against the sorted master list and pack per-sample presence bits into
uint64 words, LSB-first (accession j -> word j//64, bit j%64).

The reference does a hash-join per 1/5000th range slice; since both sides
are sorted, a vectorized `searchsorted` merge is equivalent and row order is
identical (master-list order). Output is bit-exact: header AA BB CC DD +
uint64 N + uint32 k, then rows of uint64 kmer + ceil(N/64) words
(kmers_merge_multiple_databaes.cpp:54-73).
"""
from __future__ import annotations

import numpy as np

from ..core import formats


def presence_words(master: np.ndarray, sample_kmer_lists, chunk_rows: int = 1 << 22):
    """Yield (start_row, pa_words chunk) for the master list vs N samples."""
    n_acc = len(sample_kmer_lists)
    n_words = (n_acc + 63) // 64
    for start in range(0, len(master), chunk_rows):
        chunk = master[start:start + chunk_rows]
        words = np.zeros((len(chunk), n_words), dtype=np.uint64)
        for acc_i, sk in enumerate(sample_kmer_lists):
            idx = np.searchsorted(sk, chunk)
            idx_c = np.minimum(idx, max(len(sk) - 1, 0))
            present = (sk[idx_c] == chunk) if len(sk) else np.zeros(len(chunk), bool)
            words[present, acc_i // 64] |= np.uint64(1 << (acc_i % 64))
        yield start, words


def build_table(sample_list_paths, accession_names, master_list_path,
                out_base: str, k: int, chunk_rows: int = 1 << 22) -> int:
    """Write `<out_base>.table` + `<out_base>.names`; returns #rows."""
    master = formats.read_kmer_list(master_list_path)
    samples = [formats.read_kmer_list_split_flags(p)[0] for p in sample_list_paths]
    formats.write_names(out_base, accession_names)
    with open(str(out_base) + ".table", "wb") as f:
        formats.write_table_header(f, len(accession_names), k)
        for start, words in presence_words(master, samples, chunk_rows):
            formats.write_table_rows(f, master[start:start + len(words)], words)
    return len(master)
