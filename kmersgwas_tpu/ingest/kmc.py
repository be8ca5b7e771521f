"""KMC k-mer database (.kmc_pre/.kmc_suf) import/export.

The reference consumes databases produced by the external KMC 3 counter
through its C++ API (SURVEY.md §2.4; the binary and API submodule are absent
from the checkout). This module reads and writes the KMC1 on-disk layout so
existing KMC databases can be imported into this framework's count-file
format (and ours exported for KMC-based tooling):

  .kmc_pre: 'KMCP' | prefix index: (4^lut_prefix_len + 1) uint64 record
            offsets | header | kmc_version u32 (0 for KMC1) |
            header_size u32 | 'KMCP'
      header (KMC1): kmer_length u32, mode u32, counter_size u32,
            lut_prefix_length u32, min_count u32, max_count u32,
            total_kmers u64, both_strands u8, pad[3]
  .kmc_suf: 'KMCS' | records | 'KMCS'
      record: ceil((k - lut_prefix_len)/4) suffix bytes (4 symbols/byte,
            first symbol in the top 2 bits) + counter_size LE counter bytes

Records are sorted by the full k-mer; prefix p's records span
[prefix_index[p], prefix_index[p+1]).

STATUS: implemented from the published KMC format description and
round-trip tested against itself; byte-level compatibility with real KMC 3
output is untested in this environment (no KMC binary available). Treat
`read_kmc` failures on external files as a format-version issue and report
them.
"""
from __future__ import annotations

import struct

import numpy as np

PRE_MARKER = b"KMCP"
SUF_MARKER = b"KMCS"
_HDR1 = struct.Struct("<6IQB3x")   # KMC1 header


def write_kmc1(path_base: str, kmers: np.ndarray, counts: np.ndarray, k: int,
               lut_prefix_len: int | None = None, counter_size: int = 4,
               min_count: int = 1, max_count: int = (1 << 32) - 1,
               both_strands: bool = True) -> None:
    """Write a KMC1-format database from sorted k-mer codes + counts."""
    kmers = np.asarray(kmers, dtype=np.uint64)
    counts = np.asarray(counts, dtype=np.uint64)
    if np.any(np.diff(kmers.astype(np.int64)) < 0):
        order = np.argsort(kmers)
        kmers, counts = kmers[order], counts[order]
    if lut_prefix_len is None:
        # KMC heuristic: prefix table ~ a few MB; keep small for tests
        lut_prefix_len = max(1, min(12, k - 1, int(np.log2(len(kmers) + 2) // 2)))
    n_pref = 1 << (2 * lut_prefix_len)
    suf_sym = k - lut_prefix_len
    suf_bytes = (suf_sym + 3) // 4

    prefix = (kmers >> np.uint64(2 * suf_sym)).astype(np.int64)
    # prefix index: first record of each prefix, +guard
    idx = np.searchsorted(prefix, np.arange(n_pref + 1), side="left").astype("<u8")

    with open(path_base + ".kmc_pre", "wb") as f:
        f.write(PRE_MARKER)
        idx.tofile(f)
        hdr = _HDR1.pack(k, 0, counter_size, lut_prefix_len,
                         min_count, min(max_count, (1 << 32) - 1),
                         len(kmers), 1 if both_strands else 0)
        f.write(hdr)
        f.write(struct.pack("<II", 0, len(hdr)))   # kmc_version=0 (KMC1)
        f.write(PRE_MARKER)

    # suffix records: symbols packed 4/byte, first symbol in top 2 bits
    suf_mask = np.uint64((1 << (2 * suf_sym)) - 1) if suf_sym else np.uint64(0)
    suffix = kmers & suf_mask
    rec = np.zeros((len(kmers), suf_bytes + counter_size), dtype=np.uint8)
    for b in range(suf_bytes):
        # byte b holds symbols 4b..4b+3 (symbol 0 = most significant)
        byte = np.zeros(len(kmers), dtype=np.uint64)
        for s in range(4):
            sym_i = 4 * b + s
            if sym_i >= suf_sym:
                break
            shift = np.uint64(2 * (suf_sym - 1 - sym_i))
            sym = (suffix >> shift) & np.uint64(3)
            byte |= sym << np.uint64(6 - 2 * s)
        rec[:, b] = byte.astype(np.uint8)
    for c in range(counter_size):
        rec[:, suf_bytes + c] = ((counts >> np.uint64(8 * c))
                                 & np.uint64(0xFF)).astype(np.uint8)

    with open(path_base + ".kmc_suf", "wb") as f:
        f.write(SUF_MARKER)
        rec.tofile(f)
        f.write(SUF_MARKER)


def read_kmc(path_base: str):
    """Read a KMC1 database -> (sorted kmer codes uint64, counts uint64, k)."""
    with open(path_base + ".kmc_pre", "rb") as f:
        data = f.read()
    if data[:4] != PRE_MARKER or data[-4:] != PRE_MARKER:
        raise ValueError("not a KMC prefix file (bad markers)")
    kmc_version, header_size = struct.unpack("<II", data[-12:-4])
    if kmc_version != 0:
        raise NotImplementedError(
            f"KMC database version {kmc_version:#x} not supported (KMC1 only)")
    hdr = data[-12 - header_size:-12]
    (k, mode, counter_size, lut_prefix_len, min_count, max_count,
     total_kmers, both_strands) = _HDR1.unpack(hdr[:_HDR1.size])
    n_pref = 1 << (2 * lut_prefix_len)
    idx = np.frombuffer(data, dtype="<u8", count=n_pref + 1, offset=4)
    if idx[-1] != total_kmers:
        raise ValueError("prefix index does not cover all records")

    suf_sym = k - lut_prefix_len
    suf_bytes = (suf_sym + 3) // 4
    rec_bytes = suf_bytes + counter_size
    with open(path_base + ".kmc_suf", "rb") as f:
        sdata = f.read()
    if sdata[:4] != SUF_MARKER or sdata[-4:] != SUF_MARKER:
        raise ValueError("not a KMC suffix file (bad markers)")
    body = np.frombuffer(sdata, dtype=np.uint8,
                         count=total_kmers * rec_bytes, offset=4)
    rec = body.reshape(total_kmers, rec_bytes)

    # prefixes: expand run lengths from the index
    counts_per_pref = np.diff(idx.astype(np.int64))
    prefixes = np.repeat(np.arange(n_pref, dtype=np.uint64), counts_per_pref)

    suffix = np.zeros(total_kmers, dtype=np.uint64)
    for b in range(suf_bytes):
        byte = rec[:, b].astype(np.uint64)
        for s in range(4):
            sym_i = 4 * b + s
            if sym_i >= suf_sym:
                break
            sym = (byte >> np.uint64(6 - 2 * s)) & np.uint64(3)
            suffix |= sym << np.uint64(2 * (suf_sym - 1 - sym_i))
    counts = np.zeros(total_kmers, dtype=np.uint64)
    for c in range(counter_size):
        counts |= rec[:, suf_bytes + c].astype(np.uint64) << np.uint64(8 * c)

    kmers = (prefixes << np.uint64(2 * suf_sym)) | suffix
    return kmers, counts, k
