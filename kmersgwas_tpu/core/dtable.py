"""Device-native table format (.dtable): pre-squeezed packed bit-planes.

At the fused kernel's throughput the host-side work of the reference-format
stream (per-batch column squeeze + repack, ~136 B/k-mer for 1008 samples)
becomes the bottleneck. A `.dtable` materializes the squeeze ONCE for a
given accession subset:

  header: magic 'KGTD' | uint32 version | uint64 n_rows | uint32 n_used |
          uint32 w32 | uint32 kmer_len | uint32 min_count_applied
  body:   three contiguous sections —
          kmers   (n_rows) uint64
          popcnt  (n_rows) uint16
          planes  (n_rows, w32) uint32   (LSB-first, lane-padded)

Streaming a batch is then one memmap slice + one device_put: no unpack, no
popcount, no filtering on the host. Row indices in the .dtable refer back to
the source .table rows (stored as a fourth section) so winner export still
resolves against the canonical table.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from . import formats
from .table import KmersTableReader

MAGIC = b"KGTD"
VERSION = 1
_HDR = struct.Struct("<4sIQIIII")


@dataclass
class DTableHeader:
    n_rows: int
    n_used: int
    w32: int
    kmer_len: int
    min_count: int


def build_dtable(table_base: str, out_path: str, *, names_to_use=None,
                 min_count: int = 1, batch_rows: int = 1 << 20,
                 start_row: int = 0,
                 end_row: int | None = None) -> DTableHeader:
    """One streaming pass: .table -> .dtable for the given accession subset,
    dropping rows that fail the two-tail MAC filter at `min_count`.

    start_row/end_row restrict the pass to a contiguous .table row span —
    used by the multi-process drivers so each host caches only its own
    k-mer range (parallel/multihost.host_row_span).

    Fully out-of-core: each section streams to its own spill file as batches
    arrive, then the sections are stitched behind the header — peak memory
    is O(batch), never O(table)."""
    import os
    reader = KmersTableReader(table_base, names_to_use=names_to_use)
    spills = {s: str(out_path) + f".tmp.{s}"
              for s in ("kmers", "popcnt", "planes", "rows")}
    n_rows = 0
    fh = {s: open(p, "wb") for s, p in spills.items()}
    try:
        for batch in reader.iter_batches(batch_rows, min_count,
                                         start_row=start_row,
                                         end_row=end_row):
            batch.kmers.astype("<u8").tofile(fh["kmers"])
            batch.popcnt.astype("<u2").tofile(fh["popcnt"])
            np.ascontiguousarray(batch.packed).astype("<u4").tofile(fh["planes"])
            batch.row_index.astype("<i8").tofile(fh["rows"])
            n_rows += batch.n_rows
    finally:
        for f in fh.values():
            f.close()
    hdr = DTableHeader(n_rows=n_rows, n_used=reader.n_used, w32=reader.w32,
                       kmer_len=reader.header.kmer_len, min_count=min_count)
    with open(str(out_path), "wb") as f:
        f.write(_HDR.pack(MAGIC, VERSION, n_rows, reader.n_used, reader.w32,
                          reader.header.kmer_len, min_count))
        for section in ("kmers", "popcnt", "planes", "rows"):
            with open(spills[section], "rb") as pf:
                while True:
                    chunk = pf.read(1 << 26)
                    if not chunk:
                        break
                    f.write(chunk)
            os.remove(spills[section])
    return hdr


class DTableReader:
    """Zero-copy batch streaming from a .dtable via memmap sections."""

    def __init__(self, path: str):
        self.path = str(path)
        with open(self.path, "rb") as f:
            magic, ver, n_rows, n_used, w32, klen, minc = _HDR.unpack(
                f.read(_HDR.size))
        if magic != MAGIC or ver != VERSION:
            raise ValueError("not a kmersgwas_tpu .dtable")
        self.hdr = DTableHeader(n_rows, n_used, w32, klen, minc)
        off = _HDR.size
        self.kmers = np.memmap(self.path, dtype="<u8", mode="r", offset=off,
                               shape=(n_rows,))
        off += 8 * n_rows
        self.popcnt = np.memmap(self.path, dtype="<u2", mode="r", offset=off,
                                shape=(n_rows,))
        off += 2 * n_rows
        self.planes = np.memmap(self.path, dtype="<u4", mode="r", offset=off,
                                shape=(n_rows, w32))
        off += 4 * n_rows * w32
        self.src_rows = np.memmap(self.path, dtype="<i8", mode="r", offset=off,
                                  shape=(n_rows,))

    def iter_batches(self, batch_size: int, start_row: int = 0):
        """Yield (start, planes, popcnt_f32, src_rows) memmap slices."""
        for s in range(start_row, self.hdr.n_rows, batch_size):
            e = min(s + batch_size, self.hdr.n_rows)
            yield s, self.planes[s:e], self.popcnt[s:e].astype(np.float32), \
                np.asarray(self.src_rows[s:e])
