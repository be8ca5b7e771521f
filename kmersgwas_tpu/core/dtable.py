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
                 min_count: int = 1, batch_rows: int = 1 << 20) -> DTableHeader:
    """One streaming pass: .table -> .dtable for the given accession subset,
    dropping rows that fail the two-tail MAC filter at `min_count`."""
    reader = KmersTableReader(table_base, names_to_use=names_to_use)
    tmp = str(out_path) + ".tmp"
    kmers_l, pop_l, rows_l = [], [], []
    n_rows = 0
    with open(tmp, "wb") as planes_f:
        for batch in reader.iter_batches(batch_rows, min_count):
            planes_f.write(np.ascontiguousarray(batch.packed).tobytes())
            kmers_l.append(batch.kmers)
            pop_l.append(batch.popcnt.astype(np.uint16))
            rows_l.append(batch.row_index)
            n_rows += batch.n_rows
    hdr = DTableHeader(n_rows=n_rows, n_used=reader.n_used, w32=reader.w32,
                       kmer_len=reader.header.kmer_len, min_count=min_count)
    with open(str(out_path), "wb") as f:
        f.write(_HDR.pack(MAGIC, VERSION, n_rows, reader.n_used, reader.w32,
                          reader.header.kmer_len, min_count))
        if n_rows:
            np.concatenate(kmers_l).astype("<u8").tofile(f)
            np.concatenate(pop_l).astype("<u2").tofile(f)
            with open(tmp, "rb") as pf:
                while True:
                    chunk = pf.read(1 << 26)
                    if not chunk:
                        break
                    f.write(chunk)
            np.concatenate(rows_l).astype("<i8").tofile(f)
    import os
    os.remove(tmp)
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
