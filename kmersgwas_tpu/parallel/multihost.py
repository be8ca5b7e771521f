"""Multi-host (pod-slice) orchestration of the scan and kinship.

Topology (SURVEY.md §2.5 mapping): the k-mer axis is range-partitioned
across HOSTS at the reference's slice boundaries (DCN never carries table
rows), and within each global batch the rows are sharded across every DEVICE
of the global mesh (ICI carries only top-k candidates / kinship psum).

Each process:
  1. `init_distributed(...)` — jax.distributed handshake
  2. finds its contiguous row span of the sorted `.table` via
     `host_row_span` (binary search on the memory-mapped k-mer column)
  3. streams its span; `make_global_batch` assembles the per-process
     arrays into one globally-sharded array per step (every process must
     call in lockstep, SPMD-style)
  4. the sharded scan step (parallel/sharding.py) merges candidates across
     all devices; the final state is replicated, so any host can export.

Single-host multi-device works identically (the span is the whole table).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import formats
from ..core.table import KmersTableReader
from .sharding import AXIS


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None) -> None:
    """jax.distributed.initialize wrapper; no-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh() -> Mesh:
    return Mesh(np.array(jax.devices()).reshape(-1), (AXIS,))


def host_row_span(table_base: str, host_id: int, n_hosts: int):
    """-> (start_row, end_row) of this host's contiguous k-mer range.

    The table is sorted by k-mer code, so the reference's range-partition
    boundaries (core/codec.step_bounds) become contiguous row spans found by
    binary search over the memory-mapped k-mer column.
    """
    reader = KmersTableReader(table_base)
    if n_hosts <= 1:
        return 0, reader.n_rows_total
    from .sharding import host_range_of_kmer_space
    lo_k, hi_k = host_range_of_kmer_space(host_id, n_hosts,
                                          reader.header.kmer_len)
    wf = reader.header.row_words()
    mm = np.memmap(reader.base + ".table", dtype="<u8", mode="r",
                   offset=formats.TableHeader.HEADER_BYTES)
    kmers = mm.reshape(-1, 1 + wf)[:, 0]
    start = int(np.searchsorted(kmers, np.uint64(lo_k), side="right")
                if host_id else 0)
    end = int(np.searchsorted(kmers, np.uint64(hi_k), side="right"))
    return start, end


def make_global_batch(mesh: Mesh, local_arrays, pad_value=0):
    """Per-process host arrays -> globally sharded device arrays.

    Every process contributes its local rows; the global array is the
    concatenation over processes, sharded over the k-mer axis. Rows are
    padded per-process to a common multiple of the local device count.
    All processes must call this in lockstep with equal local row counts
    (pad upstream to the fixed global batch size / n_processes).
    """
    out = []
    sharding = NamedSharding(mesh, P(AXIS))
    for a in local_arrays:
        a = np.asarray(a)
        out.append(jax.make_array_from_process_local_data(sharding, a))
    return out


def replicated(mesh: Mesh, *arrays):
    sharding = NamedSharding(mesh, P())
    return [jax.make_array_from_process_local_data(sharding, np.asarray(a))
            for a in arrays]
