"""Direct unit tests for the zero-copy host feed (pipeline/feed.py).

The feed is exercised end-to-end by the scan/checkpoint/mp suites; these
tests pin its CONTRACT directly: full batches are raw memmap views (the
zero-copy invariant the 65M rows/s steady-state rate depends on), the
tail batch is the padded scratch with exact padding semantics, stream
positions are exact dtable row indices, and a start_row resume replays
the identical suffix. Reference hot-loop analogue: the Load half of
src/associate_kmers.cpp:123-148.
"""
import numpy as np

from kmersgwas_tpu.core import dtable as dt_mod
from kmersgwas_tpu.ops import topk as topk_ops
from kmersgwas_tpu.pipeline import feed as feed_mod

from test_pipeline import build_population


def _dtable(tmp_path, n_samples=16, n_kmers=300):
    pop = build_population(tmp_path, n_samples=n_samples, n_kmers=n_kmers)
    path = str(tmp_path / "pop.dtable")
    dt_mod.build_dtable(pop["base"], path, min_count=2, batch_rows=64)
    return dt_mod.DTableReader(path)


def test_dtable_feed_contract(tmp_path):
    dt = _dtable(tmp_path)
    n = dt.hdr.n_rows
    pad_to = 96                      # not a divisor of n -> real tail batch
    assert n % pad_to, "fixture must exercise the tail path"
    batches = list(feed_mod.dtable_feed(dt, pad_to))

    # positions are exact cumulative row indices, ending at n_rows
    pos = 0
    for r, packed, popcnt, lo, hi, pos_after, pats in batches:
        assert packed.shape == (pad_to, dt.hdr.w32)
        assert pos_after == min(pos + pad_to, n)
        if r == pad_to:
            # zero-copy invariant: the full batch IS the memmap slice
            assert np.shares_memory(packed, dt.planes)
        else:
            # tail: padded scratch, zero rows + zero popcnt past r
            assert not np.shares_memory(packed, dt.planes)
            assert not packed[r:].any()
            assert not popcnt[r:].any()
        # row ids decode to the dtable's source rows for the valid rows
        el, eh = topk_ops.encode_rows(np.asarray(dt.src_rows[pos:pos + r]))
        assert np.array_equal(lo[:r], el)
        assert np.array_equal(hi[:r], eh)
        assert np.array_equal(np.asarray(popcnt[:r]),
                              np.asarray(dt.popcnt[pos:pos + r],
                                         dtype=np.float32))
        pos = pos_after
    assert pos == n

    # every table row passes through exactly once, bit-identical
    got = np.concatenate([np.asarray(b[1][:b[0]]) for b in batches])
    assert np.array_equal(got, np.asarray(dt.planes))


def test_dtable_feed_resume_suffix(tmp_path):
    dt = _dtable(tmp_path)
    pad_to = 96
    full = list(feed_mod.dtable_feed(dt, pad_to))
    start = full[1][5]               # pos_after of the second batch
    resumed = list(feed_mod.dtable_feed(dt, pad_to, start_row=start))
    assert len(resumed) == len(full) - 2
    for a, b in zip(resumed, full[2:]):
        assert a[0] == b[0] and a[5] == b[5]
        assert np.array_equal(np.asarray(a[1][:a[0]]),
                              np.asarray(b[1][:b[0]]))
        assert np.array_equal(a[3][:a[0]], b[3][:b[0]])
        assert np.array_equal(a[4][:a[0]], b[4][:b[0]])


def test_kinship_feed_zero_copy(tmp_path):
    dt = _dtable(tmp_path)
    n = dt.hdr.n_rows
    got, pos = [], 0
    for s, r, planes in feed_mod.kinship_feed(dt, 96):
        assert s == pos
        assert np.shares_memory(planes, dt.planes)   # always a raw slice
        got.append(np.asarray(planes))
        pos = s + r
    assert pos == n
    assert np.array_equal(np.concatenate(got), np.asarray(dt.planes))
