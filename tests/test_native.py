"""Native C++ ingest library vs NumPy reference implementations.

Outputs must be byte-identical: the native path is the production route and
the NumPy path is the executable specification.
"""
import numpy as np
import pytest

from kmersgwas_tpu import native
from kmersgwas_tpu.core import codec, formats
from kmersgwas_tpu.ingest import counter, strand, tablebuild, union

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")

K = 15


def _write_fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s}\n")


def _random_seqs(rng, n=30, length=120):
    return ["".join("ACGT"[b] for b in rng.integers(0, 4, size=length))
            for _ in range(n)]


def _read_counts(path):
    rec = np.fromfile(path, dtype=[("k", "<u8"), ("c", "<u8")])
    return rec["k"].copy(), rec["c"].copy()


@pytest.mark.parametrize("canonize,min_count", [(False, 1), (True, 1), (True, 2)])
def test_native_count_matches_numpy(tmp_path, canonize, min_count):
    rng = np.random.default_rng(0)
    fa = tmp_path / "r.fa"
    _write_fasta(fa, _random_seqs(rng))
    out = tmp_path / "counts.bin"
    n = native.count([fa], K, canonize, min_count, out)
    kk, cc = _read_counts(out)
    ek, ec = counter.count_kmers_in_files([fa], K, canonize=canonize,
                                          min_count=min_count)
    assert n == len(ek)
    assert np.array_equal(kk, ek)
    assert np.array_equal(cc, ec)


def test_native_count_fastq_with_invalid(tmp_path):
    fq = tmp_path / "r.fq"
    fq.write_text("@a\nACGTNACGTACGTACGTAC\n+\n" + "I" * 19 + "\n"
                  "@b\nTTTTTTTTTTTTTTTTTT\n+\n" + "I" * 18 + "\n")
    out = tmp_path / "c.bin"
    native.count([fq], K, False, 1, out)
    kk, cc = _read_counts(out)
    ek, ec = counter.count_kmers_in_files([fq], K, canonize=False)
    assert np.array_equal(kk, ek) and np.array_equal(cc, ec)


def test_native_count_gzip(tmp_path):
    import gzip
    rng = np.random.default_rng(1)
    seqs = _random_seqs(rng, n=10)
    gz = tmp_path / "r.fa.gz"
    with gzip.open(gz, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s}\n")
    plain = tmp_path / "r.fa"
    _write_fasta(plain, seqs)
    o1, o2 = tmp_path / "a.bin", tmp_path / "b.bin"
    native.count([gz], K, True, 1, o1)
    native.count([plain], K, True, 1, o2)
    assert open(o1, "rb").read() == open(o2, "rb").read()


def _sample_counts(tmp_path, rng, tag):
    fa = tmp_path / f"{tag}.fa"
    _write_fasta(fa, _random_seqs(rng, n=20))
    canon = tmp_path / f"{tag}.canon"
    nonc = tmp_path / f"{tag}.nonc"
    native.count([fa], K, True, 2, canon)
    native.count([fa], K, False, 1, nonc)
    return canon, nonc


def test_native_strand_merge_matches_numpy(tmp_path):
    rng = np.random.default_rng(2)
    canon, nonc = _sample_counts(tmp_path, rng, "s")
    out_native = tmp_path / "nat.kmers"
    native.strand_merge(canon, nonc, K, out_native)
    ck, _ = _read_counts(canon)
    nk, _ = _read_counts(nonc)
    out_np = tmp_path / "np.kmers"
    strand.write_strand_list(out_np, ck, nk, K)
    assert open(out_native, "rb").read() == open(out_np, "rb").read()


def test_native_union_and_table_match_numpy(tmp_path):
    rng = np.random.default_rng(3)
    paths = []
    for s in range(6):
        canon, nonc = _sample_counts(tmp_path, rng, f"u{s}")
        p = tmp_path / f"u{s}.kmers"
        native.strand_merge(canon, nonc, K, p)
        paths.append(p)
    m_native = tmp_path / "master_nat.bin"
    n1 = native.list_union(paths, K, 2, 0.2, m_native)
    m_np = tmp_path / "master_np.bin"
    n2, _ = union.build_master_list(paths, m_np, K, mac=2, min_strand_frac=0.2,
                                    collect_stats=False)
    assert n1 == n2
    assert open(m_native, "rb").read() == open(m_np, "rb").read()

    names = [f"acc{s}" for s in range(6)]
    t_native = str(tmp_path / "t_nat")
    native.build_table(paths, names, m_native, t_native, K)
    t_np = str(tmp_path / "t_np")
    tablebuild.build_table(paths, names, m_np, t_np, K)
    assert open(t_native + ".table", "rb").read() == open(t_np + ".table", "rb").read()
    assert open(t_native + ".names").read() == open(t_np + ".names").read()


def test_native_squeeze_pack_matches_numpy(tmp_path):
    from kmersgwas_tpu import native as nat
    from kmersgwas_tpu.core import table as table_mod
    rng = np.random.default_rng(9)
    # synthetic raw rows: 70 accessions -> wf=2 file words
    n_file = 70
    wf = 2
    r = 500
    raw = rng.integers(0, 1 << 63, size=(r, 1 + wf), dtype=np.uint64)
    # used subset: shuffled 40 columns
    cols = rng.permutation(n_file)[:40].astype(np.int64)
    n_used, w32 = 40, 4
    kk, packed, pop, keep = nat.squeeze_pack(raw, cols, n_used, w32, 3)
    # numpy oracle
    bits = ((raw[:, (cols // 64) + 1] >> (cols % 64).astype(np.uint64))
            & np.uint64(1)).astype(np.uint8)
    pc = bits.sum(axis=1)
    padded = np.zeros((r, w32 * 32), np.uint8)
    padded[:, :n_used] = bits
    expect_packed = np.packbits(padded, axis=1, bitorder="little").view("<u4")
    assert np.array_equal(kk, raw[:, 0])
    assert np.array_equal(packed, expect_packed)
    assert np.array_equal(pop, pc.astype(np.int32))
    assert np.array_equal(keep, (pc >= 3) & (pc <= n_used - 3))


def test_reader_native_path_equals_numpy(tmp_path, monkeypatch):
    from kmersgwas_tpu.core import table as table_mod
    import test_formats_ingest as tfi
    fx = tfi.full_pipeline_fixture(tmp_path)
    sub = [fx["names"][i] for i in [5, 1, 9, 3, 7]]
    rd = table_mod.KmersTableReader(fx["out_base"], names_to_use=sub)
    # force both paths over the same table and compare
    monkeypatch.setattr(table_mod, "_NATIVE_SQUEEZE", True)
    native_batches = list(rd.iter_batches(batch_size=41, min_count=1))
    monkeypatch.setattr(table_mod, "_NATIVE_SQUEEZE", False)
    numpy_batches = list(rd.iter_batches(batch_size=41, min_count=1))
    assert len(native_batches) == len(numpy_batches)
    for a, b in zip(native_batches, numpy_batches):
        assert np.array_equal(a.kmers, b.kmers)
        assert np.array_equal(a.packed, b.packed)
        assert np.array_equal(a.popcnt, b.popcnt)
        assert np.array_equal(a.row_index, b.row_index)


def test_native_union_stats_artifacts_match_numpy(tmp_path):
    """Native list_union with write_stats emits the same companion files
    (.no_pass_kmers, .shareness, .stats.*) as the Python route, byte for
    byte (list_kmers_found_in_multiple_samples.cpp:209-218 parity)."""
    rng = np.random.default_rng(5)
    paths = []
    for s in range(5):
        canon, nonc = _sample_counts(tmp_path, rng, f"w{s}")
        p = tmp_path / f"w{s}.kmers"
        native.strand_merge(canon, nonc, K, p)
        paths.append(p)
    m_nat = tmp_path / "mstats_nat.bin"
    n1 = native.list_union(paths, K, 2, 0.3, m_nat, write_stats=True)
    m_np = tmp_path / "mstats_np.bin"
    n2, _ = union.build_master_list(paths, m_np, K, mac=2, min_strand_frac=0.3)
    assert n1 == n2
    for suffix in ("", ".no_pass_kmers", ".shareness", ".stats.only_canonical",
                   ".stats.only_non_canonical", ".stats.both"):
        a = open(str(m_nat) + suffix, "rb").read()
        b = open(str(m_np) + suffix, "rb").read()
        assert a == b, suffix
