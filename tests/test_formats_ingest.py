"""File-format and ingest-stage tests on synthetic populations.

A small simulated population (reads -> counts -> strand lists -> master list
-> table) exercises every stage with independently-computed expectations.
"""
import numpy as np
import pytest

from kmersgwas_tpu.core import codec, formats, table as table_mod
from kmersgwas_tpu.ingest import counter, strand, tablebuild, union


K = 15


def make_sample(rng, n_source, k=K):
    """Random canonical k-mer set + orientation flags for one sample."""
    raw = rng.integers(0, 1 << (2 * k), size=n_source, dtype=np.uint64)
    canon = np.unique(codec.canonize(raw, k))
    flags = rng.integers(1, 4, size=len(canon)).astype(np.uint64)
    return canon, flags


def test_strand_list_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    kmers, flags = make_sample(rng, 500)
    path = tmp_path / "s.kmers"
    formats.write_strand_kmer_list(path, kmers, flags)
    k2, f2 = formats.read_kmer_list_split_flags(path)
    order = np.argsort(kmers)
    assert np.array_equal(k2, kmers[order])
    assert np.array_equal(f2.astype(np.uint64), flags[order])
    # sorted by low 62 bits
    assert np.all(np.diff(k2.astype(np.int64)) >= 0)


def test_strand_flags_from_counts():
    k = 15
    # three canonical k-mers; orientation evidence constructed explicitly
    canon = np.unique(codec.canonize(
        np.array([111, 222, 333], dtype=np.uint64), k))
    rc = codec.reverse_complement(canon, k)
    # sample reads: canonical form of c0, rc of c1, both of c2
    non_canon = np.concatenate([canon[:1], rc[1:2], canon[2:3], rc[2:3]])
    kk, ff = strand.strand_flags_from_counts(canon, non_canon, k)
    assert np.array_equal(kk, canon)
    assert list(ff) == [1, 2, 3]


def test_strand_flags_zero_is_error():
    k = 15
    canon = np.unique(codec.canonize(np.array([7, 9], dtype=np.uint64), k))
    with pytest.raises(ValueError):
        strand.strand_flags_from_counts(canon, canon[:1], k)


def test_counter_from_fasta(tmp_path):
    # two reads; verify against brute-force string counting
    seqs = [b"ACGTACGTACGTACGTACGT", b"TTTTACGTACGTACGTAAAA"]
    fa = tmp_path / "reads.fa"
    fa.write_bytes(b">r1\n" + seqs[0] + b"\n>r2\n" + seqs[1] + b"\n")
    k = 7
    kmers, counts = counter.count_kmers_in_files([fa], k, canonize=False)
    expect = {}
    for s in seqs:
        s = s.decode()
        for i in range(len(s) - k + 1):
            expect[s[i:i + k]] = expect.get(s[i:i + k], 0) + 1
    got = dict(zip(codec.decode_kmers(kmers, k), counts.tolist()))
    assert got == expect

    ck, cc = counter.count_kmers_in_files([fa], k, canonize=True, min_count=2)
    # canonized counts merge a kmer with its RC
    cexpect = {}
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    for s, c in expect.items():
        rc = "".join(comp[ch] for ch in reversed(s))
        key = min(s, rc)
        cexpect[key] = cexpect.get(key, 0) + c
    cexpect = {s: c for s, c in cexpect.items() if c >= 2}
    assert dict(zip(codec.decode_kmers(ck, k), cc.tolist())) == cexpect


def test_counter_skips_invalid_bases(tmp_path):
    fq = tmp_path / "r.fq"
    fq.write_bytes(b"@r\nACGTNACGT\n+\nIIIIIIIII\n")
    kmers, _ = counter.count_kmers_in_files([fq], 4, canonize=False)
    decoded = set(codec.decode_kmers(kmers, 4))
    assert decoded == {"ACGT"}  # windows crossing N are dropped


def test_union_counts_and_filter():
    k1 = np.array([10, 20, 30], dtype=np.uint64)
    f1 = np.array([1, 3, 2], dtype=np.uint8)
    k2 = np.array([20, 30], dtype=np.uint64)
    f2 = np.array([2, 1], dtype=np.uint8)
    uniq, c_all, c_can, c_non = union.union_counts([k1, k2], [f1, f2])
    assert list(uniq) == [10, 20, 30]
    assert list(c_all) == [1, 2, 2]
    assert list(c_can) == [1, 0, 1]   # flag==1 counts
    assert list(c_non) == [0, 1, 1]   # flag==2 counts
    keep, pass_mac, c_both = union.filter_union(uniq, c_all, c_can, c_non,
                                                mac=2, min_strand_frac=0.5)
    # kmer 10: fails MAC. kmer 20: canon side = 0+1 (both) >= ceil(1)=1,
    # non side = 1+1 = 2 >= 1 -> pass. kmer 30: canon 1+0 >= 1, non 1+0 >= 1 -> pass
    assert list(keep) == [False, True, True]


def test_union_matches_reference_ceil_edge():
    # count_all=100, p=0.2 -> each side needs >= 20 (manual example in
    # list_kmers_found_in_multiple_samples.cpp header comment)
    uniq = np.array([5], dtype=np.uint64)
    c_all = np.array([100])
    for canon_cnt, ok in [(19, False), (20, True)]:
        keep, _, _ = union.filter_union(uniq, c_all, np.array([canon_cnt]),
                                        np.array([80 - canon_cnt]), 1, 0.2)
        # both = 100 - canon - non = 20 + canon - ... construct: both = 100-80=20
        # canon side = canon + both, non side = non + both
        side_canon = canon_cnt + 20
        side_non = (80 - canon_cnt) + 20
        expect = side_canon >= 20 and side_non >= 20
        assert keep[0] == expect == ok or keep[0] == expect


def full_pipeline_fixture(tmp_path, n_samples=12, n_kmers=400, seed=7):
    """Build strand lists -> master list -> table; return all intermediates."""
    rng = np.random.default_rng(seed)
    pool = np.unique(codec.canonize(
        rng.integers(0, 1 << (2 * K), size=n_kmers * 2, dtype=np.uint64), K))
    paths, per_sample = [], []
    for s in range(n_samples):
        take = rng.random(len(pool)) < rng.uniform(0.2, 0.7)
        kk = pool[take]
        ff = rng.integers(1, 4, size=len(kk)).astype(np.uint64)
        p = tmp_path / f"sample{s}.kmers"
        formats.write_strand_kmer_list(p, kk, ff)
        paths.append(p)
        per_sample.append((kk, ff))
    master_path = tmp_path / "master.kmers"
    n_pass, stats = union.build_master_list(paths, master_path, K, mac=2,
                                            min_strand_frac=0.2)
    names = [f"acc{s}" for s in range(n_samples)]
    out_base = str(tmp_path / "pop")
    n_rows = tablebuild.build_table(paths, names, master_path, out_base, K)
    return dict(paths=paths, per_sample=per_sample, master_path=master_path,
                n_pass=n_pass, names=names, out_base=out_base, n_rows=n_rows,
                pool=pool)


def test_table_build_and_read(tmp_path):
    fx = full_pipeline_fixture(tmp_path)
    hdr, kmers, pa = formats.read_table(fx["out_base"])
    assert hdr.n_accessions == len(fx["names"])
    assert hdr.kmer_len == K
    assert len(kmers) == fx["n_rows"] == fx["n_pass"]
    master = formats.read_kmer_list(fx["master_path"])
    assert np.array_equal(kmers, master)
    # verify presence bits against the raw per-sample sets
    for s, (kk, _) in enumerate(fx["per_sample"]):
        got = (pa[:, s // 64] >> np.uint64(s % 64)) & np.uint64(1)
        expect = np.isin(kmers, kk).astype(np.uint64)
        assert np.array_equal(got, expect), f"sample {s}"


def test_table_header_binary_layout(tmp_path):
    fx = full_pipeline_fixture(tmp_path, n_samples=3, n_kmers=50)
    raw = open(fx["out_base"] + ".table", "rb").read()
    # reference: bytes AA BB CC DD, uint64 N, uint32 k
    assert raw[:4] == bytes([0xAA, 0xBB, 0xCC, 0xDD])
    assert int.from_bytes(raw[4:12], "little") == 3
    assert int.from_bytes(raw[12:16], "little") == K
    row_bytes = 8 * (1 + 1)
    assert (len(raw) - 16) % row_bytes == 0


def test_reader_squeeze_and_mac(tmp_path):
    fx = full_pipeline_fixture(tmp_path)
    hdr, kmers, pa = formats.read_table(fx["out_base"])
    # use a shuffled subset of accessions, as the phenotype order would
    sub = [fx["names"][i] for i in [5, 1, 9, 3]]
    rd = table_mod.KmersTableReader(fx["out_base"], names_to_use=sub)
    batch = rd.load_all(min_count=1)
    # expected: bits of columns 5,1,9,3 with MAC both tails at 1
    cols = np.array([5, 1, 9, 3])
    bits = np.stack([(pa[:, c // 64] >> np.uint64(c % 64)) & np.uint64(1)
                     for c in cols], axis=1).astype(np.uint8)
    pc = bits.sum(axis=1)
    keep = (pc >= 1) & (pc <= len(cols) - 1)
    assert np.array_equal(batch.kmers, kmers[keep])
    assert np.array_equal(batch.popcnt.astype(np.int64), pc[keep])
    assert np.array_equal(batch.row_index, np.nonzero(keep)[0])
    # unpack packed planes and compare bit-exactly
    from kmersgwas_tpu.ops.bitplanes import pack_bits_np
    w = rd.w32
    padded = np.zeros((keep.sum(), w * 32), dtype=np.uint8)
    padded[:, :4] = bits[keep]
    assert np.array_equal(batch.packed, pack_bits_np(padded))


def test_reader_batching_consistency(tmp_path):
    fx = full_pipeline_fixture(tmp_path)
    rd = table_mod.KmersTableReader(fx["out_base"])
    whole = rd.load_all(min_count=2)
    parts = list(rd.iter_batches(batch_size=37, min_count=2))
    assert sum(b.n_rows for b in parts) == whole.n_rows
    assert all(b.n_rows <= 37 for b in parts)
    assert np.array_equal(np.concatenate([b.kmers for b in parts]), whole.kmers)
    assert np.array_equal(np.concatenate([b.row_index for b in parts]), whole.row_index)
    assert np.array_equal(np.concatenate([b.packed for b in parts]), whole.packed)


def test_plink_bed_export_layout(tmp_path):
    # 5 accessions, 2 k-mers with known patterns
    pa = np.array([[0b10110], [0b00001]], dtype=np.uint64)
    by = formats.pa_words_to_bed_bytes(pa, 5)
    assert by.shape == (2, 2)
    # kmer0: samples 1,2,4 present -> byte0 dubits (s0..s3)=0,3,3,0 -> 0b00111100
    assert by[0, 0] == 0b00111100
    assert by[0, 1] == 0b00000011  # sample 4 present
    assert by[1, 0] == 0b00000011
    assert by[1, 1] == 0

    base = str(tmp_path / "exp")
    with formats.BedBimWriter(base) as w:
        w.write_variants(["AAAAA_1", "CCCCC_2"], pa, 5)
    raw = open(base + ".bed", "rb").read()
    assert raw[:3] == bytes([0x6C, 0x1B, 0x01])
    assert raw[3:] == by.tobytes()
    bim = open(base + ".bim").read().splitlines()
    assert bim[0].split("\t") == ["0", "AAAAA_1", "0", "0", "0", "1"]
    # round-trip through the bed reader
    formats.write_fam(base + ".fam", [f"a{i}" for i in range(5)], np.zeros(5))
    names, dubits = formats.read_bed(base)
    assert np.array_equal(dubits[0], np.array([0, 3, 3, 0, 3]))


def test_phenotype_tsv_roundtrip(tmp_path):
    t = formats.PhenotypeTable(names=["phenotype_value", "P1"],
                               accessions=["a", "b", "c"],
                               values=np.array([[1.5, 2.0], [0.25, -1.0], [3.0, 0.0]]))
    p = tmp_path / "pheno.tsv"
    formats.write_phenotypes(p, t)
    t2 = formats.read_phenotypes(p)
    assert t2.names == t.names and t2.accessions == t.accessions
    assert np.allclose(t2.values, t.values)


def test_kmc_database_roundtrip(tmp_path):
    from kmersgwas_tpu.ingest import kmc
    rng = np.random.default_rng(0)
    k = 21
    kmers = np.unique(rng.integers(0, 1 << (2 * k), size=5000, dtype=np.uint64))
    counts = rng.integers(1, 1000, size=len(kmers)).astype(np.uint64)
    base = str(tmp_path / "db")
    kmc.write_kmc1(base, kmers, counts, k)
    k2, c2, klen = kmc.read_kmc(base)
    assert klen == k
    assert np.array_equal(k2, kmers)
    assert np.array_equal(c2, counts)


def test_kmc_roundtrip_edge_cases(tmp_path):
    from kmersgwas_tpu.ingest import kmc
    # suffix length not a multiple of 4 symbols; tiny prefix table;
    # counter values crossing byte boundaries
    k = 15
    kmers = np.array([0, 1, (1 << (2 * k)) - 1, 12345, 678910], dtype=np.uint64)
    kmers = np.unique(kmers)
    counts = np.array([1, 255, 256, 65536, 2**31], dtype=np.uint64)[: len(kmers)]
    base = str(tmp_path / "edge")
    kmc.write_kmc1(base, kmers, counts, k, lut_prefix_len=3, counter_size=4)
    k2, c2, klen = kmc.read_kmc(base)
    assert np.array_equal(k2, np.sort(kmers))
    order = np.argsort(kmers)
    assert np.array_equal(c2, counts[order])

    # unsorted input is sorted on write
    sh = np.random.default_rng(1).permutation(len(kmers))
    kmc.write_kmc1(base, kmers[sh], counts[sh], k, lut_prefix_len=2)
    k3, c3, _ = kmc.read_kmc(base)
    assert np.array_equal(k3, np.sort(kmers))
    assert np.array_equal(c3, counts[order])


def test_kmc_import_feeds_strand_merge(tmp_path):
    """KMC import -> strand merge path: databases written in KMC format are
    usable exactly like native count files."""
    from kmersgwas_tpu.ingest import kmc, strand
    rng = np.random.default_rng(2)
    k = 15
    raw = rng.integers(0, 1 << (2 * k), size=2000, dtype=np.uint64)
    canon = np.unique(codec.canonize(raw, k))
    # orientation evidence: every canonical k-mer observed in some direction
    flip = rng.random(len(canon)) < 0.5
    nonc = np.where(flip, codec.reverse_complement(canon, k), canon)
    kmc.write_kmc1(str(tmp_path / "c"), canon,
                   np.full(len(canon), 2, np.uint64), k)
    kmc.write_kmc1(str(tmp_path / "n"), np.sort(nonc),
                   np.ones(len(nonc), np.uint64), k)
    ck, _, _ = kmc.read_kmc(str(tmp_path / "c"))
    nk, _, _ = kmc.read_kmc(str(tmp_path / "n"))
    kk, ff = strand.strand_flags_from_counts(ck, nk, k)
    assert np.array_equal(kk, canon)
    assert set(ff.tolist()) <= {1, 2, 3}


def test_streaming_builders_byte_identical(tmp_path):
    """Out-of-core slice streaming produces byte-identical artifacts for any
    slice count (the reference's 5,000-pass invariant,
    build_kmers_table.cpp:98-103)."""
    fx = full_pipeline_fixture(tmp_path, n_samples=9, n_kmers=600, seed=11)
    ref_master = open(fx["master_path"], "rb").read()
    ref_nopass = open(str(fx["master_path"]) + ".no_pass_kmers").read()
    ref_share = open(str(fx["master_path"]) + ".shareness").read()
    ref_table = open(fx["out_base"] + ".table", "rb").read()
    for n_slices in (1, 7, 64):
        m2 = tmp_path / f"master_s{n_slices}.kmers"
        n2, st2 = union.build_master_list(fx["paths"], m2, K, mac=2,
                                          min_strand_frac=0.2,
                                          n_slices=n_slices)
        assert n2 == fx["n_pass"]
        assert open(m2, "rb").read() == ref_master
        assert open(str(m2) + ".no_pass_kmers").read() == ref_nopass
        assert open(str(m2) + ".shareness").read() == ref_share
        t2 = str(tmp_path / f"pop_s{n_slices}")
        rows = tablebuild.build_table(fx["paths"], fx["names"], m2, t2, K,
                                      n_slices=n_slices)
        assert rows == fx["n_rows"]
        assert open(t2 + ".table", "rb").read() == ref_table


def test_sorted_list_cursor(tmp_path):
    """Cursor read_upto matches a direct masked comparison at every bound."""
    from kmersgwas_tpu.ingest.streamio import SortedListCursor
    rng = np.random.default_rng(3)
    km = np.unique(rng.integers(0, 1 << (2 * K), size=5000, dtype=np.uint64))
    fl = rng.integers(1, 4, size=len(km)).astype(np.uint64)
    p = tmp_path / "list.kmers"
    formats.write_strand_kmer_list(p, km, fl)
    raw = np.fromfile(p, dtype="<u8")
    bounds = sorted(rng.integers(0, 1 << (2 * K), size=10).tolist()) + [1 << (2 * K)]
    with SortedListCursor(p, chunk_words=257) as cur:
        prev = -1
        for b in bounds:
            got = cur.read_upto(b)
            codes = raw & np.uint64(codec.KMER_MASK_62)
            want = raw[(codes > prev) & (codes <= b)]
            assert np.array_equal(got, want), b
            prev = b
        assert cur.exhausted


def test_kmc2_roundtrip(tmp_path):
    """KMC2/3 (kmc_version 0x200) write -> read round-trip: signature-binned
    records + per-(bin, prefix) LUT reconstruct the exact k-mer set."""
    from kmersgwas_tpu.ingest import kmc
    rng = np.random.default_rng(6)
    k = 17
    kk = np.unique(rng.integers(0, 1 << (2 * k), size=5000, dtype=np.uint64))
    cc = rng.integers(1, 1000, size=len(kk)).astype(np.uint64)
    kmc.write_kmc2(str(tmp_path / "db2"), kk, cc, k, signature_len=5,
                   n_bins=16)
    rk, rc, rk_len = kmc.read_kmc(str(tmp_path / "db2"))
    assert rk_len == k
    assert np.array_equal(rk, kk)
    order = np.argsort(kk)
    assert np.array_equal(rc, cc[order])
    # version field really is 0x200
    import struct
    data = open(str(tmp_path / "db2") + ".kmc_pre", "rb").read()
    ver, _ = struct.unpack("<II", data[-12:-4])
    assert ver == 0x200


def test_kmc2_feeds_strand_merge(tmp_path):
    """A KMC2 database imports into the strand-merge path identically to a
    KMC1 one (the reference's OpenForListing contract,
    kmers_add_strand_information.cpp:72-85)."""
    from kmersgwas_tpu.ingest import kmc, strand
    rng = np.random.default_rng(7)
    k = 15
    raw = rng.integers(0, 1 << (2 * k), size=3000, dtype=np.uint64)
    canon = np.unique(codec.canonize(raw, k))
    flip = rng.random(len(canon)) < 0.5
    nonc = np.sort(np.where(flip, codec.reverse_complement(canon, k), canon))
    kmc.write_kmc2(str(tmp_path / "c2"), canon,
                   np.full(len(canon), 2, np.uint64), k, signature_len=4)
    kmc.write_kmc1(str(tmp_path / "n1"), nonc,
                   np.ones(len(nonc), np.uint64), k)
    ck, _, _ = kmc.read_kmc(str(tmp_path / "c2"))
    nk, _, _ = kmc.read_kmc(str(tmp_path / "n1"))
    kk, ff = strand.strand_flags_from_counts(ck, nk, k)
    assert np.array_equal(kk, canon)
    assert set(ff.tolist()) <= {1, 2, 3}


def test_kmc_roundtrip_fuzz_grid(tmp_path):
    """Round-trip fuzz across the KMC parameter grid: counter_size 1-4 x
    lut_prefix_len extremes x k in {15,21,25,31} x both_strands x both
    on-disk versions (reference consumer: kmers_add_strand_information.cpp:
    72-85 via the KMC API)."""
    from kmersgwas_tpu.ingest import kmc
    rng = np.random.default_rng(99)
    for k in (15, 21, 25, 31):
        space = 1 << min(2 * k, 40)
        kmers = np.sort(rng.choice(space, size=200, replace=False)
                        ).astype(np.uint64)
        for counter_size in (1, 2, 3, 4):
            cmax = (1 << (8 * counter_size)) - 1
            counts = rng.integers(1, min(cmax, 10**6) + 1, size=200
                                  ).astype(np.uint64)
            for lut in (1, 8):
                for strands in (True, False):
                    base = str(tmp_path / f"db_{k}_{counter_size}_{lut}")
                    kmc.write_kmc1(base, kmers, counts, k,
                                   lut_prefix_len=min(lut + 4, 12, k - 1),
                                   counter_size=counter_size,
                                   both_strands=strands)
                    k2, c2, klen = kmc.read_kmc(base)
                    assert klen == k
                    np.testing.assert_array_equal(k2, kmers)
                    np.testing.assert_array_equal(c2, counts)
                    # KMC2 LUT is n_bins * 4^lut entries: keep lut modest
                    sig = min(5, k - 1)
                    kmc.write_kmc2(base, kmers, counts, k,
                                   lut_prefix_len=min(lut, k - 1),
                                   signature_len=sig, n_bins=16,
                                   counter_size=counter_size,
                                   both_strands=strands)
                    k3, c3, klen3 = kmc.read_kmc(base)
                    assert klen3 == k
                    np.testing.assert_array_equal(k3, kmers)
                    np.testing.assert_array_equal(c3, counts)


def test_kmc_forward_compat_larger_header(tmp_path):
    """A future-KMC header extended by trailing fields (header_size larger
    than the known struct) must still read: known fields sit at the START
    of the header block, which is addressed backwards from the trailer."""
    import struct
    from kmersgwas_tpu.ingest import kmc
    rng = np.random.default_rng(7)
    kmers = np.sort(rng.choice(1 << 30, size=64, replace=False)).astype(np.uint64)
    counts = rng.integers(1, 100, size=64).astype(np.uint64)
    base = str(tmp_path / "fwd")
    kmc.write_kmc1(base, kmers, counts, 21, lut_prefix_len=3)
    raw = open(base + ".kmc_pre", "rb").read()
    version, hdr_size = struct.unpack("<II", raw[-12:-4])
    # splice 8 extra bytes at the END of the header struct
    body_end = len(raw) - 12 - hdr_size
    patched = (raw[:body_end + hdr_size] + b"\xEE" * 8
               + struct.pack("<II", version, hdr_size + 8) + raw[-4:])
    open(base + ".kmc_pre", "wb").write(patched)
    k2, c2, klen = kmc.read_kmc(base)
    assert klen == 21
    np.testing.assert_array_equal(k2, kmers)
    np.testing.assert_array_equal(c2, counts)


def test_kmc2_many_bins_roundtrip(tmp_path):
    """KMC2 layout with the counter's real-world bin count (512) and
    signature length 9 — exercises multi-bin LUT reconstruction at scale."""
    from kmersgwas_tpu.ingest import kmc
    rng = np.random.default_rng(123)
    k = 25
    kmers = np.sort(rng.choice(1 << (2 * k), size=3000, replace=False)
                    ).astype(np.uint64)
    counts = rng.integers(1, 1000, size=3000).astype(np.uint64)
    base = str(tmp_path / "db512")
    kmc.write_kmc2(base, kmers, counts, k, lut_prefix_len=2,
                   signature_len=9, n_bins=512, counter_size=3)
    k2, c2, klen = kmc.read_kmc(base)
    assert klen == k
    np.testing.assert_array_equal(k2, kmers)
    np.testing.assert_array_equal(c2, counts)
