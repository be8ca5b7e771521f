"""Golden tests against the ACTUAL reference binaries.

The reference C++ sources compile unmodified with minimal stand-in headers
for the three empty submodules (tests/ref_build/include: cxxopts, CTPL,
KMC declarations — the KMC code paths are never executed). Each test runs
a real reference binary and this framework's implementation on identical
inputs and compares outputs byte-for-byte (or numerically where the
reference emits text floats). This upgrades the parity claims from
"matches our transcription of the reference" to "matches the reference's
own machine code".

Covered: list_kmers_found_in_multiple_samples, build_kmers_table,
emma_kinship_kmers, associate_kmers, filter_kmers, kmers_table_to_bed.
"""
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference"
BUILD_SH = os.path.join(os.path.dirname(__file__), "ref_build",
                        "build_ref.sh")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF) and shutil.which("g++")),
    reason="reference sources or g++ unavailable")

K = 21


@pytest.fixture(scope="module")
def ref_bin(tmp_path_factory):
    out = tmp_path_factory.mktemp("ref_bin")
    r = subprocess.run(["bash", BUILD_SH, str(out)], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    return out


@pytest.fixture(scope="module")
def population(tmp_path_factory):
    """Per-sample strand lists + paths file, written by OUR writers (the
    reference consumes the identical binary format)."""
    from kmersgwas_tpu.ingest import strand

    d = tmp_path_factory.mktemp("pop")
    rng = np.random.default_rng(77)
    n_samples = 12
    pool = np.unique(rng.integers(0, 1 << (2 * K), size=4000,
                                  dtype=np.uint64))
    # canonical pool (the strand writer canonizes)
    from kmersgwas_tpu.core import codec
    pool = np.unique(codec.canonize(pool, K))
    names, paths = [], []
    for i in range(n_samples):
        present = pool[rng.random(len(pool)) < 0.55]
        # canonized count DB = canonical codes; as-read DB = observed forms:
        # forward-only / reverse-only / both per k-mer
        cat = rng.integers(0, 3, size=len(present))
        rc = codec.reverse_complement(present, K)
        observed = np.concatenate([present[cat != 1], rc[cat != 0]])
        p = str(d / f"acc{i:02d}.kmers")
        strand.write_strand_list(p, present, observed, K)
        names.append(f"acc{i:02d}")
        paths.append(p)
    list_file = str(d / "paths.txt")
    with open(list_file, "w") as f:
        for p, n in zip(paths, names):
            f.write(f"{p} {n}\n")
    return {"dir": d, "paths": paths, "names": names, "list_file": list_file}


def _run(binary, args):
    r = subprocess.run([str(binary), *map(str, args)], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    return r


@pytest.fixture(scope="module")
def master_list(ref_bin, population, tmp_path_factory):
    d = tmp_path_factory.mktemp("master")
    ref_out = str(d / "ref_master")
    _run(ref_bin / "list_kmers_found_in_multiple_samples",
         ["-l", population["list_file"], "-k", K, "--mac", 3,
          "-p", 0.2, "-o", ref_out])
    from kmersgwas_tpu.ingest import union
    our_out = str(d / "our_master")
    union.build_master_list(population["paths"], our_out, K, 3, 0.2)
    return {"ref": ref_out, "ours": our_out, "dir": d}


def test_list_kmers_master_list_bit_exact(master_list):
    ref = open(master_list["ref"], "rb").read()
    ours = open(master_list["ours"], "rb").read()
    assert len(ref) > 0
    assert ref == ours


def test_list_kmers_side_artifacts_match(master_list):
    for ext in (".shareness", ".no_pass_kmers", ".stats.both",
                ".stats.only_canonical", ".stats.only_non_canonical"):
        ref = open(master_list["ref"] + ext).read()
        ours = open(master_list["ours"] + ext).read()
        assert ref == ours, ext


@pytest.fixture(scope="module")
def table(ref_bin, population, master_list, tmp_path_factory):
    d = tmp_path_factory.mktemp("table")
    ref_out = str(d / "ref_table")
    _run(ref_bin / "build_kmers_table",
         ["-l", population["list_file"], "-k", K,
          "-a", master_list["ref"], "-o", ref_out])
    from kmersgwas_tpu.ingest import tablebuild
    our_out = str(d / "our_table")
    tablebuild.build_table(population["paths"], population["names"],
                           master_list["ours"], our_out, K)
    return {"ref": ref_out, "ours": our_out, "dir": d}


def test_build_table_bit_exact(table):
    for ext in (".table", ".names"):
        ref = open(table["ref"] + ext, "rb").read()
        ours = open(table["ours"] + ext, "rb").read()
        assert len(ref) > 0
        assert ref == ours, ext


def test_emma_kinship_matches_reference_binary(ref_bin, table):
    r = _run(ref_bin / "emma_kinship_kmers",
             ["-t", table["ref"], "-k", K, "--maf", 0.2])
    ref_K = np.array([[float(v) for v in ln.split("\t")]
                      for ln in r.stdout.strip().splitlines()])
    from kmersgwas_tpu.pipeline import kinship as km
    our_K = km.kinship_from_table(table["ours"], maf=0.2)
    # the reference prints with cout's default 6 significant digits
    np.testing.assert_allclose(our_K, ref_K, rtol=0, atol=1e-6)


def test_associate_matches_reference_binary(ref_bin, table, population,
                                            tmp_path_factory):
    from kmersgwas_tpu.core import formats
    from kmersgwas_tpu.pipeline import scan as scan_mod

    d = tmp_path_factory.mktemp("assoc")
    rng = np.random.default_rng(5)
    names = population["names"]
    n = len(names)
    # INTEGER phenotypes: every score term (sums of small ints, squares,
    # integer denominators) is exactly representable in f32, so the
    # reference's SSE accumulate and our XLA dot produce BIT-IDENTICAL
    # scores regardless of summation order -> the top-k comparison is
    # fully deterministic including tie handling
    y = rng.integers(-8, 9, size=(n, 2)).astype(np.float64)
    pheno_path = str(d / "p.pheno")
    formats.write_phenotypes(pheno_path, formats.PhenotypeTable(
        names=["a", "b"], accessions=names, values=y))

    # Pick a heap size where the k-th/(k+1)-th scores are STRICTLY ordered
    # in every column: at a tied boundary the reference heap displaces an
    # arbitrary tied member (std::priority_queue pop order), so its output
    # set is implementation-defined there — both results are valid top-k,
    # but only a strict boundary makes the set unique and comparable.
    probe = scan_mod.associate(table["ours"], names, y, ["a", "b"],
                               kmer_len=K, n_top=100, maf=0.05, mac=2,
                               batch_size=512)
    n_best = None
    for k_try in range(20, 90):
        if all(probe.scores[j][k_try - 1] > probe.scores[j][k_try]
               for j in range(2)):
            n_best = k_try
            break
    assert n_best is not None, "no strict score boundary in [20, 90)"

    _run(ref_bin / "associate_kmers",
         ["-p", pheno_path, "-b", "ref", "-o", str(d),
          "--kmers_table", table["ref"], "-n", n_best, "--batch_size", 512,
          "--parallel", 2, "--kmer_len", K, "--maf", 0.05, "--mac", 2,
          "--k_mers_scores"])
    res = scan_mod.associate(table["ours"], names, y, ["a", "b"],
                             kmer_len=K, n_top=n_best, maf=0.05, mac=2,
                             batch_size=512)
    for j in range(2):
        ref_k, ref_s = formats.read_best_kmers_scores(
            str(d / f"ref.{j}.best_kmers.scores"))
        np.testing.assert_array_equal(np.sort(ref_k),
                                      np.sort(res.kmers[j]))
        # the reference's epilogue runs in double and its dump stores f64;
        # ours stores the f32 score — agreement to f32 ulp
        np.testing.assert_allclose(np.sort(ref_s), np.sort(res.scores[j]),
                                   rtol=2e-7)
    # winner bed/bim per column. The bed genotype bytes are in table-row
    # order — fully determined — and must be byte-identical. The bim names
    # carry the score RANK, whose order among score ties is the reference
    # heap's pop order (implementation-defined); compare the k-mer part
    # exactly and the rank part as a permutation.
    plink_bases = [str(d / f"ours.{j}") for j in range(2)]
    scan_mod.export_plink(res, n, K, plink_bases)
    for j in range(2):
        ref_bed = open(str(d / f"ref.{j}.{['a','b'][j]}") + ".bed",
                       "rb").read()
        our_bed = open(plink_bases[j] + ".bed", "rb").read()
        assert ref_bed == our_bed, j
        ref_bim = open(str(d / f"ref.{j}.{['a','b'][j]}") + ".bim"
                       ).read().splitlines()
        our_bim = open(plink_bases[j] + ".bim").read().splitlines()
        ref_kmers = [ln.split("\t")[1].rsplit("_", 1)[0] for ln in ref_bim]
        our_kmers = [ln.split("\t")[1].rsplit("_", 1)[0] for ln in our_bim]
        assert ref_kmers == our_kmers, j
        ref_ranks = sorted(int(ln.split("\t")[1].rsplit("_", 1)[1])
                           for ln in ref_bim)
        our_ranks = sorted(int(ln.split("\t")[1].rsplit("_", 1)[1])
                           for ln in our_bim)
        assert ref_ranks == our_ranks == list(range(1, len(ref_bim) + 1))


def test_filter_kmers_matches_reference_binary(ref_bin, table,
                                               tmp_path_factory):
    from kmersgwas_tpu.core import codec, formats
    from kmersgwas_tpu.pipeline.export import filter_kmers_to_text

    d = tmp_path_factory.mktemp("filt")
    hdr, kmers, _ = formats.read_table(table["ours"])
    rng = np.random.default_rng(9)
    take = rng.choice(len(kmers), size=min(25, len(kmers)), replace=False)
    queries = codec.decode_kmers(kmers[np.sort(take)], K)
    qfile = str(d / "q.txt")
    with open(qfile, "w") as f:
        f.write("\n".join(queries) + "\n")
    _run(ref_bin / "filter_kmers", ["-t", table["ref"], "-k", qfile,
                                    "-o", str(d / "ref.txt")])
    filter_kmers_to_text(table["ours"], queries, str(d / "ours.txt"))
    assert open(d / "ref.txt").read() == open(d / "ours.txt").read()


def test_table_to_bed_matches_reference_binary(ref_bin, table, population,
                                               tmp_path_factory):
    from kmersgwas_tpu.core import formats
    from kmersgwas_tpu.pipeline.export import table_to_bed

    d = tmp_path_factory.mktemp("t2b")
    names = population["names"]
    rng = np.random.default_rng(3)
    y = np.round(rng.normal(size=(len(names), 1)), 3)
    pheno_path = str(d / "p.pheno")
    formats.write_phenotypes(pheno_path, formats.PhenotypeTable(
        names=["ph"], accessions=names, values=y))
    _run(ref_bin / "kmers_table_to_bed",
         ["-t", table["ref"], "-k", K, "-p", pheno_path, "--maf", 0.05,
          "--mac", 2, "-b", 400, "-o", str(d / "ref")])
    table_to_bed(table["ours"], str(d / "ours"), pheno_path=pheno_path,
                 maf=0.05, mac=2, batch_size=400)
    i = 0
    found = False
    while os.path.exists(str(d / f"ref.{i}.bed")):
        found = True
        for ext in (".bed", ".bim"):
            ref_b = open(str(d / f"ref.{i}") + ext, "rb").read()
            our_b = open(str(d / f"ours.{i}") + ext, "rb").read()
            assert ref_b == our_b, (i, ext)
        i += 1
    assert found


def test_average_phenotypes_matches_reference_awk(tmp_path):
    """pipeline/align.average_phenotypes vs the reference's awk aggregator
    (src/awk/average_phenotypes.awk) on duplicated-accession input; the awk
    emits hash order, so compare as accession -> mean maps."""
    from kmersgwas_tpu.pipeline.align import average_phenotypes

    rng = np.random.default_rng(13)
    accs = [f"a{i}" for i in rng.integers(0, 8, size=30)]
    vals = np.round(rng.normal(size=30), 4)
    body = "".join(f"{a}\t{v}\n" for a, v in zip(accs, vals))
    fin = tmp_path / "in.tsv"
    fin.write_text(body)
    r = subprocess.run(
        ["awk", "-f", os.path.join(REF, "src/awk/average_phenotypes.awk"),
         str(fin)], capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    ref = {}
    for ln in r.stdout.strip().splitlines()[1:]:
        a, v = ln.split("\t")
        ref[a] = float(v)
    got_a, got_v = average_phenotypes(accs, vals)
    ours = dict(zip(got_a, got_v))
    assert set(ours) == set(ref)
    for a in ref:
        # awk prints with OFMT %.6g
        assert ours[a] == pytest.approx(ref[a], rel=1e-5, abs=1e-6)


@pytest.fixture(scope="module")
def snp_bed(tmp_path_factory):
    """Synthetic PLINK bed/bim/fam with hom/het/missing genotype codes."""
    from kmersgwas_tpu.core import formats

    d = tmp_path_factory.mktemp("snps")
    rng = np.random.default_rng(21)
    n, m = 14, 300
    names = [f"s{i:02d}" for i in range(n)]
    dubits = rng.choice([0, 1, 2, 3], size=(m, n), p=[0.35, 0.05, 0.1, 0.5])
    nb = (n + 3) // 4
    bed = bytearray(formats.PLINK_BED_MAGIC)
    for row in dubits:
        padded = np.zeros(nb * 4, np.uint8)
        padded[:n] = row
        for q in range(nb):
            b = (padded[4 * q] | (padded[4 * q + 1] << 2)
                 | (padded[4 * q + 2] << 4) | (padded[4 * q + 3] << 6))
            bed.append(int(b))
    base = str(d / "snps")
    open(base + ".bed", "wb").write(bytes(bed))
    with open(base + ".bim", "w") as f:
        for i in range(m):
            f.write(f"1\tsnp{i}\t0\t{i + 1}\tA\tG\n")
    y = rng.integers(-6, 7, size=n).astype(np.float64)
    formats.write_fam(base + ".fam", names, y)
    return {"base": base, "names": names, "y": y, "dir": d}


def test_emma_kinship_bed_matches_reference_binary(ref_bin, snp_bed):
    from kmersgwas_tpu.snps.kinship import emma_kinship_from_bed
    r = _run(ref_bin / "emma_kinship", [snp_bed["base"]])
    ref_K = np.array([[float(v) for v in ln.split("\t")]
                      for ln in r.stdout.strip().splitlines()])
    our_K = emma_kinship_from_bed(snp_bed["base"])
    np.testing.assert_allclose(our_K, ref_K, rtol=0, atol=1e-6)


def test_associate_snps_matches_reference_binary(ref_bin, snp_bed,
                                                 tmp_path_factory):
    from kmersgwas_tpu.core import formats
    from kmersgwas_tpu.snps import assoc
    from kmersgwas_tpu.snps.bed import load_bed_planes

    d = tmp_path_factory.mktemp("snp_assoc")
    names, y = snp_bed["names"], snp_bed["y"]
    pheno_path = str(d / "p.pheno")
    formats.write_phenotypes(pheno_path, formats.PhenotypeTable(
        names=["ph"], accessions=names, values=y[:, None]))

    # strict score boundary (same tie caveat as the k-mer scan)
    planes = load_bed_planes(snp_bed["base"], names)
    _, scores = assoc.most_associated_snps(planes, y[:, None].astype(
        np.float32), 100, 0.05, 2)
    sdesc = np.sort(scores[:, 0])[::-1]
    n_best = next(k for k in range(10, 90) if sdesc[k - 1] > sdesc[k])

    _run(ref_bin / "associate_snps",
         [pheno_path, snp_bed["base"], str(d / "ref"), n_best, 0.05, 2])
    assoc.associate_snps(snp_bed["base"], names, y[:, None], ["ph"],
                         str(d / "ours"), n_best, 0.05, 2)
    for ext in (".bed", ".bim"):
        ref_b = open(str(d / "ref.ph") + ext, "rb").read()
        our_b = open(str(d / "ours.ph") + ext, "rb").read()
        assert len(ref_b) > 3
        assert ref_b == our_b, ext


def test_strand_merge_matches_reference_binary(ref_bin, tmp_path_factory):
    """The real kmers_add_strand_information consumes KMC1 databases written
    by OUR kmc-export (the stub CKMCFile implements KMC1 listing); its
    strand-flagged sorted list must be byte-identical to our strand-merge."""
    from kmersgwas_tpu.core import codec
    from kmersgwas_tpu.ingest import kmc, strand

    d = tmp_path_factory.mktemp("strand")
    rng = np.random.default_rng(31)
    pool = np.unique(codec.canonize(
        rng.integers(0, 1 << (2 * K), size=1500, dtype=np.uint64), K))
    cat = rng.integers(0, 3, size=len(pool))
    rc = codec.reverse_complement(pool, K)
    observed = np.unique(np.concatenate([pool[cat != 1], rc[cat != 0]]))
    canon_counts = rng.integers(2, 50, size=len(pool)).astype(np.uint64)
    obs_counts = rng.integers(1, 50, size=len(observed)).astype(np.uint64)

    kmc.write_kmc1(str(d / "canon"), pool, canon_counts, K)
    kmc.write_kmc1(str(d / "nonc"), observed, obs_counts, K)

    _run(ref_bin / "kmers_add_strand_information",
         ["-c", str(d / "canon"), "-n", str(d / "nonc"), "-k", K,
          "-o", str(d / "ref.kmers")])
    strand.write_strand_list(str(d / "ours.kmers"), pool, observed, K)
    ref = open(d / "ref.kmers", "rb").read()
    ours = open(d / "ours.kmers", "rb").read()
    assert len(ref) == 8 * len(pool)
    assert ref == ours


def test_histogram_matches_reference_binary(ref_bin, tmp_path_factory):
    """The real histogram_KMC_kmers_counts over OUR KMC1 export vs our
    counts_histogram."""
    from kmersgwas_tpu.core import codec
    from kmersgwas_tpu.ingest import kmc
    from kmersgwas_tpu.ingest.counter import counts_histogram

    d = tmp_path_factory.mktemp("hist")
    rng = np.random.default_rng(32)
    kmers = np.unique(rng.integers(0, 1 << (2 * K), size=800,
                                   dtype=np.uint64))
    counts = rng.integers(1, 30, size=len(kmers)).astype(np.uint64)
    kmc.write_kmc1(str(d / "db"), kmers, counts, K)
    r = _run(ref_bin / "histogram_KMC_kmers_counts",
             ["-d", str(d), "-n", "db", "-k", K])
    ref_lines = r.stdout.strip().splitlines()[1:]
    ref_h = {int(a): int(c) for a, c in (ln.split("\t") for ln in ref_lines)}
    ours = counts_histogram(counts)
    got_h = {i: int(c) for i, c in enumerate(ours) if c}
    assert {k: v for k, v in ref_h.items() if v} == got_h
