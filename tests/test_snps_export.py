"""SNP arm + export utility tests."""
import numpy as np
import pytest

from kmersgwas_tpu.core import codec, formats
from kmersgwas_tpu.pipeline import export
from kmersgwas_tpu.snps import assoc, bed, kinship as snp_kinship

from test_pipeline import build_population, K


def make_bed(tmp_path, rng, n_snps=60, n_samples=20, missing=0.1, het=0.15):
    """Random PLINK bed with hom/het/missing genotypes."""
    u = rng.random((n_snps, n_samples))
    dubits = np.where(u < missing, 1,
                      np.where(u < missing + het, 2,
                               np.where(u < missing + het + 0.4, 3, 0))).astype(np.uint8)
    base = str(tmp_path / "snps")
    names = [f"s{i:02d}" for i in range(n_samples)]
    bpr = (n_samples + 3) // 4
    body = np.zeros((n_snps, bpr), dtype=np.uint8)
    for j in range(n_samples):
        body[:, j // 4] |= dubits[:, j] << ((j % 4) * 2)
    with open(base + ".bed", "wb") as f:
        f.write(formats.PLINK_BED_MAGIC)
        body.tofile(f)
    with open(base + ".bim", "w") as f:
        for i in range(n_snps):
            f.write(f"1\tsnp{i}\t0\t{i}\tA\tG\n")
    formats.write_fam(base + ".fam", names, np.zeros(n_samples))
    return base, names, dubits


def reference_snp_scores(dubits, y, mac):
    """Direct transcription of calculate_grammmar_approx_association
    (snps_multiple_databases.cpp:157-172)."""
    M, n = dubits.shape
    out = np.zeros(M)
    for i in range(M):
        d = dubits[i]
        pres = (d == 3).astype(np.float64)
        het = (d == 2).astype(np.float64)
        nonmiss = (d != 1).astype(np.float64)
        dose = pres + 0.5 * het
        N = nonmiss.sum()
        S_gi = dose.sum()
        S_gi2 = (dose * dose).sum()
        if mac > S_gi or mac > (N - S_gi):
            out[i] = 0.0
            continue
        yigi = (pres * y).sum() + 0.5 * (het * y).sum()
        ysum = (nonmiss * y).sum()
        r = N * yigi - S_gi * ysum
        denom = N * (N * S_gi2 - S_gi * S_gi)
        out[i] = r * r / denom if denom > 0 else 0.0
    return out


def test_bed_planes_and_scores(tmp_path):
    rng = np.random.default_rng(0)
    base, names, dubits = make_bed(tmp_path, rng)
    planes = bed.load_bed_planes(base)
    n = len(names)
    y = rng.normal(size=n)
    idx, scores = assoc.most_associated_snps(planes, y[:, None].astype(np.float32),
                                             n_best=10, maf=0.0, mac=1.0)
    expect = reference_snp_scores(dubits, y, mac=1.0)
    np.testing.assert_allclose(scores[:, 0], expect, rtol=1e-4, atol=1e-4)
    order = np.argsort(-expect, kind="stable")[:10]
    assert set(idx[0].tolist()) == set(order.tolist())
    assert np.all(np.diff(idx[0]) > 0)  # row-sorted like the reference


def test_bed_planes_sample_subset(tmp_path):
    rng = np.random.default_rng(1)
    base, names, dubits = make_bed(tmp_path, rng)
    sub = [names[i] for i in (7, 2, 11)]
    planes = bed.load_bed_planes(base, sub)
    assert planes.n_samples == 3
    d = dubits[:, [7, 2, 11]]
    np.testing.assert_allclose(planes.total, (d != 1).sum(axis=1))
    np.testing.assert_allclose(planes.s_gi, ((d == 3) + 0.5 * (d == 2)).sum(axis=1))


def test_export_selected_snps(tmp_path):
    rng = np.random.default_rng(2)
    base, names, dubits = make_bed(tmp_path, rng, n_snps=30)
    out = str(tmp_path / "sel")
    sel = [np.array([3, 7, 20]), np.array([0, 29])]
    assoc.export_selected_snps(base, [out + ".a", out + ".b"], sel)
    src = open(base + ".bed", "rb").read()
    bpr = (len(names) + 3) // 4
    got = open(out + ".a.bed", "rb").read()
    assert got[:3] == formats.PLINK_BED_MAGIC
    for i, s in enumerate(sel[0]):
        assert got[3 + i * bpr:3 + (i + 1) * bpr] == src[3 + s * bpr:3 + (s + 1) * bpr]
    bim = open(out + ".b.bim").read().splitlines()
    assert bim[0].split("\t")[1] == "snp0" and bim[1].split("\t")[1] == "snp29"


def test_emma_kinship_from_bed_matches_reference(tmp_path):
    rng = np.random.default_rng(3)
    base, names, dubits = make_bed(tmp_path, rng, n_snps=40, n_samples=12)
    K_got = snp_kinship.emma_kinship_from_bed(base)
    # literal reference transcription (emma_kinship.cpp:104-141)
    n = len(names)
    Kref = np.zeros((n, n))
    n_used = 0
    for i in range(dubits.shape[0]):
        d = dubits[i]
        hom = (d == 3).astype(np.float64)
        het = d == 2
        miss = d == 1
        total = float((~miss).sum())
        if total == 0:
            continue
        n_used += 1
        maf = hom.sum() / total
        g = np.where(miss, maf, hom)
        Kref += np.outer(g, g) + np.outer(1 - g, 1 - g)
        maf2 = (hom.sum() + het.sum()) / total
        g2 = np.where(miss, maf2, np.where(het, 1.0, hom))
        Kref += np.outer(g2, g2) + np.outer(1 - g2, 1 - g2)
    Kref /= 2 * n_used
    np.fill_diagonal(Kref, 1.0)
    np.testing.assert_allclose(K_got, Kref, atol=1e-12)


def test_filter_kmers_to_text(tmp_path):
    pop = build_population(tmp_path, n_samples=8, n_kmers=150)
    hdr, kmers, pa = formats.read_table(pop["base"])
    queries_codes = kmers[[5, 20, 40]]
    queries = codec.decode_kmers(queries_codes, K)
    # include one absent k-mer string (its canonical form must miss)
    absent = "A" * K
    out = str(tmp_path / "filter.txt")
    found = export.filter_kmers_to_text(pop["base"], queries + [absent], out)
    lines = open(out).read().splitlines()
    assert lines[0].split("\t") == ["kmer"] + pop["names"]
    got = {l.split("\t")[0]: l.split("\t")[1:] for l in lines[1:]}
    assert found == len(got)
    assert set(got) <= set(queries) | {absent}
    assert set(queries) <= set(got)
    n = hdr.n_accessions
    for qs, qc in zip(queries, queries_codes):
        row = np.nonzero(kmers == qc)[0][0]
        bits = [(int(pa[row, c // 64]) >> (c % 64)) & 1 for c in range(n)]
        assert [int(x) for x in got[qs]] == bits


def test_table_to_bed_shards_and_dedup(tmp_path):
    pop = build_population(tmp_path, n_samples=10, n_kmers=200)
    pheno = tmp_path / "p.tsv"
    formats.write_phenotypes(pheno, formats.PhenotypeTable(
        ["phenotype_value"], pop["names"], np.arange(10, dtype=float)[:, None]))
    out = str(tmp_path / "dump")
    n = export.table_to_bed(pop["base"], out, pheno_path=str(pheno),
                            maf=0.0, mac=1, batch_size=37)
    # count variants across shards == MAC-passing rows
    hdr, kmers, pa = formats.read_table(pop["base"])
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((pa[:, :, None] >> shifts) & np.uint64(1)).reshape(len(kmers), -1)[:, :10]
    n1 = bits.sum(axis=1)
    keep = (n1 >= 1) & (n1 <= 9)
    assert n == int(keep.sum())
    import glob
    shards = sorted(glob.glob(out + ".*.bim"))
    total = sum(len(open(s).read().splitlines()) for s in shards)
    assert total == n

    # unique-pattern dedup keeps one variant per distinct pattern
    out2 = str(tmp_path / "dumpu")
    n2 = export.table_to_bed(pop["base"], out2, pheno_path=str(pheno),
                             maf=0.0, mac=1, batch_size=1000, unique_patterns=True)
    uniq = len(set(map(tuple, bits[keep].tolist())))
    assert n2 == uniq


def test_snp_gwas_arm_two_steps(tmp_path):
    """SNP arm end-to-end: a causal SNP must dominate and clear thresholds."""
    from kmersgwas_tpu.pipeline.gwas import GWASConfig, run_gwas
    from test_pipeline import build_population
    rng = np.random.default_rng(7)
    # population with a k-mers table (for kinship) + a SNP bed with a causal SNP
    pop = build_population(tmp_path, n_samples=40, n_kmers=300, seed=9)
    n = 40
    n_snps = 50
    dubits = np.where(rng.random((n_snps, n)) < 0.5, 3, 0).astype(np.uint8)
    causal = rng.integers(0, 2, size=n)
    dubits[7] = np.where(causal > 0, 3, 0)
    base = str(tmp_path / "snps")
    bpr = (n + 3) // 4
    body = np.zeros((n_snps, bpr), dtype=np.uint8)
    for j in range(n):
        body[:, j // 4] |= dubits[:, j] << ((j % 4) * 2)
    with open(base + ".bed", "wb") as f:
        f.write(formats.PLINK_BED_MAGIC)
        body.tofile(f)
    with open(base + ".bim", "w") as f:
        for i in range(n_snps):
            f.write(f"1\tsnp{i}\t0\t{i}\tA\tG\n")
    formats.write_fam(base + ".fam", pop["names"], np.zeros(n))

    y = 3.0 * causal + rng.normal(scale=0.5, size=n)
    pheno = tmp_path / "p.tsv"
    formats.write_phenotypes(pheno, formats.PhenotypeTable(
        ["phenotype_value"], pop["names"], y[:, None]))

    cfg = GWASConfig(pheno_path=str(pheno), kmers_table=pop["base"],
                     outdir=str(tmp_path / "out"), kmer_len=15,
                     n_permutations=15, maf=0.05, mac=2, min_data_points=10,
                     run_kmers=False, snps_matrix=base, run_snps="two_steps",
                     n_snps=10, lmm_grid=32, lmm_refine=20)
    res = run_gwas(cfg)
    out = tmp_path / "out" / "snps"
    assert (out / "threshold_5per").exists()
    passed = (out / "pass_threshold_5per").read_text().splitlines()
    assert any("snp7" == ln.split("\t")[1] for ln in passed), passed
    # snp7 is the best p in the real column
    lines = (out / "output" / "phenotype_value.assoc.txt").read_text().splitlines()[1:]
    best = min(lines, key=lambda l: float(l.split("\t")[8]))
    assert best.split("\t")[1] == "snp7"


def test_dump_table_textual(tmp_path):
    import io
    pop = build_population(tmp_path, n_samples=6, n_kmers=80)
    buf = io.StringIO()
    n = export.dump_table_textual(pop["base"], buf)
    hdr, kmers, pa = formats.read_table(pop["base"])
    lines = buf.getvalue().splitlines()
    assert n == len(lines) == len(kmers)
    s0, bits0 = lines[0].split("\t")
    assert codec.encode_kmers([s0])[0] == kmers[0]
    expect = "".join(str((int(pa[0, 0]) >> c) & 1) for c in range(6))
    assert bits0 == expect
