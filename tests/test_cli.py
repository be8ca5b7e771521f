"""CLI smoke test: reads -> counts -> strand lists -> master -> table ->
kinship -> GWAS, end-to-end through the command-line interface."""
import numpy as np

from kmersgwas_tpu.cli.__main__ import main as cli
from kmersgwas_tpu.core import codec, formats

K = 15


def write_reads(path, rng, genome, coverage=4, read_len=60, insert=None):
    """Simulated reads from a circularized genome (optionally with an
    inserted sequence)."""
    g = genome if insert is None else genome[:50] + insert + genome[50:]
    with open(path, "w") as f:
        i = 0
        for _ in range(coverage * len(g) // read_len):
            start = rng.integers(0, len(g) - read_len)
            seq = g[start:start + read_len]
            if rng.random() < 0.5:  # reverse strand
                comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
                seq = "".join(comp[c] for c in reversed(seq))
            f.write(f">r{i}\n{seq}\n")
            i += 1


def test_cli_end_to_end(tmp_path, capsys):
    rng = np.random.default_rng(0)
    bases = "ACGT"
    genome = "".join(bases[i] for i in rng.integers(0, 4, size=800))
    insert = "".join(bases[i] for i in rng.integers(0, 4, size=40))

    n_samples = 12
    carriers = set(range(0, n_samples, 2))
    lists_file = tmp_path / "lists.txt"
    lf_lines = []
    for s in range(n_samples):
        reads = tmp_path / f"s{s}.fa"
        write_reads(reads, rng, genome,
                    insert=insert if s in carriers else None)
        canon = tmp_path / f"s{s}.canon"
        nonc = tmp_path / f"s{s}.nonc"
        cli(["count", "-k", str(K), "-o", str(canon), "--canonize",
             "--min_count", "2", str(reads)])
        cli(["count", "-k", str(K), "-o", str(nonc), str(reads)])
        slist = tmp_path / f"s{s}.kmers"
        cli(["strand-merge", "-c", str(canon), "-n", str(nonc),
             "-k", str(K), "-o", str(slist)])
        lf_lines.append(f"{slist} acc{s:02d}")
    lists_file.write_text("\n".join(lf_lines) + "\n")

    master = tmp_path / "master.kmers"
    cli(["list-kmers", "-l", str(lists_file), "-k", str(K), "--mac", "2",
         "-p", "0.2", "-o", str(master)])
    table = str(tmp_path / "pop")
    cli(["build-table", "-l", str(lists_file), "-k", str(K),
         "-a", str(master), "-o", table])

    hdr, kmers, pa = formats.read_table(table)
    assert hdr.n_accessions == n_samples and len(kmers) > 50
    # insert-specific k-mers present only in carriers
    ins_region = genome[50 - K + 1:50] + insert + genome[50:50 + K - 1]
    ins_kmers = codec.canonize(codec.encode_kmers(
        [ins_region[i:i + K] for i in range(len(ins_region) - K + 1)]), K)
    # junction k-mers can coincide with plain-genome k-mers when the first
    # insert bases happen to match the genome continuation — exclude those
    genome_kmers = codec.canonize(codec.encode_kmers(
        [genome[i:i + K] for i in range(len(genome) - K + 1)]), K)
    ins_kmers = ins_kmers[~np.isin(ins_kmers, genome_kmers)]
    hit_rows = np.nonzero(np.isin(kmers, ins_kmers))[0]
    assert len(hit_rows) > 10
    for r in hit_rows:
        bits = [(int(pa[r, s // 64]) >> (s % 64)) & 1 for s in range(n_samples)]
        assert set(np.nonzero(bits)[0].tolist()) <= carriers
        assert len(np.nonzero(bits)[0]) >= 1

    # phenotype driven by insert presence
    y = np.array([3.0 if s in carriers else 0.0 for s in range(n_samples)])
    y += rng.normal(scale=0.3, size=n_samples)
    pheno = tmp_path / "pheno.tsv"
    formats.write_phenotypes(pheno, formats.PhenotypeTable(
        ["phenotype_value"], [f"acc{s:02d}" for s in range(n_samples)],
        y[:, None]))

    cli(["gwas", "--pheno", str(pheno), "--kmers_table", table,
         "--outdir", str(tmp_path / "out"), "-l", str(K), "-k", "50",
         "--permutations", "10", "--mac", "2", "--maf", "0.05",
         "--min_data_points", "5", "--batch_size", "64",
         "--dont_remove_intermediates"])
    outdir = tmp_path / "out"
    assert (outdir / "kmers" / "threshold_5per").exists()
    # winners' PLINK artifacts per column (kmers_gwas.py:152-160 parity)
    for ext in (".bed", ".bim", ".fam"):
        assert (outdir / "kmers" / f"pheno.0.phenotype_value{ext}").exists()
        assert (outdir / "kmers" / f"pheno.1.P1{ext}").exists()
    assoc = (outdir / "kmers" / "output" / "phenotype_value.assoc.txt").read_text()
    lines = assoc.splitlines()
    assert lines[0].split("\t")[8] == "p_lrt"
    # the best-p k-mer must be insert-linked: either an insert/junction k-mer
    # (carrier pattern) or a plain-genome k-mer spanning the insertion site,
    # which the insert DISRUPTS in carriers (anti-carrier pattern — the score
    # and LMM are symmetric under pattern complement)
    disrupted = codec.canonize(codec.encode_kmers(
        [genome[i:i + K] for i in range(50 - K + 1, 50)]), K)
    linked = set(ins_kmers.tolist()) | set(disrupted.tolist())
    best = min(lines[1:], key=lambda l: float(l.split("\t")[8]))
    best_kmer = best.split("\t")[1].rsplit("_", 1)[0]
    assert int(codec.canonize(codec.encode_kmers([best_kmer]), K)[0]) in linked
