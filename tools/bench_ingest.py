"""Out-of-core ingest benchmark: build a 100M+-row table under bounded RSS.

Validates the streaming L3 builders (ingest/union.py, ingest/tablebuild.py,
native kgt_list_union / kgt_build_table) at reference scale semantics: the
reference's 5,000-slice design exists precisely so N x billions of k-mers
never sit in RAM (list_kmers_found_in_multiple_samples.cpp:144-151,
build_kmers_table.cpp:98-103).

Generates N_SAMPLES sorted strand lists slice-by-slice (generation itself is
bounded), then runs union + table build in a SUBPROCESS and reports its peak
RSS and throughput. Usage:

    python tools/bench_ingest.py [--rows 120e6] [--samples 32] [--route native]
"""
import argparse
import json
import os
import resource
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 31
N_GEN_SLICES = 64


def generate(workdir: str, target_rows: int, n_samples: int, seed: int = 0):
    """Write per-sample strand lists slice-by-slice; returns list paths."""
    rng = np.random.default_rng(seed)
    space = 1 << (2 * K)
    per_slice = target_rows // N_GEN_SLICES
    files = [open(os.path.join(workdir, f"s{i}.kmers"), "wb")
             for i in range(n_samples)]
    t0 = time.perf_counter()
    total = 0
    for s in range(N_GEN_SLICES):
        lo = s * (space // N_GEN_SLICES)
        hi = lo + space // N_GEN_SLICES
        pool = np.unique(rng.integers(lo, hi, size=int(per_slice * 1.05),
                                      dtype=np.uint64))
        total += len(pool)
        for f in files:
            take = rng.random(len(pool)) < 0.35
            kk = pool[take]
            ff = rng.integers(1, 4, size=len(kk)).astype(np.uint64)
            (kk | (ff << np.uint64(62))).astype("<u8").tofile(f)
    for f in files:
        f.close()
    print(f"[gen] {total:,} pool k-mers x {n_samples} samples "
          f"in {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    return [os.path.join(workdir, f"s{i}.kmers") for i in range(n_samples)]


def _child(route: str, workdir: str, n_samples: int):
    paths = [os.path.join(workdir, f"s{i}.kmers") for i in range(n_samples)]
    names = [f"acc{i}" for i in range(n_samples)]
    master = os.path.join(workdir, "master.bin")
    base = os.path.join(workdir, "pop")
    t0 = time.perf_counter()
    if route == "native":
        from kmersgwas_tpu import native
        n_pass = native.list_union(paths, K, 2, 0.2, master, write_stats=False)
        t1 = time.perf_counter()
        n_rows = native.build_table(paths, names, master, base, K)
    else:
        from kmersgwas_tpu.ingest import tablebuild, union
        n_pass, _ = union.build_master_list(paths, master, K, mac=2,
                                            min_strand_frac=0.2,
                                            collect_stats=False)
        t1 = time.perf_counter()
        n_rows = tablebuild.build_table(paths, names, master, base, K)
    t2 = time.perf_counter()
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(json.dumps({
        "route": route, "n_samples": n_samples, "master_rows": n_pass,
        "table_rows": n_rows, "union_s": round(t1 - t0, 1),
        "table_s": round(t2 - t1, 1), "peak_rss_gb": round(rss_gb, 2),
        "union_krows_per_s": round(n_pass / max(t1 - t0, 1e-9) / 1e3, 0),
        "table_krows_per_s": round(n_rows / max(t2 - t1, 1e-9) / 1e3, 0),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=float, default=120e6)
    ap.add_argument("--samples", type=int, default=32)
    ap.add_argument("--route", choices=["native", "numpy"], default="native")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    a = ap.parse_args()
    if a.child:
        _child(a.route, a.workdir, a.samples)
        return
    workdir = a.workdir or tempfile.mkdtemp(prefix="kgt_ingest_bench_")
    os.makedirs(workdir, exist_ok=True)
    if not os.path.exists(os.path.join(workdir, f"s{a.samples - 1}.kmers")):
        generate(workdir, int(a.rows), a.samples)
    # measured phase runs in a subprocess so peak RSS excludes generation
    subprocess.run([sys.executable, os.path.abspath(__file__), "--child",
                    "--route", a.route, "--workdir", workdir,
                    "--samples", str(a.samples)], check=True,
                   env={**os.environ,
                        "PYTHONPATH": os.path.dirname(os.path.dirname(
                            os.path.abspath(__file__)))})


if __name__ == "__main__":
    main()
