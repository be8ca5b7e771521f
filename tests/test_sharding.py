"""Multi-device tests on a virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kmersgwas_tpu.ops import bitplanes, score, topk
from kmersgwas_tpu.parallel import sharding


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device (virtual) platform")
    return sharding.make_mesh()


def _make(rng, r, n, p):
    n_pad = ((n + 127) // 128) * 128
    bits = rng.integers(0, 2, size=(r, n)).astype(np.uint8)
    padded = np.zeros((r, n_pad), dtype=np.uint8)
    padded[:, :n] = bits
    packed = bitplanes.pack_bits_np(padded)
    y = rng.normal(size=(n, p)).astype(np.float32)
    return bits, packed, y, n_pad


def test_sharded_scan_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    r, n, p, k = 4096, 50, 3, 40
    bits, packed, y, n_pad = _make(rng, r, n, p)
    popcnt = bits.sum(axis=1).astype(np.float32)
    yp, ysum = score.prepare_phenotypes(y, n_pad)
    min_count = 2

    # single-device reference via ops
    state1 = topk.init_state(p, k)
    scores = score.score_batch(jnp.asarray(packed), jnp.asarray(popcnt), yp, ysum,
                               n_used=n, min_count=min_count)
    scores = jnp.where(jnp.asarray(popcnt)[:, None] > 0, scores, -jnp.inf)
    lo, hi = topk.encode_rows(np.arange(r))
    state1 = topk.update(state1, scores, jnp.asarray(lo), jnp.asarray(hi))
    ref = topk.finalize(state1)

    # sharded step
    step = sharding.build_sharded_scan_step(mesh, n_used=n, min_count=min_count, k=k)
    sp, spc, slo, shi = sharding.shard_batch(mesh, [packed, popcnt, lo, hi])
    ypr, ysr = sharding.replicate(mesh, yp, ysum)
    state2 = topk.TopKState(*sharding.replicate(
        mesh, *topk.init_state(p, k)))
    state2 = step(state2, sp, spc, slo, shi, ypr, ysr)
    got = topk.finalize(state2)

    for j in range(p):
        np.testing.assert_allclose(np.sort(got[j][0]), np.sort(ref[j][0]), rtol=1e-5)
        assert set(got[j][1].tolist()) == set(ref[j][1].tolist())


def test_sharded_scan_multiple_updates(mesh):
    rng = np.random.default_rng(1)
    n, p, k = 30, 2, 16
    step = sharding.build_sharded_scan_step(mesh, n_used=n, min_count=1, k=k)
    all_scores = []
    state = topk.TopKState(*sharding.replicate(mesh, *topk.init_state(p, k)))
    yp = ysum = None
    for it in range(3):
        bits, packed, y, n_pad = _make(rng, 1024, n, p)
        if yp is None:
            ypl, ysl = score.prepare_phenotypes(y, n_pad)
            yp, ysum = sharding.replicate(mesh, ypl, ysl)
            y0 = y
        popcnt = bits.sum(axis=1).astype(np.float32)
        rows = np.arange(it * 1024, (it + 1) * 1024)
        lo, hi = topk.encode_rows(rows)
        sp, spc, slo, shi = sharding.shard_batch(mesh, [packed, popcnt, lo, hi])
        state = step(state, sp, spc, slo, shi, yp, ysum)
        # track for brute force (scores always vs y0)
        all_scores.append((bits, rows))
    # brute force with y0
    n_used = n
    allbits = np.concatenate([b for b, _ in all_scores])
    allrows = np.concatenate([r for _, r in all_scores])
    n1 = allbits.sum(axis=1).astype(np.float64)
    got = topk.finalize(state)
    for j in range(p):
        yj = y0[:, j].astype(np.float64)
        yigi = allbits @ yj
        r_ = n_used * yigi - n1 * yj.sum()
        denom = n_used * n1 - n1**2
        s = np.where((denom > 0) & (n1 >= 1) & (n1 <= n_used - 1), r_**2 / denom, -np.inf)
        order = np.argsort(-s, kind="stable")[:k]
        assert set(got[j][1].tolist()) == set(allrows[order].tolist())


def test_sharded_kinship_matches_accumulator(mesh):
    rng = np.random.default_rng(2)
    r, n = 2048, 40
    n_pad = 128
    bits = rng.integers(0, 2, size=(r, n)).astype(np.uint8)
    padded = np.zeros((r, n_pad), dtype=np.uint8)
    padded[:, :n] = bits
    packed = bitplanes.pack_bits_np(padded)

    kstep = sharding.build_sharded_kinship_step(mesh)
    acc0, = sharding.replicate(mesh, jnp.zeros((n_pad, n_pad), jnp.int32))
    sp, = sharding.shard_batch(mesh, [packed])
    acc = kstep(acc0, sp)
    S = np.asarray(acc)[:n, :n]
    xnor = (r + S) / 2.0
    g = bits.astype(np.int64)
    expect = np.zeros((n, n))
    for i in range(n):
        expect[i] = (1 ^ g[:, i][:, None] ^ g).sum(axis=0)
    np.testing.assert_allclose(xnor, expect, atol=0)


def test_host_range_partition_covers_space():
    los, his = [], []
    for h in range(8):
        lo, hi = sharding.host_range_of_kmer_space(h, 8, 31)
        los.append(lo)
        his.append(hi)
    assert los[0] == 0
    assert all(his[i] == los[i + 1] for i in range(7))
    assert his[-1] >= (1 << 62) - 1


def test_host_row_span_partitions_table(tmp_path):
    from kmersgwas_tpu.parallel import multihost
    from test_pipeline import build_population
    pop = build_population(tmp_path, n_samples=8, n_kmers=300)
    from kmersgwas_tpu.core import formats as fm
    hdr, kmers, _ = fm.read_table(pop["base"])
    spans = [multihost.host_row_span(pop["base"], h, 4) for h in range(4)]
    assert spans[0][0] == 0
    assert spans[-1][1] == len(kmers)
    for a, b in zip(spans, spans[1:]):
        assert a[1] == b[0]
    # every row's k-mer falls inside its host's key range
    from kmersgwas_tpu.parallel.sharding import host_range_of_kmer_space
    for h, (s, e) in enumerate(spans):
        lo, hi = host_range_of_kmer_space(h, 4, 15)
        if e > s:
            assert int(kmers[s]) > lo or h == 0
            assert int(kmers[e - 1]) <= hi


def test_production_sharded_associate_exact(mesh, tmp_path):
    """The PRODUCTION scan (pipeline.scan.associate with a mesh) reproduces
    the single-device result exactly — scores, rows, and order — over
    multiple streamed batches (VERDICT: unify sharded + production paths)."""
    from test_pipeline import build_population
    from kmersgwas_tpu.pipeline import scan as scan_mod
    pop = build_population(tmp_path, n_samples=24, n_kmers=600)
    n = len(pop["names"])
    rng = np.random.default_rng(7)
    y = rng.normal(size=(n, 3))
    kw = dict(kmer_len=15, n_top=25, maf=0.05, mac=2, batch_size=64)
    ref = scan_mod.associate(pop["base"], pop["names"], y, list("abc"), **kw)
    got = scan_mod.associate(pop["base"], pop["names"], y, list("abc"),
                             mesh=mesh, **kw)
    assert got.n_tested == ref.n_tested
    for j in range(3):
        np.testing.assert_array_equal(got.rows[j], ref.rows[j])
        np.testing.assert_allclose(got.scores[j], ref.scores[j], rtol=1e-6)
        np.testing.assert_array_equal(got.kmers[j], ref.kmers[j])


def test_production_sharded_associate_resume(mesh, tmp_path):
    """Checkpoint written by the sharded scan resumes exactly (device-0
    seeding keeps the final cross-device merge duplicate-free)."""
    from test_pipeline import build_population
    from kmersgwas_tpu.pipeline import scan as scan_mod
    pop = build_population(tmp_path, n_samples=16, n_kmers=400)
    n = len(pop["names"])
    rng = np.random.default_rng(8)
    y = rng.normal(size=(n, 2))
    kw = dict(kmer_len=15, n_top=20, maf=0.05, mac=2, batch_size=48)
    full = scan_mod.associate(pop["base"], pop["names"], y, ["a", "b"],
                              mesh=mesh, **kw)
    ck = str(tmp_path / "sck")
    r1 = scan_mod.associate(pop["base"], pop["names"], y, ["a", "b"],
                            mesh=mesh, checkpoint_path=ck,
                            checkpoint_every=1, **kw)
    r2 = scan_mod.associate(pop["base"], pop["names"], y, ["a", "b"],
                            mesh=mesh, checkpoint_path=ck,
                            checkpoint_every=1, **kw)
    for j in range(2):
        assert set(r1.kmers[j].tolist()) == set(full.kmers[j].tolist())
        assert set(r2.kmers[j].tolist()) == set(full.kmers[j].tolist())


def test_production_sharded_kinship_bit_exact(mesh, tmp_path):
    """kinship_from_table(mesh=...) — the PRODUCT path with per-device
    partial accumulators, padded shards (masked rows), and int64 flush —
    reproduces the single-device kinship bit-exactly, including through a
    checkpoint/resume cycle."""
    from test_pipeline import build_population
    from kmersgwas_tpu.pipeline import kinship as km
    pop = build_population(tmp_path, n_samples=24, n_kmers=500)
    kw = dict(maf=0.05, batch_size=37)        # odd size: forces shard padding
    K_ref = km.kinship_from_table(pop["base"], **kw)
    K_got = km.kinship_from_table(pop["base"], mesh=mesh, **kw)
    np.testing.assert_array_equal(K_got, K_ref)

    ck = str(tmp_path / "kck")
    K_c1 = km.kinship_from_table(pop["base"], mesh=mesh, checkpoint_path=ck,
                                 checkpoint_every=2, **kw)
    np.testing.assert_array_equal(K_c1, K_ref)


@pytest.mark.slow
def test_production_sharded_associate_flagship_shape(mesh, tmp_path):
    """Pin the multi-device scan at FLAGSHIP scan parameters — 2M global
    rows/batch x 101 columns x top-10001 (VERDICT r2 item 5): exercises the
    production cand_c/cand_k/cand_q/buffer-capacity coupling
    (pipeline/scan.py) at real widths instead of toy ones. N is kept small
    (the parameter coupling under test depends on rows/K/P, not N)."""
    import jax.numpy as jnp
    from kmersgwas_tpu.core import formats
    from kmersgwas_tpu.pipeline import scan as scan_mod
    rng = np.random.default_rng(33)
    rows, n, p, k, kmer_len = 1 << 22, 100, 101, 10001, 31
    names = [f"a{i}" for i in range(n)]
    base = str(tmp_path / "big")
    wf = (n + 63) // 64
    formats.write_names(base, names)
    with open(base + ".table", "wb") as f:
        formats.write_table_header(f, n, kmer_len)
        chunk = 1 << 20
        last_mask = np.uint64((1 << (n - (wf - 1) * 64)) - 1)
        for s in range(0, rows, chunk):
            rec = np.empty((chunk, 1 + wf), dtype="<u8")
            rec[:, 0] = np.arange(s, s + chunk, dtype=np.uint64) * np.uint64(11)
            rec[:, 1:] = rng.integers(0, 1 << 63, size=(chunk, wf),
                                      dtype=np.uint64)
            rec[:, wf] &= last_mask
            rec.tofile(f)
    y = rng.normal(size=(n, p))
    cols = [f"c{j}" for j in range(p)]
    kw = dict(kmer_len=kmer_len, n_top=k, maf=0.05, mac=5,
              batch_size=1 << 21)
    ref = scan_mod.associate(base, names, y, cols, **kw)
    got = scan_mod.associate(base, names, y, cols, mesh=mesh, **kw)
    assert got.n_tested == ref.n_tested
    for j in range(0, p, 10):
        np.testing.assert_array_equal(got.rows[j], ref.rows[j])
        np.testing.assert_allclose(got.scores[j], ref.scores[j], rtol=0)
