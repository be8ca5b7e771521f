"""Device-op tests (CPU backend): score kernel, streaming top-k, kinship."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kmersgwas_tpu.ops import bitplanes, kinship, score, topk


def rand_problem(rng, r=300, n=70, p=5, w_pad=128):
    n_pad = ((n + w_pad - 1) // w_pad) * w_pad
    bits = rng.integers(0, 2, size=(r, n)).astype(np.uint8)
    padded = np.zeros((r, n_pad), dtype=np.uint8)
    padded[:, :n] = bits
    packed = bitplanes.pack_bits_np(padded)
    y = rng.normal(size=(n, p))
    return bits, packed, y, n_pad


def reference_scores(bits, y, min_count):
    """Direct NumPy transcription of calculate_kmer_score
    (kmers_multiple_databases.cpp:327-363)."""
    n = bits.shape[1]
    n1 = bits.sum(axis=1).astype(np.float64)
    out = np.zeros((bits.shape[0], y.shape[1]))
    for j in range(y.shape[1]):
        yigi = bits @ y[:, j]
        ysum = y[:, j].sum()
        r = n * yigi - n1 * ysum
        denom = n * n1 - n1 * n1
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.where(denom > 0, r * r / denom, 0.0)
        ok = (n1 >= min_count) & ((n - n1) >= min_count)
        out[:, j] = np.where(ok, s, 0.0)
    return out


def test_unpack_roundtrip():
    rng = np.random.default_rng(0)
    bits, packed, _, n_pad = rand_problem(rng)
    up = np.asarray(bitplanes.unpack_bits(jnp.asarray(packed)))
    assert np.array_equal(up[:, : bits.shape[1]], bits)
    assert np.all(up[:, bits.shape[1]:] == 0)
    pm1 = np.asarray(bitplanes.unpack_bits_pm1(jnp.asarray(packed)))
    assert np.array_equal(pm1[:, : bits.shape[1]], bits.astype(np.int8) * 2 - 1)


def test_popcount_rows():
    rng = np.random.default_rng(1)
    bits, packed, _, _ = rand_problem(rng)
    pc = np.asarray(bitplanes.popcount_rows(jnp.asarray(packed)))
    assert np.array_equal(pc, bits.sum(axis=1))


@pytest.mark.parametrize("min_count", [1, 5])
def test_score_batch_matches_reference(min_count):
    rng = np.random.default_rng(2)
    bits, packed, y, n_pad = rand_problem(rng)
    n = bits.shape[1]
    yp, ysum = score.prepare_phenotypes(y, n_pad)
    got = np.asarray(score.score_batch(
        jnp.asarray(packed), jnp.asarray(bits.sum(axis=1), jnp.float32),
        yp, ysum, n_used=n, min_count=min_count))
    expect = reference_scores(bits, y, min_count)
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=1e-4)


def test_score_batch_pallas_interpret_matches_xla():
    # Pallas kernel in interpret mode (CPU) must agree with the XLA path
    from functools import partial
    import jax.experimental.pallas as pl
    rng = np.random.default_rng(3)
    bits, packed, y, n_pad = rand_problem(rng, r=256, n=100, p=3)
    n = bits.shape[1]
    yp, ysum = score.prepare_phenotypes(y, n_pad)
    pc = jnp.asarray(bits.sum(axis=1), jnp.float32)
    xla = score.score_batch(jnp.asarray(packed), pc, yp, ysum,
                            n_used=n, min_count=2)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        pal = score.score_batch_pallas(jnp.asarray(packed), pc, yp, ysum,
                                       n_used=n, min_count=2, tile_rows=128)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(xla), rtol=1e-5, atol=1e-5)


def test_topk_streaming_matches_global_sort():
    rng = np.random.default_rng(4)
    total, p, k = 1000, 3, 50
    scores_all = rng.normal(size=(total, p)).astype(np.float32)
    state = topk.init_state(p, k)
    for start in range(0, total, 128):
        chunk = scores_all[start:start + 128]
        rows = np.arange(start, start + len(chunk), dtype=np.int64)
        lo, hi = topk.encode_rows(rows)
        state = topk.update(state, jnp.asarray(chunk), jnp.asarray(lo), jnp.asarray(hi))
    result = topk.finalize(state)
    for j in range(p):
        got_scores, got_rows = result[j]
        order = np.argsort(-scores_all[:, j], kind="stable")[:k]
        np.testing.assert_allclose(np.sort(got_scores), np.sort(scores_all[order, j]), rtol=1e-6)
        assert set(got_rows.tolist()) == set(order.tolist())


def test_topk_tie_keeps_earliest_row():
    p, k = 1, 2
    state = topk.init_state(p, k)
    sc = np.array([[1.0], [1.0], [1.0], [2.0]], dtype=np.float32)
    lo, hi = topk.encode_rows(np.arange(4))
    state = topk.update(state, jnp.asarray(sc), jnp.asarray(lo), jnp.asarray(hi))
    _, rows = topk.finalize(state)[0]
    # heap semantics: score-2 row plus the EARLIEST of the tied score-1 rows
    assert set(rows.tolist()) == {3, 0}


def test_topk_row_encoding_large():
    rows = np.array([0, 2**31 + 5, 2**33, 123456789012], dtype=np.int64)
    lo, hi = topk.encode_rows(rows)
    assert np.array_equal(topk.decode_rows(lo, hi), rows)


def test_kinship_matches_reference_xnor():
    rng = np.random.default_rng(5)
    r, n = 500, 37
    bits, packed, _, n_pad = rand_problem(rng, r=r, n=n)
    acc = kinship.KinshipAccumulator(n_used=n, n_pad=n_pad)
    for start in range(0, r, 200):
        acc.add(jnp.asarray(packed[start:start + 200]))
    K = acc.finalize()
    # reference: K[i][j] = mean over rows of (1 ^ g_i ^ g_j); diag = 1
    g = bits.astype(np.int64)
    expect = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            expect[i, j] = np.mean(1 ^ g[:, i] ^ g[:, j])
    np.fill_diagonal(expect, 1.0)
    np.testing.assert_allclose(K, expect, atol=1e-12)


def test_blocked_top_k_exactly_matches_flat():
    rng = np.random.default_rng(10)
    for trial in range(8):
        p, r, k = 3, 512, rng.integers(2, 40)
        # heavy ties: quantized scores force boundary-tie handling
        sc = np.round(rng.normal(size=(p, r)) * 3) / 3
        sc = sc.astype(np.float32)
        v1, i1 = jax.lax.top_k(jnp.asarray(sc), int(k))
        v2, i2 = topk.blocked_top_k(jnp.asarray(sc), int(k), block=16)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_blocked_top_k_unaligned_and_small():
    rng = np.random.default_rng(11)
    sc = rng.normal(size=(2, 100)).astype(np.float32)  # 100 % 16 != 0
    v1, i1 = jax.lax.top_k(jnp.asarray(sc), 7)
    v2, i2 = topk.blocked_top_k(jnp.asarray(sc), 7, block=16)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    # k >= r falls back to flat
    v3, i3 = topk.blocked_top_k(jnp.asarray(sc), 200, block=16)
    assert v3.shape == (2, 100)


def _strided_bmax(sc, block, tile_rows):
    p, r = sc.shape
    nb = tile_rows // block
    t = sc.reshape(p, r // tile_rows, block, nb)
    return t.max(axis=2).reshape(p, -1)


def test_strided_top_k_from_bmax_matches_flat():
    rng = np.random.default_rng(12)
    n_exact = 0
    for trial in range(10):
        p, r, k = 3, 512, int(rng.integers(2, 40))
        if trial % 2:   # distinct values: extraction must be exact
            sc = rng.permutation(r * p).reshape(p, r).astype(np.float32)
        else:           # heavy ties: flag must guard correctness
            sc = (np.round(rng.normal(size=(p, r)) * 3) / 3).astype(np.float32)
        for tile_rows in (r, 128):
            bmax = _strided_bmax(sc, 16, tile_rows)
            v1, i1 = jax.lax.top_k(jnp.asarray(sc), k)
            v2, i2, exact = topk.strided_top_k_from_bmax(
                jnp.asarray(sc), jnp.asarray(bmax), k, tile_rows=tile_rows)
            if bool(exact):
                n_exact += 1
                np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
                np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
            if trial % 2:
                assert bool(exact), "distinct values must extract exactly"
    assert n_exact >= 10


def test_score_bmax_pallas_interpret_matches_xla():
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.default_rng(13)
    bits, packed, y, n_pad = rand_problem(rng, r=256, n=100, p=3)
    n = bits.shape[1]
    yp, ysum = score.prepare_phenotypes(y, n_pad)
    pc = jnp.asarray(bits.sum(axis=1), jnp.float32)
    xla = np.asarray(score.score_batch(jnp.asarray(packed), pc, yp, ysum,
                                       n_used=n, min_count=2)).T
    xla = np.where(np.asarray(pc)[None, :] > 0, xla, -np.inf)
    with pltpu.force_tpu_interpret_mode():
        sc, bmax = score.score_batch_t_pallas_bmax(
            jnp.asarray(packed), pc, yp, ysum, n_used=n, min_count=2,
            tile_rows=128, block=16)
    np.testing.assert_allclose(np.asarray(sc), xla, rtol=1e-5, atol=1e-5)
    expect_bmax = _strided_bmax(xla, 16, 128)
    np.testing.assert_allclose(np.asarray(bmax), expect_bmax,
                               rtol=1e-5, atol=1e-5)


def test_scan_step_buffered_matches_plain():
    """Buffered deferred-merge scan must produce exactly the plain path's
    final top-k (values AND rows) across a long tie-heavy stream, exercising
    both the buffer-append and the flush/fallback branches."""
    from kmersgwas_tpu.ops import scanstep
    rng = np.random.default_rng(14)
    n, p, k = 40, 3, 16
    n_pad, w32 = 128, 4
    rows_per, n_batches = 256, 24
    min_count = 2
    y = rng.normal(size=(n, p))
    yp, ysum = score.prepare_phenotypes(y, n_pad)

    state_p = topk.init_state(p, k)
    state_b = scanstep.init_buffered_state(p, k, buf_cap=32)
    n_buffered = 0
    for b in range(n_batches):
        bits = rng.integers(0, 2, size=(rows_per, n)).astype(np.uint8)
        padded = np.zeros((rows_per, n_pad), dtype=np.uint8)
        padded[:, :n] = bits
        packed = jnp.asarray(bitplanes.pack_bits_np(padded))
        # quantize popcount-driven scores into heavy ties
        pc = jnp.asarray(bits.sum(axis=1), jnp.float32)
        lo, hi = topk.encode_rows(np.arange(b * rows_per, (b + 1) * rows_per))
        lo, hi = jnp.asarray(lo), jnp.asarray(hi)
        state_p = scanstep.scan_step(state_p, packed, pc, lo, hi, yp, ysum,
                                     n_used=n, min_count=min_count,
                                     kernel="xla", cand_k=8)
        prev_n = int(state_b.buf_n)
        state_b = scanstep.scan_step_buffered(
            state_b, packed, pc, lo, hi, yp, ysum, n_used=n,
            min_count=min_count, kernel="xla", cand_c=8, cand_k=12)
        if int(state_b.buf_n) > prev_n:
            n_buffered += 1
    assert n_buffered >= 5, "buffer path never engaged; test is vacuous"
    final_b = scanstep.flush_buffered(state_b)
    np.testing.assert_array_equal(np.asarray(state_p.scores),
                                  np.asarray(final_b.scores))
    np.testing.assert_array_equal(
        topk.decode_rows(np.asarray(state_p.row_lo), np.asarray(state_p.row_hi)),
        topk.decode_rows(np.asarray(final_b.row_lo), np.asarray(final_b.row_hi)))


def test_scan_step_buffered_multi_matches_sequential():
    """Chained multi-batch step == B sequential buffered steps, bitwise."""
    import functools
    from kmersgwas_tpu.ops import scanstep as ss
    from kmersgwas_tpu.ops import score as score_ops
    rng = np.random.default_rng(12)
    n, p, k, r, B = 40, 3, 24, 256, 4
    n_pad = 128
    w32 = n_pad // 32
    y = rng.normal(size=(n, p)).astype(np.float32)
    yp, ysum = score_ops.prepare_phenotypes(y, n_pad)
    kw = dict(y_padded=yp, y_sum=ysum, n_used=n, min_count=2,
              kernel="xla", cand_c=8, cand_k=8)
    packed = np.zeros((B, r, w32), np.uint32)
    popcnt = np.zeros((B, r), np.float32)
    los = np.zeros((B, r), np.int32)
    his = np.zeros((B, r), np.int32)
    for b in range(B):
        bits = rng.integers(0, 2, size=(r, n)).astype(np.uint8)
        padded = np.zeros((r, n_pad), np.uint8)
        padded[:, :n] = bits
        packed[b] = bitplanes.pack_bits_np(padded)
        popcnt[b] = bits.sum(axis=1)
        lo, hi = topk.encode_rows(np.arange(b * r, (b + 1) * r))
        los[b], his[b] = lo, hi
    s_seq = ss.init_buffered_state(p, k, buf_cap=8 * 4)
    for b in range(B):
        s_seq = ss.scan_step_buffered(s_seq, jnp.asarray(packed[b]),
                                      jnp.asarray(popcnt[b]),
                                      jnp.asarray(los[b]),
                                      jnp.asarray(his[b]), **kw)
    s_multi = ss.scan_step_buffered_multi(
        ss.init_buffered_state(p, k, buf_cap=8 * 4), jnp.asarray(packed),
        jnp.asarray(popcnt), jnp.asarray(los), jnp.asarray(his), **kw)
    for a, b_ in zip(s_seq, s_multi):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_scan_step_compact_matches_plain():
    """Compact tile-max scan must produce exactly the plain path's final
    top-k (values AND rows) across a long tie-heavy stream, exercising the
    append, buffer-full-flush, and hot-batch-fallback branches, at both
    c == n_tiles and c < n_tiles."""
    from kmersgwas_tpu.ops import scanstep
    rng = np.random.default_rng(15)
    n, p, k = 40, 3, 16
    n_pad = 128
    rows_per, n_batches = 256, 24
    min_count = 2
    y = rng.normal(size=(n, p))
    yp, ysum = score.prepare_phenotypes(y, n_pad)

    batches = []
    for b in range(n_batches):
        bits = rng.integers(0, 2, size=(rows_per, n)).astype(np.uint8)
        padded = np.zeros((rows_per, n_pad), dtype=np.uint8)
        padded[:, :n] = bits
        packed = jnp.asarray(bitplanes.pack_bits_np(padded))
        pc = jnp.asarray(bits.sum(axis=1), jnp.float32)
        lo, hi = topk.encode_rows(np.arange(b * rows_per, (b + 1) * rows_per))
        batches.append((packed, pc, jnp.asarray(lo), jnp.asarray(hi)))

    state_p = topk.init_state(p, k)
    for packed, pc, lo, hi in batches:
        state_p = scanstep.scan_step(state_p, packed, pc, lo, hi, yp, ysum,
                                     n_used=n, min_count=min_count,
                                     kernel="xla", cand_k=8)

    for tile_rows in (64, 16):      # c == n_tiles and c < n_tiles
        state_c = scanstep.init_buffered_state(p, k, buf_cap=24)
        n_append = 0
        for packed, pc, lo, hi in batches:
            prev_n = int(state_c.buf_n)
            state_c = scanstep.scan_step_compact(
                state_c, packed, pc, lo, hi, yp, ysum, n_used=n,
                min_count=min_count, kernel="xla", cand_c=4, cand_k=12,
                tile_rows=tile_rows)
            if int(state_c.buf_n) > prev_n:
                n_append += 1
        assert n_append >= 5, "compact append path never engaged"
        assert n_append < n_batches, "fallback path never engaged"
        final_c = scanstep.flush_buffered(state_c)
        np.testing.assert_array_equal(np.asarray(state_p.scores),
                                      np.asarray(final_c.scores))
        np.testing.assert_array_equal(
            topk.decode_rows(np.asarray(state_p.row_lo),
                             np.asarray(state_p.row_hi)),
            topk.decode_rows(np.asarray(final_c.row_lo),
                             np.asarray(final_c.row_hi)))


def test_score_tilemax_pallas_interpret_matches_xla():
    from jax.experimental.pallas import tpu as pltpu
    from kmersgwas_tpu.ops import scanstep
    rng = np.random.default_rng(16)
    bits, packed, y, n_pad = rand_problem(rng, r=256, n=100, p=3)
    n = bits.shape[1]
    yp, ysum = score.prepare_phenotypes(y, n_pad)
    pc = jnp.asarray(bits.sum(axis=1), jnp.float32)
    # tie-heavy thresholds: include -inf, a mid quantile, and +inf
    sc_ref = np.asarray(score.score_batch(jnp.asarray(packed), pc, yp, ysum,
                                          n_used=n, min_count=2)).T
    sc_ref = np.where(np.asarray(pc)[None, :] > 0, sc_ref, -np.inf)
    for th_val in (-np.inf, np.quantile(sc_ref, 0.9), np.inf):
        th = jnp.full((3,), th_val, jnp.float32)
        tm_x, ta_x, tm2_x, ta2_x, tm3_x, ta3_x, n2_x, n3_x, ct_x = \
            scanstep._tilemax(
                jnp.asarray(packed), pc, yp, ysum, th, n, 2, "xla", 64)
        with pltpu.force_tpu_interpret_mode():
            (tm_p, ta_p, tm2_p, ta2_p, tm3_p, ta3_p, n2_p, n3_p, ct_p) = \
                score.score_batch_t_pallas_tilemax(
                    jnp.asarray(packed), pc, yp, ysum, th,
                    n_used=n, min_count=2, tile_rows=64)
        np.testing.assert_allclose(np.asarray(tm_p), np.asarray(tm_x),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(tm2_p), np.asarray(tm2_x),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(tm3_p), np.asarray(tm3_x),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(ct_p), np.asarray(ct_x))
        np.testing.assert_array_equal(np.asarray(n2_p), np.asarray(n2_x))
        # lanes: the captured value at each returned lane must be genuine;
        # tie resolution between implementations is free to differ
        s3 = np.where(np.asarray(pc)[None, :] > 0, sc_ref,
                      -np.inf).reshape(3, -1, 64)
        for ta, tm in ((ta_p, tm_p), (ta_x, tm_x)):
            picked = np.take_along_axis(s3, np.asarray(ta)[:, :, None],
                                        axis=2)[:, :, 0]
            np.testing.assert_allclose(picked, np.asarray(tm),
                                       rtol=1e-5, atol=1e-5)
        # second lane must differ from the first and hold the second value
        # wherever the second value is unique and below the max
        srt = np.sort(s3, axis=2)[:, :, ::-1]
        uniq = (srt[:, :, 0] > srt[:, :, 1]) & (srt[:, :, 1] > srt[:, :, 2])
        for ta2, tm2 in ((ta2_p, tm2_p), (ta2_x, tm2_x)):
            picked2 = np.take_along_axis(
                s3, np.clip(np.asarray(ta2), 0, 63)[:, :, None],
                axis=2)[:, :, 0]
            np.testing.assert_allclose(picked2[uniq],
                                       np.asarray(tm2)[uniq],
                                       rtol=1e-5, atol=1e-5)
        # third capture: the exactness guard (tmax3 <= th) | (n3 == 1)
        # depends on n3 — pin it between paths, and spot-check targ3 where
        # the third value is unique (mirrors the targ2 assertion)
        np.testing.assert_array_equal(np.asarray(n3_p), np.asarray(n3_x))
        np.testing.assert_allclose(np.asarray(tm3_p), np.asarray(tm3_x),
                                   rtol=1e-5, atol=1e-5)
        uniq3 = uniq & (srt[:, :, 2] > srt[:, :, 3])
        for ta3, tm3 in ((ta3_p, tm3_p), (ta3_x, tm3_x)):
            picked3 = np.take_along_axis(
                s3, np.clip(np.asarray(ta3), 0, 63)[:, :, None],
                axis=2)[:, :, 0]
            np.testing.assert_allclose(picked3[uniq3],
                                       np.asarray(tm3)[uniq3],
                                       rtol=1e-5, atol=1e-5)


def test_scan_step_compact_narrow_append_exact():
    """cand_q narrow appends (only the top-q sorted candidates kept when the
    (q+1)-th is provably <= thresh) must leave the final top-k bit-identical
    to the plain path; the narrow branch must actually engage."""
    from kmersgwas_tpu.ops import scanstep
    rng = np.random.default_rng(21)
    n, p, k = 40, 3, 16
    n_pad = 128
    rows_per, n_batches = 256, 30
    min_count = 2
    y = rng.normal(size=(n, p))
    yp, ysum = score.prepare_phenotypes(y, n_pad)

    batches = []
    for b in range(n_batches):
        bits = rng.integers(0, 2, size=(rows_per, n)).astype(np.uint8)
        padded = np.zeros((rows_per, n_pad), dtype=np.uint8)
        padded[:, :n] = bits
        packed = jnp.asarray(bitplanes.pack_bits_np(padded))
        pc = jnp.asarray(bits.sum(axis=1), jnp.float32)
        lo, hi = topk.encode_rows(np.arange(b * rows_per, (b + 1) * rows_per))
        batches.append((packed, pc, jnp.asarray(lo), jnp.asarray(hi)))

    state_p = topk.init_state(p, k)
    for packed, pc, lo, hi in batches:
        state_p = scanstep.scan_step(state_p, packed, pc, lo, hi, yp, ysum,
                                     n_used=n, min_count=min_count,
                                     kernel="xla", cand_k=8)

    state_c = scanstep.init_buffered_state(p, k, buf_cap=96)
    n_narrow = n_wide = 0
    for packed, pc, lo, hi in batches:
        prev_n = int(state_c.buf_n)
        state_c = scanstep.scan_step_compact(
            state_c, packed, pc, lo, hi, yp, ysum, n_used=n,
            min_count=min_count, kernel="xla", cand_c=16, cand_k=12,
            tile_rows=16, cand_q=8)
        d = int(state_c.buf_n) - prev_n
        if d == 8:
            n_narrow += 1
        elif d == 48:
            n_wide += 1
    assert n_narrow >= 3, f"narrow append never engaged ({n_narrow})"
    final_c = scanstep.flush_buffered(state_c)
    np.testing.assert_array_equal(np.asarray(state_p.scores),
                                  np.asarray(final_c.scores))
    np.testing.assert_array_equal(
        topk.decode_rows(np.asarray(state_p.row_lo),
                         np.asarray(state_p.row_hi)),
        topk.decode_rows(np.asarray(final_c.row_lo),
                         np.asarray(final_c.row_hi)))


def test_score_tilemax_pre_transposed_equivalent():
    """pre_transposed=True on an already-(W32, R) input must match the
    default layout bit-for-bit (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.default_rng(23)
    bits, packed, y, n_pad = rand_problem(rng, r=128, n=90, p=3)
    n = bits.shape[1]
    yp, ysum = score.prepare_phenotypes(y, n_pad)
    pc = jnp.asarray(bits.sum(axis=1), jnp.float32)
    th = jnp.full((3,), 5.0, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        ref = score.score_batch_t_pallas_tilemax(
            jnp.asarray(packed), pc, yp, ysum, th, n_used=n, min_count=2,
            tile_rows=64)
        got = score.score_batch_t_pallas_tilemax(
            jnp.asarray(packed).T, pc, yp, ysum, th, n_used=n, min_count=2,
            tile_rows=64, pre_transposed=True)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_score_precision_plumbing_interpret():
    """precision="highest" must plumb through the tilemax kernel and the
    compact step without changing interpret-mode results (interpret mode
    runs f32 either way; on hardware it selects the multi-pass MXU dot)."""
    from jax.experimental.pallas import tpu as pltpu
    from kmersgwas_tpu.ops import scanstep
    rng = np.random.default_rng(29)
    bits, packed, y, n_pad = rand_problem(rng, r=128, n=60, p=3)
    n = bits.shape[1]
    yp, ysum = score.prepare_phenotypes(y, n_pad)
    pc = jnp.asarray(bits.sum(axis=1), jnp.float32)
    th = jnp.full((3,), 1.0, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        a = score.score_batch_t_pallas_tilemax(
            jnp.asarray(packed), pc, yp, ysum, th, n_used=n, min_count=2,
            tile_rows=64, precision="highest")
        b = score.score_batch_t_pallas_tilemax(
            jnp.asarray(packed), pc, yp, ysum, th, n_used=n, min_count=2,
            tile_rows=64, precision="default")
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               rtol=1e-5)
    # XLA-kernel compact step accepts the arg (no-op there)
    st = scanstep.init_buffered_state(3, 8, buf_cap=24)
    lo, hi = topk.encode_rows(np.arange(128))
    st = scanstep.scan_step_compact(
        st, jnp.asarray(packed), pc, jnp.asarray(lo), jnp.asarray(hi),
        yp, ysum, n_used=n, min_count=2, kernel="xla", cand_c=2, cand_k=6,
        tile_rows=64, precision="highest")
    assert np.isfinite(float(np.asarray(st.thresh)[0]))


def test_scan_step_compact_pre_transposed_stream_equal():
    """Full compact-step streaming equality with pre_transposed=True inputs
    (the bench's layout): final top-k bit-identical to the row-major path
    across append/flush/fallback branches."""
    from kmersgwas_tpu.ops import scanstep
    rng = np.random.default_rng(35)
    n, p, k = 40, 3, 16
    n_pad = 128
    rows_per, n_batches = 256, 16
    min_count = 2
    y = rng.normal(size=(n, p))
    yp, ysum = score.prepare_phenotypes(y, n_pad)

    st_a = scanstep.init_buffered_state(p, k, buf_cap=24)
    st_b = scanstep.init_buffered_state(p, k, buf_cap=24)
    kw = dict(y_padded=yp, y_sum=ysum, n_used=n, min_count=min_count,
              kernel="xla", cand_c=4, cand_k=12, tile_rows=64)
    for b in range(n_batches):
        bits = rng.integers(0, 2, size=(rows_per, n)).astype(np.uint8)
        padded = np.zeros((rows_per, n_pad), dtype=np.uint8)
        padded[:, :n] = bits
        packed = jnp.asarray(bitplanes.pack_bits_np(padded))
        pc = jnp.asarray(bits.sum(axis=1), jnp.float32)
        lo, hi = topk.encode_rows(np.arange(b * rows_per, (b + 1) * rows_per))
        lo, hi = jnp.asarray(lo), jnp.asarray(hi)
        st_a = scanstep.scan_step_compact(st_a, packed, pc, lo, hi, **kw)
        st_b = scanstep.scan_step_compact(st_b, packed.T, pc, lo, hi,
                                          pre_transposed=True, **kw)
    fa = scanstep.flush_buffered(st_a)
    fb = scanstep.flush_buffered(st_b)
    np.testing.assert_array_equal(np.asarray(fa.scores), np.asarray(fb.scores))
    np.testing.assert_array_equal(np.asarray(fa.row_lo), np.asarray(fb.row_lo))
    np.testing.assert_array_equal(np.asarray(fa.row_hi), np.asarray(fb.row_hi))


def test_scan_step_compact_c2_matches_plain():
    """cand_c2 < cand_c (top-3 capture limited to the hottest c2 tiles,
    top-1 elsewhere, guarded by the v2-cold condition): final top-k must
    still equal the plain path exactly, with both append and fallback
    branches engaged."""
    from kmersgwas_tpu.ops import scanstep
    rng = np.random.default_rng(17)
    n, p, k = 40, 3, 16
    n_pad = 128
    rows_per, n_batches = 256, 24
    min_count = 2
    y = rng.normal(size=(n, p))
    yp, ysum = score.prepare_phenotypes(y, n_pad)

    batches = []
    for b in range(n_batches):
        bits = rng.integers(0, 2, size=(rows_per, n)).astype(np.uint8)
        padded = np.zeros((rows_per, n_pad), dtype=np.uint8)
        padded[:, :n] = bits
        packed = jnp.asarray(bitplanes.pack_bits_np(padded))
        pc = jnp.asarray(bits.sum(axis=1), jnp.float32)
        lo, hi = topk.encode_rows(np.arange(b * rows_per, (b + 1) * rows_per))
        batches.append((packed, pc, jnp.asarray(lo), jnp.asarray(hi)))

    state_p = topk.init_state(p, k)
    for packed, pc, lo, hi in batches:
        state_p = scanstep.scan_step(state_p, packed, pc, lo, hi, yp, ysum,
                                     n_used=n, min_count=min_count,
                                     kernel="xla", cand_k=8)

    # tile_rows=16 -> n_tiles=16, c=8, c2=2: width = 8 + 4 = 12 | buf 24
    state_c = scanstep.init_buffered_state(p, k, buf_cap=24)
    n_append = 0
    for packed, pc, lo, hi in batches:
        prev_n = int(state_c.buf_n)
        state_c = scanstep.scan_step_compact(
            state_c, packed, pc, lo, hi, yp, ysum, n_used=n,
            min_count=min_count, kernel="xla", cand_c=8, cand_k=12,
            tile_rows=16, cand_c2=2)
        if int(state_c.buf_n) > prev_n:
            n_append += 1
    assert n_append >= 3, "compact append path never engaged"
    assert n_append < n_batches, "fallback path never engaged"
    final_c = scanstep.flush_buffered(state_c)
    np.testing.assert_array_equal(np.asarray(state_p.scores),
                                  np.asarray(final_c.scores))
    np.testing.assert_array_equal(
        topk.decode_rows(np.asarray(state_p.row_lo),
                         np.asarray(state_p.row_hi)),
        topk.decode_rows(np.asarray(final_c.row_lo),
                         np.asarray(final_c.row_hi)))


def test_score_tilemax_chunked_and_blocked_matches_single(monkeypatch):
    """Wide phenotype axis: the tilemax kernel chunks P past _P_CHUNK and
    switches to revisited 128-lane output blocks past the VMEM plane
    budget; both modes must reproduce the single-call kernel's planes
    EXACTLY (interpret mode) — same per-element math, different storage."""
    import jax as _jax
    from jax.experimental.pallas import tpu as pltpu
    from kmersgwas_tpu.ops import score as score_mod

    rng = np.random.default_rng(23)
    p_wide = 20
    bits, packed, y, n_pad = rand_problem(rng, r=256, n=60, p=p_wide)
    n = bits.shape[1]
    yp, ysum = score_mod.prepare_phenotypes(y, n_pad)
    pc = jnp.asarray(bits.sum(axis=1), jnp.float32)
    th = jnp.asarray(rng.normal(size=p_wide).astype(np.float32)) ** 2

    def run():
        with pltpu.force_tpu_interpret_mode():
            return [np.asarray(o) for o in
                    score_mod.score_batch_t_pallas_tilemax(
                        jnp.asarray(packed), pc, yp, ysum, th,
                        n_used=n, min_count=2, tile_rows=64)]

    ref = run()

    # chunked path (chunk=8 < 20 columns)
    _jax.clear_caches()
    monkeypatch.setattr(score_mod, "_P_CHUNK", 8)
    got = run()
    for r_, g_ in zip(ref, got):
        np.testing.assert_array_equal(g_, r_)

    # + blocked store mode (budget 1 byte)
    _jax.clear_caches()
    monkeypatch.setattr(score_mod, "_VMEM_PLANE_BUDGET", 1)
    got = run()
    for r_, g_ in zip(ref, got):
        np.testing.assert_array_equal(g_, r_)
    _jax.clear_caches()


def test_score_bmax_chunked_matches_xla(monkeypatch):
    """score_batch_t_pallas[_bmax] P-chunking reproduces the single-call
    result (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu
    from kmersgwas_tpu.ops import score as score_mod

    rng = np.random.default_rng(24)
    bits, packed, y, n_pad = rand_problem(rng, r=128, n=50, p=12)
    n = bits.shape[1]
    yp, ysum = score_mod.prepare_phenotypes(y, n_pad)
    pc = jnp.asarray(bits.sum(axis=1), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        sc1 = score_mod.score_batch_t_pallas(
            jnp.asarray(packed), pc, yp, ysum, n_used=n, min_count=2,
            tile_rows=64)
        b1s, b1m = score_mod.score_batch_t_pallas_bmax(
            jnp.asarray(packed), pc, yp, ysum, n_used=n, min_count=2,
            tile_rows=64, block=16)
    monkeypatch.setattr(score_mod, "_P_CHUNK", 5)
    with pltpu.force_tpu_interpret_mode():
        sc2 = score_mod.score_batch_t_pallas(
            jnp.asarray(packed), pc, yp, ysum, n_used=n, min_count=2,
            tile_rows=64)
        b2s, b2m = score_mod.score_batch_t_pallas_bmax(
            jnp.asarray(packed), pc, yp, ysum, n_used=n, min_count=2,
            tile_rows=64, block=16)
    np.testing.assert_array_equal(np.asarray(sc1), np.asarray(sc2))
    np.testing.assert_array_equal(np.asarray(b1s), np.asarray(b2s))
    np.testing.assert_array_equal(np.asarray(b1m), np.asarray(b2m))


def test_scan_step_compact_topw_matches_plain():
    """cand_w (in-kernel running top-W mode, XLA mirror here) must produce
    exactly the plain path's final top-k (values AND rows) across a
    tie-heavy stream, with the narrow append, wide append, and fallback
    branches all engaging."""
    from kmersgwas_tpu.ops import scanstep
    rng = np.random.default_rng(33)
    n, p, k = 40, 3, 16
    n_pad = 128
    rows_per, n_batches = 256, 30
    min_count = 2
    y = rng.normal(size=(n, p))
    yp, ysum = score.prepare_phenotypes(y, n_pad)

    batches = []
    for b in range(n_batches):
        bits = rng.integers(0, 2, size=(rows_per, n)).astype(np.uint8)
        padded = np.zeros((rows_per, n_pad), dtype=np.uint8)
        padded[:, :n] = bits
        packed = jnp.asarray(bitplanes.pack_bits_np(padded))
        pc = jnp.asarray(bits.sum(axis=1), jnp.float32)
        lo, hi = topk.encode_rows(np.arange(b * rows_per, (b + 1) * rows_per))
        batches.append((packed, pc, jnp.asarray(lo), jnp.asarray(hi)))

    state_p = topk.init_state(p, k)
    for packed, pc, lo, hi in batches:
        state_p = scanstep.scan_step(state_p, packed, pc, lo, hi, yp, ysum,
                                     n_used=n, min_count=min_count,
                                     kernel="xla", cand_k=8)

    for tile_rows in (64, 16):
        state_c = scanstep.init_buffered_state(p, k, buf_cap=24)
        n_narrow = n_wide = n_skip = 0
        for packed, pc, lo, hi in batches:
            prev_n = int(state_c.buf_n)
            state_c = scanstep.scan_step_compact(
                state_c, packed, pc, lo, hi, yp, ysum, n_used=n,
                min_count=min_count, kernel="xla", cand_k=12,
                tile_rows=tile_rows, cand_w=8, cand_q=4)
            d = (int(state_c.buf_n) - prev_n) % 24
            if d == 4:
                n_narrow += 1
            elif d == 8:
                n_wide += 1
            else:
                n_skip += 1       # fallback (buf reset) or flush boundary
        assert n_narrow >= 3, f"narrow append never engaged ({n_narrow})"
        assert n_narrow + n_wide < n_batches, "fallback never engaged"
        final_c = scanstep.flush_buffered(state_c)
        np.testing.assert_array_equal(np.asarray(state_p.scores),
                                      np.asarray(final_c.scores))
        np.testing.assert_array_equal(
            topk.decode_rows(np.asarray(state_p.row_lo),
                             np.asarray(state_p.row_hi)),
            topk.decode_rows(np.asarray(final_c.row_lo),
                             np.asarray(final_c.row_hi)))


def test_score_topw_pallas_interpret_matches_xla():
    """The in-kernel running top-W kernel (interpret mode) must agree with
    the XLA mirror: identical guards and candidate VALUES; identical
    (value, lane) pairs on the hot prefix (cold tail order is free)."""
    from jax.experimental.pallas import tpu as pltpu
    from kmersgwas_tpu.ops import scanstep
    rng = np.random.default_rng(34)
    bits, packed, y, n_pad = rand_problem(rng, r=256, n=100, p=3)
    n = bits.shape[1]
    yp, ysum = score.prepare_phenotypes(y, n_pad)
    pc = jnp.asarray(bits.sum(axis=1), jnp.float32)
    sc_ref = np.asarray(score.score_batch(jnp.asarray(packed), pc, yp, ysum,
                                          n_used=n, min_count=2)).T
    sc_ref = np.where(np.asarray(pc)[None, :] > 0, sc_ref, -np.inf)
    for th_val in (-np.inf, np.quantile(sc_ref, 0.9),
                   np.quantile(sc_ref, 0.999), np.inf):
        th = jnp.full((3,), th_val, jnp.float32)
        v_x, g_x, ok_x = scanstep._topw_xla(
            jnp.asarray(packed), pc, yp, ysum, th, n, 2, 64, 128)
        with pltpu.force_tpu_interpret_mode():
            v_p, g_p, ok_p = score.score_batch_t_pallas_topw(
                jnp.asarray(packed), pc, yp, ysum, th,
                n_used=n, min_count=2, tile_rows=64, cand_w=128)
        # the kernel's replace-min list is unsorted; apply the step's
        # (value desc, lane asc) repair sort before comparing
        order = np.lexsort((np.asarray(g_p), -np.asarray(v_p)), axis=1)
        v_p = np.take_along_axis(np.asarray(v_p), order, axis=1)
        g_p = np.take_along_axis(np.asarray(g_p), order, axis=1)
        np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_x))
        np.testing.assert_allclose(v_p, np.asarray(v_x),
                                   rtol=1e-5, atol=1e-5)
        # hot prefix: exact (value, lane) agreement column by column —
        # guaranteed whenever the step would USE the candidates (its
        # min <= thresh guard holds, so boundary twins are cold)
        for j in range(3):
            if not (v_x[j, -1] <= th_val):
                continue        # step falls back; outputs unused
            hot = np.asarray(v_x[j]) > th_val
            np.testing.assert_array_equal(g_p[j][hot],
                                          np.asarray(g_x[j])[hot])
        # every returned lane's true score equals the returned value
        for vv, gg in ((v_p, g_p), (v_x, g_x)):
            got = np.take_along_axis(sc_ref, np.asarray(gg), axis=1)
            finite = np.isfinite(np.asarray(vv))
            np.testing.assert_allclose(got[finite],
                                       np.asarray(vv)[finite],
                                       rtol=1e-5, atol=1e-5)


def test_scan_step_compact_colgroup_matches_plain():
    """Per-column-group decisions (col_group < P): the final top-k must be
    exactly the plain path's even when one column group is persistently
    hot/tie-heavy (forcing ITS fallback while other groups keep appending),
    for both the tile-max and the cand_w candidate paths."""
    from kmersgwas_tpu.ops import scanstep
    rng = np.random.default_rng(35)
    n, p, k = 40, 10, 12
    n_pad = 128
    rows_per, n_batches = 256, 24
    min_count = 2
    y = rng.normal(size=(n, p))
    y[:, 2] = np.sign(y[:, 2])       # quantized column -> heavy score ties
    yp, ysum = score.prepare_phenotypes(y, n_pad)

    batches = []
    for b in range(n_batches):
        bits = rng.integers(0, 2, size=(rows_per, n)).astype(np.uint8)
        bits[:, 1] = bits[:, 0]      # duplicated accessions -> more ties
        padded = np.zeros((rows_per, n_pad), dtype=np.uint8)
        padded[:, :n] = bits
        packed = jnp.asarray(bitplanes.pack_bits_np(padded))
        pc = jnp.asarray(bits.sum(axis=1), jnp.float32)
        lo, hi = topk.encode_rows(np.arange(b * rows_per, (b + 1) * rows_per))
        batches.append((packed, pc, jnp.asarray(lo), jnp.asarray(hi)))

    state_p = topk.init_state(p, k)
    for packed, pc, lo, hi in batches:
        state_p = scanstep.scan_step(state_p, packed, pc, lo, hi, yp, ysum,
                                     n_used=n, min_count=min_count,
                                     kernel="xla", cand_k=8)

    for mode_kw in (dict(cand_c=4, cand_q=4),
                    dict(cand_w=8, cand_q=4)):
        # col_group=4 -> groups [0:4) [4:8) [8:10): decisions cross a
        # group boundary and the last group is ragged
        state_c = scanstep.init_buffered_state(p, k, buf_cap=24)
        appended = 0
        for packed, pc, lo, hi in batches:
            prev = int(state_c.buf_n)
            state_c = scanstep.scan_step_compact(
                state_c, packed, pc, lo, hi, yp, ysum, n_used=n,
                min_count=min_count, kernel="xla", cand_k=12,
                tile_rows=16, col_group=4, **mode_kw)
            if int(state_c.buf_n) != prev:
                appended += 1
        assert appended >= 5, f"group append path never engaged ({mode_kw})"
        final_c = scanstep.flush_buffered(state_c)
        np.testing.assert_array_equal(np.asarray(state_p.scores),
                                      np.asarray(final_c.scores))
        np.testing.assert_array_equal(
            topk.decode_rows(np.asarray(state_p.row_lo),
                             np.asarray(state_p.row_hi)),
            topk.decode_rows(np.asarray(final_c.row_lo),
                             np.asarray(final_c.row_hi)))
