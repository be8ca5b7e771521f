"""Codec property tests: encode/decode, RC, canonization, hashing, slicing."""
import numpy as np
import pytest

from kmersgwas_tpu.core import codec


def _random_kmers(rng, n, k):
    return rng.integers(0, 1 << (2 * k), size=n, dtype=np.uint64)


def test_encode_decode_roundtrip():
    strings = ["ACGT" * 7 + "ACG", "T" * 31, "A" * 31, "GATTACA" * 4 + "GAT"]
    codes = codec.encode_kmers(strings)
    assert codec.decode_kmers(codes, 31) == strings


def test_encode_known_values():
    # A=0 C=1 G=2 T=3, last base in bits 0..1
    assert codec.encode_kmers(["AAT"])[0] == 3
    assert codec.encode_kmers(["TAA"])[0] == 3 << 4
    assert codec.encode_kmers(["ACGT"])[0] == 0b00011011


@pytest.mark.parametrize("k", [15, 21, 31])
def test_reverse_complement_involution(k):
    rng = np.random.default_rng(0)
    x = _random_kmers(rng, 1000, k)
    assert np.array_equal(codec.reverse_complement(codec.reverse_complement(x, k), k), x)


def test_reverse_complement_matches_string_rc():
    k = 31
    rng = np.random.default_rng(1)
    x = _random_kmers(rng, 50, k)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    for code, s in zip(x, codec.decode_kmers(x, k)):
        rc_str = "".join(comp[c] for c in reversed(s))
        assert codec.decode_kmers(codec.reverse_complement(np.array([code]), k), k)[0] == rc_str


def test_canonize_min_and_flags():
    k = 21
    rng = np.random.default_rng(2)
    x = _random_kmers(rng, 500, k)
    canon = codec.canonize(x, k)
    rc = codec.reverse_complement(x, k)
    assert np.array_equal(canon, np.minimum(x, rc))
    c2, flags = codec.canon_flags(x, k)
    assert np.array_equal(c2, canon)
    fwd = x < rc
    assert np.all(flags[fwd] == codec.FLAG_CANON_ONLY)
    assert np.all(flags[~fwd] == codec.FLAG_NON_CANON_ONLY)


def test_hash64_reference_vector():
    # MurmurHash3 fmix64 of 0x123456789abcdef computed independently
    def fmix64(k):
        mask = (1 << 64) - 1
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & mask
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & mask
        k ^= k >> 33
        return k
    vals = np.array([0, 1, 0x123456789ABCDEF, (1 << 64) - 1], dtype=np.uint64)
    expect = np.array([fmix64(int(v)) for v in vals], dtype=np.uint64)
    assert np.array_equal(codec.hash64(vals), expect)


def test_step_threshold_matches_reference_formula():
    # kmers_step_to_threshold(step, total, k) = ((max_kmer/total)+1)*step
    for k in (15, 31):
        max_kmer = (1 << (2 * k)) - 1
        for total in (5000, 7):
            for step in (1, 3, total):
                assert codec.step_threshold(step, total, k) == ((max_kmer // total) + 1) * step
    b = codec.step_bounds(5000, 31)
    assert b[0] == codec.step_threshold(1, 5000, 31)
    assert b[-1] == codec.step_threshold(5000, 5000, 31)
    assert int(b[-1]) >= (1 << 62) - 1  # last slice covers the whole space


def test_bit_reverse64():
    assert codec.bit_reverse64(np.uint64(1)) == np.uint64(1) << np.uint64(63)
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 63, size=100, dtype=np.uint64)
    assert np.array_equal(codec.bit_reverse64(codec.bit_reverse64(x)), x)


def test_pattern_hash_distinguishes_rows():
    rows = np.array([[1, 2], [1, 3], [1, 2]], dtype=np.uint64)
    h = codec.pattern_hash(rows)
    assert h[0] == h[2] and h[0] != h[1]
