"""Association score scan: the hot kernel of the framework.

Reference semantics (src/kmers_multiple_databases.cpp:327-363
`calculate_kmer_score`): for phenotype vector y (padded with zeros to the
lane width) and a k-mer's presence bits g over N used samples with
N1 = popcount(g),

    yigi  = sum_i y_i * g_i
    score = (N*yigi - N1*sum(y))^2 / (N*N1 - N1^2)       (0 if N1 or N0 < mac)

The reference computes yigi row-at-a-time with an SSE4.1 masked accumulate;
here the whole batch is one bit-matrix x phenotype-matrix product on the MXU:
scores for R k-mers x P phenotype columns = G(R,N) @ Y(N,P) followed by an
elementwise VPU epilogue. The CTPL thread pool over phenotype columns
(associate_kmers.cpp:134-137) collapses into the P axis of the GEMM.

Two implementations:
  * `score_batch`  — pure-XLA (unpack + dot); runs anywhere, used for tests.
  * `score_batch_pallas` — fused Pallas TPU kernel: packed uint32 tiles are
    DMA'd to VMEM, unpacked on the VPU, multiplied on the MXU, and only the
    (R,P) score tile is written back; the dense (R,N) bit matrix never
    touches HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bitplanes import unpack_bits


def prepare_phenotypes(values, n_lanes: int):
    """Phenotype columns (N, P) -> zero-padded (n_lanes, P) f32 + column sums.

    Zero padding reproduces update_scores_and_sum's resize-with-zeros
    (kmers_multiple_databases.cpp:288-295); the SSE lane permutation
    (kmer_general.cpp:155-167 permute_scores) is unnecessary here because the
    GEMM is order-invariant.
    """
    y = jnp.asarray(values, dtype=jnp.float32)
    if y.ndim == 1:
        y = y[:, None]
    n, p = y.shape
    yp = jnp.zeros((n_lanes, p), jnp.float32).at[:n, :].set(y)
    return yp, jnp.sum(y, axis=0)


def _score_epilogue(yigi, popcnt, y_sum, n_used, min_count):
    n = jnp.float32(n_used)
    n1 = popcnt[:, None]
    r = n * yigi - n1 * y_sum[None, :]
    denom = n * n1 - n1 * n1
    score = jnp.where(denom > 0, (r * r) / denom, 0.0)
    ok = (n1 >= min_count) & ((n - n1) >= min_count)
    return jnp.where(ok, score, 0.0)


@functools.partial(jax.jit, static_argnames=("n_used", "min_count"))
def score_batch(packed, popcnt, y_padded, y_sum, *, n_used: int, min_count: int):
    """XLA path: (R, W32) packed bits -> (R, P) scores."""
    g = unpack_bits(packed, jnp.float32)          # (R, N_pad)
    yigi = jnp.dot(g, y_padded, preferred_element_type=jnp.float32)
    return _score_epilogue(yigi, popcnt, y_sum, n_used, min_count)


# ---------------------------------------------------------------------------
# Transposed fused kernel: k-mers in the lane dimension
# ---------------------------------------------------------------------------
#
# The natural (R, W32) layout unpacks along lanes of width 32 — hostile to
# the (8,128) VPU tile. Transposing once on device to (W32, R) puts the huge
# k-mer axis in the lanes: the unpack becomes a sublane-broadcast shift and
# the GEMM emits scores directly in (P, R) — the exact layout the blocked
# top-k consumes, so the scan step does zero relayouts.

# phenotype-axis chunk size for the fused kernels: the y block, unpacked
# g matrix, and per-chunk outputs must share the 16 MB VMEM
_P_CHUNK = 256
# whole-plane tilemax outputs switch to revisited 128-lane blocks past this
# total VMEM footprint (module-level so tests can force the blocked mode)
_VMEM_PLANE_BUDGET = 6 << 20


def _unpack_dot_t(w, yt, prec):
    """(W32, TR) packed words x (P_pad, N_pad) yt -> yigi (P_pad, TR).

    prec "bf16": unpack the 0/1 genotype bits straight to bfloat16 and run
    the native bf16 x bf16 -> f32 MXU contract. Scores are BIT-IDENTICAL to
    prec "default" (which rounds both f32 operands to bf16 before the same
    contract; 0/1 are exact in bf16) while the unpacked g matrix is half
    the VMEM bytes — less VPU/store work per tile. Other values pass
    through to jnp.dot(precision=...)."""
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, 32, 1), 1)
    bits = (w[:, None, :] >> shifts) & jnp.uint32(1)      # (W32, 32, TR)
    # Mosaic has no uint32->float cast; hop through int32
    if prec == "bf16":
        g = bits.astype(jnp.int32).astype(jnp.bfloat16).reshape(
            -1, w.shape[1])
        return jnp.dot(yt.astype(jnp.bfloat16), g,
                       preferred_element_type=jnp.float32)
    g = bits.astype(jnp.int32).astype(jnp.float32).reshape(-1, w.shape[1])
    return jnp.dot(yt, g, preferred_element_type=jnp.float32, precision=prec)


def _score_t_kernel(packed_ref, pop_ref, yt_ref, ysum_ref, out_ref,
                    *, n_used: int, min_count: int, prec: str = "default"):
    w = packed_ref[...]                                   # (W32, TR) uint32
    yigi = _unpack_dot_t(w, yt_ref[...], prec)
    n = jnp.float32(n_used)
    n1 = pop_ref[...]                                     # (1, TR)
    r = n * yigi - ysum_ref[...] * n1                     # (P_pad, TR)
    denom = n * n1 - n1 * n1
    score = jnp.where(denom > 0, (r * r) / denom, 0.0)
    ok = (n1 >= jnp.float32(min_count)) & ((n - n1) >= jnp.float32(min_count))
    score = jnp.where(ok, score, 0.0)
    out_ref[...] = jnp.where(n1 > 0, score, -jnp.inf)     # popcnt==0 = padding


@functools.partial(jax.jit, static_argnames=("n_used", "min_count",
                                             "tile_rows", "precision"))
def score_batch_t_pallas(packed, popcnt, y_padded, y_sum, *,
                         n_used: int, min_count: int, tile_rows: int = 2048,
                         precision: str = "default"):
    """Fused kernel -> scores transposed (P, R); padding rows score -inf.

    packed: (R, W32) uint32 (transposed on device), popcnt (R,) f32,
    y_padded (N_pad, P), R % tile_rows == 0.
    """
    rows, w32 = packed.shape
    n_pad, p = y_padded.shape
    assert n_pad == w32 * 32 and rows % tile_rows == 0
    packed_t = packed.T                                   # (W32, R)
    pop2 = popcnt[None, :]                                # (1, R)
    grid = (rows // tile_rows,)

    def call_chunk(y_chunk, ysum_chunk):
        pc = y_chunk.shape[1]
        pc_pad = ((pc + 7) // 8) * 8
        yt = jnp.zeros((pc_pad, n_pad), jnp.float32).at[:pc, :].set(
            y_chunk.T)
        ysum2 = jnp.zeros((pc_pad, 1), jnp.float32).at[:pc, 0].set(
            ysum_chunk)
        out = pl.pallas_call(
            functools.partial(_score_t_kernel, n_used=n_used,
                              min_count=min_count, prec=precision),
            grid=grid,
            in_specs=[
                pl.BlockSpec((w32, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((pc_pad, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((pc_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((pc_pad, tile_rows), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((pc_pad, rows), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * rows * n_pad * pc_pad,
                bytes_accessed=rows * w32 * 4 + n_pad * pc_pad * 4
                + rows * pc_pad * 4,
                transcendentals=0,
            ),
        )(packed_t, pop2, yt, ysum2)
        return out[:pc]

    # chunk the phenotype axis past ~256 columns (y block + unpacked g +
    # the (pc, tile) score block must share VMEM); <= 256 is one call
    if p <= _P_CHUNK:
        return call_chunk(y_padded, y_sum)
    return jnp.concatenate(
        [call_chunk(y_padded[:, s:s + _P_CHUNK], y_sum[s:s + _P_CHUNK])
         for s in range(0, p, _P_CHUNK)], axis=0)


def _score_t_bmax_kernel(packed_ref, pop_ref, yt_ref, ysum_ref,
                         out_ref, bmax_ref, *, n_used: int, min_count: int,
                         block: int, prec: str = "default"):
    w = packed_ref[...]                                   # (W32, TR) uint32
    yigi = _unpack_dot_t(w, yt_ref[...], prec)
    n = jnp.float32(n_used)
    n1 = pop_ref[...]                                     # (1, TR)
    r = n * yigi - ysum_ref[...] * n1                     # (P_pad, TR)
    denom = n * n1 - n1 * n1
    score = jnp.where(denom > 0, (r * r) / denom, 0.0)
    ok = (n1 >= jnp.float32(min_count)) & ((n - n1) >= jnp.float32(min_count))
    score = jnp.where(ok, score, 0.0)
    score = jnp.where(n1 > 0, score, -jnp.inf)            # popcnt==0 = padding
    out_ref[...] = score
    # strided block maxima: group b of this tile = lanes {b + nb*j}, nb =
    # tile_rows/block. Folding `block` contiguous nb-lane slices is pure
    # elementwise vreg max — no lane-axis reshape (which Mosaic rejects).
    tr = score.shape[1]
    nb = tr // block
    bm = score[:, :nb]
    for a in range(1, block):
        bm = jnp.maximum(bm, score[:, a * nb:(a + 1) * nb])
    bmax_ref[...] = bm


@functools.partial(jax.jit, static_argnames=("n_used", "min_count",
                                             "tile_rows", "block",
                                             "precision"))
def score_batch_t_pallas_bmax(packed, popcnt, y_padded, y_sum, *,
                              n_used: int, min_count: int,
                              tile_rows: int = 2048, block: int = 16,
                              precision: str = "default"):
    """Like score_batch_t_pallas, but also emits per-`block`-lane score maxima
    (P, R/block) from VMEM — the level-0 reduction of the blocked top-k fused
    into the score kernel, so extraction never re-reads the (P, R) scores.

    Block membership is STRIDED within each tile: global block g covers lanes
    {tile*tile_rows + (g % nb) + nb*j : j < block}, nb = tile_rows/block,
    tile = g // nb — the layout ops/topk.strided_top_k_from_bmax consumes."""
    rows, w32 = packed.shape
    n_pad, p = y_padded.shape
    assert n_pad == w32 * 32 and rows % tile_rows == 0 and tile_rows % block == 0
    packed_t = packed.T                                   # (W32, R)
    pop2 = popcnt[None, :]                                # (1, R)
    grid = (rows // tile_rows,)

    def call_chunk(y_chunk, ysum_chunk):
        pc = y_chunk.shape[1]
        pc_pad = ((pc + 7) // 8) * 8
        yt = jnp.zeros((pc_pad, n_pad), jnp.float32).at[:pc, :].set(
            y_chunk.T)
        ysum2 = jnp.zeros((pc_pad, 1), jnp.float32).at[:pc, 0].set(
            ysum_chunk)
        sc, bmax = pl.pallas_call(
            functools.partial(_score_t_bmax_kernel, n_used=n_used,
                              min_count=min_count, block=block,
                              prec=precision),
            grid=grid,
            in_specs=[
                pl.BlockSpec((w32, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((pc_pad, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((pc_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((pc_pad, tile_rows), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pc_pad, tile_rows // block), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((pc_pad, rows), jnp.float32),
                jax.ShapeDtypeStruct((pc_pad, rows // block), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * rows * n_pad * pc_pad,
                bytes_accessed=rows * w32 * 4 + n_pad * pc_pad * 4
                + rows * pc_pad * 4 + rows // block * pc_pad * 4,
                transcendentals=0,
            ),
        )(packed_t, pop2, yt, ysum2)
        return sc[:pc], bmax[:pc]

    if p <= _P_CHUNK:
        return call_chunk(y_padded, y_sum)
    parts = [call_chunk(y_padded[:, s:s + _P_CHUNK], y_sum[s:s + _P_CHUNK])
             for s in range(0, p, _P_CHUNK)]
    return (jnp.concatenate([a for a, _ in parts], axis=0),
            jnp.concatenate([b for _, b in parts], axis=0))


def _score_t_tilemax_kernel(packed_ref, pop_ref, yt_ref, ysum_ref, th_ref,
                            tmax_ref, targ_ref, tmax2_ref, targ2_ref,
                            tmax3_ref, targ3_ref, n2_ref, n3_ref,
                            cnt_ref, *, n_used: int, min_count: int,
                            prec: str = "default", blocked: bool = False):
    w = packed_ref[...]                                   # (W32, TR) uint32
    yigi = _unpack_dot_t(w, yt_ref[...], prec)
    n = jnp.float32(n_used)
    n1 = pop_ref[...]                                     # (1, TR)
    r = n * yigi - ysum_ref[...] * n1                     # (P_pad, TR)
    denom = n * n1 - n1 * n1
    score = jnp.where(denom > 0, (r * r) / denom, 0.0)
    ok = (n1 >= jnp.float32(min_count)) & ((n - n1) >= jnp.float32(min_count))
    score = jnp.where(ok, score, 0.0)
    score = jnp.where(n1 > 0, score, -jnp.inf)            # popcnt==0 = padding
    # Per-column tile TOP-3 (values + lanes) + hot count + tie guards:
    #   m1/a1: native max + argmax. The argmax tie rule is unspecified in
    #     Mosaic; that is sufficient — a candidate only enters the final
    #     top-k when its value strictly exceeds thresh, and the caller's
    #     cnt <= 3 fallback plus the captures below cover every such lane.
    #     Candidates <= thresh are dead weight the flush merge drops.
    #   m2/a2 (and m3/a3): the previous lane is pushed to -inf
    #     ARITHMETICALLY (two adds of -3e38 overflow to -inf; where/select
    #     or fold chains fed by a computed broadcast hang the Mosaic
    #     compiler), then a native max; the lane is sum-encoded (sum of idx
    #     over lanes equal to the masked max) — exact whenever that value is
    #     unique among the remaining lanes, which n2/n3 report so the caller
    #     can fall back on ambiguity (n_i > 1 while m_i > thresh).
    m1 = jnp.max(score, axis=1, keepdims=True)
    a1 = jnp.argmax(score, axis=1).astype(jnp.int32)[:, None]
    idx = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    idx_f = idx.astype(jnp.float32)
    big = (idx == a1).astype(jnp.float32) * jnp.float32(-3e38)
    score2 = score + big + big
    m2 = jnp.max(score2, axis=1, keepdims=True)
    eq2 = (score2 == m2).astype(jnp.float32)
    n2 = jnp.sum(eq2, axis=1, keepdims=True).astype(jnp.int32)
    a2 = jnp.sum(idx_f * eq2, axis=1, keepdims=True).astype(jnp.int32)
    big2 = (idx == a2).astype(jnp.float32) * jnp.float32(-3e38)
    score3 = score2 + big2 + big2
    m3 = jnp.max(score3, axis=1, keepdims=True)
    eq3 = (score3 == m3).astype(jnp.float32)
    n3 = jnp.sum(eq3, axis=1, keepdims=True).astype(jnp.int32)
    a3 = jnp.sum(idx_f * eq3, axis=1, keepdims=True).astype(jnp.int32)
    cnt = jnp.sum((score > th_ref[...]).astype(jnp.int32),
                  axis=1, keepdims=True)
    # program t masked-updates lane t % 128 of a 128-lane-aligned output
    # tile (1-lane blocks are not lowerable, nor are unaligned dynamic
    # lane stores). Two storage modes:
    #   blocked=False — outputs are whole-array VMEM-resident blocks (the
    #     flagship-shape fast path; fits up to ~450 phenotype columns);
    #   blocked=True  — outputs are (p_pad, 128) blocks revisited for 128
    #     consecutive grid steps (index map i -> i // 128): VMEM holds one
    #     128-lane tile per output, so arbitrary column counts fit.
    t = pl.program_id(0)
    p_pad = m1.shape[0]
    hit = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (p_pad, 128), 1) == t % 128,
        (p_pad, 128))
    stores = ((tmax_ref, m1), (targ_ref, a1), (tmax2_ref, m2),
              (targ2_ref, a2), (tmax3_ref, m3), (targ3_ref, a3),
              (n2_ref, n2), (n3_ref, n3), (cnt_ref, cnt))
    if blocked:
        for ref, val in stores:
            ref[...] = jnp.where(hit, jnp.broadcast_to(val, (p_pad, 128)),
                                 ref[...])
    else:
        base = pl.multiple_of((t // 128) * 128, 128)
        sl = pl.ds(base, 128)
        for ref, val in stores:
            ref[:, sl] = jnp.where(hit, jnp.broadcast_to(val, (p_pad, 128)),
                                   ref[:, sl])


@functools.partial(jax.jit, static_argnames=("n_used", "min_count",
                                             "tile_rows", "pre_transposed",
                                             "precision"))
def score_batch_t_pallas_tilemax(packed, popcnt, y_padded, y_sum, thresh, *,
                                 n_used: int, min_count: int,
                                 tile_rows: int = 2048,
                                 pre_transposed: bool = False,
                                 precision: str = "default"):
    """Compact scan kernel: scores stay in VMEM; only nine (P, n_tiles)
    planes reach HBM — the per-tile TOP-3 score values with their lanes,
    uniqueness guards n2/n3, and the count of lanes scoring > thresh[p].

    This is the steady-state fast path of the scan: the (P, R) score matrix
    (~0.9 GB per 2M-row batch) is never written, and extraction shrinks to a
    top-k over n_tiles = R/tile_rows lanes. Exactness bookkeeping lives in
    ops/scanstep.scan_step_compact.

    packed (R, W32) uint32 — or, with pre_transposed=True, already
    (W32, R) so the device-side relayout is skipped (a source that can emit
    k-mers-in-lanes directly, e.g. the bench's PRNG stream, avoids a
    512 MB/batch HBM round trip). popcnt (R,) f32, y_padded (N_pad, P) f32,
    thresh (P,) f32 per-column displacement threshold. R % tile_rows == 0.
    Returns (tmax, targ, tmax2, targ2, tmax3, targ3, n2, n3, cnt), each
    (P, T); targ* are int32 lanes within the tile (targ2/targ3 are only
    meaningful when n2/n3 == 1 — the caller falls back otherwise whenever
    the value is hot).
    """
    if pre_transposed:
        w32, rows = packed.shape
    else:
        rows, w32 = packed.shape
    n_pad, p = y_padded.shape
    assert n_pad == w32 * 32 and rows % tile_rows == 0
    packed_t = packed if pre_transposed else packed.T     # (W32, R)
    pop2 = popcnt[None, :]                                # (1, R)
    n_tiles = rows // tile_rows
    # lane dim of the outputs padded to the 128-lane store alignment; the
    # padding lanes are never written (uninitialized) and masked off below
    nt_pad = ((n_tiles + 127) // 128) * 128
    grid = (n_tiles,)
    out_dtypes = [jnp.float32, jnp.int32, jnp.float32, jnp.int32,
                  jnp.float32, jnp.int32, jnp.int32, jnp.int32, jnp.int32]

    def call_chunk(y_chunk, ysum_chunk, th_chunk):
        pc = y_chunk.shape[1]
        pc_pad = ((pc + 7) // 8) * 8
        # whole-plane VMEM-resident outputs for the flagship shapes; the
        # revisited 128-lane block mode once the planes stop fitting
        blocked = pc_pad * nt_pad * 4 * 9 > _VMEM_PLANE_BUDGET
        yt = jnp.zeros((pc_pad, n_pad), jnp.float32).at[:pc, :].set(
            y_chunk.T)
        ysum2 = jnp.zeros((pc_pad, 1), jnp.float32).at[:pc, 0].set(
            ysum_chunk)
        th2 = jnp.full((pc_pad, 1), -jnp.inf, jnp.float32).at[:pc, 0].set(
            th_chunk)
        if blocked:
            out_specs = [pl.BlockSpec((pc_pad, 128), lambda i: (0, i // 128),
                                      memory_space=pltpu.VMEM)] * 9
        else:
            out_specs = [pl.BlockSpec((pc_pad, nt_pad), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)] * 9
        outs = pl.pallas_call(
            functools.partial(_score_t_tilemax_kernel, n_used=n_used,
                              min_count=min_count, prec=precision,
                              blocked=blocked),
            grid=grid,
            in_specs=[
                pl.BlockSpec((w32, tile_rows), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_rows), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pc_pad, n_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pc_pad, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pc_pad, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((pc_pad, nt_pad), d)
                       for d in out_dtypes],
            cost_estimate=pl.CostEstimate(
                flops=2 * rows * n_pad * pc_pad,
                bytes_accessed=rows * w32 * 4 + n_pad * pc_pad * 4
                + 9 * nt_pad * pc_pad * 4,
                transcendentals=0,
            ),
        )(packed_t, pop2, yt, ysum2, th2)
        return [o[:pc] for o in outs]

    # chunk the phenotype axis: the unpacked g matrix + per-chunk scores
    # must fit VMEM alongside the y block, which caps a chunk at ~256
    # columns; chunks re-run the unpack, so P <= 256 (the reference's
    # default shape) stays a single call
    if p <= _P_CHUNK:
        outs = call_chunk(y_padded, y_sum, thresh)
    else:
        parts = [call_chunk(y_padded[:, s:s + _P_CHUNK],
                            y_sum[s:s + _P_CHUNK], thresh[s:s + _P_CHUNK])
                 for s in range(0, p, _P_CHUNK)]
        outs = [jnp.concatenate([pt[i] for pt in parts], axis=0)
                for i in range(9)]
    return tuple(o[:p, :n_tiles] for o in outs)


def _score_t_topw_kernel(packed_ref, pop_ref, yt_ref, ysum_ref, th_ref,
                         vref, gref, okref, *, n_used: int, min_count: int,
                         tile_rows: int, prec: str = "default"):
    """Round-5 kernel: the running top-W candidate list lives IN the kernel.

    Each grid step scores one tile, extracts its top-3 (value, lane) with
    the proven arithmetic-masking constructs, then INSERTS the three
    (value, global-lane) pairs into a carried (P, W) sorted candidate list
    held in revisited output blocks — a rank-compare + two selects per
    insert. Earlier Mosaic versions hung on select folds fed by computed
    broadcasts (tools/exp_kernel.py vir/via/vi2); the current toolchain
    lowers them (case `topc`), which retires the whole XLA-side extraction
    (lax.top_k over tile maxima + two-key sort + take_alongs) and shrinks
    kernel outputs from nine (P, T) planes to two (P, W) ones.

    The carried list is an UNSORTED top-W multiset maintained by
    replace-min (argmin + one masked select per insert — cheaper than a
    sorted shift-insert, measured ~2x on the VPU chain): an incoming value
    replaces the current minimum lane iff it strictly beats it. The min is
    monotone nondecreasing, so every dropped value is <= the final
    minimum; the caller checks that minimum against thresh (the excl_ok
    analogue) — under that guard ANY drop policy among equal values is
    exact (the dropped twin is dead weight), and the caller's cheap
    two-key sort (value desc, lane asc) re-establishes the buffer's
    earliest-row tie discipline, so no insertion-order conditions are
    needed.

    Exactness bookkeeping (okref, running AND per column):
      cnt <= 3            — no tile may hold a 4th hot lane (not captured)
      hot => unambiguous  — the sum-encoded 2nd/3rd lanes must be unique
        (a garbage lane for a genuinely hot value would corrupt the pair)
    Fully-padded tiles produce -inf, which never strictly beats the
    minimum (dropped).
    """
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        vref[...] = jnp.full(vref.shape, -jnp.inf, jnp.float32)
        gref[...] = jnp.zeros(gref.shape, jnp.int32)
        okref[...] = jnp.ones(okref.shape, jnp.int32)

    w = packed_ref[...]                                   # (W32, TR) uint32
    yigi = _unpack_dot_t(w, yt_ref[...], prec)
    n = jnp.float32(n_used)
    n1 = pop_ref[...]                                     # (1, TR)
    r = n * yigi - ysum_ref[...] * n1                     # (P_pad, TR)
    denom = n * n1 - n1 * n1
    score = jnp.where(denom > 0, (r * r) / denom, 0.0)
    ok = (n1 >= jnp.float32(min_count)) & ((n - n1) >= jnp.float32(min_count))
    score = jnp.where(ok, score, 0.0)
    score = jnp.where(n1 > 0, score, -jnp.inf)            # popcnt==0 = padding

    th = th_ref[...]                                      # (P_pad, 1)
    m1 = jnp.max(score, axis=1, keepdims=True)
    a1 = jnp.argmax(score, axis=1).astype(jnp.int32)[:, None]
    idx = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    idx_f = idx.astype(jnp.float32)
    big = (idx == a1).astype(jnp.float32) * jnp.float32(-3e38)
    score2 = score + big + big
    m2 = jnp.max(score2, axis=1, keepdims=True)
    eq2 = (score2 == m2).astype(jnp.float32)
    n2 = jnp.sum(eq2, axis=1, keepdims=True).astype(jnp.int32)
    a2 = jnp.minimum(jnp.sum(idx_f * eq2, axis=1, keepdims=True)
                     .astype(jnp.int32), tile_rows - 1)
    big2 = (idx == a2).astype(jnp.float32) * jnp.float32(-3e38)
    score3 = score2 + big2 + big2
    m3 = jnp.max(score3, axis=1, keepdims=True)
    eq3 = (score3 == m3).astype(jnp.float32)
    n3 = jnp.sum(eq3, axis=1, keepdims=True).astype(jnp.int32)
    a3 = jnp.minimum(jnp.sum(idx_f * eq3, axis=1, keepdims=True)
                     .astype(jnp.int32), tile_rows - 1)
    cnt = jnp.sum((score > th).astype(jnp.int32), axis=1, keepdims=True)

    g_ok = ((cnt <= 3)
            & ((m2 <= th) | (n2 == 1)) & ((m3 <= th) | (n3 == 1)))
    okref[...] = okref[...] * jnp.broadcast_to(g_ok.astype(jnp.int32),
                                               okref.shape)

    base = t * tile_rows
    lane = jax.lax.broadcasted_iota(jnp.int32, vref.shape, 1)
    for m, a in ((m1, a1), (m2, a2), (m3, a3)):
        g = base + a                                      # (P_pad, 1)
        cur_v = vref[...]
        cur_g = gref[...]
        minv = jnp.min(cur_v, axis=1, keepdims=True)
        am = jnp.argmin(cur_v, axis=1).astype(jnp.int32)[:, None]
        hit = (lane == am) & jnp.broadcast_to(m > minv, cur_v.shape)
        vref[...] = jnp.where(hit, jnp.broadcast_to(m, cur_v.shape), cur_v)
        gref[...] = jnp.where(hit, jnp.broadcast_to(g, cur_g.shape), cur_g)


@functools.partial(jax.jit, static_argnames=("n_used", "min_count",
                                             "tile_rows", "cand_w",
                                             "pre_transposed", "precision"))
def score_batch_t_pallas_topw(packed, popcnt, y_padded, y_sum, thresh, *,
                              n_used: int, min_count: int,
                              tile_rows: int = 2048, cand_w: int = 128,
                              pre_transposed: bool = False,
                              precision: str = "default"):
    """Fused scan kernel with the IN-KERNEL running top-W epilogue
    (_score_t_topw_kernel). Returns (cand_v (P, W) f32 — the exact top-W
    multiset per column, UNSORTED (replace-min order; callers two-key-sort
    by (value desc, lane asc)), cand_g (P, W) int32 global batch lanes,
    okc (P,) bool per-column exactness guard). W = cand_w must be a
    multiple of 128 (lane-aligned output blocks)."""
    if pre_transposed:
        w32, rows = packed.shape
    else:
        rows, w32 = packed.shape
    n_pad, p = y_padded.shape
    assert n_pad == w32 * 32 and rows % tile_rows == 0
    assert cand_w % 128 == 0
    packed_t = packed if pre_transposed else packed.T
    pop2 = popcnt[None, :]
    n_tiles = rows // tile_rows
    grid = (n_tiles,)

    def call_chunk(y_chunk, ysum_chunk, th_chunk):
        pc = y_chunk.shape[1]
        pc_pad = ((pc + 7) // 8) * 8
        yt = jnp.zeros((pc_pad, n_pad), jnp.float32).at[:pc, :].set(
            y_chunk.T)
        ysum2 = jnp.zeros((pc_pad, 1), jnp.float32).at[:pc, 0].set(
            ysum_chunk)
        th2 = jnp.full((pc_pad, 1), -jnp.inf, jnp.float32).at[:pc, 0].set(
            th_chunk)
        outs = pl.pallas_call(
            functools.partial(_score_t_topw_kernel, n_used=n_used,
                              min_count=min_count, tile_rows=tile_rows,
                              prec=precision),
            grid=grid,
            in_specs=[
                pl.BlockSpec((w32, tile_rows), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_rows), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pc_pad, n_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pc_pad, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pc_pad, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((pc_pad, cand_w), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pc_pad, cand_w), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pc_pad, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((pc_pad, cand_w), jnp.float32),
                jax.ShapeDtypeStruct((pc_pad, cand_w), jnp.int32),
                jax.ShapeDtypeStruct((pc_pad, 128), jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * rows * n_pad * pc_pad,
                bytes_accessed=rows * w32 * 4 + n_pad * pc_pad * 4
                + (2 * cand_w + 128) * pc_pad * 4,
                transcendentals=0,
            ),
        )(packed_t, pop2, yt, ysum2, th2)
        return [o[:pc] for o in outs]

    if p <= _P_CHUNK:
        cv, cg, okp = call_chunk(y_padded, y_sum, thresh)
    else:
        parts = [call_chunk(y_padded[:, s:s + _P_CHUNK],
                            y_sum[s:s + _P_CHUNK], thresh[s:s + _P_CHUNK])
                 for s in range(0, p, _P_CHUNK)]
        cv = jnp.concatenate([pt[0] for pt in parts], axis=0)
        cg = jnp.concatenate([pt[1] for pt in parts], axis=0)
        okp = jnp.concatenate([pt[2] for pt in parts], axis=0)
    return cv, cg, okp[:, 0] > 0


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

def _score_kernel(packed_ref, pop_ref, y_ref, ysum_ref, out_ref,
                  *, n_used: int, min_count: int):
    packed = packed_ref[...]                       # (TR, W32) uint32
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 32), 2)
    bits = ((packed[:, :, None] >> shifts) & jnp.uint32(1))
    g = bits.astype(jnp.int32).astype(jnp.float32).reshape(
        packed.shape[0], packed.shape[1] * 32)
    yigi = jnp.dot(g, y_ref[...], preferred_element_type=jnp.float32)
    n = jnp.float32(n_used)
    n1 = pop_ref[...].reshape(-1, 1)
    r = n * yigi - n1 * ysum_ref[...].reshape(1, -1)
    denom = n * n1 - n1 * n1
    score = jnp.where(denom > 0, (r * r) / denom, 0.0)
    ok = (n1 >= jnp.float32(min_count)) & ((n - n1) >= jnp.float32(min_count))
    out_ref[...] = jnp.where(ok, score, 0.0)


@functools.partial(jax.jit, static_argnames=("n_used", "min_count", "tile_rows"))
def score_batch_pallas(packed, popcnt, y_padded, y_sum, *,
                       n_used: int, min_count: int, tile_rows: int = 512):
    """Fused TPU kernel; requires R % tile_rows == 0 (pad upstream)."""
    rows, w32 = packed.shape
    n_pad, p = y_padded.shape
    assert n_pad == w32 * 32, (n_pad, w32)
    assert rows % tile_rows == 0
    grid = (rows // tile_rows,)
    return pl.pallas_call(
        functools.partial(_score_kernel, n_used=n_used, min_count=min_count),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_rows, w32), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, p), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * n_pad * p,
            bytes_accessed=rows * w32 * 4 + n_pad * p * 4 + rows * p * 4,
            transcendentals=0,
        ),
    )(packed, popcnt, y_padded, y_sum)
