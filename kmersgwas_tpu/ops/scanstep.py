"""Fused association-scan step: score + blocked top-k + state merge, one jit.

The production inner loop of the scan driver. Three implementations of the
scoring stage share the surrounding top-k logic:

  kernel="xla"      — unpack + dot via XLA (runs on CPU too; tests)
  kernel="pallas"   — transposed fused Pallas kernel (TPU production path)

Scores arrive already transposed (P, R) with padding rows at -inf, feed the
exact blocked top-k, and merge into the carried TopKState without leaving
the device.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import topk as topk_ops
from .bitplanes import unpack_bits


def _scores_t_xla(packed, popcnt, y_padded, y_sum, n_used, min_count):
    g = unpack_bits(packed, jnp.float32)                  # (R, N_pad)
    yigi = jnp.dot(g, y_padded, preferred_element_type=jnp.float32)
    n = jnp.float32(n_used)
    n1 = popcnt[:, None]
    r = n * yigi - n1 * y_sum[None, :]
    denom = n * n1 - n1 * n1
    score = jnp.where(denom > 0, (r * r) / denom, 0.0)
    ok = (n1 >= min_count) & ((n - n1) >= min_count)
    score = jnp.where(ok, score, 0.0)
    return jnp.where(n1 > 0, score, -jnp.inf).T           # (P, R)


def _merge(state: topk_ops.TopKState, v, blo, bhi) -> topk_ops.TopKState:
    k = state.scores.shape[1]
    cat_v = jnp.concatenate([state.scores, v], axis=1)
    cat_lo = jnp.concatenate([state.row_lo, blo], axis=1)
    cat_hi = jnp.concatenate([state.row_hi, bhi], axis=1)
    nv, j = jax.lax.top_k(cat_v, k)
    return topk_ops.TopKState(scores=nv,
                              row_lo=jnp.take_along_axis(cat_lo, j, axis=1),
                              row_hi=jnp.take_along_axis(cat_hi, j, axis=1))


@functools.partial(jax.jit,
                   static_argnames=("n_used", "min_count", "kernel", "block",
                                    "cand_k"))
def scan_step(state: topk_ops.TopKState, packed, popcnt, row_lo, row_hi,
              y_padded, y_sum, *, n_used: int, min_count: int,
              kernel: str = "xla", block: int = 16,
              cand_k: int | None = None) -> topk_ops.TopKState:
    """One streamed batch -> merged top-k state.

    packed (R, W32) uint32, popcnt (R,) f32 with 0 marking padding rows,
    row_lo/row_hi (R,) int32 encoded row ids, y_padded (N_pad, P) f32.

    cand_k: optional candidate cap. Extracting only the batch's top-cand_k
    (cand_k << K) makes the dominant top-k phases much smaller; the merge is
    exact whenever the post-merge k-th score strictly exceeds the cand_k-th
    batch score (then every batch element that could displace the state was
    among the candidates; equal scores never displace, matching the heap's
    strict-> rule, best_associations_heap.cpp:50). A `lax.cond` falls back
    to the full extraction on the rare batches (state not yet full, or a
    candidate tie at the boundary) where that check fails.
    """
    if kernel == "pallas":
        from .score import score_batch_t_pallas
        sc = score_batch_t_pallas(packed, popcnt, y_padded, y_sum,
                                  n_used=n_used, min_count=min_count)
    else:
        sc = _scores_t_xla(packed, popcnt, y_padded, y_sum, n_used, min_count)

    k = state.scores.shape[1]

    def full_merge(_):
        v, i = topk_ops.blocked_top_k(sc, k, block=block)
        return _merge(state, v, row_lo[i], row_hi[i])

    if not cand_k or cand_k >= k:
        return full_merge(None)

    v, i = topk_ops.blocked_top_k(sc, cand_k, block=block)
    merged = _merge(state, v, row_lo[i], row_hi[i])
    c_min = v[:, -1]
    new_kth = merged.scores[:, -1]
    exact = jnp.all(new_kth > c_min)
    return jax.lax.cond(exact, lambda _: merged, full_merge, None)


# ---------------------------------------------------------------------------
# Buffered scan step: deferred merges
# ---------------------------------------------------------------------------
#
# The per-batch state merge (a stable top-k over (P, K + cand_k), K = 10001)
# costs as much as the score GEMM itself. But after the state saturates,
# almost no batch entries can displace it: any displacer must STRICTLY beat
# the carried k-th score (the heap rule, best_associations_heap.cpp:50).
# So: carry `thresh` = per-column k-th score as of the last merge, extract a
# small top-c per batch, and — whenever the c-th extracted score is already
# below thresh (so every unextracted element, being <= it, can never
# displace) — just append the c candidates to a side buffer and skip the
# merge. The expensive (P, K + C + cand_k) merge runs only when the buffer
# fills or a batch is too hot for the small extraction, amortizing it over
# ~C/c batches. Exact by construction; `lax.cond` falls back to the full
# extraction on the rare non-exact wide merges.


class BufferedTopKState(NamedTuple):
    scores: jax.Array    # (P, K) f32 descending (as of last flush)
    row_lo: jax.Array    # (P, K) int32
    row_hi: jax.Array    # (P, K) int32
    buf_v: jax.Array     # (P, C) f32 pending candidates
    buf_lo: jax.Array    # (P, C) int32
    buf_hi: jax.Array    # (P, C) int32
    buf_n: jax.Array     # () int32 filled slots (multiple of c)
    thresh: jax.Array    # (P,) f32 k-th score at last flush


def init_buffered_state(n_phenotypes: int, k: int, buf_cap: int
                        ) -> BufferedTopKState:
    z = jnp.zeros((n_phenotypes, k), jnp.int32)
    zb = jnp.zeros((n_phenotypes, buf_cap), jnp.int32)
    return BufferedTopKState(
        scores=jnp.full((n_phenotypes, k), -jnp.inf, jnp.float32),
        row_lo=z, row_hi=z,
        buf_v=jnp.full((n_phenotypes, buf_cap), -jnp.inf, jnp.float32),
        buf_lo=zb, buf_hi=zb,
        buf_n=jnp.int32(0),
        thresh=jnp.full((n_phenotypes,), -jnp.inf, jnp.float32),
    )


def _scores_and_bmax(packed, popcnt, y_padded, y_sum, n_used, min_count,
                     kernel, block):
    """-> (scores (P,R), strided block maxima (P,R/block), tile_rows)."""
    if kernel == "pallas":
        from .score import score_batch_t_pallas_bmax
        tile_rows = 2048
        sc, bmax = score_batch_t_pallas_bmax(
            packed, popcnt, y_padded, y_sum, n_used=n_used,
            min_count=min_count, tile_rows=tile_rows, block=block)
        return sc, bmax, tile_rows
    sc = _scores_t_xla(packed, popcnt, y_padded, y_sum, n_used, min_count)
    p, r = sc.shape
    if r % block:                       # pad -inf (gather of a padded lane is
        sc = jnp.pad(sc, ((0, 0), (0, block - r % block)),  # dropped as
                     constant_values=-jnp.inf)              # non-finite later)
        r = sc.shape[1]
    nb = r // block                     # single tile: group b = {b + nb*j}
    bmax = jnp.max(sc.reshape(p, block, nb), axis=1)
    return sc, bmax, r


@functools.partial(jax.jit,
                   static_argnames=("n_used", "min_count", "kernel", "block",
                                    "cand_c", "cand_k"))
def scan_step_buffered(state: BufferedTopKState, packed, popcnt,
                       row_lo, row_hi, y_padded, y_sum, *, n_used: int,
                       min_count: int, kernel: str = "xla", block: int = 16,
                       cand_c: int = 512, cand_k: int = 2048
                       ) -> BufferedTopKState:
    """One streamed batch -> buffered top-k state. Args as scan_step; the
    buffer capacity C (state.buf_v.shape[1]) must be a multiple of cand_c."""
    k = state.scores.shape[1]
    cap = state.buf_v.shape[1]
    assert cap % cand_c == 0
    sc, bmax, tile_rows = _scores_and_bmax(packed, popcnt, y_padded, y_sum,
                                           n_used, min_count, kernel, block)

    v, i, v_exact = topk_ops.strided_top_k_from_bmax(sc, bmax, cand_c,
                                                     tile_rows=tile_rows)
    blo, bhi = row_lo[i], row_hi[i]
    # unextracted elements are <= v[:,-1]; if that's already < thresh they
    # can never strictly beat the (monotone nondecreasing) k-th score
    can_buffer = (v_exact & jnp.all(v[:, -1] < state.thresh)
                  & (state.buf_n + cand_c <= cap))

    def do_buffer(st: BufferedTopKState) -> BufferedTopKState:
        at = (jnp.int32(0), st.buf_n)
        return st._replace(
            buf_v=jax.lax.dynamic_update_slice(st.buf_v, v, at),
            buf_lo=jax.lax.dynamic_update_slice(st.buf_lo, blo, at),
            buf_hi=jax.lax.dynamic_update_slice(st.buf_hi, bhi, at),
            buf_n=st.buf_n + cand_c)

    def do_flush(st: BufferedTopKState) -> BufferedTopKState:
        def merge_with(wv, wlo, whi):
            # concat order fixes tie preference: state (oldest) < buffer
            # (older batches first) < this batch — stable top_k then matches
            # the heap's earliest-wins-on-equal rule
            cat_v = jnp.concatenate([st.scores, st.buf_v, wv], axis=1)
            cat_lo = jnp.concatenate([st.row_lo, st.buf_lo, wlo], axis=1)
            cat_hi = jnp.concatenate([st.row_hi, st.buf_hi, whi], axis=1)
            nv, j = jax.lax.top_k(cat_v, k)
            return (nv, jnp.take_along_axis(cat_lo, j, axis=1),
                    jnp.take_along_axis(cat_hi, j, axis=1))

        wv, wi, w_exact = topk_ops.strided_top_k_from_bmax(sc, bmax, cand_k,
                                                           tile_rows=tile_rows)
        nv, nlo, nhi = merge_with(wv, row_lo[wi], row_hi[wi])
        # exact iff the wide extraction was itself exact AND nothing outside
        # it (all <= its min) could strictly beat the new k-th score
        exact = w_exact & jnp.all(nv[:, -1] > wv[:, -1])

        def fallback(_):
            # contiguous blocked top-k re-reads sc but is tie-exact always
            fv, fi = topk_ops.blocked_top_k(sc, k, block=16)
            return merge_with(fv, row_lo[fi], row_hi[fi])

        nv, nlo, nhi = jax.lax.cond(exact, lambda _: (nv, nlo, nhi),
                                    fallback, None)
        return BufferedTopKState(
            scores=nv, row_lo=nlo, row_hi=nhi,
            buf_v=jnp.full_like(st.buf_v, -jnp.inf),
            buf_lo=jnp.zeros_like(st.buf_lo),
            buf_hi=jnp.zeros_like(st.buf_hi),
            buf_n=jnp.int32(0), thresh=nv[:, -1])

    return jax.lax.cond(can_buffer, do_buffer, do_flush, state)


@functools.partial(jax.jit,
                   static_argnames=("n_used", "min_count", "kernel", "block",
                                    "cand_c", "cand_k"))
def scan_step_buffered_multi(state: BufferedTopKState, packed, popcnt,
                             row_lo, row_hi, y_padded, y_sum, *, n_used: int,
                             min_count: int, kernel: str = "xla",
                             block: int = 16, cand_c: int = 512,
                             cand_k: int = 2048) -> BufferedTopKState:
    """Chained variant: process B batches in ONE dispatch via lax.scan.

    packed (B, R, W32), popcnt/row_lo/row_hi (B, R). Through a remote-relay
    device link each jit call costs milliseconds of fixed dispatch latency;
    chaining batches amortizes it without changing per-batch semantics
    (bitwise-identical state evolution to B sequential scan_step_buffered
    calls)."""

    def body(st, batch):
        pk, pc, lo, hi = batch
        st = scan_step_buffered.__wrapped__(
            st, pk, pc, lo, hi, y_padded, y_sum, n_used=n_used,
            min_count=min_count, kernel=kernel, block=block,
            cand_c=cand_c, cand_k=cand_k)
        return st, None

    state, _ = jax.lax.scan(body, state, (packed, popcnt, row_lo, row_hi))
    return state


@jax.jit
def flush_buffered(state: BufferedTopKState) -> topk_ops.TopKState:
    """Drain the candidate buffer -> plain TopKState (for finalize/checkpoint)."""
    k = state.scores.shape[1]
    cat_v = jnp.concatenate([state.scores, state.buf_v], axis=1)
    cat_lo = jnp.concatenate([state.row_lo, state.buf_lo], axis=1)
    cat_hi = jnp.concatenate([state.row_hi, state.buf_hi], axis=1)
    nv, j = jax.lax.top_k(cat_v, k)
    return topk_ops.TopKState(scores=nv,
                              row_lo=jnp.take_along_axis(cat_lo, j, axis=1),
                              row_hi=jnp.take_along_axis(cat_hi, j, axis=1))
