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
