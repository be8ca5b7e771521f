"""Steady-state sweep of scan-step variants (bench.py conditions)."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from kmersgwas_tpu.ops import score as score_ops
from kmersgwas_tpu.ops import topk as topk_ops
from kmersgwas_tpu.ops.scanstep import scan_step, _merge

n_used, n_pad, p, k = 1008, 1024, 101, 10001
rows = 1 << 21
min_count = 51
w32 = n_pad // 32

rng = np.random.default_rng(0)
y = rng.normal(size=(n_used, p)).astype(np.float32)
yp, ysum = score_ops.prepare_phenotypes(y, n_pad)
yp = jax.device_put(jnp.asarray(yp))
ysum = jax.device_put(jnp.asarray(ysum))

n_batches = 12
batches = []
for b in range(n_batches):
    packed = rng.integers(0, 1 << 32, size=(rows, w32), dtype=np.uint64).astype(np.uint32)
    popcnt = np.asarray(jax.device_get(jnp.sum(
        jax.lax.population_count(jnp.asarray(packed)), axis=1)), dtype=np.float32)
    lo, hi = topk_ops.encode_rows(np.arange(b * rows, (b + 1) * rows))
    batches.append((jax.device_put(packed), jax.device_put(popcnt),
                    jax.device_put(lo), jax.device_put(hi)))


def measure(step_fn, name, iters=48):
    state = topk_ops.init_state(p, k)
    state = step_fn(state, *batches[0])
    jax.block_until_ready(state.scores)
    for b in batches[1:]:
        state = step_fn(state, *b)
    jax.block_until_ready(state.scores)
    t0 = time.perf_counter()
    _ = float(np.asarray(state.scores).sum())
    t_fetch = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        state = step_fn(state, *batches[i % n_batches])
    checksum = float(np.asarray(state.scores).sum())
    dt = max(time.perf_counter() - t0 - t_fetch, 1e-9)
    assert np.isfinite(checksum)
    r = rows * iters / dt
    print(f"{name:45s}: {dt/iters*1e3:7.2f} ms/step  {r/1e6:7.1f}M kmers/s",
          flush=True)
    return state


# ---- approx variant -------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_used", "min_count", "cand_k",
                                             "recall"))
def scan_step_approx(state, packed, popcnt, row_lo, row_hi, y_padded, y_sum,
                     *, n_used, min_count, cand_k, recall=0.95):
    sc = score_ops.score_batch_t_pallas(packed, popcnt, y_padded, y_sum,
                                        n_used=n_used, min_count=min_count)
    kk = state.scores.shape[1]
    v, i = jax.lax.approx_max_k(sc, cand_k, recall_target=recall)
    blo, bhi = row_lo[i], row_hi[i]
    # ties at the eventual boundary must prefer the earliest row, like the
    # heap; approx extraction permutes ties by bucket, so 2-key sort them
    neg_v, bhi, blo, v = jax.lax.sort((-v, bhi, blo, v), num_keys=3)
    merged = _merge(state, v, blo, bhi)
    new_kth = merged.scores[:, -1]
    batch_ge = jnp.sum(sc >= new_kth[:, None], axis=1)
    cand_ge = jnp.sum(v >= new_kth[:, None], axis=1)
    exact = jnp.all(batch_ge == cand_ge)

    def full(_):
        v2, i2 = topk_ops.blocked_top_k(sc, kk)
        return _merge(state, v2, row_lo[i2], row_hi[i2])

    return jax.lax.cond(exact, lambda _: merged, full, None)


s_ref = None
for ck in (2048, 1024, 4096):
    f = functools.partial(scan_step, y_padded=yp, y_sum=ysum, n_used=n_used,
                          min_count=min_count, kernel="pallas", cand_k=ck)
    st = measure(f, f"blocked cand_k={ck}")
    if ck == 2048:
        s_ref = st

for ck in (1024, 2048):
    for rc in (0.9, 0.99):
        try:
            f = functools.partial(scan_step_approx, y_padded=yp, y_sum=ysum,
                                  n_used=n_used, min_count=min_count,
                                  cand_k=ck, recall=rc)
            st = measure(f, f"approx cand_k={ck} recall={rc}")
            same = (np.array_equal(np.asarray(st.scores), np.asarray(s_ref.scores))
                    and np.array_equal(np.asarray(st.row_lo), np.asarray(s_ref.row_lo)))
            print(f"    state identical to blocked reference: {same}", flush=True)
        except Exception as e:
            print(f"approx ck={ck} rc={rc} FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            break
