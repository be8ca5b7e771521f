"""Sweep batch rows x cand_k for the fused scan step."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from kmersgwas_tpu.ops import score as score_ops
from kmersgwas_tpu.ops import topk as topk_ops
from kmersgwas_tpu.ops.scanstep import scan_step

n_used, n_pad, p, k = 1008, 1024, 101, 10001
min_count = 51
w32 = n_pad // 32
rng = np.random.default_rng(0)
y = rng.normal(size=(n_used, p)).astype(np.float32)
yp, ysum = score_ops.prepare_phenotypes(y, n_pad)
yp = jax.device_put(jnp.asarray(yp))
ysum = jax.device_put(jnp.asarray(ysum))


def run(rows, cand_k, block=16, iters=None, n_batches=None):
    n_batches = n_batches or max(3, (24 << 20) // rows)
    iters = iters or max(12, ((1 << 21) * 48) // rows)
    batches = []
    for b in range(n_batches):
        packed = rng.integers(0, 1 << 32, size=(rows, w32), dtype=np.uint64).astype(np.uint32)
        pc = np.asarray(jax.device_get(jnp.sum(
            jax.lax.population_count(jnp.asarray(packed)), axis=1)), dtype=np.float32)
        lo, hi = topk_ops.encode_rows(np.arange(b * rows, (b + 1) * rows))
        batches.append((jax.device_put(packed), jax.device_put(pc),
                        jax.device_put(lo), jax.device_put(hi)))
    f = functools.partial(scan_step, y_padded=yp, y_sum=ysum, n_used=n_used,
                          min_count=min_count, kernel="pallas", cand_k=cand_k,
                          block=block)
    state = topk_ops.init_state(p, k)
    for b in batches:
        state = f(state, *b)
    jax.block_until_ready(state.scores)
    t0 = time.perf_counter()
    _ = float(np.asarray(state.scores).sum())
    t_fetch = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        state = f(state, *batches[i % n_batches])
    checksum = float(np.asarray(state.scores).sum())
    dt = max(time.perf_counter() - t0 - t_fetch, 1e-9)
    assert np.isfinite(checksum)
    r = rows * iters / dt
    print(f"rows={rows>>20:3d}M cand_k={cand_k:5d} block={block:3d}: "
          f"{dt/iters*1e3:7.2f} ms/step  {r/1e6:7.1f}M kmers/s", flush=True)
    del batches, state


for rows, ck in [(1 << 21, 512), (1 << 22, 1024), (1 << 23, 2048),
                 (1 << 23, 1024)]:
    run(rows, ck)
