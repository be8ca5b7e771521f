"""Stage-level profiling of the scan step on the real chip."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from kmersgwas_tpu.ops import score as score_ops
from kmersgwas_tpu.ops import topk as topk_ops
from kmersgwas_tpu.ops.scanstep import scan_step, _merge

print(jax.devices())

n_used, n_pad, p, k = 1008, 1024, 101, 10001
rows = 1 << 21
min_count = 51
w32 = n_pad // 32

rng = np.random.default_rng(0)
y = rng.normal(size=(n_used, p)).astype(np.float32)
yp, ysum = score_ops.prepare_phenotypes(y, n_pad)
yp = jax.device_put(jnp.asarray(yp))
ysum = jax.device_put(jnp.asarray(ysum))

packed = jax.device_put(rng.integers(0, 1 << 32, size=(rows, w32), dtype=np.uint64).astype(np.uint32))
popcnt = jnp.sum(jax.lax.population_count(packed), axis=1).astype(jnp.float32)
lo, hi = topk_ops.encode_rows(np.arange(rows))
lo = jax.device_put(lo); hi = jax.device_put(hi)


def timeit(f, *args, iters=10):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
    return (time.perf_counter() - t0) / iters * 1e3


# anchor: full fused step, same config as bench.py
step_j = functools.partial(scan_step, y_padded=yp, y_sum=ysum, n_used=n_used,
                           min_count=min_count, kernel="pallas", cand_k=2048)
st = topk_ops.init_state(p, k)
st = step_j(st, packed, popcnt, lo, hi)
t = timeit(lambda s: step_j(s, packed, popcnt, lo, hi), st)
print(f"ANCHOR full scan_step (cand_k=2048): {t:.2f} ms -> {rows/t*1e3/1e6:.1f}M kmers/s", flush=True)

score_j = jax.jit(functools.partial(score_ops.score_batch_t_pallas,
                                    n_used=n_used, min_count=min_count))
t_score = timeit(score_j, packed, popcnt, yp, ysum)
print(f"score pallas: {t_score:.2f} ms", flush=True)

sc = jax.device_put(score_j(packed, popcnt, yp, ysum))

for block in (8, 16, 32, 64):
    for kk in (512, 1024, 2048):
        f = jax.jit(functools.partial(topk_ops.blocked_top_k, k=kk, block=block))
        t = timeit(f, sc)
        print(f"blocked_top_k block={block:3d} k={kk:5d}: {t:.2f} ms", flush=True)

state = topk_ops.init_state(p, k)
for ck in (512, 1024, 2048):
    f = jax.jit(functools.partial(topk_ops.blocked_top_k, k=ck, block=16))
    v, i = f(sc)
    merge_j = jax.jit(_merge)
    t = timeit(merge_j, state, v, lo[i], hi[i])
    print(f"merge cand_k={ck:5d}: {t:.2f} ms", flush=True)

for ck in (512, 1024):
    sj = functools.partial(scan_step, y_padded=yp, y_sum=ysum, n_used=n_used,
                           min_count=min_count, kernel="pallas", cand_k=ck)
    st2 = topk_ops.init_state(p, k)
    st2 = sj(st2, packed, popcnt, lo, hi)
    t = timeit(lambda s: sj(s, packed, popcnt, lo, hi), st2)
    print(f"full scan_step cand_k={ck}: {t:.2f} ms -> {rows/t*1e3/1e6:.1f}M kmers/s", flush=True)
