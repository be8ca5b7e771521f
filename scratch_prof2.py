"""Stage-level profiling of the BUFFERED scan step on the real chip."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from kmersgwas_tpu.ops import score as score_ops
from kmersgwas_tpu.ops import topk as topk_ops
from kmersgwas_tpu.ops import scanstep as ss

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

n_batches = 8
batches = []
for b in range(n_batches):
    packed = rng.integers(0, 1 << 32, size=(rows, w32), dtype=np.uint64).astype(np.uint32)
    pc = np.asarray(jax.device_get(jnp.sum(
        jax.lax.population_count(jnp.asarray(packed)), axis=1)), dtype=np.float32)
    lo, hi = topk_ops.encode_rows(np.arange(b * rows, (b + 1) * rows))
    batches.append((jax.device_put(packed), jax.device_put(pc),
                    jax.device_put(lo), jax.device_put(hi)))


def timeit(f, *args, iters=12):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
    return (time.perf_counter() - t0) / iters * 1e3


# anchor: full buffered step, same config as bench.py, steady state
step_j = functools.partial(ss.scan_step_buffered, y_padded=yp, y_sum=ysum,
                           n_used=n_used, min_count=min_count,
                           kernel="pallas", cand_c=512, cand_k=2048)
st = ss.init_buffered_state(p, k, buf_cap=512 * 8)
for b in batches:
    st = step_j(st, *b)
jax.block_until_ready(st.scores)
# steady state now: thresh set, buffer partially filled

def one(s):
    return step_j(s, *batches[3])

t = timeit(one, st, iters=24)
print(f"ANCHOR buffered step steady: {t:.2f} ms -> {rows/t*1e3/1e6:.1f}M kmers/s", flush=True)

# stage 1: score+bmax kernel alone
tile_rows, block = 2048, 16
sb_j = jax.jit(functools.partial(score_ops.score_batch_t_pallas_bmax,
                                 n_used=n_used, min_count=min_count,
                                 tile_rows=tile_rows, block=block))
t_sb = timeit(sb_j, batches[3][0], batches[3][1], yp, ysum)
print(f"score+bmax pallas: {t_sb:.2f} ms", flush=True)

sc, bmax = sb_j(batches[3][0], batches[3][1], yp, ysum)
sc = jax.device_put(sc); bmax = jax.device_put(bmax)

# stage 2: strided extraction (cand_c=512)
ext_j = jax.jit(functools.partial(topk_ops.strided_top_k_from_bmax,
                                  k=512, tile_rows=tile_rows))
t_ext = timeit(ext_j, sc, bmax)
print(f"strided extract c=512: {t_ext:.2f} ms", flush=True)

# stage 2b: the inner blocked_top_k over bmax only
btk_j = jax.jit(functools.partial(topk_ops.blocked_top_k, k=513, block=16))
t_btk = timeit(btk_j, bmax)
print(f"  blocked_top_k(bmax,513): {t_btk:.2f} ms  (bmax {bmax.shape})", flush=True)

# stage 2c: wide extraction cand_k=2048 (flush path)
ext2_j = jax.jit(functools.partial(topk_ops.strided_top_k_from_bmax,
                                   k=2048, tile_rows=tile_rows))
t_ext2 = timeit(ext2_j, sc, bmax)
print(f"strided extract k=2048: {t_ext2:.2f} ms", flush=True)

# stage 3: buffer append (dynamic_update_slice) — approximate with the state op
v, i, ex = ext_j(sc, bmax)
print(f"residual (anchor - score - extract): {t - t_sb - t_ext:.2f} ms", flush=True)
