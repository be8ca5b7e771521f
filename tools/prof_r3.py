"""Round-3 profile: locate where the compact scan step's wall-clock goes
on the real chip, and measure relay dispatch latency + chained-window gain.

Pieces timed per 2M-row batch at N=1008 / P=101 / K=10001:
  0. relay dispatch latency (trivial jit, per-call, synced)
  1. on-device batch generation (bench.py gen kernel)
  2. device transpose (R,W32) -> (W32,R) alone
  3. score GEMM kernel alone (score_batch_t_pallas)
  4. tilemax kernel alone (score_batch_t_pallas_tilemax)
  5. compact step, append path (thresh high)
  6. compact step, fallback path (thresh -inf)
  7. chained window of 8 gen+step per dispatch (lax.scan)
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmersgwas_tpu.ops import score as score_ops
from kmersgwas_tpu.ops import scanstep as ss


def timeit(fn, *args, iters=20, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    # host fetch of one scalar: relay block_until_ready can under-wait
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).reshape(-1)[0]
    return (time.perf_counter() - t0) / iters


def main():
    n_used, n_pad, p, k = 1008, 1024, 101, 10001
    rows = 1 << 21
    min_count = 51
    w32 = n_pad // 32
    gen_tile = 1 << 14
    rng = np.random.default_rng(0)
    y = rng.normal(size=(n_used, p)).astype(np.float32)
    yp, ysum = score_ops.prepare_phenotypes(y, n_pad)
    yp, ysum = jax.device_put(yp), jax.device_put(ysum)

    # 0. dispatch latency
    f0 = jax.jit(lambda x: x + 1)
    x0 = jax.device_put(jnp.float32(0))
    for _ in range(3):
        x0 = f0(x0)
    jax.block_until_ready(x0)
    t0 = time.perf_counter()
    it = 50
    for _ in range(it):
        x0 = f0(x0)
    np.asarray(x0)
    print(f"dispatch latency (chained +1): {(time.perf_counter()-t0)/it*1e3:8.3f} ms/call")

    t0 = time.perf_counter()
    for _ in range(it):
        np.asarray(f0(x0))  # synced every call
    print(f"dispatch latency (synced +1) : {(time.perf_counter()-t0)/it*1e3:8.3f} ms/call")

    # 1. generation
    def _gen_kernel(seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        out_ref[...] = pltpu.prng_random_bits(out_ref.shape)

    @jax.jit
    def gen_batch(seed):
        packed = pl.pallas_call(
            _gen_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(rows // gen_tile,),
                in_specs=[],
                out_specs=pl.BlockSpec((gen_tile, w32), lambda i, s: (i, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((rows, w32), jnp.uint32),
        )(jnp.reshape(seed, (1,)))
        pc = jnp.sum(jax.lax.population_count(packed), axis=1).astype(jnp.float32)
        return packed, pc

    seed = jax.device_put(jnp.int32(7))
    t = timeit(gen_batch, seed)
    print(f"gen (2M x 32 prng + popcount): {t*1e3:8.2f} ms")
    packed, popcnt = jax.block_until_ready(gen_batch(seed))

    # 1b. generation directly transposed (W32, R)
    @jax.jit
    def gen_batch_t(seed):
        packed_t = pl.pallas_call(
            _gen_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(rows // gen_tile,),
                in_specs=[],
                out_specs=pl.BlockSpec((w32, gen_tile), lambda i, s: (0, i),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((w32, rows), jnp.uint32),
        )(jnp.reshape(seed, (1,)))
        pc = jnp.sum(jax.lax.population_count(packed_t), axis=0).astype(jnp.float32)
        return packed_t, pc

    t = timeit(gen_batch_t, seed)
    print(f"gen transposed (32 x 2M)     : {t*1e3:8.2f} ms")

    # 2. transpose alone
    f_t = jax.jit(lambda x: x.T.copy())
    t = timeit(f_t, packed)
    print(f"transpose (2M,32)->(32,2M)   : {t*1e3:8.2f} ms")

    # 3. score kernel alone
    f_score = jax.jit(functools.partial(
        score_ops.score_batch_t_pallas.__wrapped__,
        n_used=n_used, min_count=min_count))
    t = timeit(f_score, packed, popcnt, yp, ysum)
    print(f"score kernel (incl. transp.) : {t*1e3:8.2f} ms  ({rows/t/1e6:.0f}M/s)")

    # 4. tilemax kernel alone
    th = jax.device_put(jnp.full((p,), 230.0, jnp.float32))
    f_tm = jax.jit(functools.partial(
        score_ops.score_batch_t_pallas_tilemax.__wrapped__,
        n_used=n_used, min_count=min_count))
    t = timeit(f_tm, packed, popcnt, yp, ysum, th)
    print(f"tilemax kernel (incl.transp.): {t*1e3:8.2f} ms  ({rows/t/1e6:.0f}M/s)")

    # 5/6. compact step append vs fallback
    from kmersgwas_tpu.ops import topk as topk_ops
    lo = jax.device_put(np.arange(rows, dtype=np.int32))
    hi = jax.device_put(np.zeros(rows, np.int32))
    step = functools.partial(
        ss.scan_step_compact, y_padded=yp, y_sum=ysum, n_used=n_used,
        min_count=min_count, kernel="pallas", cand_c=256, cand_k=2048,
        tile_rows=2048)
    state = ss.init_buffered_state(p, k, buf_cap=256 * 24)
    # saturate thresh: one fallback step
    state = jax.block_until_ready(step(state, packed, popcnt, lo, hi))
    print(f"  thresh after 1 batch: {float(np.asarray(state.thresh)[0]):.2f}")
    t = timeit(step, state, packed, popcnt, lo, hi)
    print(f"compact step (append path)   : {t*1e3:8.2f} ms  ({rows/t/1e6:.0f}M/s)")
    state_cold = ss.init_buffered_state(p, k, buf_cap=256 * 24)
    t = timeit(step, state_cold, packed, popcnt, lo, hi)
    print(f"compact step (fallback path) : {t*1e3:8.2f} ms  ({rows/t/1e6:.0f}M/s)")

    # 7. chained window: 8 x (gen + step) per dispatch
    S = 8

    @jax.jit
    def window(state, seed):
        def body(carry, _):
            st, sd = carry
            pk, pc = gen_batch.__wrapped__(sd)
            st = ss.scan_step_compact.__wrapped__(
                st, pk, pc, lo, hi, yp, ysum, n_used=n_used,
                min_count=min_count, kernel="pallas", cand_c=256,
                cand_k=2048, tile_rows=2048)
            return (st, sd + rows // gen_tile), None
        (state, seed), _ = jax.lax.scan(body, (state, seed), length=S)
        return state, seed

    st, sd = window(state, seed)
    jax.block_until_ready(st.scores)
    t0 = time.perf_counter()
    it = 8
    for _ in range(it):
        st, sd = window(st, sd)
    np.asarray(st.buf_n)
    dt = (time.perf_counter() - t0) / it
    print(f"chained window (8 steps)     : {dt*1e3:8.2f} ms  "
          f"({S*rows/dt/1e6:.0f}M/s)")


if __name__ == "__main__":
    main()
