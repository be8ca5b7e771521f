"""Round-5 probe: device scan-step rate at SMALL batch sizes.

Why (as of the round-5-initial capture): the zero-copy host feed appeared
to copy ~1.7x faster with a 512k-row staging buffer than a 2M one, so this
probe measured the kernel at 512k rows/step to locate a feed/kernel batch
crossover.

Measured (real chip via relay, 2026-08-21):
    rows/step = 2M   : step 6.69 ms  -> 313.5M rows/s   (BENCH_r04/r05)
    rows/step = 512k : step ~4.9-6.2 ms -> ~84-106M rows/s
                       (windows still partly relay-noisy; cand_c=128)

SUPERSEDED (2026-08-22, tools/prof_r5_feedgap.py): the 2M-batch feed
"slowness" was a bench artifact — the 8M-row bench table left a ~2M-row
TAIL batch (25% of rows) on the one-off scratch-pad path at the 2,000,896
production quantum. Steady-state (full-batch) feed runs at the host's
memcpy bound at BOTH quanta (~65M rows/s at 2M, ~73M at 512k), so there
is no crossover: production runs kernel-optimal 2M steps and the
co-located bound is min(kernel 354.8M, feed ~65M) ~= 65M rows/s.

Run: python tools/prof_r5_feed.py  (~3 min incl. remote compile)
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmersgwas_tpu.ops import scanstep as ss
from kmersgwas_tpu.ops import score as score_ops


def measure(rows: int = 1 << 19, S: int = 32, n_windows: int = 14,
            cand_c: int = 128):
    n_used, n_pad, p, k = 1008, 1024, 101, 10001
    min_count = 51
    w32 = n_pad // 32
    gen_tile = 1 << 14

    rng = np.random.default_rng(0)
    y = rng.normal(size=(n_used, p)).astype(np.float32)
    yp, ysum = score_ops.prepare_phenotypes(y, n_pad)
    yp, ysum = jax.device_put(yp), jax.device_put(ysum)
    hi0 = jax.device_put(np.zeros(rows, np.int32))
    iota = jax.device_put(np.arange(rows, dtype=np.int32))

    def _gen_kernel(seed_ref, out_ref, pc_ref):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        bits = pltpu.prng_random_bits(out_ref.shape)
        out_ref[...] = bits
        pc_ref[...] = jnp.sum(
            jax.lax.population_count(bits).astype(jnp.float32),
            axis=0, keepdims=True)

    def gen(seed):
        packed_t, pc = pl.pallas_call(
            _gen_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(rows // gen_tile,),
                in_specs=[],
                out_specs=[
                    pl.BlockSpec((w32, gen_tile), lambda i, s: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, gen_tile), lambda i, s: (0, i),
                                 memory_space=pltpu.VMEM)]),
            out_shape=[jax.ShapeDtypeStruct((w32, rows), jnp.uint32),
                       jax.ShapeDtypeStruct((1, rows), jnp.float32)],
        )(jnp.reshape(seed, (1,)))
        return packed_t, pc[0]

    step = functools.partial(
        ss.scan_step_compact.__wrapped__, y_padded=yp, y_sum=ysum,
        n_used=n_used, min_count=min_count, kernel="pallas", cand_c=cand_c,
        cand_k=2048, tile_rows=2048, cand_q=64, cand_c2=64,
        pre_transposed=True)

    @jax.jit
    def window(state, seed, base):
        def body(carry, _):
            st, sd, bs = carry
            packed, pc = gen(sd)
            st = step(st, packed, pc, bs + iota, hi0)
            return (st, sd + rows // gen_tile, bs + rows), None
        (state, seed, base), _ = jax.lax.scan(body, (state, seed, base),
                                              length=S)
        return state, seed, base

    print("compiling...", file=sys.stderr, flush=True)
    state = ss.init_buffered_state(p, k, buf_cap=(cand_c + 2 * 64) * 16)
    seed = jax.device_put(jnp.int32(1 << 20))
    base = jax.device_put(jnp.int32(0))
    state, seed, base = window(state, seed, base)
    np.asarray(state.buf_n)
    ws = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        state, seed, base = window(state, seed, base)
        np.asarray(state.buf_n)
        ws.append(time.perf_counter() - t0)
    ws = np.array(ws[n_windows // 3:])          # drop ramp
    rates = S * rows / ws
    print("window ms:", " ".join(f"{t*1e3:.0f}" for t in ws))
    print(f"rows/step={rows}: median {np.median(rates)/1e6:.1f}M rows/s  "
          f"step {np.median(ws)/S*1e3:.2f} ms")


if __name__ == "__main__":
    measure()
