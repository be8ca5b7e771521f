"""Round-5 probe: P=1009 permutation-axis scan with per-column-group
decisions + the in-kernel top-W epilogue.

VERDICT r4 #3 target: a P=1009 run within ~25% of the P=101 per-TEST
throughput. P=101 r5 flagship: 317.0M rows/s * 101 = 32.0B tests/s, so
the bar is >= 24B tests/s (>= 23.8M rows/s at P=1009).

Configuration: 1M-row steps (bounds the fallback's per-group score plane),
cand_w=256 in-kernel candidates, q=64 narrow appends, col_group=128 (8
groups over 1009 columns — a hot column only drags its own group into the
group-sized fallback). The ramp is genuinely long at this width: the
narrow guard needs fewer than 64 hot tile-winners per column, i.e.
~10001 * 1M / S < 64 -> S > 156M rows; ramp windows are reported
separately, steady state is the headline (same methodology as bench.py).

Run: python tools/prof_r5_pscale.py [n_windows] (~15-25 min incl. the
multi-chunk remote compile).
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

N_USED, N_PAD, P, K = 1008, 1024, 1009, 10001
ROWS = 1 << 20
MIN_COUNT = 51
W32 = N_PAD // 32
GEN_TILE = 1 << 14
S = 16


def main(n_windows: int = 16, n_ramp: int = 16):
    rng = np.random.default_rng(0)
    y = rng.normal(size=(N_USED, P)).astype(np.float32)
    yp, ysum = score_ops.prepare_phenotypes(y, N_PAD)
    yp, ysum = jax.device_put(yp), jax.device_put(ysum)
    hi0 = jax.device_put(np.zeros(ROWS, np.int32))
    iota = jax.device_put(np.arange(ROWS, dtype=np.int32))

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
                num_scalar_prefetch=1, grid=(ROWS // GEN_TILE,),
                in_specs=[],
                out_specs=[
                    pl.BlockSpec((W32, GEN_TILE), lambda i, s: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, GEN_TILE), lambda i, s: (0, i),
                                 memory_space=pltpu.VMEM)]),
            out_shape=[jax.ShapeDtypeStruct((W32, ROWS), jnp.uint32),
                       jax.ShapeDtypeStruct((1, ROWS), jnp.float32)],
        )(jnp.reshape(seed, (1,)))
        return packed_t, pc[0]

    step = functools.partial(
        ss.scan_step_compact.__wrapped__, y_padded=yp, y_sum=ysum,
        n_used=N_USED, min_count=MIN_COUNT, kernel="pallas",
        cand_k=2048, tile_rows=2048, cand_w=256, cand_q=64,
        col_group=128, pre_transposed=True)

    @jax.jit
    def window(state, seed, base):
        def body(carry, _):
            st, sd, bs = carry
            packed, pc = gen(sd)
            st = step(st, packed, pc, bs + iota, hi0)
            return (st, sd + ROWS // GEN_TILE, bs + ROWS), None
        (state, seed, base), _ = jax.lax.scan(body, (state, seed, base),
                                              length=S)
        return state, seed, base

    print("compiling (multi-chunk, ~minutes via remote compile)...",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    state = ss.init_buffered_state(P, K, buf_cap=12288)
    seed = jax.device_put(jnp.int32(1 << 20))
    base = jax.device_put(jnp.int32(0))
    state, seed, base = window(state, seed, base)
    jax.block_until_ready(state)
    print(f"compiled in {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    ramp = []
    for _ in range(n_ramp):
        t0 = time.perf_counter()
        state, seed, base = window(state, seed, base)
        jax.block_until_ready(state)
        ramp.append(time.perf_counter() - t0)
    ws = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        state, seed, base = window(state, seed, base)
        jax.block_until_ready(state)
        ws.append(time.perf_counter() - t0)
    ws = np.array(ws)
    med = float(np.median(ws))
    rows_s = S * ROWS / med
    print("ramp ms:   " + " ".join(f"{t*1e3:.0f}" for t in ramp),
          file=sys.stderr)
    print("window ms: " + " ".join(f"{t*1e3:.0f}" for t in ws),
          file=sys.stderr)
    print(f"P={P}: step {med/S*1e3:.2f} ms  {rows_s/1e6:.1f}M rows/s  "
          f"{rows_s*P/1e9:.1f}B tests/s "
          f"(bar: >=24B tests/s)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
