"""Probe: per-step batch size scaling (2M vs 4M vs 8M rows/step).

The compact step's extraction (top-c over tile maxima + fixed-width sort +
append) runs once per BATCH; doubling the batch halves the fixed part per
row while the tile-maxima top-k grows ~linearly. Measures ms per 2M-row
equivalent for each size, fused-popcount generator throughout.

OUTCOME (2026-08-21, v5e via axon): 2M baseline reproduced (best windows
8.3 ms/step); the 4M variant CRASHED the TPU worker ("kernel fault",
worker restart) at the first window — most likely the (W32, 4M)
single-lane-dim generator output. Direction abandoned: the projected gain
(~0.4 ms/step of amortized extraction) does not justify a kernel-fault
surface in the production step. Kept for the record.
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

n_used, n_pad, p, k = 1008, 1024, 101, 10001
min_count = 51
w32 = n_pad // 32
gen_tile = 1 << 14

rng = np.random.default_rng(0)
y = rng.normal(size=(n_used, p)).astype(np.float32)
yp, ysum = score_ops.prepare_phenotypes(y, n_pad)
yp, ysum = jax.device_put(yp), jax.device_put(ysum)


def make_gen(rows):
    def _gen_pc_kernel(seed_ref, out_ref, pc_ref):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        bits = pltpu.prng_random_bits(out_ref.shape)
        out_ref[...] = bits
        pc_ref[...] = jnp.sum(
            jax.lax.population_count(bits).astype(jnp.float32),
            axis=0, keepdims=True)

    def gen(seed):
        packed_t, pc = pl.pallas_call(
            _gen_pc_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(rows // gen_tile,),
                in_specs=[],
                out_specs=[
                    pl.BlockSpec((w32, gen_tile), lambda i, s: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, gen_tile), lambda i, s: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
            ),
            out_shape=[jax.ShapeDtypeStruct((w32, rows), jnp.uint32),
                       jax.ShapeDtypeStruct((1, rows), jnp.float32)],
        )(jnp.reshape(seed, (1,)))
        return packed_t, pc[0]
    return gen


def run(rows, steps, n_win=10, n_ramp=8, cand_c=256):
    gen = make_gen(rows)
    hi0 = jax.device_put(np.zeros(rows, np.int32))
    iota = jax.device_put(np.arange(rows, dtype=np.int32))
    step = functools.partial(
        ss.scan_step_compact.__wrapped__, y_padded=yp, y_sum=ysum,
        n_used=n_used, min_count=min_count, kernel="pallas", cand_c=cand_c,
        cand_k=2048, tile_rows=2048, cand_q=64, pre_transposed=True)

    @jax.jit
    def window(state, seed, base):
        def body(carry, _):
            st, sd, bs = carry
            packed, pc = gen(sd)
            st = step(st, packed, pc, bs + iota, hi0)
            return (st, sd + rows // gen_tile, bs + rows), None
        (state, seed, base), _ = jax.lax.scan(body, (state, seed, base),
                                              length=steps)
        return state, seed, base

    state = ss.init_buffered_state(p, k, buf_cap=cand_c * 24)
    seed = jax.device_put(jnp.int32(1 << 20))
    base = jax.device_put(jnp.int32(0))
    t0 = time.perf_counter()
    state, seed, base = window(state, seed, base)
    np.asarray(state.buf_n)
    print(f"[{rows>>20}M] compile+warm {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    for _ in range(n_ramp):
        state, seed, base = window(state, seed, base)
        np.asarray(state.buf_n)
    ts = []
    for _ in range(n_win):
        t0 = time.perf_counter()
        state, seed, base = window(state, seed, base)
        np.asarray(state.buf_n)
        ts.append(time.perf_counter() - t0)
    ms = np.array(ts) * 1e3
    med = float(np.median(ms))
    per2m = med / steps / (rows / (1 << 21))
    print(f"[{rows>>20}M rows/step] windows ms: "
          + " ".join(f"{t:.0f}" for t in ms), file=sys.stderr)
    print(f"[{rows>>20}M rows/step] {per2m:.2f} ms per 2M-row equivalent = "
          f"{(1<<21)/per2m*1000/1e6:.1f} M/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["2", "4", "8"]
    if "2" in which:
        run(1 << 21, 16)
    if "4" in which:
        run(1 << 22, 8)
    if "8" in which:
        run(1 << 23, 4)
