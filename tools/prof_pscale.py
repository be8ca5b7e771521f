"""Permutation-axis scaling probe: step time vs P (phenotype columns).

The reference defaults to 100 permutations partly because its scan costs
scale linearly in P on CPU threads (associate_kmers.cpp:134-137). On the
MXU the score GEMM's N-dimension (P) is the underutilized axis at P=101
(padded to 128 lanes), so widening P toward 1024 raises MXU utilization —
permutation-rich thresholds get cheaper per test. Chained windows as in
bench.py; fresh PRNG stream per step.
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

n_used, n_pad, k = 1008, 1024, 10001
import os as _os
rows = 1 << int(_os.environ.get("PSCALE_LOG2_ROWS", "21"))
min_count = 51
w32 = n_pad // 32
gen_tile = 1 << 14
S = 16

rng = np.random.default_rng(0)


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


def run(p, n_win=8, n_ramp=8):
    y = rng.normal(size=(n_used, p)).astype(np.float32)
    yp, ysum = score_ops.prepare_phenotypes(y, n_pad)
    yp, ysum = jax.device_put(yp), jax.device_put(ysum)
    hi0 = jax.device_put(np.zeros(rows, np.int32))
    iota = jax.device_put(np.arange(rows, dtype=np.int32))
    step = functools.partial(
        ss.scan_step_compact.__wrapped__, y_padded=yp, y_sum=ysum,
        n_used=n_used, min_count=min_count, kernel="pallas", cand_c=256,
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

    state = ss.init_buffered_state(p, k, buf_cap=256 * 24)
    seed = jax.device_put(jnp.int32(1 << 20))
    base = jax.device_put(jnp.int32(0))
    t0 = time.perf_counter()
    state, seed, base = window(state, seed, base)
    np.asarray(state.buf_n)
    print(f"[P={p}] compile+warm {time.perf_counter()-t0:.0f}s",
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
    best = float(np.min(ms)) / S
    med = float(np.median(ms)) / S
    tests_s = rows * p / (med / 1e3)
    print(f"[P={p}] windows ms: " + " ".join(f"{t:.0f}" for t in ms),
          file=sys.stderr)
    print(f"[P={p}] median {med:.2f} ms/step (best {best:.2f}) = "
          f"{rows/(med/1e3)/1e6:.1f} M kmers/s = {tests_s/1e9:.1f} B "
          f"kmer-tests/s", flush=True)


if __name__ == "__main__":
    for p in [int(x) for x in (sys.argv[1:] or ["101", "509", "1013"])]:
        run(p)
