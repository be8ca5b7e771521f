"""Round-5-final probe: what would pc_pad-invariant accumulation cost?

BENCHMARKS.md "Score precision" records that scores differ in the last
mantissa bit across phenotype-chunk widths (the MXU contraction split
depends on the y-block shape). ROUND5.md floated fixing the y block at a
constant 256 columns regardless of P to make scores shape-invariant,
guessing "no measured cost". This probe measures the production scan step
(pallas, cand_w=256, tile 4096, 2M rows) at P = 101 (pc_pad 104, the
flagship), P = 128, and P = 256 — i.e. exactly what padding the flagship
to 128 or 256 columns would cost.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/prof_r5_pcpad.py

RESULT (real chip via relay, 2026-08-22; the fresh state per variant
re-ramps and the relay was noisy, so read the MIN window, not the
median — P=101's min matches the converged flagship):

    P=101 (pc_pad 104)  min window  94 ms ->  5.88 ms/step  (flagship)
    P=128 (pc_pad 128)  min window 106 ms ->  6.63 ms/step  (+13%)
    P=256 (pc_pad 256)  min window 185 ms -> 11.56 ms/step  (~2x)

REFUTED: the MXU does not round the 104-row y operand up to 128 for
free (8-sublane granularity is real), and a fixed 256-wide block would
HALVE flagship throughput — matching the FLOP analysis (the GEMM cost
scales with pc_pad). Scores therefore stay last-mantissa-bit sensitive
to the phenotype-chunk width by design; exact cross-shape
reproducibility is what `--score_precision highest` and the certify_topk
finalize (exact f64 re-score of every carried candidate) are for.
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

N_USED, N_PAD, K = 1008, 1024, 10001
ROWS = 1 << 21
MIN_COUNT = 51
W32 = N_PAD // 32
GEN_TILE = 1 << 14
S = 16


def make_gen():
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
    return gen


def run_windows(window, state0, n_windows=12, n_ramp=8, label=""):
    print(f"[{label}] compiling...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    state = state0
    seed = jax.device_put(jnp.int32(1 << 20))
    base = jax.device_put(jnp.int32(0))
    state, seed, base = window(state, seed, base)
    jax.block_until_ready(state)
    print(f"[{label}] compiled in {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    for _ in range(n_ramp):
        state, seed, base = window(state, seed, base)
        jax.block_until_ready(state)
    ws = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        state, seed, base = window(state, seed, base)
        jax.block_until_ready(state)
        ws.append(time.perf_counter() - t0)
    ws = np.array(ws)
    med = float(np.median(ws))
    print(f"[{label}] windows ms: "
          + " ".join(f"{t*1e3:.0f}" for t in ws), file=sys.stderr)
    print(f"[{label}] step {med/S*1e3:.2f} ms  "
          f"{S*ROWS/med/1e6:.1f}M rows/s", flush=True)


def variant(p):
    rng = np.random.default_rng(0)
    y = rng.normal(size=(N_USED, p)).astype(np.float32)
    yp, ysum = score_ops.prepare_phenotypes(y, N_PAD)
    yp, ysum = jax.device_put(yp), jax.device_put(ysum)
    hi0 = jax.device_put(np.zeros(ROWS, np.int32))
    iota = jax.device_put(np.arange(ROWS, dtype=np.int32))
    gen = make_gen()
    step = functools.partial(
        ss.scan_step_compact.__wrapped__, y_padded=yp, y_sum=ysum,
        n_used=N_USED, min_count=MIN_COUNT, kernel="pallas",
        cand_k=2048, tile_rows=4096, cand_w=256, cand_q=64,
        pre_transposed=True)

    @jax.jit
    def window(state, seed, base):
        def body(carry, _):
            st, sd, bs = carry
            packed, pc = gen(sd)
            st = step(st, packed, pc, bs + iota, hi0)
            return (st, sd + ROWS // GEN_TILE, bs + ROWS), None
        (state, seed, base), _ = jax.lax.scan(
            body, (state, seed, base), length=S)
        return state, seed, base

    return window, ss.init_buffered_state(p, K, buf_cap=12288)


if __name__ == "__main__":
    for p in (int(a) for a in (sys.argv[1:] or ["101", "128", "256"])):
        run_windows(*variant(p), n_windows=12, n_ramp=8, label=f"P={p}")
