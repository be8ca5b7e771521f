"""Round-4 step-time probes (real chip), chained windows like bench.py.

Variants of the bench's simulated-stream step (2M rows, N=1008, P=101):
  v0: round-3 baseline — transposed gen + separate popcount + compact step
      (tile_rows 2048, cand_c 256)
  v1: popcount fused into the generator kernel (drops the separate 256 MB
      popcount pass)
  v2: v1 + tile_rows 4096 (half the tile maxima -> cheaper extraction)
  v3: v1 + cand_c 128 (narrower candidate top-k + sort)
  v4: v1 + tile_rows 4096 + cand_c 128
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
rows = 1 << 21
min_count = 51
w32 = n_pad // 32
gen_tile = 1 << 14
S = 16

rng = np.random.default_rng(0)
y = rng.normal(size=(n_used, p)).astype(np.float32)
yp, ysum = score_ops.prepare_phenotypes(y, n_pad)
yp, ysum = jax.device_put(yp), jax.device_put(ysum)
hi0 = jax.device_put(np.zeros(rows, np.int32))
iota = jax.device_put(np.arange(rows, dtype=np.int32))


def _gen_kernel(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    out_ref[...] = pltpu.prng_random_bits(out_ref.shape)


def gen_v0(seed):
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
    pc = jnp.sum(jax.lax.population_count(packed_t), axis=0
                 ).astype(jnp.float32)
    return packed_t, pc


def _gen_pc_kernel(seed_ref, out_ref, pc_ref):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.prng_random_bits(out_ref.shape)
    out_ref[...] = bits
    pc_ref[...] = jnp.sum(
        jax.lax.population_count(bits).astype(jnp.float32),
        axis=0, keepdims=True)


def gen_v1(seed):
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


def make_window(gen, tile_rows, cand_c, precision="default"):
    step = functools.partial(
        ss.scan_step_compact.__wrapped__, y_padded=yp, y_sum=ysum,
        n_used=n_used, min_count=min_count, kernel="pallas", cand_c=cand_c,
        cand_k=2048, tile_rows=tile_rows, cand_q=64, pre_transposed=True,
        precision=precision)

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
    return window


def run(label, gen, tile_rows=2048, cand_c=256, n_win=10, n_ramp=8,
        precision="default"):
    window = make_window(gen, tile_rows, cand_c, precision)
    state = ss.init_buffered_state(p, k, buf_cap=cand_c * 24)
    seed = jax.device_put(jnp.int32(1 << 20))
    base = jax.device_put(jnp.int32(0))
    t0 = time.perf_counter()
    state, seed, base = window(state, seed, base)
    np.asarray(state.buf_n)
    print(f"[{label}] compile+warm {time.perf_counter()-t0:.0f}s",
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
    print(f"[{label}] windows ms: " +
          " ".join(f"{t:.0f}" for t in ms), file=sys.stderr)
    print(f"[{label}] median {med:.1f} ms/window = {med/S:.2f} ms/step = "
          f"{S*rows/ (med/1e3) /1e6:.1f} M/s", flush=True)
    # sanity: v1 popcount must equal v0's for the same seed
    return med


if __name__ == "__main__":
    which = sys.argv[1:] or ["v0", "v1", "v2", "v4"]
    # correctness spot-check of the fused popcount
    if "check" in which or True:
        pk0, pc0 = jax.jit(gen_v0)(jnp.int32(7))
        pk1, pc1 = jax.jit(gen_v1)(jnp.int32(7))
        assert np.array_equal(np.asarray(pk0), np.asarray(pk1))
        assert np.array_equal(np.asarray(pc0), np.asarray(pc1))
        print("fused-popcount gen bit-identical", flush=True)
    if "v0" in which:
        run("v0 base", gen_v0)
    if "v1" in which:
        run("v1 fused-pc", gen_v1)
    if "v2" in which:
        run("v2 fused-pc+tile4096", gen_v1, tile_rows=4096)
    if "v3" in which:
        run("v3 fused-pc+c128", gen_v1, cand_c=128)
    if "v4" in which:
        run("v4 fused-pc+tile4096+c128", gen_v1, tile_rows=4096, cand_c=128)
    if "v5" in which:
        # bit-identity of bf16-unpack vs default on real scores first
        from kmersgwas_tpu.ops.score import score_batch_t_pallas
        pk, pc = jax.jit(gen_v1)(jnp.int32(11))
        s_def = score_batch_t_pallas(pk.T, pc, yp, ysum, n_used=n_used,
                                     min_count=min_count,
                                     precision="default")
        s_b16 = score_batch_t_pallas(pk.T, pc, yp, ysum, n_used=n_used,
                                     min_count=min_count, precision="bf16")
        assert np.array_equal(np.asarray(s_def), np.asarray(s_b16)), \
            "bf16 unpack NOT bit-identical to default"
        print("bf16-unpack scores bit-identical to default", flush=True)
        run("v5 fused-pc+bf16g", gen_v1, precision="bf16")
