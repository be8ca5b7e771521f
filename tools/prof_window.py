"""Isolate per-step cost inside a chained lax.scan window on the chip.

Windows of S=16 iterations, one dispatch each, synced with a scalar fetch:
  w0: gen only
  w1: gen + transpose + popcount reduce
  w2: gen + tilemax kernel (sum outputs into carry; no top-k machinery)
  w3: gen + full compact step (append path, saturated thresh)
  w4: gen + full compact step, cold thresh start (fallback-heavy)
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

n_used, n_pad, p, k = 1008, 1024, 101, 10001
rows = 1 << 21
min_count = 51
w32 = n_pad // 32
gen_tile = 1 << 14
S = 16


def _gen_kernel(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    out_ref[...] = pltpu.prng_random_bits(out_ref.shape)


def gen(seed):
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
    return packed


def run_window(fn, carry, label, iters=6):
    f = jax.jit(fn)
    out = f(carry)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0]
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = f(out)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0]
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts)
    med = np.median(ts)
    print(f"{label:36s}: med {med/S*1e3:7.2f} ms/step "
          f"({S*rows/med/1e6:5.0f}M/s)  windows(ms): "
          + " ".join(f"{t*1e3:.0f}" for t in ts))
    return out


def main():
    rng = np.random.default_rng(0)
    y = rng.normal(size=(n_used, p)).astype(np.float32)
    yp, ysum = score_ops.prepare_phenotypes(y, n_pad)
    yp, ysum = jax.device_put(yp), jax.device_put(ysum)
    lo = jax.device_put(np.arange(rows, dtype=np.int32))
    hi = jax.device_put(np.zeros(rows, np.int32))

    def w0(carry):
        def body(c, _):
            sd, acc = c
            pk = gen(sd)
            return (sd + 128, acc + pk[0, 0]), None
        c, _ = jax.lax.scan(body, carry, length=S)
        return c

    run_window(w0, (jnp.int32(1), jnp.uint32(0)), "w0 gen only")

    def w1(carry):
        def body(c, _):
            sd, acc = c
            pk = gen(sd)
            pkt = pk.T
            pc = jnp.sum(jax.lax.population_count(pkt), axis=0)
            return (sd + 128, acc + pc[0]), None
        c, _ = jax.lax.scan(body, carry, length=S)
        return c

    run_window(w1, (jnp.int32(1), jnp.int32(0)), "w1 gen+transpose+popcount")

    def w2(carry):
        def body(c, _):
            sd, acc = c
            pk = gen(sd)
            pc = jnp.sum(jax.lax.population_count(pk), axis=1).astype(jnp.float32)
            th = jnp.full((p,), 8000.0, jnp.float32)
            outs = score_ops.score_batch_t_pallas_tilemax.__wrapped__(
                pk, pc, yp, ysum, th, n_used=n_used, min_count=min_count,
                tile_rows=2048)
            return (sd + 128, acc + outs[0][0, 0]), None
        c, _ = jax.lax.scan(body, carry, length=S)
        return c

    run_window(w2, (jnp.int32(1), jnp.float32(0)), "w2 gen+tilemax")

    step = functools.partial(
        ss.scan_step_compact.__wrapped__, y_padded=yp, y_sum=ysum,
        n_used=n_used, min_count=min_count, kernel="pallas", cand_c=256,
        cand_k=2048, tile_rows=2048)

    def w3(carry):
        def body(c, _):
            sd, st = c
            pk = gen(sd)
            pc = jnp.sum(jax.lax.population_count(pk), axis=1).astype(jnp.float32)
            st = step(st, pk, pc, lo, hi)
            return (sd + 128, st), None
        c, _ = jax.lax.scan(body, carry, length=S)
        return c

    state = ss.init_buffered_state(p, k, buf_cap=256 * 24)
    # saturate via one real fallback step first
    pk = jax.block_until_ready(gen(jax.device_put(jnp.int32(0))))
    pc = jnp.sum(jax.lax.population_count(pk), axis=1).astype(jnp.float32)
    state = jax.block_until_ready(jax.jit(step)(state, pk, pc, lo, hi))
    out = run_window(w3, (jnp.int32(1), state), "w3 gen+compact step (warm)")
    # how many fallbacks happened? buf_n resets on flush; print it
    print("   buf_n after warm windows:", int(np.asarray(out[1].buf_n)),
          "thresh[0]:", float(np.asarray(out[1].thresh)[0]))

    state_cold = ss.init_buffered_state(p, k, buf_cap=256 * 24)
    run_window(w3, (jnp.int32(1), state_cold), "w4 gen+compact step (cold)", iters=3)


if __name__ == "__main__":
    main()
