"""Profile the scan step components on the real chip.

Times, per 2M-row batch at N=1008/P=101/K=10001:
  1. score kernel alone (score_batch_t_pallas_bmax)
  2. strided_top_k_from_bmax extraction alone (cand_c=512)
  3. full buffered step (scan_step_buffered)
to locate where the non-GEMM wall-clock goes.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from kmersgwas_tpu.ops import score as score_ops
from kmersgwas_tpu.ops import topk as topk_ops
from kmersgwas_tpu.ops import scanstep as ss


def timeit(fn, *args, iters=30, warmup=3, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    n_used, n_pad, p, k = 1008, 1024, 101, 10001
    rows = 1 << 21
    min_count = 51
    w32 = n_pad // 32
    rng = np.random.default_rng(0)
    y = rng.normal(size=(n_used, p)).astype(np.float32)
    yp, ysum = score_ops.prepare_phenotypes(y, n_pad)
    packed = jax.device_put(rng.integers(0, 1 << 32, size=(rows, w32),
                                         dtype=np.uint64).astype(np.uint32))
    popcnt = jax.device_put(np.asarray(jax.device_get(jnp.sum(
        jax.lax.population_count(jnp.asarray(packed)), axis=1)), np.float32))
    lo, hi = topk_ops.encode_rows(np.arange(rows))
    lo, hi = jax.device_put(lo), jax.device_put(hi)

    f_score = jax.jit(functools.partial(
        score_ops.score_batch_t_pallas_bmax.__wrapped__,
        n_used=n_used, min_count=min_count))
    t = timeit(f_score, packed, popcnt, yp, ysum)
    print(f"score+bmax kernel: {t*1e3:8.2f} ms   ({rows/t/1e6:.0f}M kmers/s)")

    f_score_plain = jax.jit(functools.partial(
        score_ops.score_batch_t_pallas.__wrapped__,
        n_used=n_used, min_count=min_count))
    t = timeit(f_score_plain, packed, popcnt, yp, ysum)
    print(f"score kernel     : {t*1e3:8.2f} ms   ({rows/t/1e6:.0f}M kmers/s)")

    sc, bmax = f_score(packed, popcnt, yp, ysum)
    sc, bmax = jax.block_until_ready((sc, bmax))

    for cand in (512, 2048):
        f_x = jax.jit(functools.partial(topk_ops.strided_top_k_from_bmax,
                                        k=cand, tile_rows=2048))
        t = timeit(f_x, sc, bmax)
        print(f"strided extract c={cand:5d}: {t*1e3:8.2f} ms")

    # sub-parts of the extraction
    f_b = jax.jit(functools.partial(topk_ops.blocked_top_k, k=513, block=16))
    t = timeit(f_b, bmax)
    print(f"  blocked_top_k(bmax,513): {t*1e3:8.2f} ms")

    f_t = jax.jit(lambda b: jax.lax.top_k(b, 513))
    t = timeit(f_t, bmax)
    print(f"  flat top_k(bmax,513)   : {t*1e3:8.2f} ms")

    # plain top_k over small widths (what a compact path would cost)
    for width in (1024, 2048, 8192):
        x = jax.device_put(rng.normal(size=(p, width)).astype(np.float32))
        f = jax.jit(lambda a: jax.lax.top_k(a, min(128, width)))
        t = timeit(f, x)
        print(f"  top_k (101,{width}) k=128: {t*1e3:8.2f} ms")

    # flush-style merge: top_k over (P, K + 4096) k=K
    x = jax.device_put(rng.normal(size=(p, k + 4096)).astype(np.float32))
    f = jax.jit(lambda a: jax.lax.top_k(a, k))
    t = timeit(f, x, iters=10)
    print(f"  flush top_k (101,{k+4096}) k={k}: {t*1e3:8.2f} ms")

    # full buffered step
    state = ss.init_buffered_state(p, k, buf_cap=512 * 8)
    step = functools.partial(ss.scan_step_buffered, y_padded=yp, y_sum=ysum,
                             n_used=n_used, min_count=min_count,
                             kernel="pallas", cand_c=512, cand_k=2048)
    state = step(state, packed, popcnt, lo, hi)
    jax.block_until_ready(state.scores)
    t = timeit(step, state, packed, popcnt, lo, hi, iters=30)
    print(f"buffered step    : {t*1e3:8.2f} ms   ({rows/t/1e6:.0f}M kmers/s)")


def compact():
    import functools
    n_used, n_pad, p, k = 1008, 1024, 101, 10001
    rows = 1 << 21
    min_count = 51
    w32 = n_pad // 32
    rng = np.random.default_rng(0)
    y = rng.normal(size=(n_used, p)).astype(np.float32)
    yp, ysum = score_ops.prepare_phenotypes(y, n_pad)

    # distinct batches so the steady-state append path engages
    n_batches = 12
    batches = []
    for b in range(n_batches):
        packed = rng.integers(0, 1 << 32, size=(rows, w32),
                              dtype=np.uint64).astype(np.uint32)
        popcnt = np.asarray(jax.device_get(jnp.sum(
            jax.lax.population_count(jnp.asarray(packed)), axis=1)),
            np.float32)
        lo, hi = topk_ops.encode_rows(np.arange(b * rows, (b + 1) * rows))
        batches.append((jax.device_put(packed), jax.device_put(popcnt),
                        jax.device_put(lo), jax.device_put(hi)))

    # kernel alone
    th = jnp.full((p,), 100.0, jnp.float32)
    f_k = jax.jit(functools.partial(
        score_ops.score_batch_t_pallas_tilemax.__wrapped__,
        n_used=n_used, min_count=min_count))
    t = timeit(f_k, batches[0][0], batches[0][1], yp, ysum, th)
    print(f"tilemax kernel   : {t*1e3:8.2f} ms   ({rows/t/1e6:.0f}M kmers/s)")

    import time as _t
    step = functools.partial(ss.scan_step_compact, y_padded=yp, y_sum=ysum,
                             n_used=n_used, min_count=min_count,
                             kernel="pallas", cand_c=128, cand_k=2048)
    state = ss.init_buffered_state(p, k, buf_cap=128 * 32)
    print("compiling compact step...")
    state = step(state, *batches[0])
    jax.block_until_ready(state.scores)
    for b in batches[1:]:
        state = step(state, *b)
    jax.block_until_ready(state.scores)
    print(f"warm buf_n={int(state.buf_n)} thresh0={float(state.thresh[0]):.2f}")
    iters = 96
    t0 = _t.perf_counter()
    for i in range(iters):
        state = step(state, *batches[i % n_batches])
    checksum = float(np.asarray(state.scores).sum())
    dt = _t.perf_counter() - t0
    assert np.isfinite(checksum)
    tput = rows * iters / dt
    print(f"compact step     : {dt/iters*1e3:8.2f} ms   ({tput/1e6:.0f}M kmers/s)")


import sys

if __name__ == "__main__":
    if "--compact" in sys.argv:
        compact()
    elif "--steady" not in sys.argv:
        main()


def steady():
    """Append-path cost in isolation: thresh forced high so cnt==0 and the
    compact step always buffers (the genuine late-stream regime where almost
    no row beats the carried k-th score)."""
    import functools
    import time as _t
    n_used, n_pad, p, k = 1008, 1024, 101, 10001
    rows = 1 << 21
    min_count = 51
    w32 = n_pad // 32
    rng = np.random.default_rng(0)
    y = rng.normal(size=(n_used, p)).astype(np.float32)
    yp, ysum = score_ops.prepare_phenotypes(y, n_pad)
    n_batches = 8
    batches = []
    for b in range(n_batches):
        packed = rng.integers(0, 1 << 32, size=(rows, w32),
                              dtype=np.uint64).astype(np.uint32)
        popcnt = np.asarray(jax.device_get(jnp.sum(
            jax.lax.population_count(jnp.asarray(packed)), axis=1)),
            np.float32)
        lo, hi = topk_ops.encode_rows(np.arange(b * rows, (b + 1) * rows))
        batches.append((jax.device_put(packed), jax.device_put(popcnt),
                        jax.device_put(lo), jax.device_put(hi)))

    for cand_c, tile_rows in ((256, 2048), (256, 1024)):
        step = functools.partial(ss.scan_step_compact, y_padded=yp,
                                 y_sum=ysum, n_used=n_used,
                                 min_count=min_count, kernel="pallas",
                                 cand_c=cand_c, cand_k=2048,
                                 tile_rows=tile_rows)
        state = ss.init_buffered_state(p, k, buf_cap=cand_c * 16)
        state = state._replace(
            scores=jnp.full((p, k), 1e30, jnp.float32),
            thresh=jnp.full((p,), 1e30, jnp.float32))
        state = step(state, *batches[0])
        jax.block_until_ready(state.scores)
        for b in batches[1:]:
            state = step(state, *b)
        jax.block_until_ready(state.scores)
        assert int(state.buf_n) > 0, "append path not engaged"
        iters = 96
        t0 = _t.perf_counter()
        for i in range(iters):
            state = step(state, *batches[i % n_batches])
        checksum = float(np.asarray(state.buf_n))
        dt = _t.perf_counter() - t0
        tput = rows * iters / dt
        print(f"append path c={cand_c} tile={tile_rows}: "
              f"{dt/iters*1e3:8.2f} ms  ({tput/1e6:.0f}M kmers/s)")


if __name__ == "__main__" and "--steady" in sys.argv:
    steady()
