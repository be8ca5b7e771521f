"""Round-5 probe: where the post-kernel epilogue time goes, and whether a
narrower candidate configuration closes the gap to the unpack+GEMM bound.

Step budget at the r4 flagship config (c=256, c2=64, q=64):
    measured step          6.69 ms
    unpack+GEMM bound      5.41 ms    (prof_window2 GEMM-only)
    -> epilogue + extraction ~1.3 ms: in-kernel top-3/cnt reductions, the
       XLA-side top_k over tile maxima, two-key sort (width c+2*c2=384),
       deferred row gather, append/cond plumbing, amortized flush merge.

Variants measured here (same windowed-median methodology as bench.py):
    flag       c=256 c2=64 q=64   — the r4 flagship (baseline re-measure)
    floor      kernel-only: _tilemax outputs reduced to one scalar carried
               through the scan (no extraction, no state) — the true
               generator+kernel floor including the in-kernel top-3 work
    narrow192  c=128 c2=32 q=64   — sort width 192
    narrow128  c=64  c2=32 q=32   — sort width 128 (risk: more fallbacks
               while thresh is still low; watch the window trace)

Run: python tools/prof_r5_epi.py [variant ...]   (default: all, ~10 min)

RESULTS (real chip via relay, 2026-08-21, 12 windows x 16 steps after
8 ramp windows; the relay was warming through the early variants — read
the MIN window, the median of the converged tail, not the raw median):

    floor      windows 89-93 ms  -> 5.58 ms/step (375.7M rows/s)
               kernel+gen only: the in-kernel top-3 epilogue costs
               ~0.17 ms over the 5.41 ms unpack+GEMM bound
    flag       raw median polluted by ramp (windows 725..104); converged
               windows 104-107 ms -> 6.5-6.7 ms/step == BENCH_r04
    narrow192  STILL RAMPING after 20 windows (1133 -> 353 ms): with
    narrow128  c=64-128 kept tiles the exact fallback keeps firing until
               thresh needs only c hot tiles/column (~10001*2M/S < c ->
               S > 150-300M rows); the narrow-c configs trade a shorter
               sort for a catastrophically longer hot phase. REJECTED.

Readings:
  * extraction gap at the r4 flagship = 6.5-6.7 - 5.58 ~ 1.0-1.1 ms
    (lax.top_k over tile maxima + take_alongs + two-key sort + deferred
    gather + append plumbing + amortized flush).
  * micro-costs measured on-chip (chained dispatches): two-key sort of
    width 384 ~ 0.09 ms, width 192 ~ 0.09 ms; (P,64) gather from 2M rows
    ~ 0.11 ms; 64-wide dynamic_update_slice ~ 0.07 ms (x3 arrays). No
    single XLA op dominates — the gap is the SUM of many small pieces,
    so narrowing any one of them cannot reach the <= 5.8 ms target.
  * RESOLUTION (see main_topw/main_topw2/main_topw3 + exp_kernel.py case
    `topc`): the current Mosaic toolchain now LOWERS the running
    sorted-insert that r3/r4 recorded as CRASH/HANG (vi crash remains;
    vir/via/vi2 now pass). ops/score._score_t_topw_kernel therefore
    carries the whole running top-W candidate list in-kernel, retiring
    the XLA-side top_k/take_alongs/wide-sort. Measured (same windowed
    methodology):

      topw128  shift-insert W=128 q=64      no-flush windows 99 ms
      topw256  shift-insert W=256 q=64      median 6.32 ms/step (331.7M)
      topwfloor shift-insert kernel-only    6.25 ms  (insert cost 0.67 ms)
      rmfloor  REPLACE-MIN kernel-only      6.04 ms  (insert cost 0.46 ms)
      rm2048   replace-min W=256 cap 12288  median 6.40 ms, typical
               windows 101-103 ms (6.3-6.4 ms/step)
      rm4096   tile_rows=4096 variant       best windows 96-99 ms
               (6.0-6.2 ms/step) but erratic; kept at 2048 for stability

    Final form (shipped as the r5 flagship in bench.py + pipeline/scan):
    replace-min W=256 q=64 cap 12288, tile 2048 — BENCH r5: 317.0M
    kmers/s median, 6.62 ms/step (typical no-flush windows 104-105 ms =
    6.5 ms/step) vs r4's 313.5M / 6.69 ms. The <= 5.8 ms target remains
    unreached: the kernel floor itself is 5.58 ms (gen+GEMM+top-3
    epilogue), the in-kernel replace-min list costs +0.46 ms (a serial
    VPU dependency chain across all 1024 grid steps that cannot overlap
    the next tile's GEMM), and the residual append/flush machinery
    ~0.5 ms. Going lower needs either a Mosaic that pipelines the
    insert chain against the MXU, or tile 4096 stability (halves the
    chain; best windows already 6.0 ms).

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

N_USED, N_PAD, P, K = 1008, 1024, 101, 10001
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


def main(variants):
    rng = np.random.default_rng(0)
    y = rng.normal(size=(N_USED, P)).astype(np.float32)
    yp, ysum = score_ops.prepare_phenotypes(y, N_PAD)
    yp, ysum = jax.device_put(yp), jax.device_put(ysum)
    hi0 = jax.device_put(np.zeros(ROWS, np.int32))
    iota = jax.device_put(np.arange(ROWS, dtype=np.int32))
    gen = make_gen()

    def step_window(c, c2, q):
        step = functools.partial(
            ss.scan_step_compact.__wrapped__, y_padded=yp, y_sum=ysum,
            n_used=N_USED, min_count=MIN_COUNT, kernel="pallas", cand_c=c,
            cand_k=2048, tile_rows=2048, cand_q=q, cand_c2=c2,
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
        cap = (c + 2 * c2) * 16
        cap += (-cap) % q if q else 0
        # capacity must divide both the wide and narrow append widths
        capq = np.lcm(c + 2 * c2, q) * 8 if q else cap
        return window, ss.init_buffered_state(P, K, buf_cap=int(capq))

    if "flag" in variants:
        run_windows(*step_window(256, 64, 64), label="flag")
    if "floor" in variants:
        # kernel-only: tilemax outputs folded into one carried scalar
        from kmersgwas_tpu.ops.scanstep import _tilemax

        @jax.jit
        def window(carry, seed, base):
            def body(c, _):
                acc, sd = c
                packed, pc = gen(sd)
                outs = _tilemax(packed, pc, yp, ysum,
                                jnp.full((P,), jnp.float32(1e30)),
                                N_USED, MIN_COUNT, "pallas", 2048,
                                pre_transposed=True)
                acc = acc + outs[0][0, 0] + outs[8].astype(jnp.float32)[0, 0]
                return (acc, sd + ROWS // GEN_TILE), None
            (acc, seed), _ = jax.lax.scan(body, (carry, seed), length=S)
            return acc, seed, base
        run_windows(window, jnp.float32(0), label="floor")
    if "narrow192" in variants:
        run_windows(*step_window(128, 32, 64), label="narrow192")
    if "narrow128" in variants:
        run_windows(*step_window(64, 32, 32), label="narrow128")


if __name__ == "__main__" and sys.argv[1:2] != ["topw"]:
    args = sys.argv[1:] or ["floor", "flag", "narrow192", "narrow128"]
    main(args)


def main_topw(variants):
    """Windowed step-time for the cand_w in-kernel top-W mode."""
    rng = np.random.default_rng(0)
    y = rng.normal(size=(N_USED, P)).astype(np.float32)
    yp, ysum = score_ops.prepare_phenotypes(y, N_PAD)
    yp, ysum = jax.device_put(yp), jax.device_put(ysum)
    hi0 = jax.device_put(np.zeros(ROWS, np.int32))
    iota = jax.device_put(np.arange(ROWS, dtype=np.int32))
    gen = make_gen()

    def topw_window(w, q):
        step = functools.partial(
            ss.scan_step_compact.__wrapped__, y_padded=yp, y_sum=ysum,
            n_used=N_USED, min_count=MIN_COUNT, kernel="pallas",
            cand_k=2048, tile_rows=2048, cand_w=w, cand_q=q,
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
        cap = int(np.lcm(w, q)) * 16
        return window, ss.init_buffered_state(P, K, buf_cap=cap)

    if "topw128" in variants:
        run_windows(*topw_window(128, 64), n_windows=16, n_ramp=12,
                    label="topw128")
    if "topw128q32" in variants:
        run_windows(*topw_window(128, 32), n_windows=16, n_ramp=12,
                    label="topw128q32")
    if "topw256" in variants:
        run_windows(*topw_window(256, 64), n_windows=16, n_ramp=12,
                    label="topw256")


if __name__ == "__main__" and sys.argv[1:2] == ["topw"]:
    main_topw(sys.argv[2:] or ["topw128", "topw256"])


def main_topw2(variants):
    """Follow-ups: flush amortization (bigger cap) + in-kernel insert cost
    (kernel-only topw floor)."""
    rng = np.random.default_rng(0)
    y = rng.normal(size=(N_USED, P)).astype(np.float32)
    yp, ysum = score_ops.prepare_phenotypes(y, N_PAD)
    yp, ysum = jax.device_put(yp), jax.device_put(ysum)
    hi0 = jax.device_put(np.zeros(ROWS, np.int32))
    iota = jax.device_put(np.arange(ROWS, dtype=np.int32))
    gen = make_gen()

    if "topw256big" in variants:
        step = functools.partial(
            ss.scan_step_compact.__wrapped__, y_padded=yp, y_sum=ysum,
            n_used=N_USED, min_count=MIN_COUNT, kernel="pallas",
            cand_k=2048, tile_rows=2048, cand_w=256, cand_q=64,
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
        run_windows(window, ss.init_buffered_state(P, K, buf_cap=12288),
                    n_windows=24, n_ramp=12, label="topw256big")
    if "topwfloor" in variants:
        from kmersgwas_tpu.ops.score import score_batch_t_pallas_topw

        @jax.jit
        def windowf(carry, seed, base):
            def body(c, _):
                acc, sd = c
                packed, pc = gen(sd)
                cv, cg, ok = score_batch_t_pallas_topw.__wrapped__(
                    packed, pc, yp, ysum, jnp.full((P,), jnp.float32(1e30)),
                    n_used=N_USED, min_count=MIN_COUNT, tile_rows=2048,
                    cand_w=256, pre_transposed=True)
                acc = acc + cv[0, 0] + cg.astype(jnp.float32)[0, 0]
                return (acc, sd + ROWS // GEN_TILE), None
            (acc, seed), _ = jax.lax.scan(body, (carry, seed), length=S)
            return acc, seed, base
        run_windows(windowf, jnp.float32(0), n_windows=16, n_ramp=8,
                    label="topwfloor")


if __name__ == "__main__" and sys.argv[1:2] == ["topw2"]:
    main_topw2(sys.argv[2:] or ["topw256big", "topwfloor"])


def main_topw3(variants):
    """Replace-min insert (r5 final form) + tile_rows=4096 variants."""
    rng = np.random.default_rng(0)
    y = rng.normal(size=(N_USED, P)).astype(np.float32)
    yp, ysum = score_ops.prepare_phenotypes(y, N_PAD)
    yp, ysum = jax.device_put(yp), jax.device_put(ysum)
    hi0 = jax.device_put(np.zeros(ROWS, np.int32))
    iota = jax.device_put(np.arange(ROWS, dtype=np.int32))
    gen = make_gen()

    def step_win(tile, w, q, cap):
        step = functools.partial(
            ss.scan_step_compact.__wrapped__, y_padded=yp, y_sum=ysum,
            n_used=N_USED, min_count=MIN_COUNT, kernel="pallas",
            cand_k=2048, tile_rows=tile, cand_w=w, cand_q=q,
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
        return window, ss.init_buffered_state(P, K, buf_cap=cap)

    if "rmfloor" in variants:
        from kmersgwas_tpu.ops.score import score_batch_t_pallas_topw

        @jax.jit
        def windowf(carry, seed, base):
            def body(c, _):
                acc, sd = c
                packed, pc = gen(sd)
                cv, cg, ok = score_batch_t_pallas_topw.__wrapped__(
                    packed, pc, yp, ysum, jnp.full((P,), jnp.float32(1e30)),
                    n_used=N_USED, min_count=MIN_COUNT, tile_rows=2048,
                    cand_w=256, pre_transposed=True)
                acc = acc + cv[0, 0] + cg.astype(jnp.float32)[0, 0]
                return (acc, sd + ROWS // GEN_TILE), None
            (acc, seed), _ = jax.lax.scan(body, (carry, seed), length=S)
            return acc, seed, base
        run_windows(windowf, jnp.float32(0), n_windows=12, n_ramp=6,
                    label="rmfloor")
    if "rm2048" in variants:
        run_windows(*step_win(2048, 256, 64, 12288), n_windows=24,
                    n_ramp=12, label="rm2048")
    if "rm4096" in variants:
        run_windows(*step_win(4096, 256, 64, 12288), n_windows=24,
                    n_ramp=12, label="rm4096")


if __name__ == "__main__" and sys.argv[1:2] == ["topw3"]:
    main_topw3(sys.argv[2:] or ["rmfloor", "rm2048", "rm4096"])


def main_topw4(variants):
    """Round-5-final probe: can Mosaic hide the replace-min chain?

    The r5 postmortem measured the in-kernel replace-min candidate list
    as a serial VPU dependency chain across grid steps (+0.46 ms at tile
    2048, ~half that at 4096): step t+1's inserts read the list step t
    wrote, so the scheduler cannot software-pipeline them under step
    t+1's MXU contraction. PARITY-SPLIT hypothesis: keep TWO independent
    128-slot lists, even tiles inserting into list A, odd tiles into
    list B (separate revisited output refs) — the same 256 candidate
    slots, but the cross-step dependency distance doubles to 2, giving
    the scheduler one full step of slack to overlap each chain with the
    other parity's GEMM.

    Kernel-only floors (outputs reduced to a scalar, thresh=+inf so the
    guard work matches production), tile_rows=4096:
        rmfloor4096   single 256-slot list   (the shipped kernel)
        parity4096    two 128-slot lists     (the hypothesis)

    RESULT (real chip via relay, 2026-08-22, 16 windows x 16 steps after
    8 ramp windows — an unusually quiet relay, windows 90-92 ms flat):

        parity4096    step 5.69 ms  368.8M rows/s
        rmfloor4096   step 5.67 ms  369.7M rows/s

    NO DIFFERENCE — hypothesis refuted: doubling the dependency distance
    does not let the current Mosaic scheduler overlap the insert chain
    with the other parity's MXU work; cross-iteration software
    pipelining of compute (as opposed to DMA) is not happening, so the
    chain cost is per-step serial latency, not a cross-step hazard.
    Also worth recording: the single-list kernel-only floor at tile 4096
    is 5.67 ms — i.e. the WHOLE insert chain costs only ~0.1 ms over the
    5.58 ms gen+GEMM+top-3 floor at this tile size, and the shipped
    production step (5.91-5.97 ms) sits ~0.25-0.3 ms above its own
    kernel floor, all of it XLA-side append/cond machinery. There is no
    remaining in-kernel lever of consequence; the single-list production
    kernel stays.
    """
    from kmersgwas_tpu.ops.score import _unpack_dot_t

    rng = np.random.default_rng(0)
    y = rng.normal(size=(N_USED, P)).astype(np.float32)
    yp, ysum = score_ops.prepare_phenotypes(y, N_PAD)
    yp, ysum = jax.device_put(yp), jax.device_put(ysum)
    gen = make_gen()
    tile_rows = 4096

    def _parity_kernel(packed_ref, pop_ref, yt_ref, ysum_ref, th_ref,
                       va_ref, ga_ref, vb_ref, gb_ref, ok_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            va_ref[...] = jnp.full(va_ref.shape, -jnp.inf, jnp.float32)
            ga_ref[...] = jnp.zeros(ga_ref.shape, jnp.int32)
            vb_ref[...] = jnp.full(vb_ref.shape, -jnp.inf, jnp.float32)
            gb_ref[...] = jnp.zeros(gb_ref.shape, jnp.int32)
            ok_ref[...] = jnp.ones(ok_ref.shape, jnp.int32)

        w = packed_ref[...]
        yigi = _unpack_dot_t(w, yt_ref[...], "default")
        n = jnp.float32(N_USED)
        n1 = pop_ref[...]
        r = n * yigi - ysum_ref[...] * n1
        denom = n * n1 - n1 * n1
        score = jnp.where(denom > 0, (r * r) / denom, 0.0)
        okm = ((n1 >= jnp.float32(MIN_COUNT))
               & ((n - n1) >= jnp.float32(MIN_COUNT)))
        score = jnp.where(okm, score, 0.0)
        score = jnp.where(n1 > 0, score, -jnp.inf)

        th = th_ref[...]
        m1 = jnp.max(score, axis=1, keepdims=True)
        a1 = jnp.argmax(score, axis=1).astype(jnp.int32)[:, None]
        idx = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
        idx_f = idx.astype(jnp.float32)
        big = (idx == a1).astype(jnp.float32) * jnp.float32(-3e38)
        score2 = score + big + big
        m2 = jnp.max(score2, axis=1, keepdims=True)
        eq2 = (score2 == m2).astype(jnp.float32)
        n2 = jnp.sum(eq2, axis=1, keepdims=True).astype(jnp.int32)
        a2 = jnp.minimum(jnp.sum(idx_f * eq2, axis=1, keepdims=True)
                         .astype(jnp.int32), tile_rows - 1)
        big2 = (idx == a2).astype(jnp.float32) * jnp.float32(-3e38)
        score3 = score2 + big2 + big2
        m3 = jnp.max(score3, axis=1, keepdims=True)
        eq3 = (score3 == m3).astype(jnp.float32)
        n3 = jnp.sum(eq3, axis=1, keepdims=True).astype(jnp.int32)
        a3 = jnp.minimum(jnp.sum(idx_f * eq3, axis=1, keepdims=True)
                         .astype(jnp.int32), tile_rows - 1)
        cnt = jnp.sum((score > th).astype(jnp.int32), axis=1,
                      keepdims=True)
        g_ok = ((cnt <= 3)
                & ((m2 <= th) | (n2 == 1)) & ((m3 <= th) | (n3 == 1)))
        ok_ref[...] = ok_ref[...] * jnp.broadcast_to(
            g_ok.astype(jnp.int32), ok_ref.shape)

        base = t * tile_rows
        lane = jax.lax.broadcasted_iota(jnp.int32, va_ref.shape, 1)

        def insert(vref, gref):
            for m, a in ((m1, a1), (m2, a2), (m3, a3)):
                g = base + a
                cur_v = vref[...]
                cur_g = gref[...]
                minv = jnp.min(cur_v, axis=1, keepdims=True)
                am = jnp.argmin(cur_v, axis=1).astype(jnp.int32)[:, None]
                hit = (lane == am) & jnp.broadcast_to(m > minv, cur_v.shape)
                vref[...] = jnp.where(hit, jnp.broadcast_to(m, cur_v.shape),
                                      cur_v)
                gref[...] = jnp.where(hit, jnp.broadcast_to(g, cur_g.shape),
                                      cur_g)

        @pl.when(t % 2 == 0)
        def _ins_a():
            insert(va_ref, ga_ref)

        @pl.when(t % 2 == 1)
        def _ins_b():
            insert(vb_ref, gb_ref)

    # build the call with the real phenotype block once
    pc_pad = ((P + 7) // 8) * 8
    yt_h = np.zeros((pc_pad, N_PAD), np.float32)
    yt_h[:P, :] = np.asarray(yp).T
    ysum2_h = np.zeros((pc_pad, 1), np.float32)
    ysum2_h[:P, 0] = np.asarray(ysum)
    th_h = np.full((pc_pad, 1), np.float32(1e30))
    yt_d = jax.device_put(yt_h)
    ysum2_d = jax.device_put(ysum2_h)
    th_d = jax.device_put(th_h)
    n_tiles = ROWS // tile_rows

    def parity(packed_t, pc):
        return pl.pallas_call(
            _parity_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((W32, tile_rows), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_rows), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pc_pad, N_PAD), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pc_pad, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pc_pad, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((pc_pad, 128), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)] * 5,
            out_shape=[
                jax.ShapeDtypeStruct((pc_pad, 128), jnp.float32),
                jax.ShapeDtypeStruct((pc_pad, 128), jnp.int32),
                jax.ShapeDtypeStruct((pc_pad, 128), jnp.float32),
                jax.ShapeDtypeStruct((pc_pad, 128), jnp.int32),
                jax.ShapeDtypeStruct((pc_pad, 128), jnp.int32),
            ],
        )(packed_t, pc[None, :], yt_d, ysum2_d, th_d)

    if "parity4096" in variants:
        @jax.jit
        def windowp(carry, seed, base):
            def body(c, _):
                acc, sd = c
                packed, pc = gen(sd)
                va, ga, vb, gb, ok = parity(packed, pc)
                acc = (acc + va[0, 0] + ga.astype(jnp.float32)[0, 0]
                       + vb[0, 0] + gb.astype(jnp.float32)[0, 0])
                return (acc, sd + ROWS // GEN_TILE), None
            (acc, seed), _ = jax.lax.scan(body, (carry, seed), length=S)
            return acc, seed, base
        run_windows(windowp, jnp.float32(0), n_windows=16, n_ramp=8,
                    label="parity4096")
    if "rmfloor4096" in variants:
        from kmersgwas_tpu.ops.score import score_batch_t_pallas_topw

        @jax.jit
        def windowf(carry, seed, base):
            def body(c, _):
                acc, sd = c
                packed, pc = gen(sd)
                cv, cg, ok = score_batch_t_pallas_topw.__wrapped__(
                    packed, pc, yp, ysum,
                    jnp.full((P,), jnp.float32(1e30)),
                    n_used=N_USED, min_count=MIN_COUNT,
                    tile_rows=tile_rows, cand_w=256, pre_transposed=True)
                acc = acc + cv[0, 0] + cg.astype(jnp.float32)[0, 0]
                return (acc, sd + ROWS // GEN_TILE), None
            (acc, seed), _ = jax.lax.scan(body, (carry, seed), length=S)
            return acc, seed, base
        run_windows(windowf, jnp.float32(0), n_windows=16, n_ramp=8,
                    label="rmfloor4096")


if __name__ == "__main__" and sys.argv[1:2] == ["topw4"]:
    main_topw4(sys.argv[2:] or ["rmfloor4096", "parity4096"])
