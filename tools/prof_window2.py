"""Micro-profile the compact step's post-kernel ops inside a scan window.

p0: gen + tilemax + top_k(tmax, c+1) + take_along_axis x6
p1: p0 + two-key sort of the 3c candidates
p2: p1 + row_lo/row_hi gather at the candidate lanes   <-- suspect
p3: p2 + buffer append (dynamic_update_slice x3) under a cond
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmersgwas_tpu.ops import score as score_ops

n_used, n_pad, p = 1008, 1024, 101
rows = 1 << 21
min_count = 51
w32 = n_pad // 32
gen_tile = 1 << 14
S = 16
c = 256
tile_rows = 2048
n_tiles = rows // tile_rows


def _gen_kernel(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    out_ref[...] = pltpu.prng_random_bits(out_ref.shape)


def gen(seed):
    return pl.pallas_call(
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


def run_window(fn, carry, label, iters=5):
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
    med = float(np.median(ts))
    print(f"{label:44s}: med {med/S*1e3:7.2f} ms/step  windows(ms): "
          + " ".join(f"{t*1e3:.0f}" for t in ts))
    return out


def main():
    rng = np.random.default_rng(0)
    y = rng.normal(size=(n_used, p)).astype(np.float32)
    yp, ysum = score_ops.prepare_phenotypes(y, n_pad)
    yp, ysum = jax.device_put(yp), jax.device_put(ysum)
    lo = jax.device_put(np.arange(rows, dtype=np.int32))
    hi = jax.device_put(np.zeros(rows, np.int32))
    th0 = jnp.full((p,), 16000.0, jnp.float32)

    def common(sd):
        pk = gen(sd)
        pc = jnp.sum(jax.lax.population_count(pk), axis=1).astype(jnp.float32)
        outs = score_ops.score_batch_t_pallas_tilemax.__wrapped__(
            pk, pc, yp, ysum, th0, n_used=n_used, min_count=min_count,
            tile_rows=tile_rows)
        tmax, targ, tmax2, targ2, tmax3, targ3, n2, n3, cnt = outs
        v_all, ti = jax.lax.top_k(tmax, c + 1)
        v1, ti_c = v_all[:, :c], ti[:, :c]
        v2 = jnp.take_along_axis(tmax2, ti_c, axis=1)
        v3 = jnp.take_along_axis(tmax3, ti_c, axis=1)
        g1 = ti_c * tile_rows + jnp.take_along_axis(targ, ti_c, axis=1)
        g2 = ti_c * tile_rows + jnp.take_along_axis(targ2, ti_c, axis=1)
        g3 = ti_c * tile_rows + jnp.take_along_axis(targ3, ti_c, axis=1)
        cat_v = jnp.concatenate([v1, v2, v3], axis=1)
        cat_g = jnp.minimum(jnp.concatenate([g1, g2, g3], axis=1), rows - 1)
        return cat_v, cat_g

    def p0(carry):
        def body(c_, _):
            sd, acc = c_
            cat_v, cat_g = common(sd)
            return (sd + 128, acc + cat_v[0, 0] + cat_g[0, 0]), None
        out, _ = jax.lax.scan(body, carry, length=S)
        return out

    run_window(p0, (jnp.int32(1), jnp.float32(0)), "p0 kernel+topk(tmax)+take")

    def p1(carry):
        def body(c_, _):
            sd, acc = c_
            cat_v, cat_g = common(sd)
            neg_v, g_s = jax.lax.sort((-cat_v, cat_g), dimension=1, num_keys=2)
            return (sd + 128, acc + neg_v[0, 0] + g_s[0, 0]), None
        out, _ = jax.lax.scan(body, carry, length=S)
        return out

    run_window(p1, (jnp.int32(1), jnp.float32(0)), "p1 + two-key sort")

    def p2(carry):
        def body(c_, _):
            sd, acc = c_
            cat_v, cat_g = common(sd)
            neg_v, g_s = jax.lax.sort((-cat_v, cat_g), dimension=1, num_keys=2)
            blo, bhi = lo[g_s], hi[g_s]
            return (sd + 128, acc + neg_v[0, 0] + blo[0, 0] + bhi[0, 0]), None
        out, _ = jax.lax.scan(body, carry, length=S)
        return out

    run_window(p2, (jnp.int32(1), jnp.float32(0)), "p2 + row gather (2M source)")

    def p3(carry):
        def body(c_, _):
            sd, bufs, bn, acc = c_
            cat_v, cat_g = common(sd)
            neg_v, g_s = jax.lax.sort((-cat_v, cat_g), dimension=1, num_keys=2)
            blo, bhi = lo[g_s], hi[g_s]
            bv, blo_b, bhi_b = bufs

            def app(args):
                bv, blo_b, bhi_b, bn = args
                at = (jnp.int32(0), bn)
                return (jax.lax.dynamic_update_slice(bv, -neg_v, at),
                        jax.lax.dynamic_update_slice(blo_b, blo, at),
                        jax.lax.dynamic_update_slice(bhi_b, bhi, at),
                        bn + 3 * c)

            def rst(args):
                bv, blo_b, bhi_b, bn = args
                return bv, blo_b, bhi_b, jnp.int32(0)

            bv, blo_b, bhi_b, bn = jax.lax.cond(
                bn + 3 * c <= bv.shape[1], app, rst, (bv, blo_b, bhi_b, bn))
            return (sd + 128, (bv, blo_b, bhi_b), bn,
                    acc + bv[0, 0] + blo_b[0, 0]), None
        out, _ = jax.lax.scan(body, carry, length=S)
        return out

    cap = 3 * c * 8
    bufs = (jnp.full((p, cap), -jnp.inf, jnp.float32),
            jnp.zeros((p, cap), jnp.int32), jnp.zeros((p, cap), jnp.int32))
    run_window(p3, (jnp.int32(1), bufs, jnp.int32(0), jnp.float32(0)),
               "p3 + buffered append under cond")


if __name__ == "__main__":
    main()
