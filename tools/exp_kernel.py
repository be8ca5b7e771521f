"""Mosaic TPU lowering probes for the compact-scan (tilemax) kernel.

Run `python tools/exp_kernel.py <case>` on the real chip. Empirical findings
(v5e, jax 0.8.x) that shaped ops/score._score_t_tilemax_kernel:

  OK      single-chain lane folds (jnp.maximum over strided halves)
  OK      native reductions: jnp.max/argmax/sum(axis=-1)
  OK      compare against an INPUT broadcast + sum        (cnt kernel)
  OK      compare against a COMPUTED broadcast + sum      (t1)
  OK      arithmetic masking + native max                 (t4: m2/a2)
  OK      dynamic lane stores at 128-aligned offsets via pl.multiple_of +
          masked select (the "_store_col" pattern); 1-lane blocks and
          unaligned dynamic stores are rejected
  CRASH   two parallel value+index where-fold chains      (vi)
  HANG    where/select or min/max FOLDS fed by a computed broadcast
          (vir, via, vi2, t2)
  N/A     lax.top_k inside a kernel (unimplemented)       (t3)
  WRONG-TIE  native argmax tie rule is unspecified (valid argmax, not
          necessarily first) — callers must not rely on first-match (namax)
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P_PAD, TR, NT = 104, 2048, 128


def run(name, kernel, n_out=1, out_dtypes=(jnp.float32,)):
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(P_PAD, NT * TR)).astype(np.float32))
    outs = [jax.ShapeDtypeStruct((P_PAD, NT), d) for d in out_dtypes]
    try:
        r = pl.pallas_call(
            kernel,
            grid=(NT,),
            in_specs=[pl.BlockSpec((P_PAD, TR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((P_PAD, NT), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)] * n_out,
            out_shape=outs,
        )(x)
        jax.block_until_ready(r)
        print(f"{name}: OK")
        return r
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")


def k_fold_store(x_ref, o_ref):
    v = x_ref[...]
    width = v.shape[1]
    while width > 1:
        half = width // 2
        v = jnp.maximum(v[:, :half], v[:, half:width])
        width = half
    t = pl.program_id(0)
    base = pl.multiple_of((t // 128) * 128, 128)
    hit = jax.lax.broadcasted_iota(jnp.int32, (P_PAD, 128), 1) == t % 128
    sl = pl.ds(base, 128)
    o_ref[:, sl] = jnp.where(hit, jnp.broadcast_to(v, (P_PAD, 128)),
                             o_ref[:, sl])


def k_reduce_store(x_ref, o_ref):
    v = jnp.max(x_ref[...], axis=1, keepdims=True)
    t = pl.program_id(0)
    base = pl.multiple_of((t // 128) * 128, 128)
    hit = jax.lax.broadcasted_iota(jnp.int32, (P_PAD, 128), 1) == t % 128
    sl = pl.ds(base, 128)
    o_ref[:, sl] = jnp.where(hit, jnp.broadcast_to(v, (P_PAD, 128)),
                             o_ref[:, sl])


def k_reduce_full(x_ref, o_ref):
    v = jnp.max(x_ref[...], axis=1, keepdims=True)
    t = pl.program_id(0)
    hit = jax.lax.broadcasted_iota(jnp.int32, (P_PAD, NT), 1) == t
    o_ref[...] = jnp.where(hit, jnp.broadcast_to(v, (P_PAD, NT)), o_ref[...])


def k_vi_fold(x_ref, o_ref, i_ref):
    v = x_ref[...]
    i = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    width = v.shape[1]
    while width > 1:
        half = width // 2
        keep = v[:, :half] >= v[:, half:width]
        v = jnp.where(keep, v[:, :half], v[:, half:width])
        i = jnp.where(keep, i[:, :half], i[:, half:width])
        width = half
    t = pl.program_id(0)
    base = pl.multiple_of((t // 128) * 128, 128)
    hit = jax.lax.broadcasted_iota(jnp.int32, (P_PAD, 128), 1) == t % 128
    sl = pl.ds(base, 128)
    o_ref[:, sl] = jnp.where(hit, jnp.broadcast_to(v, (P_PAD, 128)),
                             o_ref[:, sl])
    i_ref[:, sl] = jnp.where(hit, jnp.broadcast_to(i, (P_PAD, 128)),
                             i_ref[:, sl])


def run2(name):
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(P_PAD, NT * TR)).astype(np.float32))
    try:
        r = pl.pallas_call(
            k_vi_fold,
            grid=(NT,),
            in_specs=[pl.BlockSpec((P_PAD, TR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((P_PAD, NT), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((P_PAD, NT), jnp.float32),
                       jax.ShapeDtypeStruct((P_PAD, NT), jnp.int32)],
        )(x)
        jax.block_until_ready(r)
        print(f"{name}: OK")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")


def k_cnt(x_ref, th_ref, o_ref):
    cnt = jnp.sum((x_ref[...] > th_ref[...]).astype(jnp.int32),
                  axis=1, keepdims=True)
    t = pl.program_id(0)
    base = pl.multiple_of((t // 128) * 128, 128)
    hit = jax.lax.broadcasted_iota(jnp.int32, (P_PAD, 128), 1) == t % 128
    sl = pl.ds(base, 128)
    o_ref[:, sl] = jnp.where(hit, jnp.broadcast_to(cnt, (P_PAD, 128)),
                             o_ref[:, sl])


def run3(name):
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(P_PAD, NT * TR)).astype(np.float32))
    th = jnp.zeros((P_PAD, 1), jnp.float32)
    try:
        r = pl.pallas_call(
            k_cnt,
            grid=(NT,),
            in_specs=[pl.BlockSpec((P_PAD, TR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((P_PAD, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((P_PAD, NT), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((P_PAD, NT), jnp.int32)],
        )(x, th)
        jax.block_until_ready(r)
        print(f"{name}: OK")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "reduce"):
        run("reduce+aligned_store", k_reduce_store)
    if which in ("all", "fold"):
        run("fold+aligned_store", k_fold_store)
    if which in ("all", "full"):
        run("reduce+fullwhere", k_reduce_full)
    if which in ("all", "vi"):
        run2("value+index fold")
    if which in ("all", "cnt"):
        run3("cnt vs thresh")




def k_vi_reduce(x_ref, o_ref, i_ref):
    v = x_ref[...]
    m = jnp.max(v, axis=1, keepdims=True)
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    i = jnp.min(jnp.where(v == m, idx, jnp.int32(v.shape[1])),
                axis=1, keepdims=True)
    t = pl.program_id(0)
    base = pl.multiple_of((t // 128) * 128, 128)
    hit = jax.lax.broadcasted_iota(jnp.int32, (P_PAD, 128), 1) == t % 128
    sl = pl.ds(base, 128)
    o_ref[:, sl] = jnp.where(hit, jnp.broadcast_to(m, (P_PAD, 128)),
                             o_ref[:, sl])
    i_ref[:, sl] = jnp.where(hit, jnp.broadcast_to(i, (P_PAD, 128)),
                             i_ref[:, sl])


def run4(name):
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(P_PAD, NT * TR)).astype(np.float32))
    try:
        vv, ii = pl.pallas_call(
            k_vi_reduce,
            grid=(NT,),
            in_specs=[pl.BlockSpec((P_PAD, TR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((P_PAD, NT), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((P_PAD, NT), jnp.float32),
                       jax.ShapeDtypeStruct((P_PAD, NT), jnp.int32)],
        )(x)
        jax.block_until_ready((vv, ii))
        x3 = np.asarray(x).reshape(P_PAD, NT, TR)
        np.testing.assert_allclose(np.asarray(vv), x3.max(axis=2), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(ii), x3.argmax(axis=2))
        print(f"{name}: OK (values+argmax verified)")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__" and (len(sys.argv) > 1 and sys.argv[1] == "vir"):
    run4("value+index reduce")


def k_vi_hybrid(x_ref, o_ref, i_ref):
    v = x_ref[...]
    i = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    width = v.shape[1]
    while width > 128:
        half = width // 2
        keep = v[:, :half] >= v[:, half:width]
        v = jnp.where(keep, v[:, :half], v[:, half:width])
        i = jnp.where(keep, i[:, :half], i[:, half:width])
        width = half
    m = jnp.max(v, axis=1, keepdims=True)
    im = jnp.min(jnp.where(v == m, i, jnp.int32(x_ref.shape[1])),
                 axis=1, keepdims=True)
    t = pl.program_id(0)
    base = pl.multiple_of((t // 128) * 128, 128)
    hit = jax.lax.broadcasted_iota(jnp.int32, (P_PAD, 128), 1) == t % 128
    sl = pl.ds(base, 128)
    o_ref[:, sl] = jnp.where(hit, jnp.broadcast_to(m, (P_PAD, 128)),
                             o_ref[:, sl])
    i_ref[:, sl] = jnp.where(hit, jnp.broadcast_to(im, (P_PAD, 128)),
                             i_ref[:, sl])


def run5(name):
    rng = np.random.default_rng(0)
    # tie-heavy to verify first-argmax semantics
    x = jnp.asarray(np.round(rng.normal(size=(P_PAD, NT * TR)) * 2)
                    .astype(np.float32))
    try:
        vv, ii = pl.pallas_call(
            k_vi_hybrid,
            grid=(NT,),
            in_specs=[pl.BlockSpec((P_PAD, TR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((P_PAD, NT), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((P_PAD, NT), jnp.float32),
                       jax.ShapeDtypeStruct((P_PAD, NT), jnp.int32)],
        )(x)
        jax.block_until_ready((vv, ii))
        x3 = np.asarray(x).reshape(P_PAD, NT, TR)
        np.testing.assert_allclose(np.asarray(vv), x3.max(axis=2), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(ii), x3.argmax(axis=2))
        print(f"{name}: OK (values+first-argmax verified, tie-heavy)")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__" and (len(sys.argv) > 1 and sys.argv[1] == "vih"):
    run5("value+index hybrid")


def k_vi_f32(x_ref, o_ref, i_ref):
    v = x_ref[...]
    i = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1).astype(jnp.float32)
    width = v.shape[1]
    while width > 1:
        half = width // 2
        keep = v[:, :half] >= v[:, half:width]
        v = jnp.where(keep, v[:, :half], v[:, half:width])
        i = jnp.where(keep, i[:, :half], i[:, half:width])
        width = half
    t = pl.program_id(0)
    base = pl.multiple_of((t // 128) * 128, 128)
    hit = jax.lax.broadcasted_iota(jnp.int32, (P_PAD, 128), 1) == t % 128
    sl = pl.ds(base, 128)
    o_ref[:, sl] = jnp.where(hit, jnp.broadcast_to(v, (P_PAD, 128)),
                             o_ref[:, sl])
    i_ref[:, sl] = jnp.where(hit,
                             jnp.broadcast_to(i.astype(jnp.int32),
                                              (P_PAD, 128)),
                             i_ref[:, sl])


def run6(name):
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.round(rng.normal(size=(P_PAD, NT * TR)) * 2)
                    .astype(np.float32))
    try:
        vv, ii = pl.pallas_call(
            k_vi_f32,
            grid=(NT,),
            in_specs=[pl.BlockSpec((P_PAD, TR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((P_PAD, NT), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((P_PAD, NT), jnp.float32),
                       jax.ShapeDtypeStruct((P_PAD, NT), jnp.int32)],
        )(x)
        jax.block_until_ready((vv, ii))
        x3 = np.asarray(x).reshape(P_PAD, NT, TR)
        np.testing.assert_allclose(np.asarray(vv), x3.max(axis=2), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(ii), x3.argmax(axis=2))
        print(f"{name}: OK (values+first-argmax verified, tie-heavy)")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__" and (len(sys.argv) > 1 and sys.argv[1] == "vif"):
    run6("value+index f32 fold")


def k_fold_where(x_ref, o_ref):
    v = x_ref[...]
    width = v.shape[1]
    while width > 1:
        half = width // 2
        keep = v[:, :half] >= v[:, half:width]
        v = jnp.where(keep, v[:, :half], v[:, half:width])
        width = half
    t = pl.program_id(0)
    base = pl.multiple_of((t // 128) * 128, 128)
    hit = jax.lax.broadcasted_iota(jnp.int32, (P_PAD, 128), 1) == t % 128
    sl = pl.ds(base, 128)
    o_ref[:, sl] = jnp.where(hit, jnp.broadcast_to(v, (P_PAD, 128)),
                             o_ref[:, sl])


def k_iota_only(x_ref, o_ref):
    v = x_ref[...]
    i = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1).astype(jnp.float32)
    v = v + 0.0 * i
    width = v.shape[1]
    while width > 1:
        half = width // 2
        v = jnp.maximum(v[:, :half], v[:, half:width])
        width = half
    t = pl.program_id(0)
    base = pl.multiple_of((t // 128) * 128, 128)
    hit = jax.lax.broadcasted_iota(jnp.int32, (P_PAD, 128), 1) == t % 128
    sl = pl.ds(base, 128)
    o_ref[:, sl] = jnp.where(hit, jnp.broadcast_to(v, (P_PAD, 128)),
                             o_ref[:, sl])


if __name__ == "__main__" and (len(sys.argv) > 1 and sys.argv[1] == "iso"):
    run("fold-where values only", k_fold_where)
    run("iota + maximum fold", k_iota_only)


def k_vi_twopass(x_ref, o_ref, i_ref):
    v0 = x_ref[...]
    tr = v0.shape[1]
    # pass 1: max via single-chain folds
    v = v0
    width = tr
    while width > 1:
        half = width // 2
        v = jnp.maximum(v[:, :half], v[:, half:width])
        width = half
    m = v                                                  # (P,1)
    # pass 2: first index achieving the max, via min-fold on masked iota
    idx = jax.lax.broadcasted_iota(jnp.int32, v0.shape, 1).astype(jnp.float32)
    mi = jnp.where(v0 == jnp.broadcast_to(m, v0.shape), idx, jnp.float32(tr))
    width = tr
    while width > 1:
        half = width // 2
        mi = jnp.minimum(mi[:, :half], mi[:, half:width])
        width = half
    t = pl.program_id(0)
    base = pl.multiple_of((t // 128) * 128, 128)
    hit = jax.lax.broadcasted_iota(jnp.int32, (P_PAD, 128), 1) == t % 128
    sl = pl.ds(base, 128)
    o_ref[:, sl] = jnp.where(hit, jnp.broadcast_to(m, (P_PAD, 128)),
                             o_ref[:, sl])
    i_ref[:, sl] = jnp.where(hit,
                             jnp.broadcast_to(mi.astype(jnp.int32),
                                              (P_PAD, 128)),
                             i_ref[:, sl])


def run7(name):
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.round(rng.normal(size=(P_PAD, NT * TR)) * 2)
                    .astype(np.float32))
    try:
        vv, ii = pl.pallas_call(
            k_vi_twopass,
            grid=(NT,),
            in_specs=[pl.BlockSpec((P_PAD, TR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((P_PAD, NT), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((P_PAD, NT), jnp.float32),
                       jax.ShapeDtypeStruct((P_PAD, NT), jnp.int32)],
        )(x)
        jax.block_until_ready((vv, ii))
        x3 = np.asarray(x).reshape(P_PAD, NT, TR)
        np.testing.assert_allclose(np.asarray(vv), x3.max(axis=2), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(ii), x3.argmax(axis=2))
        print(f"{name}: OK (values+first-argmax verified, tie-heavy)")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__" and (len(sys.argv) > 1 and sys.argv[1] == "vi2"):
    run7("value+index two-pass")


def k_vi_arith(x_ref, o_ref, i_ref):
    v0 = x_ref[...]
    tr = v0.shape[1]
    v = v0
    width = tr
    while width > 1:
        half = width // 2
        v = jnp.maximum(v[:, :half], v[:, half:width])
        width = half
    m = v                                                  # (P,1)
    # first-argmax without select: min-fold of idx + (not-max)*BIG
    eq = (v0 == jnp.broadcast_to(m, v0.shape)).astype(jnp.float32)
    idx = jax.lax.broadcasted_iota(jnp.int32, v0.shape, 1).astype(jnp.float32)
    mi = idx + (1.0 - eq) * jnp.float32(tr)
    width = tr
    while width > 1:
        half = width // 2
        mi = jnp.minimum(mi[:, :half], mi[:, half:width])
        width = half
    t = pl.program_id(0)
    base = pl.multiple_of((t // 128) * 128, 128)
    hit = jax.lax.broadcasted_iota(jnp.int32, (P_PAD, 128), 1) == t % 128
    sl = pl.ds(base, 128)
    o_ref[:, sl] = jnp.where(hit, jnp.broadcast_to(m, (P_PAD, 128)),
                             o_ref[:, sl])
    i_ref[:, sl] = jnp.where(hit,
                             jnp.broadcast_to(mi.astype(jnp.int32),
                                              (P_PAD, 128)),
                             i_ref[:, sl])


def run8(name):
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.round(rng.normal(size=(P_PAD, NT * TR)) * 2)
                    .astype(np.float32))
    try:
        vv, ii = pl.pallas_call(
            k_vi_arith,
            grid=(NT,),
            in_specs=[pl.BlockSpec((P_PAD, TR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((P_PAD, NT), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((P_PAD, NT), jnp.float32),
                       jax.ShapeDtypeStruct((P_PAD, NT), jnp.int32)],
        )(x)
        jax.block_until_ready((vv, ii))
        x3 = np.asarray(x).reshape(P_PAD, NT, TR)
        np.testing.assert_allclose(np.asarray(vv), x3.max(axis=2), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(ii), x3.argmax(axis=2))
        print(f"{name}: OK (values+first-argmax verified, tie-heavy)")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__" and (len(sys.argv) > 1 and sys.argv[1] == "via"):
    run8("value+index arith")


def _store_col(ref, val, cast=None):
    t = pl.program_id(0)
    base = pl.multiple_of((t // 128) * 128, 128)
    hit = jax.lax.broadcasted_iota(jnp.int32, (P_PAD, 128), 1) == t % 128
    sl = pl.ds(base, 128)
    if cast is not None:
        val = val.astype(cast)
    ref[:, sl] = jnp.where(hit, jnp.broadcast_to(val, (P_PAD, 128)),
                           ref[:, sl])


def k_fold_plus_cnt(x_ref, o_ref, c_ref):
    v0 = x_ref[...]
    v = v0
    width = v0.shape[1]
    while width > 1:
        half = width // 2
        v = jnp.maximum(v[:, :half], v[:, half:width])
        width = half
    cnt = jnp.sum((v0 > 0.5).astype(jnp.int32), axis=1, keepdims=True)
    _store_col(o_ref, v)
    _store_col(c_ref, cnt)


def k_native_argmax(x_ref, o_ref, i_ref):
    v0 = x_ref[...]
    m = jnp.max(v0, axis=1, keepdims=True)
    a = jnp.argmax(v0, axis=1).astype(jnp.int32)[:, None]
    _store_col(o_ref, m)
    _store_col(i_ref, a)


def runN(name, kernel, dtypes):
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.round(rng.normal(size=(P_PAD, NT * TR)) * 2)
                    .astype(np.float32))
    try:
        outs = pl.pallas_call(
            kernel,
            grid=(NT,),
            in_specs=[pl.BlockSpec((P_PAD, TR), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((P_PAD, NT), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)] * len(dtypes),
            out_shape=[jax.ShapeDtypeStruct((P_PAD, NT), d) for d in dtypes],
        )(x)
        jax.block_until_ready(outs)
        print(f"{name}: OK")
        return outs, x
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")
        return None, x


if __name__ == "__main__" and (len(sys.argv) > 1 and sys.argv[1] == "combo"):
    runN("max-fold + cnt-sum", k_fold_plus_cnt, [jnp.float32, jnp.int32])

if __name__ == "__main__" and (len(sys.argv) > 1 and sys.argv[1] == "namax"):
    outs, x = runN("native argmax", k_native_argmax, [jnp.float32, jnp.int32])
    if outs is not None:
        x3 = np.asarray(x).reshape(P_PAD, NT, TR)
        np.testing.assert_array_equal(np.asarray(outs[1]), x3.argmax(axis=2))
        print("native argmax: first-argmax semantics verified")


if __name__ == "__main__" and (len(sys.argv) > 1 and sys.argv[1] == "namax2"):
    outs, x = runN("native argmax", k_native_argmax, [jnp.float32, jnp.int32])
    if outs is not None:
        x3 = np.asarray(x).reshape(P_PAD, NT, TR)
        ii = np.asarray(outs[1])
        vv = np.asarray(outs[0])
        picked = np.take_along_axis(x3, ii[:, :, None], axis=2)[:, :, 0]
        mx = x3.max(axis=2)
        print("max values match:", np.array_equal(vv, mx))
        print("picked is a true argmax:", np.array_equal(picked, mx))
        first = x3.argmax(axis=2)
        last = TR - 1 - x3[:, :, ::-1].argmax(axis=2)
        print("equals FIRST argmax frac:", (ii == first).mean())
        print("equals LAST argmax frac:", (ii == last).mean())


def k_top2(x_ref, o1_ref, i1_ref, o2_ref, i2_ref, c_ref):
    v0 = x_ref[...]
    tr = v0.shape[1]
    m = jnp.max(v0, axis=1, keepdims=True)
    a1 = jnp.argmax(v0, axis=1).astype(jnp.int32)[:, None]
    idx = jax.lax.broadcasted_iota(jnp.int32, v0.shape, 1)
    mask = (idx == a1).astype(jnp.float32)
    big = mask * jnp.float32(-3e38)
    v2 = v0 + big + big                      # masked lane -> -inf (overflow)
    m2 = jnp.max(v2, axis=1, keepdims=True)
    eq2 = (v2 == m2).astype(jnp.float32)
    a2 = jnp.sum(idx.astype(jnp.float32) * eq2, axis=1,
                 keepdims=True).astype(jnp.int32)
    cnt = jnp.sum((v0 > 0.5).astype(jnp.int32), axis=1, keepdims=True)
    _store_col(o1_ref, m)
    _store_col(i1_ref, a1)
    _store_col(o2_ref, m2)
    _store_col(i2_ref, a2)
    _store_col(c_ref, cnt)


if __name__ == "__main__" and (len(sys.argv) > 1 and sys.argv[1] == "top2"):
    outs, x = runN("top2 kernel", k_top2,
                   [jnp.float32, jnp.int32, jnp.float32, jnp.int32, jnp.int32])
    if outs is not None:
        x3 = np.asarray(x).reshape(P_PAD, NT, TR)
        m1, a1, m2, a2, cnt = (np.asarray(o) for o in outs)
        s_sorted = np.sort(x3, axis=2)[:, :, ::-1]
        np.testing.assert_array_equal(m1, s_sorted[:, :, 0])
        picked1 = np.take_along_axis(x3, a1[:, :, None], 2)[:, :, 0]
        np.testing.assert_array_equal(picked1, m1)
        np.testing.assert_array_equal(m2, s_sorted[:, :, 1])
        # a2 exact wherever the second value is unique AND distinct from max
        uniq = ((s_sorted[:, :, 1] > s_sorted[:, :, 2])
                & (s_sorted[:, :, 0] > s_sorted[:, :, 1]))
        picked2 = np.take_along_axis(
            x3, np.clip(a2, 0, TR - 1)[:, :, None], 2)[:, :, 0]
        print("unique-second frac:", uniq.mean())
        np.testing.assert_array_equal(picked2[uniq], m2[uniq])
        print("top2 kernel: verified (m1/m2 exact, a1 valid, a2 exact when unique)")


def k_t1(x_ref, o_ref):
    v = x_ref[...]
    m = jnp.max(v, axis=1, keepdims=True)
    c2 = jnp.sum((v == m).astype(jnp.int32), axis=1, keepdims=True)
    _store_col(o_ref, c2)


def k_t2(x_ref, o_ref, o2_ref):
    v = x_ref[...]
    m1, m2 = v, jnp.full_like(v, -jnp.inf)
    width = v.shape[1]
    while width > 1:
        half = width // 2
        a1, b1 = m1[:, :half], m1[:, half:width]
        a2, b2 = m2[:, :half], m2[:, half:width]
        m1 = jnp.maximum(a1, b1)
        m2 = jnp.maximum(jnp.minimum(a1, b1), jnp.maximum(a2, b2))
        width = half
    _store_col(o_ref, m1)
    _store_col(o2_ref, m2)


def k_t3(x_ref, o_ref, o2_ref):
    v = x_ref[...]
    vv, _ = jax.lax.top_k(v, 2)
    _store_col(o_ref, vv[:, 0:1])
    _store_col(o2_ref, vv[:, 1:2])


if __name__ == "__main__" and (len(sys.argv) > 1 and sys.argv[1].startswith("t")):
    which = sys.argv[1]
    if which == "t1":
        runN("computed-broadcast into sum", k_t1, [jnp.int32])
    elif which == "t2":
        outs, x = runN("paired max/min top2 fold", k_t2,
                       [jnp.float32, jnp.float32])
        if outs is not None:
            x3 = np.asarray(x).reshape(P_PAD, NT, TR)
            s = np.sort(x3, axis=2)[:, :, ::-1]
            np.testing.assert_array_equal(np.asarray(outs[0]), s[:, :, 0])
            np.testing.assert_array_equal(np.asarray(outs[1]), s[:, :, 1])
            print("top2 values verified")
    elif which == "t3":
        runN("native lax.top_k(2)", k_t3, [jnp.float32, jnp.float32])


def k_t4(x_ref, o_ref, i_ref):
    v = x_ref[...]
    a1 = jnp.argmax(v, axis=1).astype(jnp.int32)[:, None]
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    big = (idx == a1).astype(jnp.float32) * jnp.float32(-3e38)
    v2 = v + big + big                       # masked lane -> -inf
    m2 = jnp.max(v2, axis=1, keepdims=True)
    eq2 = (v2 == m2).astype(jnp.float32)
    a2 = jnp.sum(idx.astype(jnp.float32) * eq2, axis=1,
                 keepdims=True).astype(jnp.int32)
    _store_col(o_ref, m2)
    _store_col(i_ref, a2)


if __name__ == "__main__" and (len(sys.argv) > 1 and sys.argv[1] == "t4"):
    outs, x = runN("arith-masked native max (m2+a2)", k_t4,
                   [jnp.float32, jnp.int32])
    if outs is not None:
        x3 = np.asarray(x).reshape(P_PAD, NT, TR)
        s = np.sort(x3, axis=2)[:, :, ::-1]
        m2, a2 = (np.asarray(o) for o in outs)
        np.testing.assert_array_equal(m2, s[:, :, 1])
        uniq = (s[:, :, 1] > s[:, :, 2]) & (s[:, :, 0] > s[:, :, 1])
        picked = np.take_along_axis(
            x3, np.clip(a2, 0, TR - 1)[:, :, None], 2)[:, :, 0]
        np.testing.assert_array_equal(picked[uniq], m2[uniq])
        print(f"m2 exact; a2 exact on unique-second ({uniq.mean():.2f} frac)")


# --------------------------------------------------------------------------
# topc: the in-kernel RUNNING top-c over tile maxima (VERDICT r4 #2).
#
# Minimal form: carry a sorted top-4 of (tile-max value, tile index) per
# column across grid steps in two revisited output blocks; each step does
# one insertion — a rank-compare + conditional shift, i.e. a chain of
# where/selects whose operands are computed broadcasts (the tile max and
# the carried lanes). This is exactly the pattern recorded above as
# vi (CRASH) / vir / via / vi2 / t2 (HANG): if Mosaic ever learns to lower
# it, the XLA-side lax.top_k over tile maxima (+ sort/gather, measured
# ~0.4-0.6 ms/step at flagship shape) can move into the kernel epilogue.
# Run under `timeout 300` — the failure mode is a compiler HANG, not an
# exception.
# --------------------------------------------------------------------------

def k_topc(x_ref, v_ref, i_ref):
    t = pl.program_id(0)
    v = x_ref[...]
    m1 = jnp.max(v, axis=1, keepdims=True)               # (P, 1) tile max

    @pl.when(t == 0)
    def _init():
        v_ref[...] = jnp.full(v_ref.shape, -jnp.inf, jnp.float32)
        i_ref[...] = jnp.zeros(i_ref.shape, jnp.int32)

    cur_v = v_ref[...]                                   # (P, NT) carried,
    cur_i = i_ref[...]                                   # top-4 in lanes 0-3
    lane = jax.lax.broadcasted_iota(jnp.int32, cur_v.shape, 1)
    mb = jnp.broadcast_to(m1, cur_v.shape)
    tb = jnp.full(cur_i.shape, t, jnp.int32)
    # rank of the incoming value among the carried lanes (computed
    # broadcast feeding selects — the recorded hang pattern)
    rank = jnp.sum((cur_v >= mb).astype(jnp.int32), axis=1, keepdims=True)
    shift_v = jnp.concatenate(
        [jnp.full((cur_v.shape[0], 1), -jnp.inf), cur_v[:, :-1]], axis=1)
    shift_i = jnp.concatenate(
        [jnp.zeros((cur_i.shape[0], 1), jnp.int32), cur_i[:, :-1]], axis=1)
    keep = lane < rank
    ins = lane == rank
    v_ref[...] = jnp.where(keep, cur_v, jnp.where(ins, mb, shift_v))
    i_ref[...] = jnp.where(keep, cur_i, jnp.where(ins, tb, shift_i))


if __name__ == "__main__" and (len(sys.argv) > 1 and sys.argv[1] == "topc"):
    outs, x = runN("in-kernel running top-c insert", k_topc,
                   [jnp.float32, jnp.int32])
    if outs is not None:
        x3 = np.asarray(x).reshape(P_PAD, NT, TR)
        tm = x3.max(axis=2)                  # (P, NT) tile maxima
        order = np.argsort(-tm, axis=1, kind="stable")
        vv = np.asarray(outs[0])[:, :4]
        np.testing.assert_allclose(
            vv, np.take_along_axis(tm, order[:, :4], axis=1))
        print("running top-4 values verified")
