import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from kmersgwas_tpu.ops import kinship as kin
from kmersgwas_tpu.ops.bitplanes import pack_bits_np, unpack_bits_pm1

rows, n_pad = 1 << 20, 1024
w32 = n_pad // 32
rng = np.random.default_rng(0)
bits = rng.integers(0, 2, size=(rows, n_pad)).astype(np.uint8)
packed = pack_bits_np(bits)
packed_d = jax.device_put(packed)
packed_t = jax.device_put(np.ascontiguousarray(packed.T))
S = 32

def _kin_kernel(packed_ref, acc_ref, *, n_pad):
    w = packed_ref[...]
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, 32, 1), 1)
    bits3 = (w[:, None, :] >> shifts) & jnp.uint32(1)
    b32 = bits3.astype(jnp.int32)
    g = (2 * b32 - 1).astype(jnp.int8).reshape(n_pad, w.shape[1])
    part = jax.lax.dot_general(g, g, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
    acc_ref[...] += part

def fused_once(pt, tile):
    return pl.pallas_call(
        functools.partial(_kin_kernel, n_pad=n_pad),
        grid=(pt.shape[1] // tile,),
        in_specs=[pl.BlockSpec((w32, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_pad, n_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * pt.shape[1] * n_pad * n_pad,
            bytes_accessed=pt.shape[1] * w32 * 4 + n_pad * n_pad * 4,
            transcendentals=0),
    )(pt)

def window_time(fn, arg, label):
    @jax.jit
    def win(acc, a):
        def body(_, acc):
            return acc + fn(a)
        return jax.lax.fori_loop(0, S, body, acc)
    acc = jnp.zeros((n_pad, n_pad), jnp.int32)
    acc = win(acc, arg); jax.block_until_ready(acc); np.asarray(acc[0, 0])
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        acc = win(acc, arg)
        jax.block_until_ready(acc); np.asarray(acc[0, 0])
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"{label:26s}: {med/S*1e3:8.2f} ms/1M rows ({rows*S/med/1e6:5.0f}M rows/s)"
          f"  windows(ms): {' '.join(f'{t*1e3:.0f}' for t in ts)}")

window_time(lambda a: kin.kinship_accumulate.__wrapped__(
    jnp.zeros((n_pad, n_pad), jnp.int32), a), packed_d, "current (unpack+XLA dot)")
for tile in (1024, 2048):
    window_time(functools.partial(fused_once, tile=tile), packed_t,
                f"fused i8 tile={tile}")
