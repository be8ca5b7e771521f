"""Multi-device/multi-host scaling of the scan and kinship.

The reference is single-node and file-bound (SURVEY.md §2.5: no MPI/NCCL).
Here the *k-mer axis* — billions of table rows — is the sharding axis:

  * intra-slice (ICI): a 1-D device mesh ("kmers",). Each device scores its
    row shard and reduces it to K candidates; only (P, K) candidates cross
    the interconnect (all_gather), then every device merges identically so
    the carried top-k state stays replicated. Kinship is a shard-local
    int8 GEMM + `psum`.
  * cross-host (DCN): the k-mer space is range-partitioned with the same
    slice boundaries the reference uses (core/codec.py step_bounds); each
    host streams only its contiguous uint62 range of the table, so counts
    and rows never need to move between hosts until the final top-k merge.

The samples axis (N <= a few thousand) is replicated everywhere.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import topk as topk_ops
from ..ops.bitplanes import unpack_bits, unpack_bits_pm1

AXIS = "kmers"


def make_mesh(devices=None) -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices).reshape(-1), (AXIS,))


def _local_scores(packed, popcnt, y_padded, y_sum, n_used, min_count):
    g = unpack_bits(packed, jnp.float32)
    yigi = jnp.dot(g, y_padded, preferred_element_type=jnp.float32)
    n = jnp.float32(n_used)
    n1 = popcnt[:, None]
    r = n * yigi - n1 * y_sum[None, :]
    denom = n * n1 - n1 * n1
    score = jnp.where(denom > 0, (r * r) / denom, 0.0)
    ok = (n1 >= min_count) & ((n - n1) >= min_count) & (n1 > 0)
    return jnp.where(ok, score, -jnp.inf)


def build_sharded_scan_step(mesh: Mesh, *, n_used: int, min_count: int, k: int):
    """-> jitted (state, packed, popcnt, row_lo, row_hi, yp, ysum) -> state.

    `packed`/`popcnt`/rows are sharded over the k-mer axis; the top-k state
    and phenotypes are replicated. Rows with popcnt == 0 are treated as
    padding (scored -inf), so hosts can pad shards to equal size.
    """

    def local_step(state_sc, state_lo, state_hi, packed, popcnt, lo, hi, yp, ysum):
        scores = _local_scores(packed, popcnt, yp, ysum, n_used, min_count)
        sc = scores.T                                     # (Pph, R_loc)
        kk = min(k, sc.shape[1])
        v, i = topk_ops.blocked_top_k(sc, kk)
        blo, bhi = lo[i], hi[i]
        # ship only candidates across ICI
        gv = jax.lax.all_gather(v, AXIS, axis=1, tiled=True)    # (Pph, D*kk)
        glo = jax.lax.all_gather(blo, AXIS, axis=1, tiled=True)
        ghi = jax.lax.all_gather(bhi, AXIS, axis=1, tiled=True)
        cat_v = jnp.concatenate([state_sc, gv], axis=1)
        cat_lo = jnp.concatenate([state_lo, glo], axis=1)
        cat_hi = jnp.concatenate([state_hi, ghi], axis=1)
        nv, j = jax.lax.top_k(cat_v, k)
        return (nv, jnp.take_along_axis(cat_lo, j, axis=1),
                jnp.take_along_axis(cat_hi, j, axis=1))

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state: topk_ops.TopKState, packed, popcnt, lo, hi, yp, ysum):
        sc, rlo, rhi = sharded(state.scores, state.row_lo, state.row_hi,
                               packed, popcnt, lo, hi, yp, ysum)
        return topk_ops.TopKState(sc, rlo, rhi)

    return step


def build_sharded_kinship_step(mesh: Mesh):
    """-> jitted (acc (Npad,Npad) int32 replicated, packed sharded) -> acc.

    Each device computes its shard's A^T A on the int8 MXU; `psum` over the
    k-mer axis keeps the accumulator replicated. All-zero padding rows must
    be EXCLUDED upstream (they are not neutral under the ±1 encoding) —
    shards must carry exact row counts.
    """

    def local(acc, packed):
        a = unpack_bits_pm1(packed)
        part = jax.lax.dot_general(a, a, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        return acc + jax.lax.psum(part, AXIS)

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(AXIS)), out_specs=P(),
        check_vma=False))


def shard_batch(mesh: Mesh, arrays, pad_value=0):
    """Place host arrays onto the mesh, sharded over the leading axis
    (padded to a multiple of the mesh size with `pad_value`)."""
    import numpy as np
    d = mesh.devices.size
    out = []
    for a in arrays:
        a = np.asarray(a)
        r = a.shape[0]
        rp = ((r + d - 1) // d) * d
        if rp != r:
            pad = np.full((rp - r, *a.shape[1:]), pad_value, dtype=a.dtype)
            a = np.concatenate([a, pad], axis=0)
        out.append(jax.device_put(a, NamedSharding(mesh, P(AXIS))))
    return out


def replicate(mesh: Mesh, *arrays):
    return [jax.device_put(a, NamedSharding(mesh, P())) for a in arrays]


def host_range_of_kmer_space(host_id: int, n_hosts: int, kmer_len: int):
    """Contiguous uint62 k-mer range owned by `host_id` for DCN sharding,
    cut at the reference's slice boundaries so per-host table shards can be
    built independently and byte-identically."""
    from ..core.codec import step_bounds
    bounds = step_bounds(n_hosts, kmer_len)
    lo = 0 if host_id == 0 else int(bounds[host_id - 1])
    hi = int(bounds[host_id])
    return lo, hi
