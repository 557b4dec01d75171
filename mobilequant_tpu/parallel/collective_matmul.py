"""Collective matmuls: communication/compute-overlapped TP primitives.

GSPMD's default lowering of a row-parallel (K-sharded) matmul is
matmul → all-reduce: the ICI transfer only starts after the whole product is
done. These shard_map kernels decompose the collective into a ring of
`lax.ppermute` steps interleaved with chunk matmuls, so XLA's async
collective-permute runs concurrently with the MXU work (the "collective
matmul" schedule; see also the bidirectional-ring pattern in the Pallas guide).
The reference has no counterpart — its only inter-device transfer is a
host-driven `tensor.to()` in a forward-pre-hook (ref parallel_utils.py:172-193)
— this is a new-build requirement from SURVEY.md §2.3.

Two schedules:

  allgather_matmul      x K-sharded, w replicated → full y everywhere.
                        Streams x chunks around the ring; step s multiplies the
                        chunk that originated at device (me−s) against the
                        matching row-block of w while the next chunk is in
                        flight. ≡ all_gather(x) @ w.

  matmul_reduce_scatter x K-sharded, w K-sharded → y N-sharded (each device
                        owns its column block of the summed product).
                        Step s computes the partial for the column block that
                        is (n−1−s) hops upstream and adds it to the
                        accumulator as it rides the ring. ≡ psum(x_i @ w_i)
                        then slice — but the reduction is scattered, so it
                        moves 1/n of the bytes AND overlaps with the matmuls.

Both take a `dot` callback so the integer engine can pass an
int8×int8→int32 contraction (partials accumulate exactly in int32; apply
affine corrections after).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _default_dot(a, b):
    return jax.lax.dot_general(a, b, (((a.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def allgather_matmul(x: jax.Array, w: jax.Array, mesh: Mesh, axis: str = "tp",
                     dot: Optional[Callable] = None) -> jax.Array:
    """x (..., K) sharded on its last axis over `axis`; w (K, N) replicated.
    Returns the full (..., N) product on every device.

    Ring schedule: local chunk multiplies immediately; each subsequent chunk
    arrives via async ppermute while the previous chunk's matmul occupies the
    MXU. Equivalent to `all_gather(x, tiled=True) @ w`.
    """
    dot = dot or _default_dot
    n = mesh.shape[axis]
    K = x.shape[-1]
    assert K % n == 0 and w.shape[0] == K, (x.shape, w.shape, n)
    Kc = K // n

    def body(x_local, w_full):
        me = jax.lax.axis_index(axis)
        perm = [(j, (j + 1) % n) for j in range(n)]

        def step(carry, s):
            chunk, acc = carry
            # this chunk originated at device (me − s): it is the
            # (me − s)-th K-block of the logical x
            src = (me - s) % n
            wb = jax.lax.dynamic_slice_in_dim(w_full, src * Kc, Kc, axis=0)
            acc = acc + dot(chunk, wb)
            chunk = jax.lax.ppermute(chunk, axis, perm)
            return (chunk, acc), None

        acc0 = jnp.zeros(x_local.shape[:-1] + (w_full.shape[1],),
                         dot(x_local[..., :1] * 0, w_full[:1] * 0).dtype)
        (_, acc), _ = jax.lax.scan(step, (x_local, acc0), jnp.arange(n))
        return acc

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(*([None] * (x.ndim - 1) + [axis])), P()),
                       out_specs=P(), check_vma=False)
    return fn(x, w)


def int_linear_reduce_scatter(x_q: jax.Array, x_scale, x_offset, pack: dict,
                              bias, mesh: Mesh, axis: str = "tp") -> jax.Array:
    """Row-parallel int8 linear (the engine's o_proj / w2 TP sites) through
    the ring matmul-reduce-scatter — an exact re-expression of
    qops.int_linear: the raw int32 accumulator reduce-scatters around the
    ring (partials overlap the chunk matmuls), then the affine corrections,
    per-channel scale, and bias apply ONCE on the scattered column blocks
    (colsum/rowsum are K-global, so they commute with the K-split).

    W8 packs only (a nibble-packed W4 row block interleaves two K-halves —
    its K-split is not contiguous); the engine gates on wq.shape[0] == K.
    Output is logically (…, N), device-sharded on the last axis; downstream
    GSPMD re-gathers as consumers require."""
    wq = pack["wq"]
    K, N = wq.shape
    assert x_q.shape[-1] == K, (x_q.shape, wq.shape)

    def int_dot(a, b):
        return jax.lax.dot_general(
            a, b, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    acc = matmul_reduce_scatter(x_q, wq.astype(jnp.int8), mesh, axis,
                                dot=int_dot).astype(jnp.float32)
    ox = x_offset - 128.0
    ow = jnp.reshape(pack["offset"], (-1,))
    sw = jnp.reshape(pack["scale"], (-1,))
    rowsum = jnp.sum(x_q.astype(jnp.int32), axis=-1,
                     keepdims=True).astype(jnp.float32)
    acc = acc - ox * pack["colsum"] - ow * rowsum + K * ox * ow
    out = acc * (x_scale * sw)
    if bias is not None:
        out = out + bias
    return out


def matmul_reduce_scatter(x: jax.Array, w: jax.Array, mesh: Mesh,
                          axis: str = "tp",
                          dot: Optional[Callable] = None) -> jax.Array:
    """x (..., K) and w (K, N) both sharded on K over `axis`; returns the summed
    product sharded on N (each device holds its (..., N/n) column block).

    ≡ `jnp.einsum` + psum + slice, but as a ring reduce-scatter whose transfer
    of partial column blocks overlaps the chunk matmuls, moving 1/n of the
    all-reduce bytes.
    """
    dot = dot or _default_dot
    n = mesh.shape[axis]
    K, N = w.shape
    assert N % n == 0 and K % n == 0 and x.shape[-1] == K, (x.shape, w.shape, n)
    Nc = N // n

    def body(x_local, w_local):
        me = jax.lax.axis_index(axis)
        perm = [(j, (j + 1) % n) for j in range(n)]

        def step(acc, s):
            # the accumulator at device `me` entering step s still makes
            # n − s hops, so it lands on device (me − s): that is its column
            # block — every device contributes its partial exactly once
            blk = (me - s) % n
            wb = jax.lax.dynamic_slice_in_dim(w_local, blk * Nc, Nc, axis=1)
            acc = acc + dot(x_local, wb)
            acc = jax.lax.ppermute(acc, axis, perm)
            return acc, None

        acc0 = jnp.zeros(x_local.shape[:-1] + (Nc,),
                         dot(x_local[..., :1] * 0, w_local[:1, :1] * 0).dtype)
        acc, _ = jax.lax.scan(step, acc0, jnp.arange(n))
        return acc

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(*([None] * (x.ndim - 1) + [axis])), P(axis)),
                       out_specs=P(*([None] * (x.ndim - 1) + [axis])),
                       check_vma=False)
    return fn(x, w)
