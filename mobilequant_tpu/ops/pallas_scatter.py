"""In-place staged-column append for the chunked batched decode loop.

The staging buffers (L, B, Hkv, cs, hd) ride the decode step scan's carry and
are read (as layer-scan operands) inside the same iteration that appends the
step's new K/V column. Expressed as `jax.lax.dynamic_update_slice`, XLA's
aliasing analysis inserts a full defensive copy of both buffers every step
(2x ~45 us at bs=32 — BENCHMARKS.md round-3 staging dead-ends; a full layer
unroll does not change the verdict). This kernel states the intent directly:

  * `input_output_aliases` declares the staging buffers MUST-alias their
    outputs (no second allocation);
  * only the 8-column-aligned sublane window containing column m is read,
    blended, and written back (L x B x Hkv x 8 x hd bytes ~ 1.4 MB/step at
    bs=32 instead of 2 x 5.8 MB copies);
  * the column index arrives by scalar prefetch, so the window's block index
    (m // 8) is a BlockSpec index-map output — block indices are always
    sublane-aligned, satisfying Mosaic's aligned-dynamic-start rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _append_kernel(m_ref, pk_ref, pv_ref, sk_ref, sv_ref, ok_ref, ov_ref):
    col = m_ref[0] % 8
    sub = jax.lax.broadcasted_iota(jnp.int32, ok_ref.shape, 3)
    ok_ref[:] = jnp.where(sub == col, pk_ref[:], sk_ref[:])
    ov_ref[:] = jnp.where(sub == col, pv_ref[:], sv_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def staged_append(sk: jax.Array, sv: jax.Array, pk: jax.Array, pv: jax.Array,
                  m: jax.Array, *, interpret: bool = False):
    """(sk, sv) with the (L,B,Hkv,1,hd) pending rows written at column m.
    cs (the staged-column axis) must be a multiple of 8."""
    L, B, Hkv, cs, hd = sk.shape
    assert cs % 8 == 0, cs
    mw = jnp.reshape(jnp.asarray(m, jnp.int32), (1,))

    win = pl.BlockSpec((1, B, Hkv, 8, hd),
                       lambda l, mr: (l, 0, 0, mr[0] // 8, 0),
                       memory_space=pltpu.VMEM)
    pen = pl.BlockSpec((1, B, Hkv, 1, hd), lambda l, mr: (l, 0, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[pen, pen, win, win],
        out_specs=[win, win],
    )
    return pl.pallas_call(
        _append_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(sk.shape, sk.dtype),
                   jax.ShapeDtypeStruct(sv.shape, sv.dtype)],
        # operand order: (m, pk, pv, sk, sv) -> outputs (sk, sv)
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(mw, pk, pv, sk, sv)
