"""Fused int8-KV decode attention kernel.

One Pallas dispatch per layer replaces the ~15-op XLA attention block (quantized
QK^T with zero-point corrections, 16-bit score fake-quant, scaling, masking,
softmax, 16-bit prob fake-quant, int8 PV with corrections). At bs=1 decode the
engine is dispatch-overhead-bound (BENCHMARKS.md), so op-count collapse is the
lever; the kernel also keeps K/V tiles in VMEM with no fp materialization of the
dequantized cache.

Semantics are bit-faithful to the engine/sim ladder (engine._layer_forward):
  scores = ((q−oq)·(k−ok))·sq·sk → fq16 → /√hd → +mask(valid) → softmax
  probs → fq16 → (P·(v_shift) − (ov−128)·ΣP)·sv
Grid: (B, Hkv); per program q (G,hd) int8, K/V (S,hd) int8 in VMEM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# meta vector layout (fp32): [sq, oq, sk, ok, sv, ov,
#                             qk_out_scale, qk_out_offset, qk_out_enabled,
#                             pv_in_scale, pv_in_offset, pv_in_enabled,
#                             neg_inf]
_META_LEN = 13


def _fq16_inline(x, scale, offset, qmax):
    q = jnp.round(x / scale) + offset
    q = jnp.clip(q, 0.0, qmax)
    y = (q - offset) * scale
    return jnp.where(qmax > 0.5, y, x)


def _decode_attn_kernel(meta_ref, valid_ref, q_ref, k_ref, v_ref, out_ref):
    """q (1,1,G,hd) int8; k/v (1,1,S,hd) int8; out (1,1,G,hd) fp32;
    valid: (B,) int32 in SMEM (indexed by program_id(0)); meta: (13,) fp32 SMEM."""
    sq, oq = meta_ref[0], meta_ref[1] - 128.0
    sk, ok = meta_ref[2], meta_ref[3] - 128.0
    sv, ov = meta_ref[4], meta_ref[5] - 128.0
    neg_inf = meta_ref[12]

    b = pl.program_id(0)
    q = q_ref[0, 0]                                # (G, hd) int8
    k = k_ref[0, 0]                                # (S, hd) int8
    G, hd = q.shape
    S = k.shape[0]

    acc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32).astype(jnp.float32)
    qsum = jnp.sum(q.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
    ksum = jnp.sum(k.astype(jnp.int32), axis=1).astype(jnp.float32)[None, :]
    scores = (acc - ok * qsum - oq * ksum + hd * oq * ok) * (sq * sk)

    scores = _fq16_inline(scores, meta_ref[6], meta_ref[7], meta_ref[8])
    scores = scores * (1.0 / math.sqrt(hd))
    col = jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
    # additive mask (not replacement) — bit-faithful to the engine/sim path
    scores = scores + jnp.where(col < valid_ref[b], 0.0, neg_inf)

    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=1, keepdims=True)
    probs = _fq16_inline(probs, meta_ref[9], meta_ref[10], meta_ref[11])

    v = v_ref[0, 0].astype(jnp.float32)            # (S, hd)
    pv = jax.lax.dot_general(probs, v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    psum = jnp.sum(probs, axis=1, keepdims=True)
    out_ref[0, 0] = (pv - ov * psum) * sv


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(q8: jax.Array, k8: jax.Array, v8: jax.Array,
                     meta: jax.Array, valid_len: jax.Array, *,
                     interpret: bool = False):
    """q8 (B,Hkv,G,hd) int8 × cache k8/v8 (B,Hkv,S,hd) int8 → fp32 (B,Hkv,G,hd).

    meta: (13,) fp32 (see module header). valid_len: (B,) int32.
    """
    B, Hkv, G, hd = q8.shape
    S = k8.shape[2]
    valid = valid_len.astype(jnp.int32)            # (B,), full-array SMEM

    grid = (B, Hkv)
    return pl.pallas_call(
        _decode_attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # valid (B,)
            pl.BlockSpec((1, 1, G, hd), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, hd), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, hd), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, G, hd), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, hd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Hkv * G * S * hd * 2,
            bytes_accessed=B * Hkv * (G * hd + 2 * S * hd + G * hd * 4),
            transcendentals=B * Hkv * G * S),
        interpret=interpret,
    )(meta, valid, q8, k8, v8)