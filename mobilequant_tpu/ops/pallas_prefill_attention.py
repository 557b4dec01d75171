"""Fused int8-KV prefill attention kernel (the "flash prefill" of PARITY.md).

The XLA prefill path materializes the (B,Hkv,G,T,S) fp32 score AND prob tensors
in HBM (≈2×128 MB/layer at TinyLlama shapes, T=S=1024) plus a fake-quant round
trip on each. This kernel computes attention per (batch, kv-head, Q-block)
entirely in VMEM: for the model class this framework targets (S ≤ a few K — the
reference ships block_size 1024, ref sim_model.py:43-46) the whole K/V for one
head is ≤256 KB int8, so Q-blocking with full-row softmax needs no online
(flash) rescaling pass — simpler, and bit-faithful to the engine ladder
including the post-softmax prob fake-quant, which an online-softmax formulation
cannot express exactly (fq16 is nonlinear in the final normalized probability).

Semantics mirror engine._layer_forward's prefill branch exactly:
  scores = ((q−oq)·(k−ok))·sq·sk → fq16 → /√hd → + causal/valid mask → softmax
  probs → fq16 → (P·v_shift − (ov−128)·ΣP)·sv
Mask replication of models/model.causal_mask: ok = (s ≤ pos_t) & (s < valid_b).

Reference role: this is the TPU replacement for HFFlashAttention2 /
HFSdpaAttention (ref hf_model.py:552-1027) on the *quantized* path — the
reference has no quantized fused attention at all (its NPU graph runs 1
token/step even for prompts, llm.cpp:563-603).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# meta vector layout (fp32) — identical to ops/pallas_attention.py:
# [sq, oq, sk, ok, sv, ov, qk_out_scale, qk_out_offset, qk_out_enabled,
#  pv_in_scale, pv_in_offset, pv_in_enabled, neg_inf]
_META_LEN = 13


def _fq16_inline(x, scale, offset, enabled):
    q = jnp.round(x / scale) + offset
    q = jnp.clip(q, 0.0, 65535.0)
    y = (q - offset) * scale
    return jnp.where(enabled > 0.5, y, x)


def _prefill_attn_kernel(meta_ref, valid_ref, q_ref, k_ref, v_ref, pos_ref,
                         out_ref):
    """q (1,1,G,BQ,hd) int8; k/v (1,1,S,hd) int8; pos (1,BQ,1) int32;
    valid (B,) int32 SMEM; meta (13,) fp32 SMEM; out (1,1,G,BQ,hd) fp32."""
    sq, oq = meta_ref[0], meta_ref[1] - 128.0
    sk, ok = meta_ref[2], meta_ref[3] - 128.0
    sv, ov = meta_ref[4], meta_ref[5] - 128.0
    neg_inf = meta_ref[12]

    b = pl.program_id(0)
    q = q_ref[0, 0]                                   # (G, BQ, hd) int8
    G, BQ, hd = q.shape
    k = k_ref[0, 0]                                   # (S, hd) int8
    S = k.shape[0]
    q2 = q.reshape(G * BQ, hd)

    acc = jax.lax.dot_general(q2, k, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32).astype(jnp.float32)
    qsum = jnp.sum(q2.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
    ksum = jnp.sum(k.astype(jnp.int32), axis=1).astype(jnp.float32)[None, :]
    scores = (acc - ok * qsum - oq * ksum + hd * oq * ok) * (sq * sk)

    scores = _fq16_inline(scores, meta_ref[6], meta_ref[7], meta_ref[8])
    scores = scores * (1.0 / math.sqrt(hd))

    # additive causal/valid mask == models/model.causal_mask rows for this block
    col = jax.lax.broadcasted_iota(jnp.int32, (BQ, S), 1)
    pos = pos_ref[0]                                  # (BQ, 1) int32
    ok_mask = (col <= pos) & (col < valid_ref[b])
    mask2d = jnp.where(ok_mask, 0.0, neg_inf)         # (BQ, S)
    scores = (scores.reshape(G, BQ, S) + mask2d[None]).reshape(G * BQ, S)

    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=1, keepdims=True)
    probs = _fq16_inline(probs, meta_ref[9], meta_ref[10], meta_ref[11])

    v = v_ref[0, 0].astype(jnp.float32)               # (S, hd)
    pv = jax.lax.dot_general(probs, v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    psum = jnp.sum(probs, axis=1, keepdims=True)
    out_ref[0, 0] = ((pv - ov * psum) * sv).reshape(G, BQ, hd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def prefill_attention(q8: jax.Array, k8: jax.Array, v8: jax.Array,
                      meta: jax.Array, positions: jax.Array,
                      valid_len: jax.Array, *, interpret: bool = False):
    """q8 (B,Hkv,G,T,hd) int8 × k8/v8 (B,Hkv,S,hd) int8 → fp32 (B,Hkv,G,T,hd).

    meta: (13,) fp32 (see module header). positions: (B,T) int32 query
    positions. valid_len: (B,) int32 number of valid KV slots (≥ positions+1
    for causal self-attention; pass S when everything is valid).
    """
    B, Hkv, G, T, hd = q8.shape
    S = k8.shape[2]

    # Q-block rows sized so the (G·BQ, S) fp32 score block stays ≲1 MB of VMEM
    rows = max(64, min(512, (1 << 20) // (4 * S) // 8 * 8))
    BQ = max(8, min(rows // G, (T + 7) // 8 * 8))
    if T % BQ != 0:
        pad = BQ - T % BQ
        q8 = jnp.pad(q8, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
        # padded rows mask everything out (pos −1 → all-neg_inf → uniform probs)
        positions = jnp.pad(positions, ((0, 0), (0, pad)), constant_values=-1)
    Tp = q8.shape[3]
    pos3 = positions.astype(jnp.int32)[:, :, None]    # (B, Tp, 1): VMEM-tileable

    grid = (B, Hkv, Tp // BQ)
    out = pl.pallas_call(
        _prefill_attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # valid (B,)
            pl.BlockSpec((1, 1, G, BQ, hd), lambda b, h, t: (b, h, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, hd), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, hd), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, 1), lambda b, h, t: (b, t, 0),
                         memory_space=pltpu.VMEM),                    # positions
        ],
        out_specs=pl.BlockSpec((1, 1, G, BQ, hd), lambda b, h, t: (b, h, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, Tp, hd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Hkv * G * Tp * S * hd * 2,
            bytes_accessed=B * Hkv * (G * Tp * hd + 2 * S * hd + G * Tp * hd * 4),
            transcendentals=B * Hkv * G * Tp * S),
        interpret=interpret,
    )(meta, valid_len.astype(jnp.int32), q8, k8, v8, pos3)
    return out[:, :, :, :T]
