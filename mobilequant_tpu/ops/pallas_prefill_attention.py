"""Fused int8-KV prefill attention kernel (the "flash prefill" of PARITY.md).

The XLA prefill path materializes the (B,Hkv,G,T,S) fp32 score AND prob tensors
in HBM (≈2×128 MB/layer at TinyLlama shapes, T=S=1024) plus a fake-quant round
trip on each. This kernel computes attention per (batch, kv-head, Q-block)
entirely in VMEM, and only over the *causal* S-blocks: for a Q block ending at
position p, KV blocks past p are skipped outright (≈2× less QK/softmax/PV work
on a square prompt); every phase is blockwise with running row-max / row-sum
carries, so no full-S pass ever touches the masked region. The score block
buffer persists in VMEM scratch between the phases, which keeps the softmax
whole-row exact — bit-faithful to the engine ladder including the post-softmax
prob fake-quant (an online-softmax rescaling formulation cannot express that
fq exactly — it is nonlinear in the final normalized probability). Fake-quant
application is specialized at TRACE time from the policy (a
`jnp.where(enabled, ...)` pays the full fq math even when disabled — measured
445 µs/layer before the specialization + causal skipping, 294 µs after,
dominated by dead VPU work and the masked rectangle).

Semantics mirror engine._layer_forward's prefill branch exactly:
  scores = ((q−oq)·(k−ok))·sq·sk → fq16 → /√hd → + causal/valid mask → softmax
  probs → fq16 → (P·v_shift − (ov−128)·ΣP)·sv
Mask replication of models/model.causal_mask: ok = (s ≤ pos_t) & (s < valid_b).

Reference role: the TPU replacement for HFFlashAttention2 / HFSdpaAttention
(ref hf_model.py:552-1027) on the *quantized* path — the reference has no
quantized fused attention at all (its NPU graph runs 1 token/step even for
prompts, llm.cpp:563-603).
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
# (the *_enabled slots are kept for layout compat; the kernel specializes on
#  the static qk_fq / pv_fq flags instead)
_META_LEN = 13

_NEG_BIG = -1e30


def _fq16(x, scale, offset, qmax):
    q = jnp.round(x / scale) + offset
    q = jnp.clip(q, 0.0, qmax)
    return (q - offset) * scale


def _prefill_attn_kernel(meta_ref, valid_ref, q_ref, k_ref, v_ref, pos_ref,
                         out_ref, scores_ref, *, bs: int, qk_fq: bool,
                         pv_fq: bool):
    """q (1,1,G,BQ,hd) int8; k/v (1,1,S,hd) int8; pos (1,BQ,1) int32;
    valid (B,) int32 SMEM; meta (13,) fp32 SMEM; out (1,1,G,BQ,hd) fp32;
    scores scratch (G*BQ, S) fp32 VMEM (only the causal prefix is touched)."""
    sq, oq = meta_ref[0], meta_ref[1] - 128.0
    sk, ok = meta_ref[2], meta_ref[3] - 128.0
    sv, ov = meta_ref[4], meta_ref[5] - 128.0
    neg_inf = meta_ref[12]

    b = pl.program_id(0)
    q = q_ref[0, 0]                                   # (G, BQ, hd) int8
    G, BQ, hd = q.shape
    S = k_ref.shape[2]
    R = G * BQ
    q2 = q.reshape(R, hd)
    inv_sqrt = 1.0 / math.sqrt(hd)

    pos = pos_ref[0]                                  # (BQ, 1) int32
    valid_b = valid_ref[b]
    # causal bound: KV columns beyond max(pos) (or valid) are entirely masked —
    # those S-blocks are skipped in every phase
    pmax = jnp.max(pos)
    ncols = jnp.clip(jnp.minimum(pmax + 1, valid_b), 0, S)
    nblk = (ncols + bs - 1) // bs

    qsum = jnp.sum(q2.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)

    def score_block(i, m):
        s0 = i * bs
        k = k_ref[0, 0, pl.ds(s0, bs), :]             # (bs, hd) int8
        acc = jax.lax.dot_general(q2, k, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32
                                  ).astype(jnp.float32)
        ksum = jnp.sum(k.astype(jnp.int32), axis=1).astype(jnp.float32)[None, :]
        sc = (acc - ok * qsum - oq * ksum + hd * oq * ok) * (sq * sk)
        if qk_fq:
            sc = _fq16(sc, meta_ref[6], meta_ref[7], meta_ref[8])
        sc = sc * inv_sqrt
        col = s0 + jax.lax.broadcasted_iota(jnp.int32, (BQ, bs), 1)
        ok_mask = (col <= pos) & (col < valid_b)
        mask2d = jnp.where(ok_mask, 0.0, neg_inf)     # (BQ, bs)
        sc = (sc.reshape(G, BQ, bs) + mask2d[None]).reshape(R, bs)
        scores_ref[:, pl.ds(s0, bs)] = sc
        return jnp.maximum(m, jnp.max(sc, axis=1, keepdims=True))

    m = jax.lax.fori_loop(0, nblk, score_block,
                          jnp.full((R, 1), _NEG_BIG, jnp.float32))

    def exp_block(i, l):
        s0 = i * bs
        e = jnp.exp(scores_ref[:, pl.ds(s0, bs)] - m)
        scores_ref[:, pl.ds(s0, bs)] = e
        return l + jnp.sum(e, axis=1, keepdims=True)

    l = jax.lax.fori_loop(0, nblk, exp_block, jnp.zeros((R, 1), jnp.float32))
    linv = 1.0 / jnp.maximum(l, 1e-30)

    def pv_block(i, carry):
        acc, psum = carry
        s0 = i * bs
        p = scores_ref[:, pl.ds(s0, bs)] * linv
        if pv_fq:
            p = _fq16(p, meta_ref[9], meta_ref[10], meta_ref[11])
        v = v_ref[0, 0, pl.ds(s0, bs), :].astype(jnp.float32)  # (bs, hd)
        acc = acc + jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        return acc, psum + jnp.sum(p, axis=1, keepdims=True)

    pv, psum = jax.lax.fori_loop(
        0, nblk, pv_block,
        (jnp.zeros((R, hd), jnp.float32), jnp.zeros((R, 1), jnp.float32)))
    out_ref[0, 0] = ((pv - ov * psum) * sv).reshape(G, BQ, hd)


def _prefill_attn_online_kernel(meta_ref, valid_ref, q_ref, k_ref, v_ref,
                                pos_ref, out_ref, *, bs: int, qk_fq: bool):
    """Single-pass online-softmax variant for pv_fq=False (the relaxed/serving
    policy): without the post-softmax prob fake-quant there is no whole-row
    nonlinearity, so the classic running-max/rescale formulation is exact up
    to fp32 accumulation order. One pass over the causal blocks instead of
    three (score+store / exp / PV) — the 3-phase kernel is VPU-bound on
    repeated traversals of the (G·BQ, S) score matrix, measured 209 µs/layer
    at T=S=1024 vs 1?? for this kernel (BENCHMARKS.md "Prefill").

    Σp bookkeeping for the v zero-point: p = e/l, so Σ_s p = l·linv and
    out = (Σ e·v − ov·l)·linv·sv — no separate psum accumulator needed."""
    sq, oq = meta_ref[0], meta_ref[1] - 128.0
    sk, ok = meta_ref[2], meta_ref[3] - 128.0
    sv, ov = meta_ref[4], meta_ref[5] - 128.0
    neg_inf = meta_ref[12]

    b = pl.program_id(0)
    q = q_ref[0, 0]                                   # (G, BQ, hd) int8
    G, BQ, hd = q.shape
    S = k_ref.shape[2]
    R = G * BQ
    q2 = q.reshape(R, hd)
    inv_sqrt = 1.0 / math.sqrt(hd)

    pos = pos_ref[0]                                  # (BQ, 1) int32
    valid_b = valid_ref[b]
    pmax = jnp.max(pos)
    ncols = jnp.clip(jnp.minimum(pmax + 1, valid_b), 0, S)
    nblk = (ncols + bs - 1) // bs

    qsum = jnp.sum(q2.astype(jnp.int32), axis=1,
                   keepdims=True).astype(jnp.float32)

    def blk(i, carry):
        acc, l, m = carry
        s0 = i * bs
        k = k_ref[0, 0, pl.ds(s0, bs), :]             # (bs, hd) int8
        raw = jax.lax.dot_general(q2, k, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32
                                  ).astype(jnp.float32)
        ksum = jnp.sum(k.astype(jnp.int32),
                       axis=1).astype(jnp.float32)[None, :]
        sc = (raw - ok * qsum - oq * ksum + hd * oq * ok) * (sq * sk)
        if qk_fq:
            sc = _fq16(sc, meta_ref[6], meta_ref[7], meta_ref[8])
        sc = sc * inv_sqrt
        col = s0 + jax.lax.broadcasted_iota(jnp.int32, (BQ, bs), 1)
        ok_mask = (col <= pos) & (col < valid_b)
        mask2d = jnp.where(ok_mask, 0.0, neg_inf)     # (BQ, bs)
        sc = (sc.reshape(G, BQ, bs) + mask2d[None]).reshape(R, bs)
        m_new = jnp.maximum(m, jnp.max(sc, axis=1, keepdims=True))
        r = jnp.exp(m - m_new)
        e = jnp.exp(sc - m_new)
        v = v_ref[0, 0, pl.ds(s0, bs), :].astype(jnp.float32)  # (bs, hd)
        acc = acc * r + jax.lax.dot_general(e, v, (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
        l = l * r + jnp.sum(e, axis=1, keepdims=True)
        return acc, l, m_new

    acc, l, _ = jax.lax.fori_loop(
        0, nblk, blk,
        (jnp.zeros((R, hd), jnp.float32), jnp.zeros((R, 1), jnp.float32),
         jnp.full((R, 1), _NEG_BIG, jnp.float32)))
    linv = 1.0 / jnp.maximum(l, 1e-30)
    out_ref[0, 0] = ((acc - ov * l) * linv * sv).reshape(G, BQ, hd)


@functools.partial(jax.jit, static_argnames=("qk_fq", "pv_fq", "interpret"))
def prefill_attention(q8: jax.Array, k8: jax.Array, v8: jax.Array,
                      meta: jax.Array, positions: jax.Array,
                      valid_len: jax.Array, *, qk_fq: bool = False,
                      pv_fq: bool = False, interpret: bool = False):
    """q8 (B,Hkv,G,T,hd) int8 × k8/v8 (B,Hkv,S,hd) int8 → fp32 (B,Hkv,G,T,hd).

    meta: (13,) fp32 (see module header). positions: (B,T) int32 query
    positions. valid_len: (B,) int32 number of valid KV slots. qk_fq/pv_fq:
    STATIC policy flags — apply the 16-bit score / prob fake-quant.
    """
    B, Hkv, G, T, hd = q8.shape
    S = k8.shape[2]

    # KV-length alignment: score-scratch column stores are offset by multiples
    # of BS, which Mosaic requires to be 128-lane-aligned; pad S up (to a 512
    # multiple when S > 512 so full-width S blocks divide it). Padded columns
    # have col >= valid_len, so the causal/valid mask already zeroes them.
    align = 512 if S > 512 else 128
    s_pad = (-S) % align
    if s_pad:
        k8 = jnp.pad(k8, ((0, 0), (0, 0), (0, s_pad), (0, 0)))
        v8 = jnp.pad(v8, ((0, 0), (0, 0), (0, s_pad), (0, 0)))
        S += s_pad

    # Q-block rows sized so the (G·BQ, S) fp32 score scratch stays ≲8 MB;
    # bigger blocks amortize per-program grid AND fori-loop overhead (the
    # per-iteration fixed cost dominates once compute is a few µs: 128
    # programs/layer measured slower than 32, 32 slower than 16)
    rows = max(64, min(2048, (8 << 20) // (4 * S) // 8 * 8))
    BQ = max(8, min(rows // G, (T + 7) // 8 * 8))
    if T % BQ != 0:
        pad = BQ - T % BQ
        q8 = jnp.pad(q8, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
        # padded rows mask everything out (pos −1 → zero computed blocks)
        positions = jnp.pad(positions, ((0, 0), (0, pad)), constant_values=-1)
    Tp = q8.shape[3]
    pos3 = positions.astype(jnp.int32)[:, :, None]    # (B, Tp, 1): VMEM-tileable
    BS = min(S, 512)
    assert S % BS == 0, (S, BS)

    grid = (B, Hkv, Tp // BQ)
    if pv_fq:
        # post-softmax prob fake-quant is nonlinear in the normalized
        # probability — needs the whole-row-exact 3-phase kernel
        kernel = functools.partial(_prefill_attn_kernel, bs=BS,
                                   qk_fq=qk_fq, pv_fq=pv_fq)
        scratch = [pltpu.VMEM((G * BQ, S), jnp.float32)]
    else:
        kernel = functools.partial(_prefill_attn_online_kernel, bs=BS,
                                   qk_fq=qk_fq)
        scratch = []
    out = pl.pallas_call(
        kernel,
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
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Hkv * G * Tp * S * hd * 2,
            bytes_accessed=B * Hkv * (G * Tp * hd + 2 * S * hd + G * Tp * hd * 4),
            transcendentals=B * Hkv * G * Tp * S),
        interpret=interpret,
    )(meta, valid_len.astype(jnp.int32), q8, k8, v8, pos3)
    return out[:, :, :, :T]
