"""Context parallelism: decode attention over an S-sharded int8 KV cache.

The reference has no long-context story at all — its sequence length is a
compile-time constant of the NPU graph and prefill/decode run single-stream
(ref sim_model.py:43-46, llm.cpp:563-603). For the TPU build, sequence scaling
comes from sharding the KV-cache *sequence* axis over a "cp" mesh axis: each
device holds an S/cp slab of every layer's int8 K/V cache, and the decode step
merges per-shard partial attention with the flash-decoding split-softmax
identity. Collectives are three tiny reductions per step (a pmax over the
per-shard score maxima and psums of the denominators / weighted values), all
over ICI — the (B,Hq,S) score tensor itself never leaves the shards.

Quantization fidelity: the merge is applied around the engine's decode-light
attention math (engine._layer_forward) with the SAME quantization sites —
int8 Q·Kᵀ with affine corrections, optional 16-bit fake-quant on scores
(qk_bmm.output) and on the normalized probabilities (pv_bmm.input), int8 P·V
dequant, and the explicit self-term for the step's new K/V row. The 16-bit
probability fake-quant requires the TRUE global softmax denominator, so the
merge runs in two phases (global max+denominator first, then probabilities);
outputs match the unsharded engine to fp32 summation-order rounding.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mobilequant_tpu.ops import qops
from mobilequant_tpu.quant.quantizer import fake_quant


def _fq16(x, r, cfg):
    if cfg is None or not cfg.enabled:
        return x
    return fake_quant(x, r["scale"], r["offset"], cfg)


def _local_decode_attention(qg, k8_new, v8_new, k_shard, v_shard,
                            cache_position, qk, pv,
                            *, qk_out_cfg, pv_in_cfg, neg_inf: float,
                            axis: str):
    """shard_map body: per-device partial attention + split-softmax merge.

    qg (B,Hkv,G,hd) shifted-int8 roped queries; k8_new/v8_new (B,Hkv,1,hd) the
    step's quantized K/V rows (replicated); k_shard/v_shard (B,Hkv,S/cp,hd)
    this device's cache slab. Returns (B,Hkv,G,hd) fp32 (replicated).
    """
    hd = qg.shape[-1]
    S_loc = k_shard.shape[2]
    r = jax.lax.axis_index(axis)
    col0 = r * S_loc                                   # global start of slab

    # --- local scores over the stale cache slab (engine order) -------------
    scores = qops.int_matmul_qk(qg, k_shard,
                                qk["input"]["scale"], qk["input"]["offset"],
                                qk["input2"]["scale"], qk["input2"]["offset"])
    oqv = qk["input"]["offset"] - 128.0
    okv = qk["input2"]["offset"] - 128.0
    qf = qg.astype(jnp.float32)
    kf = k8_new.astype(jnp.float32)
    s_self = jnp.sum((qf - oqv) * (kf - okv), axis=-1, keepdims=True) \
        * (qk["input"]["scale"] * qk["input2"]["scale"])        # (B,Hkv,G,1)
    scores = _fq16(scores, qk["output"], qk_out_cfg)
    s_self = _fq16(s_self, qk["output"], qk_out_cfg)
    inv = 1.0 / math.sqrt(hd)
    col = col0 + jnp.arange(S_loc)[None, None, None, :]
    maskc = jnp.where(col < cache_position[:, None, None, None], 0.0, neg_inf)
    scores = scores.astype(jnp.float32) * inv + maskc           # (B,Hkv,G,Sl)
    s_self = s_self.astype(jnp.float32) * inv

    # --- phase 1: global max + denominator (flash-decoding merge) ----------
    # every shard adds the (identical, replicated) self term exactly once by
    # dividing it by the shard count inside the psum
    m = jnp.maximum(jax.lax.pmax(jnp.max(scores, axis=-1, keepdims=True),
                                 axis), s_self)
    e = jnp.exp(scores - m)
    nsh = jax.lax.psum(jnp.ones((), jnp.float32), axis)
    den = jax.lax.psum(jnp.sum(e, axis=-1, keepdims=True)
                       + jnp.exp(s_self - m) / nsh, axis)

    # --- phase 2: probabilities (with the 16-bit pv input fq on the TRUE
    # normalized values), partial P·V, merge ---------------------------------
    p_loc = _fq16(e / den, pv["input"], pv_in_cfg)
    p_self = _fq16(jnp.exp(s_self - m) / den, pv["input"], pv_in_cfg)
    attn = qops.int_matmul_pv(p_loc, v_shard,
                              pv["input2"]["scale"], pv["input2"]["offset"])
    v_new_f = (v8_new.astype(jnp.float32) + 128.0
               - pv["input2"]["offset"]) * pv["input2"]["scale"]
    attn = jax.lax.psum(attn + (p_self * v_new_f) / nsh, axis)
    return attn


def cp_decode_attention(qg, k8_new, v8_new, k_cache, v_cache, cache_position,
                        qk, pv, qk_out_cfg, pv_in_cfg, mesh: Mesh,
                        *, axis: str = "cp", neg_inf: float = -40000.0):
    """Decode-step attention with the int8 KV cache sequence-sharded over
    `axis`. Arguments mirror engine._layer_forward's decode-light segment:

    qg        (B,Hkv,G,hd) shifted-int8 roped queries
    k8_new    (B,Hkv,1,hd) int8 — the step's new K row (post-rope, quantized)
    v8_new    (B,Hkv,1,hd) int8
    k_cache   (B,Hkv,S,hd) int8 — STALE cache (new row not yet written),
              sequence axis sharded over `axis`
    cache_position (B,) int32
    qk/pv     per-site range dicts ({"input","input2","output"} →
              {"scale","offset"}), qk_out_cfg/pv_in_cfg the QuantConfigs of
              the 16-bit sites (None/disabled → no fake-quant)
    Returns (B,Hkv,G,hd) fp32, replicated across `axis`.
    """
    spec_kv = P(None, None, axis, None)
    rep = P()
    fn = jax.shard_map(
        partial(_local_decode_attention, qk_out_cfg=qk_out_cfg,
                pv_in_cfg=pv_in_cfg, neg_inf=neg_inf, axis=axis),
        mesh=mesh,
        in_specs=(rep, rep, rep, spec_kv, spec_kv, rep, rep, rep),
        out_specs=rep,
        check_vma=False,
    )
    return fn(qg, k8_new, v8_new, k_cache, v_cache, cache_position, qk, pv)


def _local_prefill_attention(qg, k_shard, v_shard, positions, kv_valid_len,
                             qk, pv, *, qk_out_cfg, pv_in_cfg,
                             neg_inf: float, axis: str, G: int):
    """shard_map body: per-device prefill attention over an S-slab + merge.

    qg (B,Hkv,G*T,hd) shifted-int8; k_shard/v_shard (B,Hkv,S/cp,hd);
    positions (B,T). Returns (B,Hkv,G*T,hd) fp32 (replicated)."""
    B, Hkv, GT, hd = qg.shape
    T = GT // G
    S_loc = k_shard.shape[2]
    r = jax.lax.axis_index(axis)
    col0 = r * S_loc

    scores = qops.int_matmul_qk(qg, k_shard,
                                qk["input"]["scale"], qk["input"]["offset"],
                                qk["input2"]["scale"], qk["input2"]["offset"])
    scores = scores.reshape(B, Hkv, G, T, S_loc)
    scores = _fq16(scores, qk["output"], qk_out_cfg)
    # causal mask on GLOBAL kv positions (models.model.causal_mask semantics)
    kv_pos = col0 + jnp.arange(S_loc)[None, None, :]               # (1,1,Sl)
    ok = kv_pos <= positions[:, :, None]
    if kv_valid_len is not None:
        ok = ok & (kv_pos < kv_valid_len[:, None, None])
    mask = jnp.where(ok, 0.0, neg_inf)[:, None, None, :, :]        # (B,1,1,T,Sl)
    scores = scores.astype(jnp.float32) / math.sqrt(hd) + mask

    # flash split-softmax merge with the 16-bit probability fq on the TRUE
    # normalized values (needs the global max + denominator first)
    m = jax.lax.pmax(jnp.max(scores, axis=-1, keepdims=True), axis)
    e = jnp.exp(scores - m)
    den = jax.lax.psum(jnp.sum(e, axis=-1, keepdims=True), axis)
    probs = _fq16(e / den, pv["input"], pv_in_cfg)
    attn = qops.int_matmul_pv(probs.reshape(B, Hkv, GT, S_loc), v_shard,
                              pv["input2"]["scale"], pv["input2"]["offset"])
    return jax.lax.psum(attn, axis)


def cp_prefill_attention(qg, k_cache, v_cache, positions, kv_valid_len,
                         qk, pv, qk_out_cfg, pv_in_cfg, mesh: Mesh,
                         *, num_groups: int, axis: str = "cp",
                         neg_inf: float = -40000.0):
    """Prefill attention with the int8 K/V sequence axis sharded over `axis`
    — the long-context case: the (B,Hq,T,S) score tensor exists only as
    per-shard (…,S/cp) slabs. Mirrors engine._layer_forward's batched prefill
    attention (int Q·Kᵀ + fq16 → /√hd + causal mask → softmax → fq16 probs →
    int P·V) with the flash split-softmax merge across shards.

    qg (B,Hkv,G·T,hd) shifted-int8 roped queries (num_groups = G);
    k_cache/v_cache (B,Hkv,S,hd) int8, S sharded over `axis`;
    positions (B,T); kv_valid_len (B,) or None.
    Returns (B,Hkv,G·T,hd) fp32, replicated across `axis`."""
    spec_kv = P(None, None, axis, None)
    rep = P()
    fn = jax.shard_map(
        partial(_local_prefill_attention, qk_out_cfg=qk_out_cfg,
                pv_in_cfg=pv_in_cfg, neg_inf=neg_inf, axis=axis,
                G=num_groups),
        mesh=mesh,
        in_specs=(rep, spec_kv, spec_kv, rep, rep, rep, rep),
        out_specs=rep,
        check_vma=False,
    )
    return fn(qg, k_cache, v_cache, positions, kv_valid_len, qk, pv)
