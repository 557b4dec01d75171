"""Fused decode attention over the nibble-packed int4 KV cache.

One dispatch per layer computes the WHOLE decode-light attention of the
chunked-staging path — scores over the stale packed cache, the staged chunk
columns and the self term, exact partwise softmax, P·V — reading the cache
directly in its packed form. This is what realizes the int4-KV traffic win:
the XLA fallback must materialize an unpacked int8 copy of the slabs it
reads (worse than the int8 cache), while this kernel streams half the bytes
and unpacks in registers.

WHY PACKING ALONG THE SEQUENCE AXIS NEEDS NO CONCAT ANYWHERE: the block
layout (packed row r = positions r (lo nibble) and r + S/2 (hi)) splits the
cache part of the attention into two INDEPENDENT score parts —

  Q·Kᵀ contracts hd:  scores_lo = q · (kp & 15)ᵀ,  scores_hi = q · (kp ≫ 4)ᵀ
  P·V  contracts S:   att = p_lo · (vp & 15) + p_hi · (vp ≫ 4)

— and the engine's partwise softmax (shared max, per-part exp, shared
denominator; engine._kv4_decode_light_attention is the op-for-op XLA twin)
already treats score parts independently, so {cache_lo, cache_hi, staged,
self} is just four parts instead of three. Bit-faithful to the XLA fallback
for BOTH policies (the 16-bit qk/pv fq sites are static trace-time flags).

STRUCTURE (v2): everything is BATCHED over the flattened (sequence ×
kv-head) axis — the operands arrive pre-reshaped to (…, B·Hkv, rows, hd)
(free XLA collapses of contiguous axes) and every dot is ONE batched
dot_general per part, every mask/softmax one vectorized op. The v1 design
(fori over sequences × python loop over heads, the chunk kernel's attention
style) measured 49.9 µs/layer at bs=32 — compute-latency-bound on 128
tiny M=8 dots per layer; Mosaic lowers batched dot_general well enough
that the batched form is what competes with XLA's own batched int8 dots.

Domain bookkeeping: packed cache nibbles are RAW (q4 ∈ [0,15], zero-point =
the 4-bit offset); staged/self rows arrive SHIFTED (q4 − 128, zero-point −
128). Both use the same scale scalars — only the ±128 constant moves. The
K colsums input is the SHIFTED-domain sum in sequence order
(qops.kv_colsums_packed), so raw-domain corrections add 128·hd back.

Reference role: the QK/PV bmms whose input2 encodings define the device KV
cache (/root/reference/device/calibrate.py:246-281) and the per-token
KV-cache datapath of the C++ runtime (/root/reference/capp/src/llm.cpp:
571-595), re-designed for HBM-bandwidth-bound batched decode on TPU.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mobilequant_tpu.ops.pallas_mlp import _fq


def _pick_bblk(B: int, Hkv: int, S2: int, hd: int,
               target: int = 1024 * 1024) -> int:
    """Batch tile: packed K tile (Bblk·Hkv, S2, hd) int8 ≤ ~target bytes,
    Bblk dividing B (whole-S rows per sequence, a few sequences per phase).
    MQTPU_KV4_BBLK overrides (rounded down to a divisor of B)."""
    env = os.environ.get("MQTPU_KV4_BBLK")
    if env:
        Bblk = min(int(env), B)
        while B % Bblk:
            Bblk -= 1
        return Bblk
    per_seq = Hkv * S2 * hd
    for Bblk in [d for d in range(B, 0, -1) if B % d == 0]:
        if Bblk * per_seq <= target:
            return Bblk
    return 1


def kv4_attn_supported(num_kv_heads: int, max_seq_len: int, head_dim: int,
                       B: int) -> bool:
    """Static gate: lane width (hd) must be vector-register friendly and the
    packed tile must fit VMEM comfortably."""
    return (head_dim in (64, 128) and max_seq_len % 2 == 0
            and max_seq_len >= 16 and B >= 1
            and num_kv_heads * (max_seq_len // 2) * head_dim
            <= 4 * 1024 * 1024)


def _kv4_attn_kernel(idx_ref, meta_ref, mst_ref,
                     q_ref, pos_ref, kp_ref, vp_ref, kcs_ref, sk_ref, sv_ref,
                     kn_ref, vn_ref, out_ref,
                     *, hd: int, qk_fq_on: bool, pv_fq_on: bool):
    del idx_ref
    BH, G, _ = q_ref.shape
    S2 = kp_ref.shape[3]
    cs_staged = sk_ref.shape[2]
    inv = 1.0 / math.sqrt(hd)

    def m(i):
        return meta_ref[i]

    sq, oqs = m(0), m(1) - 128.0          # q: shifted domain
    skk, ok = m(2), m(3)                  # k: RAW 4-bit zero-point
    sv, ov = m(4), m(5)                   # v: RAW 4-bit zero-point
    oks = ok - 128.0                      # shifted-domain k zero-point
    neg_inf = m(12)
    mst = mst_ref[0]
    # fold 1/sqrt(hd) into the score scale when no qk fq sits between
    cf = (sq * skk) if qk_fq_on else (sq * skk * inv)

    qi = q_ref[...]                                     # (BH, G, hd) int8
    qf = qi.astype(jnp.float32)
    qs = jnp.sum(qf, axis=2, keepdims=True)             # (BH, G, 1)
    posv = pos_ref[...]                                 # (BH, 1, 1) int32

    kp = kp_ref[0]                                      # (BH, hd, S2)
    k_lo = kp & 0x0F
    k_hi = ((kp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
    kcs_row = kcs_ref[0]                                # (BH, 1, 2*S2) f32

    def part_raw(k4, ksum_sh):
        # one batched canonical matmul per nibble plane: q (BH,G,hd) ×
        # kT (BH,hd,S2); ksum_sh (BH, 1, S2) shifted
        acc = jax.lax.dot_general(
            qi, k4, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        sc = (acc - ok * qs - oqs * (ksum_sh + 128.0 * hd)
              + hd * oqs * ok) * cf
        if qk_fq_on:
            sc = _fq(sc, m(6), m(7), m(8)) * inv
        return sc

    col = jax.lax.broadcasted_iota(jnp.int32, (BH, 1, S2), 2)
    mask_lo = jnp.where(col < posv, 0.0, neg_inf)
    mask_hi = jnp.where(S2 + col < posv, 0.0, neg_inf)
    lg_lo = part_raw(k_lo, kcs_row[:, :, :S2]) + mask_lo
    lg_hi = part_raw(k_hi, kcs_row[:, :, S2:]) + mask_hi

    # staged part: SHIFTED rows, in-kernel colsums (cs is small)
    kst = sk_ref[0]                                     # (BH, cs, hd)
    kss = jnp.sum(kst.astype(jnp.int32), axis=2,
                  keepdims=True).astype(jnp.float32)    # (BH, cs, 1)
    acc_st = jax.lax.dot_general(
        qi, kst, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    sc_st = (acc_st - oks * qs
             - oqs * jnp.transpose(kss, (0, 2, 1))
             + hd * oqs * oks) * cf
    if qk_fq_on:
        sc_st = _fq(sc_st, m(6), m(7), m(8)) * inv
    col2 = jax.lax.broadcasted_iota(jnp.int32, (BH, 1, cs_staged), 2)
    lg_st = sc_st + jnp.where(col2 < mst, 0.0, neg_inf)

    # self term (shifted row)
    kn = kn_ref[...].astype(jnp.float32)                # (BH, 1, hd)
    s_self = jnp.sum((qf - oqs) * (kn - oks), axis=2,
                     keepdims=True) * (sq * skk)        # (BH, G, 1)
    if qk_fq_on:
        s_self = _fq(s_self, m(6), m(7), m(8))
    lg_self = s_self * inv

    # partwise softmax: shared max, per-part exp, shared denominator
    mx = jnp.maximum(jnp.max(lg_lo, axis=2, keepdims=True),
                     jnp.max(lg_hi, axis=2, keepdims=True))
    mx = jnp.maximum(mx, jnp.max(lg_st, axis=2, keepdims=True))
    mx = jnp.maximum(mx, lg_self)
    e_lo = jnp.exp(lg_lo - mx)
    e_hi = jnp.exp(lg_hi - mx)
    e_st = jnp.exp(lg_st - mx)
    e_self = jnp.exp(lg_self - mx)
    den = (jnp.sum(e_lo, axis=2, keepdims=True)
           + jnp.sum(e_hi, axis=2, keepdims=True)
           + jnp.sum(e_st, axis=2, keepdims=True) + e_self)

    vp = vp_ref[0]                                      # (BH, hd, S2)
    v_lo = (vp & 0x0F).astype(jnp.float32)
    v_hi = ((vp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.float32)
    vst_raw = (sv_ref[0] & 0x0F).astype(jnp.float32)    # shifted -> raw
    vn_raw = (vn_ref[...] & 0x0F).astype(jnp.float32)   # (BH, 1, hd)

    def pvdot(p, vpart):
        # p (BH,G,S2) × vT (BH,hd,S2): contract the shared minor S2 axis
        return jax.lax.dot_general(
            p, vpart, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    def pvdot_st(p, vpart):
        # staged V stays row-major (cs, hd)
        return jax.lax.dot_general(
            p, vpart, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    if pv_fq_on:
        # strict: the 16-bit fq applies to the normalized probs
        def pvfq(x):
            return _fq(x, m(9), m(10), m(11))

        p_lo = pvfq(e_lo / den)
        p_hi = pvfq(e_hi / den)
        p_st = pvfq(e_st / den)
        p_self = pvfq(e_self / den)
        psum = (jnp.sum(p_lo, axis=2, keepdims=True)
                + jnp.sum(p_hi, axis=2, keepdims=True)
                + jnp.sum(p_st, axis=2, keepdims=True)) + p_self
        A = pvdot(p_lo, v_lo) + pvdot(p_hi, v_hi) \
            + pvdot_st(p_st, vst_raw)
        A = A + p_self * vn_raw
        att = (A - ov * psum) * sv
    else:
        # relaxed: unnormalized accumulate in the raw domain, one divide --
        # sum(e)/den == 1 absorbs the zero-point exactly
        A = pvdot(e_lo, v_lo) + pvdot(e_hi, v_hi) \
            + pvdot_st(e_st, vst_raw)
        A = A + e_self * vn_raw
        att = (A / den - ov) * sv
    out_ref[...] = att


@functools.partial(jax.jit, static_argnames=(
    "num_kv_heads", "head_dim", "qk_fq_on", "pv_fq_on", "interpret"))
def kv4_decode_attention(q8, kp_L, vp_L, kcsT_L, sk_L, sv_L, k8_new, v8_new,
                         meta, pos, m_staged, layer_idx, *,
                         num_kv_heads: int, head_dim: int,
                         qk_fq_on: bool = False, pv_fq_on: bool = False,
                         interpret: bool = False):
    """Decode-light attention for layer `layer_idx` over the packed cache,
    batched over the flattened BH = B·Hkv axis.

    q8 (BH, G, hd) int8 shifted; kp_L/vp_L (L, BH, hd, S/2) packed
    hd-major (K arrives pre-transposed for the QK dot; the S/2 minor dim
    keeps the slab DMAs at full HBM rate — probe_dma);
    kcsT_L (L, BH, 1, S) fp32 shifted colsums (qops.kv_colsums_packed);
    sk_L/sv_L (L, BH, cs, hd) int8 shifted staged rows; k8_new/v8_new
    (BH, 1, hd) int8 shifted self rows; meta (13,) = engine._attn_meta for
    this layer; pos (BH, 1, 1) int32 chunk-start positions (per sequence,
    repeated per kv head); m_staged () staged-column count.
    → att (BH, G, hd) fp32.
    """
    Hkv, hd = num_kv_heads, head_dim
    BH, G, _ = q8.shape
    B = BH // Hkv
    L, _, _, S2 = kp_L.shape
    cs = sk_L.shape[2]
    Bblk = _pick_bblk(B, Hkv, S2, hd)
    nab = B // Bblk
    T = Bblk * Hkv                                  # BH rows per tile

    idx = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    kernel = functools.partial(
        _kv4_attn_kernel, hd=hd, qk_fq_on=qk_fq_on, pv_fq_on=pv_fq_on)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nab,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # m_staged
            pl.BlockSpec((T, G, hd), lambda a, idx: (a, 0, 0),
                         memory_space=pltpu.VMEM),                 # q8
            pl.BlockSpec((T, 1, 1), lambda a, idx: (a, 0, 0),
                         memory_space=pltpu.VMEM),                 # pos
            pl.BlockSpec((1, T, hd, S2),
                         lambda a, idx: (idx[0], a, 0, 0),
                         memory_space=pltpu.VMEM),                 # k packed
            pl.BlockSpec((1, T, hd, S2),
                         lambda a, idx: (idx[0], a, 0, 0),
                         memory_space=pltpu.VMEM),                 # v packed
            pl.BlockSpec((1, T, 1, 2 * S2),
                         lambda a, idx: (idx[0], a, 0, 0),
                         memory_space=pltpu.VMEM),                 # kcs
            pl.BlockSpec((1, T, cs, hd),
                         lambda a, idx: (idx[0], a, 0, 0),
                         memory_space=pltpu.VMEM),                 # staged k
            pl.BlockSpec((1, T, cs, hd),
                         lambda a, idx: (idx[0], a, 0, 0),
                         memory_space=pltpu.VMEM),                 # staged v
            pl.BlockSpec((T, 1, hd), lambda a, idx: (a, 0, 0),
                         memory_space=pltpu.VMEM),                 # k self
            pl.BlockSpec((T, 1, hd), lambda a, idx: (a, 0, 0),
                         memory_space=pltpu.VMEM),                 # v self
        ],
        out_specs=pl.BlockSpec((T, G, hd), lambda a, idx: (a, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, G, hd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * BH * G * (2 * S2 + cs + 1) * hd,
            bytes_accessed=2 * BH * S2 * hd + 2 * BH * cs * hd
            + BH * 2 * S2 * 4 + 2 * BH * G * hd * 4,
            transcendentals=BH * G * (2 * S2 + cs + 1)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(idx, meta.astype(jnp.float32),
      jnp.reshape(jnp.asarray(m_staged, jnp.int32), (1,)),
      q8, pos.astype(jnp.int32), kp_L, vp_L, kcsT_L.astype(jnp.float32),
      sk_L, sv_L, k8_new, v8_new)
    return res
