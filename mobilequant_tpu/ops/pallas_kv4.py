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
denominator; engine._decode_light_attention) already treats score parts
independently, so {cache_lo, cache_hi, staged, self} is just four parts
instead of three. Bit-faithful to the XLA unpack fallback for BOTH policies
(the 16-bit qk/pv fq sites are static trace-time flags).

Domain bookkeeping: packed cache nibbles are RAW (q4 ∈ [0,15], zero-point =
the 4-bit offset); staged/self rows arrive SHIFTED (q4 − 128, zero-point −
128). Both are handled with the same scale scalars — only the ±128 constant
moves. The K colsums input kcsT is the SHIFTED-domain sum in sequence order
(qops.kv_colsums_packed), so raw-domain corrections add 128·hd back.

Reference role: the QK/PV bmms whose input2 encodings define the device KV
cache (/root/reference/device/calibrate.py:246-281) and the per-token
KV-cache datapath of the C++ runtime (/root/reference/capp/src/llm.cpp:
571-595), re-designed for HBM-bandwidth-bound batched decode on TPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mobilequant_tpu.ops.pallas_mlp import _fq


def _pick_bblk(B: int, Hkv: int, S2: int, hd: int,
               target: int = 2 * 1024 * 1024) -> int:
    """Batch tile: packed K tile (Bblk, Hkv, S2, hd) int8 ≤ ~target bytes,
    Bblk dividing B (whole-S rows per sequence, a few sequences per phase)."""
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


def _kv4_attn_kernel(idx_ref, meta_ref, pos_ref, mst_ref,
                     q_ref, kp_ref, vp_ref, kcs_ref, sk_ref, sv_ref,
                     kn_ref, vn_ref, out_ref,
                     *, Hq: int, Hkv: int, hd: int, Bblk: int,
                     qk_fq_on: bool, pv_fq_on: bool):
    del idx_ref
    G = Hq // Hkv
    S2 = kp_ref.shape[3]
    cs_staged = sk_ref.shape[3]
    inv = 1.0 / math.sqrt(hd)

    def m(i):
        return meta_ref[i]

    a = pl.program_id(0)
    sq, oqs = m(0), m(1) - 128.0          # q: shifted domain
    skk, ok = m(2), m(3)                  # k: RAW 4-bit zero-point
    sv, ov = m(4), m(5)                   # v: RAW 4-bit zero-point
    oks = ok - 128.0                      # shifted-domain k zero-point
    neg_inf = m(12)
    mst = mst_ref[0]
    # fold 1/sqrt(hd) into the score scale when no qk fq sits between
    cf = (sq * skk) if qk_fq_on else (sq * skk * inv)

    def seq_blk(bb, _):
        gb = a * Bblk + bb
        pos_b = pos_ref[gb]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, S2), 1)
        mask_lo = jnp.where(col < pos_b, 0.0, neg_inf)
        mask_hi = jnp.where(S2 + col < pos_b, 0.0, neg_inf)
        col2 = jax.lax.broadcasted_iota(jnp.int32, (1, cs_staged), 1)
        mask_st = jnp.where(col2 < mst, 0.0, neg_inf)
        for hkv in range(Hkv):
            sl = hkv * G
            qi = q_ref[gb, sl:sl + G, :]                    # (G, hd) int8
            qf = qi.astype(jnp.float32)
            qs = jnp.sum(qf, axis=1, keepdims=True)         # (G, 1) Σ shifted

            kp = kp_ref[0, bb, hkv]                         # (S2, hd) packed
            k_lo = kp & 0x0F                                # raw nibbles
            k_hi = ((kp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
            kcs_row = kcs_ref[0, bb, hkv]                   # (1, S) shifted Σ

            def part_raw(k4, ksum_sh):
                # k in the RAW nibble domain: Σk4 = ksum_shifted + 128·hd
                accp = jax.lax.dot_general(
                    qi, k4, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                sc = (accp - ok * qs - oqs * (ksum_sh + 128.0 * hd)
                      + hd * oqs * ok) * cf
                if qk_fq_on:
                    sc = _fq(sc, m(6), m(7), m(8)) * inv
                return sc

            lg_lo = part_raw(k_lo, kcs_row[:, :S2]) + mask_lo
            lg_hi = part_raw(k_hi, kcs_row[:, S2:]) + mask_hi

            # staged part: SHIFTED rows, in-kernel colsums (cs is small)
            kst = sk_ref[0, bb, hkv]                        # (cs, hd) shifted
            kss = jnp.sum(kst.astype(jnp.int32), axis=1,
                          keepdims=True).astype(jnp.float32)
            acc_st = jax.lax.dot_general(
                qi, kst, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            sc_st = (acc_st - oks * qs - oqs * kss.reshape(1, -1)
                     + hd * oqs * oks) * cf
            if qk_fq_on:
                sc_st = _fq(sc_st, m(6), m(7), m(8)) * inv
            lg_st = sc_st + mask_st

            # self term (shifted row)
            kn = kn_ref[gb, hkv:hkv + 1, :].astype(jnp.float32)  # (1, hd)
            s_self = jnp.sum((qf - oqs) * (kn - oks), axis=1,
                             keepdims=True) * (sq * skk)
            if qk_fq_on:
                s_self = _fq(s_self, m(6), m(7), m(8))
            lg_self = s_self * inv                          # (G, 1)

            # partwise softmax: shared max, per-part exp, shared denominator
            mx = jnp.maximum(jnp.max(lg_lo, axis=1, keepdims=True),
                             jnp.max(lg_hi, axis=1, keepdims=True))
            mx = jnp.maximum(mx, jnp.max(lg_st, axis=1, keepdims=True))
            mx = jnp.maximum(mx, lg_self)
            e_lo = jnp.exp(lg_lo - mx)
            e_hi = jnp.exp(lg_hi - mx)
            e_st = jnp.exp(lg_st - mx)
            e_self = jnp.exp(lg_self - mx)
            den = (jnp.sum(e_lo, axis=1, keepdims=True)
                   + jnp.sum(e_hi, axis=1, keepdims=True)
                   + jnp.sum(e_st, axis=1, keepdims=True) + e_self)

            vp = vp_ref[0, bb, hkv]                         # (S2, hd) packed
            v_lo = (vp & 0x0F).astype(jnp.float32)
            v_hi = ((vp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.float32)
            vst = sv_ref[0, bb, hkv]
            vst_raw = (vst & 0x0F).astype(jnp.float32)      # shifted → raw
            vn_raw = (vn_ref[gb, hkv:hkv + 1, :] & 0x0F).astype(jnp.float32)
            if pv_fq_on:
                # strict: the 16-bit fq applies to the normalized probs
                def pvfq(x):
                    return _fq(x, m(9), m(10), m(11))

                p_lo = pvfq(e_lo / den)
                p_hi = pvfq(e_hi / den)
                p_st = pvfq(e_st / den)
                p_self = pvfq(e_self / den)
                psum = (jnp.sum(p_lo, axis=1, keepdims=True)
                        + jnp.sum(p_hi, axis=1, keepdims=True)
                        + jnp.sum(p_st, axis=1, keepdims=True) + p_self)
                A = jax.lax.dot_general(
                    p_lo, v_lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                A = A + jax.lax.dot_general(
                    p_hi, v_hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                A = A + jax.lax.dot_general(
                    p_st, vst_raw, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                A = A + p_self * vn_raw
                att = (A - ov * psum) * sv
            else:
                # relaxed: unnormalized accumulate in the raw domain, one
                # divide — Σe/den == 1 absorbs the zero-point exactly
                A = jax.lax.dot_general(
                    e_lo, v_lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                A = A + jax.lax.dot_general(
                    e_hi, v_hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                A = A + jax.lax.dot_general(
                    e_st, vst_raw, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                A = A + e_self * vn_raw
                att = (A / den - ov) * sv
            out_ref[gb, sl:sl + G, :] = att
        return 0

    jax.lax.fori_loop(0, Bblk, seq_blk, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=(
    "num_q_heads", "num_kv_heads", "head_dim", "qk_fq_on", "pv_fq_on",
    "interpret"))
def kv4_decode_attention(q8, kp_L, vp_L, kcsT_L, sk_L, sv_L, k8_new, v8_new,
                         meta, pos, m_staged, layer_idx, *,
                         num_q_heads: int, num_kv_heads: int, head_dim: int,
                         qk_fq_on: bool = False, pv_fq_on: bool = False,
                         interpret: bool = False):
    """Decode-light attention for layer `layer_idx` over the packed cache.

    q8 (B, Hq, hd) int8 shifted; kp_L/vp_L (L, B, Hkv, S/2, hd) packed;
    kcsT_L (L, B, Hkv, 1, S) fp32 shifted colsums (qops.kv_colsums_packed,
    row layout); sk_L/sv_L (L, B, Hkv, cs, hd) int8 shifted staged rows;
    k8_new/v8_new (B, Hkv, hd) int8 shifted self rows; meta (13,) =
    engine._attn_meta for this layer; pos (B,) chunk-start positions;
    m_staged () staged-column count. → att (B, Hq, hd) fp32.
    """
    Hq, Hkv, hd = num_q_heads, num_kv_heads, head_dim
    B = q8.shape[0]
    L, _, _, S2, _ = kp_L.shape
    cs = sk_L.shape[3]
    Bblk = _pick_bblk(B, Hkv, S2, hd)
    nab = B // Bblk

    idx = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    kernel = functools.partial(
        _kv4_attn_kernel, Hq=Hq, Hkv=Hkv, hd=hd, Bblk=Bblk,
        qk_fq_on=qk_fq_on, pv_fq_on=pv_fq_on)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nab,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # pos
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # m_staged
            pl.BlockSpec((B, Hq, hd), lambda a, idx: (0, 0, 0),
                         memory_space=pltpu.VMEM),                 # q8
            pl.BlockSpec((1, Bblk, Hkv, S2, hd),
                         lambda a, idx: (idx[0], a, 0, 0, 0),
                         memory_space=pltpu.VMEM),                 # k packed
            pl.BlockSpec((1, Bblk, Hkv, S2, hd),
                         lambda a, idx: (idx[0], a, 0, 0, 0),
                         memory_space=pltpu.VMEM),                 # v packed
            pl.BlockSpec((1, Bblk, Hkv, 1, 2 * S2),
                         lambda a, idx: (idx[0], a, 0, 0, 0),
                         memory_space=pltpu.VMEM),                 # kcs
            pl.BlockSpec((1, Bblk, Hkv, cs, hd),
                         lambda a, idx: (idx[0], a, 0, 0, 0),
                         memory_space=pltpu.VMEM),                 # staged k
            pl.BlockSpec((1, Bblk, Hkv, cs, hd),
                         lambda a, idx: (idx[0], a, 0, 0, 0),
                         memory_space=pltpu.VMEM),                 # staged v
            pl.BlockSpec((B, Hkv, hd), lambda a, idx: (0, 0, 0),
                         memory_space=pltpu.VMEM),                 # k self
            pl.BlockSpec((B, Hkv, hd), lambda a, idx: (0, 0, 0),
                         memory_space=pltpu.VMEM),                 # v self
        ],
        out_specs=pl.BlockSpec((B, Hq, hd), lambda a, idx: (0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, hd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Hq * (2 * S2 + cs + 1) * hd * 2,
            bytes_accessed=2 * B * Hkv * S2 * hd + 2 * B * Hkv * cs * hd
            + B * Hkv * 2 * S2 * 4 + 2 * B * Hq * hd * 4,
            transcendentals=B * Hq * (2 * S2 + cs + 1)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(idx, meta.astype(jnp.float32), pos.astype(jnp.int32),
      jnp.reshape(jnp.asarray(m_staged, jnp.int32), (1,)),
      q8, kp_L, vp_L, kcsT_L.astype(jnp.float32), sk_L, sv_L,
      k8_new, v8_new)
