"""Whole-decoder-layer W4 megakernel (stacked-layer, decode bs=1).

ONE Pallas dispatch runs an entire decoder layer of the packed integer engine:

  norm1 -> quantize -> qkv W4 matmul -> per-channel output fq -> RoPE ->
  joint segment quantization -> decode-light attention over the int8 KV cache
  (scores + self-term + softmax + PV, engine._layer_forward order) ->
  o-proj W4 matmul -> output fq -> residual -> [MLP phases of
  ops/pallas_mlp._w4_mlp_phase: norm2 -> w13 -> act -> w2 -> requant -> residual]

replacing ~20 XLA fusions + 3 kernel dispatches per layer. Weights stream
directly from the layer-STACKED nibble packs (scalar-prefetch layer select,
same trick as ops/pallas_matmul.w4a8_matmul_stacked), the KV cache slab rides
in as a (1,1,Hkv,S,hd) block of the full stacked cache, and the new K/V rows
come out as a (2*Hkv, hd) int8 output for engine.forward's post-scan scatter
(decode-light contract). Numerics are bit-faithful to engine._layer_forward /
the fake-quant sim ladder (the reference's sim<->device fidelity contract,
ref export.py:433-437).

TPU-shape trick: Mosaic cannot reshape (1, N) -> (H, 64) (64-lane heads), so
for hd==64 models the qkv WEIGHT COLUMNS are permuted at pack time
(build_layer_packs) such that the flat matmul output, viewed as (N/128, 128),
splits into head-major (R, 64) with two lane-slices + sublane stores; the
o-proj weight ROWS are permuted with the inverse layout. hd % 128 == 0 models
reshape directly. All layout ops used here were compile-verified on TPU v5e.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mobilequant_tpu.ops.pallas_mlp import (
    BLOCK_META_LEN, _fq, _quant_u8s, _pick_block_fh, _w4_mlp_phase,
    w4_mlp_block_supported,
)

# meta vector layout (fp32 SMEM), head section; the MLP section
# (pallas_mlp.BLOCK_META_LEN entries, _mlp_block_meta order) follows at
# ATTN_META_LEN. Fake-quant entries are qmax-encoded (pallas_mlp._fq:
# 0 = disabled, 255/65535 = 8/16-bit clip bound).
#  0 ln1_in_scale   1 ln1_in_offset  2 ln1_in_qmax  3 norm_eps
#  4 h_scale        5 h_offset       (input_layernorm output quantize)
#  6 sq  7 oq  8 sk  9 ok  10 sv  11 ov     (qk_bmm in/in2, pv_bmm in2)
# 12 qk_out_scale  13 qk_out_offset 14 qk_out_qmax
# 15 pv_in_scale   16 pv_in_offset  17 pv_in_qmax
# 18 neg_inf
# 19 a_scale       20 a_offset      (pv_bmm output quantize)
# 21 oo_scale      22 oo_offset     23 oo_qmax     (o_proj output fq)
# 24 r1in_s 25 r1in_o 26 r1in_qmax     (resid_add_1 input fq16)
# 27 r1in2_s 28 r1in2_o 29 r1in2_qmax  (resid_add_1 input2 fq16)
# 30 r1out_s 31 r1out_o 32 r1out_qmax  (resid_add_1 output fq16)
ATTN_META_LEN = 33
LAYER_META_LEN = ATTN_META_LEN + BLOCK_META_LEN


def _fqv(x, s, o, cmax, en):
    """Per-column fake-quant with per-column clip bound + enable (covers both
    the fused per-channel 8-bit branch and the per-segment 16-bit branch of
    engine._layer_forward's qkv output fq)."""
    q = jnp.round(x / s) + o
    q = jnp.clip(q, 0.0, cmax)
    return jnp.where(en > 0.5, (q - o) * s, x)


def _layer_phase(j, m, pos_ref, cs_ref, x_get, ofq_ref,
                 anw_ref, anb_ref, qkvw_ref, qaux_ref,
                 k_ref, v_ref, ow_refs, oaux_ref,
                 mnw_ref, mnb_ref,
                 w1lo_ref, w1hi_ref, w3lo_ref, w3hi_ref, aux13_ref,
                 w2p_refs, aux2_ref,
                 out_set, kvnew_set,
                 v2_scr, qk_scr, q8_scr, p_scr, ps_scr, attn_scr, flat_scr,
                 resid_scr, h_ref, acc_ref, rsum_ref,
                 *, Hq: int, Hkv: int, hd: int, rot: int, nq: int, nh: int,
                 half_f: int, act_kind: str, norm_kind: str, perm: bool,
                 attn_splits: int = 0, wbits: int = 4, B: int = 1):
    """One decoder-layer phase: j = traced phase index within the layer.
    Phase layout: [0, nq) qkv column blocks; then attention — fused into phase
    nq when attn_splits == 0, else attn_splits scores phases followed by
    attn_splits PV phases (each over B/attn_splits sequences, o-proj in the
    last); then nh MLP phases. m(i) reads meta scalar i, x_get() the (B,K)
    fp32 residual input, out_set(y) the layer output, kvnew_set(b, rows) the
    per-sequence (2*Hkv, hd) int8 new K/V rows. Shared by the single-layer
    and whole-model kernels; B>1 unrolls the per-sequence head transform /
    attention loops (continuous batching: each sequence has its own cache
    position and RoPE row in cs_ref (B,2,hd)); the K/V cache blocks may hold
    only the current split's sequences (k_ref.shape[1] = B/attn_splits)."""
    K = h_ref.shape[1]
    K2 = K // 2
    TNq = qkvw_ref.shape[2]
    G = Hq // Hkv
    R = Hq + 2 * Hkv
    R8 = (R + 7) // 8 * 8               # per-sequence row stride (8-aligned)
    Ko = Hq * hd
    Ko2 = Ko // 2

    # ---- phases [0, nq): norm1 (once) + qkv W4 matmul column blocks --------
    @pl.when(j == 0)
    def _():
        xx = _fq(x_get(), m(0), m(1), m(2))
        if norm_kind == "layernorm":
            mu = jnp.mean(xx, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(xx - mu), axis=1, keepdims=True)
            y = (xx - mu) * jax.lax.rsqrt(var + m(3))
        else:
            y = xx * jax.lax.rsqrt(jnp.mean(xx * xx, axis=1, keepdims=True)
                                   + m(3))
        y = y * anw_ref[0] + anb_ref[0]
        h_ref[:] = _quant_u8s(y, m(4), m(5))

    @pl.when(j < nq)
    def _():
        h = h_ref[:]
        ox = m(5) - 128.0
        rowsum = jnp.sum(h.astype(jnp.int32), axis=1,
                         keepdims=True).astype(jnp.float32)
        wp = qkvw_ref[0]
        if wbits == 8:
            acc = jax.lax.dot_general(h, wp, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
        else:
            lo = wp & 0x0F
            hi = ((wp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
            acc = jax.lax.dot_general(h[:, :K2], lo, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            acc = acc + jax.lax.dot_general(h[:, K2:], hi,
                                            (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.int32)
        acc = acc.astype(jnp.float32)
        s = qaux_ref[0, 0:1, :]
        o = qaux_ref[0, 1:2, :]
        cs_ = qaux_ref[0, 2:3, :]
        b = qaux_ref[0, 3:4, :]
        yq = (acc - ox * cs_ - o * rowsum + K * ox * o) * (m(4) * s) + b
        yq = _fqv(yq, ofq_ref[0, 0:1, :], ofq_ref[0, 1:2, :],
                  ofq_ref[0, 2:3, :], ofq_ref[0, 3:4, :])
        # nq == 1 -> static start (Mosaic needs dynamic sublane starts to be
        # provably 8-aligned; _pick_block_nq keeps rows % 8 == 0 when nq > 1)
        if perm:
            rows = TNq // 128
            start = 0 if nq == 1 else j * rows
            v2_scr[:, pl.ds(start, rows), :] = yq.reshape(B, rows, 128)
        else:
            rows = TNq // hd
            start = 0 if nq == 1 else j * rows
            for bb in range(B):
                qk_scr[pl.ds(bb * R8 + start, rows), :] = \
                    yq[bb:bb + 1, :].reshape(rows, hd)

    # ---- attention phases: head transform + RoPE + quantize + scores +
    # softmax, then PV + o-proj. attn_splits=0 fuses everything into phase nq
    # (single-layer kernel); attn_splits=ns runs ns scores phases then ns PV
    # phases, each over B/ns sequences, so the batched attention compute spans
    # 2*ns weight/cache-prefetch windows (the KV slabs ride as per-split
    # blocks and stream between the sub-phases).
    def _scores_part(b_lo, b_hi):
        R2 = R // 2
        sq, oqv = m(6), m(7) - 128.0
        sk, okv = m(8), m(9) - 128.0
        neg_inf = m(18)
        inv = 1.0 / math.sqrt(hd)
        kb = k_ref.shape[1]                     # sequences per cache block
        for bb in range(b_lo, b_hi):
            if perm:
                v2 = v2_scr[bb]
                qk_scr[bb * R8:bb * R8 + R2, :] = v2[:, :hd]
                qk_scr[bb * R8 + R2:bb * R8 + R, :] = v2[:, hd:]
            qk = qk_scr[bb * R8:bb * R8 + R, :]
            # RoPE (HF rotate_half; cs_ref[b] row 0 = cos (1 outside rotary
            # dims), row 1 = sign-baked sin (0 outside rotary dims))
            if rot == hd:
                # one lane roll covers both rotate_half partners (d+rot/2 mod hd)
                partner = jnp.roll(qk, -(rot // 2), 1)
            else:
                d = jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1)
                partner = jnp.where(d < rot // 2,
                                    jnp.roll(qk, -(rot // 2), 1),
                                    jnp.roll(qk, rot // 2, 1))
            roped = qk * cs_ref[bb, 0:1, :] + partner * cs_ref[bb, 1:2, :]
            row = jax.lax.broadcasted_iota(jnp.int32, qk.shape, 0)
            xq = jnp.where(row < Hq + Hkv, roped, qk)   # v rows pass through
            # joint segment quantization: q (sq,oq), k (sk,ok), v (sv,ov) rows
            s_row = jnp.where(row < Hq, m(6),
                              jnp.where(row < Hq + Hkv, m(8), m(10)))
            o_row = jnp.where(row < Hq, m(7),
                              jnp.where(row < Hq + Hkv, m(9), m(11)))
            q8f = jnp.clip(jnp.round(xq / s_row) + o_row, 0.0, 255.0) - 128.0
            q8_scr[bb * R8:bb * R8 + R, :] = q8f
            kvnew_set(bb, q8f[Hq:R, :].astype(jnp.int8))

            pos = pos_ref[bb]
            # decode-light attention per kv head (engine._layer_forward
            # order): int scores over the STALE cache masked to < pos, plus
            # the explicit self-term for the new token
            for hkv in range(Hkv):
                r0 = bb * R8 + hkv * G
                qf = q8_scr[r0:r0 + G, :]                        # (G,hd) f32
                qg = qf.astype(jnp.int8)
                kc = k_ref[0, bb % kb, hkv]                      # (S,hd) int8
                acc = jax.lax.dot_general(qg, kc, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                acc = acc.astype(jnp.float32)                    # (G,S)
                qs = jnp.sum(qg.astype(jnp.int32), axis=1,
                             keepdims=True).astype(jnp.float32)
                ks = jnp.sum(kc.astype(jnp.int32), axis=1,
                             keepdims=True).astype(jnp.float32)
                scores = (acc - okv * qs - oqv * ks.reshape(1, -1)
                          + hd * oqv * okv) * (sq * sk)
                scores = _fq(scores, m(12), m(13), m(14))
                kn = q8_scr[bb * R8 + Hq + hkv:bb * R8 + Hq + hkv + 1, :]
                s_self = jnp.sum((qf - oqv) * (kn - okv), axis=1,
                                 keepdims=True) * (sq * sk)      # (G,1)
                s_self = _fq(s_self, m(12), m(13), m(14))
                col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
                scores = scores * inv + jnp.where(col < pos, 0.0, neg_inf)
                s_self = s_self * inv
                mx = jnp.maximum(jnp.max(scores, axis=1, keepdims=True),
                                 s_self)
                e = jnp.exp(scores - mx)
                es = jnp.exp(s_self - mx)
                den = jnp.sum(e, axis=1, keepdims=True) + es
                a0 = bb * Hq + hkv * G
                p_scr[a0:a0 + G, :] = _fq(e / den, m(15), m(16), m(17))
                ps_scr[a0:a0 + G, :] = _fq(es / den, m(15), m(16), m(17))

    def _pv_part(b_lo, b_hi):
        sv, ovv = m(10), m(11) - 128.0
        vb = v_ref.shape[1]                     # sequences per cache block
        for bb in range(b_lo, b_hi):
            for hkv in range(Hkv):
                a0 = bb * Hq + hkv * G
                p = p_scr[a0:a0 + G, :]                          # (G,S) f32
                ps = ps_scr[a0:a0 + G, :]                        # (G,1)
                vc = v_ref[0, bb % vb, hkv].astype(jnp.float32)  # (S,hd)
                pv = jax.lax.dot_general(p, vc, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                psum = jnp.sum(p, axis=1, keepdims=True)
                r0 = bb * R8 + Hq + Hkv + hkv
                vn = q8_scr[r0:r0 + 1, :]
                vnf = (vn + 128.0 - m(11)) * sv
                attn_scr[a0:a0 + G, :] = (pv - ovv * psum) * sv + ps * vnf

    def _o_part():
        # quantize attention output (pv_bmm output site) + flatten each
        # sequence's heads into its own (1, Ko) row of flat_scr: for the
        # permuted hd==64 layout a lane-concat of the two head halves gives
        # the (Hq/2, 128) view whose row-major order matches the o-pack's
        # row permutation; hd%128==0 reshapes directly
        a = attn_scr[:]
        a8f = jnp.clip(jnp.round(a / m(19)) + m(20), 0.0, 255.0) - 128.0
        Hq2 = Hq // 2
        for bb in range(B):
            ab = a8f[bb * Hq:(bb + 1) * Hq, :]                   # (Hq, hd)
            if perm:
                ab = jnp.concatenate([ab[0:Hq2], ab[Hq2:Hq]], axis=1)
            flat_scr[bb:bb + 1, :] = ab.reshape(1, Ko)
        a8 = flat_scr[:].astype(jnp.int8)
        # o pack may ride as 1 block or 2 row-split blocks (the model kernel
        # splits it so the two halves DMA during different phases): split
        # si of nsp covers packed rows [si*Ko2/nsp, ...), i.e. lo = a8 cols
        # of that range and hi = the same range shifted by Ko2
        nsp = len(ow_refs)
        oacc = jnp.zeros((B, K), jnp.int32)
        if wbits == 8:
            kq = Ko // nsp
            for si, owr in enumerate(ow_refs):
                oacc = oacc + jax.lax.dot_general(
                    a8[:, si * kq:(si + 1) * kq], owr[0],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
        else:
            kq = Ko2 // nsp
            for si, owr in enumerate(ow_refs):
                wo = owr[0]
                lo2 = wo & 0x0F
                hi2 = ((wo.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
                oacc = oacc + jax.lax.dot_general(
                    a8[:, si * kq:(si + 1) * kq], lo2,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                oacc = oacc + jax.lax.dot_general(
                    a8[:, Ko2 + si * kq:Ko2 + (si + 1) * kq], hi2,
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        oacc = oacc.astype(jnp.float32)
        rs = jnp.sum(a8.astype(jnp.int32), axis=1,
                     keepdims=True).astype(jnp.float32)
        so = oaux_ref[0, 0:1, :]
        oo = oaux_ref[0, 1:2, :]
        co = oaux_ref[0, 2:3, :]
        bo = oaux_ref[0, 3:4, :]
        oxa = m(20) - 128.0
        y = (oacc - oxa * co - oo * rs + Ko * oxa * oo) * (m(19) * so) + bo
        y = _fq(y, m(21), m(22), m(23))
        # resid_add_1: strict policy quantizes both inputs + the output
        xr = _fq(x_get(), m(24), m(25), m(26))
        y = _fq(y, m(27), m(28), m(29))
        resid_scr[:] = _fq(xr + y, m(30), m(31), m(32))

    if attn_splits == 0:                 # fused: everything in phase nq
        nqa = nq

        @pl.when(j == nq)
        def _():
            _scores_part(0, B)
            _pv_part(0, B)
            _o_part()
    else:
        bh = B // attn_splits
        nqa = nq + 2 * attn_splits - 1   # phase of the last PV (+o-proj) step
        for s_ in range(attn_splits):
            @pl.when(j == nq + s_)
            def _(s_=s_):
                _scores_part(s_ * bh, (s_ + 1) * bh)
        for s_ in range(attn_splits):
            @pl.when(j == nq + attn_splits + s_)
            def _(s_=s_):
                _pv_part(s_ * bh, (s_ + 1) * bh)
                if s_ == attn_splits - 1:
                    _o_part()

    # ---- phases (nqa, nqa+nh]: whole MLP block on the attention residual ---
    @pl.when(j > nqa)
    def _():
        _w4_mlp_phase(j - (nqa + 1), nh, lambda i: m(ATTN_META_LEN + i),
                      lambda: resid_scr[:], out_set,
                      mnw_ref, mnb_ref, w1lo_ref, w1hi_ref, w3lo_ref, w3hi_ref,
                      aux13_ref, w2p_refs, aux2_ref, acc_ref, rsum_ref, h_ref,
                      act_kind=act_kind, norm_kind=norm_kind, half_f=half_f,
                      wbits=wbits)


def _layer_kernel(idx_ref, meta_ref, pos_ref,
                  x_ref, cs_ref, ofq_ref,
                  anw_ref, anb_ref, qkvw_ref, qaux_ref,
                  k_ref, v_ref, ow_ref, oaux_ref,
                  mnw_ref, mnb_ref,
                  w1lo_ref, w1hi_ref, w3lo_ref, w3hi_ref, aux13_ref,
                  w2p_ref, w2b_ref, aux2_ref,
                  out_ref, kvnew_ref,
                  v2_scr, qk_scr, q8_scr, p_scr, ps_scr, attn_scr, flat_scr,
                  resid_scr, h_ref, acc_ref, rsum_ref, **statics):
    del idx_ref
    j = pl.program_id(0)

    def out_set(yv):
        out_ref[:] = yv

    def kvnew_set(bb, rows):
        del bb
        kvnew_ref[:] = rows

    _layer_phase(j, lambda i: meta_ref[i], pos_ref, cs_ref,
                 lambda: x_ref[:], ofq_ref,
                 anw_ref, anb_ref, qkvw_ref, qaux_ref, k_ref, v_ref,
                 (ow_ref,), oaux_ref, mnw_ref, mnb_ref,
                 w1lo_ref, w1hi_ref, w3lo_ref, w3hi_ref, aux13_ref,
                 (w2p_ref,) if statics.get("wbits", 4) == 4
                 else (w2p_ref, w2b_ref),
                 aux2_ref, out_set, kvnew_set,
                 v2_scr, qk_scr, q8_scr, p_scr, ps_scr, attn_scr, flat_scr,
                 resid_scr, h_ref, acc_ref, rsum_ref, **statics)


def _model_kernel(meta_ref, pos_ref,
                  x_ref, cs_ref, ofq_ref,
                  anw_ref, anb_ref, qkvw_ref, qaux_ref,
                  k_ref, v_ref, ow_a_ref, ow_b_ref, oaux_ref,
                  mnw_ref, mnb_ref,
                  w1lo_ref, w1hi_ref, w3lo_ref, w3hi_ref, aux13_ref,
                  w2p_ref, w2b_ref, aux2_ref,
                  *rest, num_layers: int, nv: int = 0, wbits_h: int = 4,
                  **statics):
    """Whole-MODEL decode kernel: grid = (L * P [+ nv],) flat over
    (layer, phase). The hidden state lives in x_scr across grid steps (layer
    l's final MLP phase writes it for layer l+1's norm); weight/cache blocks
    stream by layer-derived index maps, so layer l+1's first blocks prefetch
    during layer l's MLP tail — no per-layer dispatch or DMA-startup cost.
    With nv > 0 the final norm + quantized lm_head run as nv extra tail
    phases (_head_phase) and the kernel also emits the (B, Vp) logits."""
    if nv:
        (hnw_ref, hnb_ref, hwq_ref, haux_ref,
         out_ref, kvnew_ref, lout_ref,
         x_scr, v2_scr, qk_scr, q8_scr, p_scr, ps_scr, attn_scr,
         flat_scr, resid_scr, h_ref, acc_ref, rsum_ref, hs_scr) = rest
    else:
        (out_ref, kvnew_ref,
         x_scr, v2_scr, qk_scr, q8_scr, p_scr, ps_scr, attn_scr,
         flat_scr, resid_scr, h_ref, acc_ref, rsum_ref) = rest
    jj = pl.program_id(0)
    P = statics["nq"] + 2 * statics["attn_splits"] + statics["nh"]
    LP = num_layers * P
    l = jnp.minimum(jj // P, num_layers - 1)
    j = jj - l * P

    @pl.when(jj == 0)
    def _():
        x_scr[:] = x_ref[:]

    def out_set(yv):
        x_scr[:] = yv

        @pl.when(l == num_layers - 1)
        def _():
            out_ref[:] = yv

    def kvnew_set(bb, rows):
        kvnew_ref[0, bb] = rows

    def layer_body():
        _layer_phase(j, lambda i: meta_ref[l, i], pos_ref, cs_ref,
                     lambda: x_scr[:], ofq_ref,
                     anw_ref, anb_ref, qkvw_ref, qaux_ref, k_ref, v_ref,
                     (ow_a_ref, ow_b_ref), oaux_ref, mnw_ref, mnb_ref,
                     w1lo_ref, w1hi_ref, w3lo_ref, w3hi_ref, aux13_ref,
                     (w2p_ref,) if statics.get("wbits", 4) == 4
                     else (w2p_ref, w2b_ref),
                     aux2_ref, out_set, kvnew_set,
                     v2_scr, qk_scr, q8_scr, p_scr, ps_scr, attn_scr,
                     flat_scr, resid_scr, h_ref, acc_ref, rsum_ref, **statics)

    if nv == 0:
        layer_body()
    else:
        @pl.when(jj < LP)
        def _():
            layer_body()

        @pl.when(jj >= LP)
        def _():
            _head_phase(jj - LP, meta_ref[num_layers - 1, 3],
                        lambda: x_scr[:], hnw_ref, hnb_ref, hwq_ref, haux_ref,
                        lout_ref, h_ref, hs_scr,
                        norm_kind=statics["norm_kind"], wbits_h=wbits_h)


def _head_phase(hj, eps, x_get, hnw_ref, hnb_ref, hwq_ref, haux_ref,
                lout_ref, h_ref, hs_scr, *, norm_kind: str, wbits_h: int):
    """Final-norm + quantized-lm_head tail phases of the whole-model kernel
    (hj = phase index over vocab column blocks). Bit-faithful to
    engine.forward's tail: final norm (unquantized, ref qmodule.py:843-845) ->
    qops.dynamic_quantize_act (per-token symmetric A8) ->
    qops.int_head_linear (per-channel symmetric W8/W4 head — the reference's
    on-device SLinear head, sim_layers.py:34-44). Padded vocab columns have
    scale 0 => logits exactly 0 (sliced off by the caller). Folding the head
    into the model kernel removes the separate head dispatch and pipelines
    head blocks 1..nv-1 behind the head-phase compute; block 0 is fetched at
    kernel START like every operand's step-0 block (hblk maps all layer
    phases to 0), riding with layer 0's startup DMAs and staying resident."""
    K = h_ref.shape[1]
    K2 = K // 2

    @pl.when(hj == 0)
    def _():
        xf = x_get()
        if norm_kind == "layernorm":
            mu = jnp.mean(xf, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
            y = (xf - mu) * jax.lax.rsqrt(var + eps)
        else:
            y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True)
                                   + eps)
        y = y * hnw_ref[0] + hnb_ref[0]
        amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(y / scale), -127.0, 127.0)
        h_ref[:] = q.astype(jnp.int8)
        hs_scr[:, 0:1] = scale
        hs_scr[:, 1:2] = jnp.sum(q, axis=1, keepdims=True)

    h = h_ref[:]
    if wbits_h == 8:
        acc = jax.lax.dot_general(h, hwq_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
    else:
        wp = hwq_ref[:]
        lo = wp & 0x0F
        hi = ((wp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
        acc = jax.lax.dot_general(h[:, :K2], lo, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        acc = acc + jax.lax.dot_general(h[:, K2:], hi,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
    sw = haux_ref[0:1, :]
    ow = haux_ref[1:2, :]
    sx = hs_scr[:, 0:1]
    rs = hs_scr[:, 1:2]
    lout_ref[:] = (acc.astype(jnp.float32) - ow * rs) * (sx * sw)


def _pick_block_v(Kh: int, Vp: int) -> int:
    """Head vocab-block width: divides the padded vocab, multiple of 512, and
    Kh*TV <= ~4 MB per block (the measured block-width sweet spot; see
    _pick_block_n in ops/pallas_matmul.py). 0 = no valid width (unsupported)."""
    cap = (4 * 1024 * 1024) // max(Kh, 1)
    for t in range(min(cap, Vp) // 512 * 512, 511, -512):
        if Vp % t == 0:
            return t
    return 0


def head_kernel_supported(head_pack: dict, hidden_size: int) -> bool:
    """Static gate for folding the quantized head into the model kernel."""
    Kh, Vp = head_pack["wq"].shape
    if Kh not in (hidden_size, hidden_size // 2):
        return False
    return Vp % 512 == 0 and _pick_block_v(Kh, Vp) > 0


def _pick_block_nq(K2: int, Nq: int, hd: int) -> int:
    """qkv column-block width: divides Nq, per-step weight bytes K2*TNq <=
    ~3 MB (ktune pipelining rules), and — when blocked — wide enough that the
    scratch-store row offset j*(TNq/128 or TNq/hd) stays 8-row aligned (Mosaic
    requires provably aligned dynamic sublane starts). Falls back to the full
    width (static start 0)."""
    step = 8 * max(hd, 128)
    cap = (3 * 1024 * 1024) // max(K2, 1)
    for t in range(min(cap, Nq) // step * step, step - 1, -step):
        if Nq % t == 0:
            return t
    return Nq


def layer_kernel_supported(c, max_seq_len: int) -> bool:
    """Static shape gate for fused_layer_w4_stacked (see module docstring)."""
    hd = c.head_dim_
    R = c.num_heads + 2 * c.num_kv_heads
    if hd % 128 != 0 and not (hd == 64 and R % 2 == 0 and c.num_heads % 2 == 0):
        return False
    K = c.hidden_size
    Ko = c.num_heads * hd
    return (K % 256 == 0 and Ko % 512 == 0 and (R * hd) % 128 == 0
            and max_seq_len % 128 == 0 and c.rotary_dim % 2 == 0
            and c.num_heads % c.num_kv_heads == 0
            and w4_mlp_block_supported(K, c.intermediate_size))


def qkv_col_perm(Hq: int, Hkv: int, hd: int):
    """Column permutation of the fused qkv projection for hd==64: final flat
    position j holds canonical column perm[j], chosen so the (N/128, 128) view
    of the matmul output lane-splits into head-major (R, 64) rows ordered
    [q0..q_{Hq-1}, k0..k_{Hkv-1}, v0..v_{Hkv-1}]. None = identity (hd%128==0,
    direct reshape)."""
    if hd % 128 == 0:
        return None
    R = Hq + 2 * Hkv
    R2 = R // 2
    mm = np.arange(R)[:, None]
    d = np.arange(hd)[None, :]
    j = (mm % R2) * 128 + (mm // R2) * hd + d          # packed col for (m, d)
    perm = np.empty(R * hd, np.int64)
    perm[j.reshape(-1)] = np.arange(R * hd)
    return perm


def o_row_perm(Hq: int, hd: int):
    """Row permutation of the o projection matching the kernel's flattened
    attention layout for hd==64 (see qkv_col_perm). operm[p] = canonical
    contraction row (h*hd + d) feeding flat position p."""
    if hd % 128 == 0:
        return None
    Hq2 = Hq // 2
    p = np.arange(Hq * hd)
    r = p // (2 * hd)
    cc = p % (2 * hd)
    h = r + np.where(cc < hd, 0, Hq2)
    d = cc % hd
    return h * hd + d


def build_layer_packs(qkv: dict, o: dict, c):
    """Pack-time builder: (qkvp, op, seg_id) for the whole-layer kernel.

    qkvp = qkv_proj with columns permuted by qkv_col_perm (identity for
    hd%128==0 — arrays are shared, no copy); op = o_proj with contraction rows
    permuted (nibbles unpacked/reordered/repacked exactly); seg_id (Nq,) int32
    = 0/1/2 for q/k/v per PACKED column (for runtime per-segment fq vectors)."""
    from mobilequant_tpu.ops import qops
    Hq, Hkv, hd = c.num_heads, c.num_kv_heads, c.head_dim_
    perm = qkv_col_perm(Hq, Hkv, hd)
    seg = np.repeat(np.array([0] * Hq + [1] * Hkv + [2] * Hkv), hd)
    if perm is None:
        qkvp, op = qkv, o
    else:
        qkvp = {k: v[..., perm] for k, v in qkv.items()}
        seg = seg[perm]
        operm = o_row_perm(Hq, hd)
        op = dict(o)
        if o["wq"].shape[1] * 2 == Hq * hd:            # W4 nibble pack
            wq_full = qops.unpack_nibbles(o["wq"])     # (L, Ko, K), 0..15
            op["wq"] = qops.pack_nibbles(wq_full[:, operm, :])
        else:                                          # W8: plain row permute
            op["wq"] = o["wq"][:, operm, :]
    return qkvp, op, jnp.asarray(seg, jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "num_q_heads", "num_kv_heads", "head_dim", "rotary_dim", "act_kind",
    "norm_kind", "interpret"))
def fused_layer_w4_stacked(x: jax.Array, pos: jax.Array, rope_cs: jax.Array,
                           qkv_ofq: jax.Array, anw_L, anb_L, qkvsp: dict,
                           osp: dict, mnw_L, mnb_L, w13sp: dict, w2sp: dict,
                           kcache: jax.Array, vcache: jax.Array,
                           meta: jax.Array, layer_idx, *,
                           num_q_heads: int, num_kv_heads: int, head_dim: int,
                           rotary_dim: int, act_kind: str = "silu",
                           norm_kind: str = "rmsnorm", interpret: bool = False):
    """One whole decoder layer of the packed W4 engine in ONE dispatch.

    x (1,K) fp32 residual; pos (1,) int32 cache position; rope_cs (2,hd) fp32
    [cos; sign-baked sin]; qkv_ofq (4,Nq) fp32 per-column output-fq rows
    [scale, offset, clipmax, enabled]; qkvsp/osp from build_layer_packs;
    w13sp/w2sp the canonical stacked MLP packs; k/vcache (L,1,Hkv,S,hd) int8;
    meta (LAYER_META_LEN,) fp32 (engine._layer_meta).
    Returns (x_out (1,K) fp32, kv_new (2*Hkv, hd) int8 [k rows; v rows])."""
    Hq, Hkv, hd, rot = num_q_heads, num_kv_heads, head_dim, rotary_dim
    M, K = x.shape
    assert M == 1, "whole-layer kernel is a bs=1 decode path"
    L, K2w, Nq = qkvsp["wq"].shape
    wbits = 4 if K2w * 2 == K else 8
    assert K2w * 2 == K or K2w == K
    assert w13sp["wq"].shape[1] == K2w, "qkv/w13 pack bitwidths must match"
    R = Hq + 2 * Hkv
    R8 = (R + 7) // 8 * 8
    assert Nq == R * hd, (Nq, R, hd)
    S = kcache.shape[3]
    Ko = Hq * hd
    Kor = osp["wq"].shape[1]            # Ko/2 (W4 nibble) or Ko (W8)
    F2h = w2sp["wq"].shape[1]           # F/2 (W4) or F (W8)
    F = w13sp["wq"].shape[2] // 2
    half_f = F // 2
    TFh = _pick_block_fh(K, half_f)
    assert TFh, (K, F)
    nh = half_f // TFh
    TNq = _pick_block_nq(K2w, Nq, hd)
    nq = Nq // TNq
    F2 = w13sp["wq"].shape[2]
    perm = hd % 128 != 0

    def aux(spd, n):
        def rowv(v):
            return jnp.broadcast_to(jnp.reshape(v, (L, 1, -1)),
                                    (L, 1, n)).astype(jnp.float32)
        return jnp.concatenate([rowv(spd["scale"]), rowv(spd["offset"]),
                                rowv(spd["colsum"]), rowv(spd["bias"])], axis=1)

    qaux = aux(qkvsp, Nq)                        # (L, 4, Nq)
    oaux = aux(osp, K)                           # (L, 4, K)
    aux13 = aux(w13sp, F2)                       # (L, 4, 2F)
    aux2 = aux(w2sp, K)                          # (L, 4, K)
    anw3 = jnp.reshape(anw_L, (L, 1, K)).astype(jnp.float32)
    anb3 = jnp.reshape(anb_L, (L, 1, K)).astype(jnp.float32)
    mnw3 = jnp.reshape(mnw_L, (L, 1, K)).astype(jnp.float32)
    mnb3 = jnp.reshape(mnb_L, (L, 1, K)).astype(jnp.float32)
    idx = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))

    nsteps = nq + 1 + nh

    def tcl(j):
        return jnp.clip(j - (nq + 1), 0, nh - 1)

    def qcl(j):
        return jnp.minimum(j, nq - 1)

    w2blk = nh if wbits == 8 else 0     # W8: seg_hi row blocks start at nh
    kernel = functools.partial(
        _layer_kernel, Hq=Hq, Hkv=Hkv, hd=hd, rot=rot, nq=nq, nh=nh,
        half_f=half_f, act_kind=act_kind, norm_kind=norm_kind, perm=perm,
        wbits=wbits)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # pos
            pl.BlockSpec((1, K), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),                    # x
            pl.BlockSpec((1, 2, hd), lambda j, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),                    # rope cs
            pl.BlockSpec((1, 4, TNq), lambda j, i: (0, 0, qcl(j)),
                         memory_space=pltpu.VMEM),                    # qkv ofq
            pl.BlockSpec((1, 1, K), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                    # attn nw
            pl.BlockSpec((1, 1, K), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                    # attn nb
            pl.BlockSpec((1, K2w, TNq), lambda j, i: (i[0], 0, qcl(j)),
                         memory_space=pltpu.VMEM),                    # qkv pack
            pl.BlockSpec((1, 4, TNq), lambda j, i: (i[0], 0, qcl(j)),
                         memory_space=pltpu.VMEM),                    # qkv aux
            pl.BlockSpec((1, 1, Hkv, S, hd), lambda j, i: (i[0], 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),                    # k cache
            pl.BlockSpec((1, 1, Hkv, S, hd), lambda j, i: (i[0], 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),                    # v cache
            pl.BlockSpec((1, Kor, K), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                    # o pack
            pl.BlockSpec((1, 4, K), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                    # o aux
            pl.BlockSpec((1, 1, K), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                    # mlp nw
            pl.BlockSpec((1, 1, K), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                    # mlp nb
            pl.BlockSpec((1, K2w, TFh), lambda j, i: (i[0], 0, tcl(j)),
                         memory_space=pltpu.VMEM),                    # w1 lo
            pl.BlockSpec((1, K2w, TFh), lambda j, i: (i[0], 0, nh + tcl(j)),
                         memory_space=pltpu.VMEM),                    # w1 hi
            pl.BlockSpec((1, K2w, TFh), lambda j, i: (i[0], 0, 2 * nh + tcl(j)),
                         memory_space=pltpu.VMEM),                    # w3 lo
            pl.BlockSpec((1, K2w, TFh), lambda j, i: (i[0], 0, 3 * nh + tcl(j)),
                         memory_space=pltpu.VMEM),                    # w3 hi
            pl.BlockSpec((1, 4, F2), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                    # aux13
            pl.BlockSpec((1, TFh, K), lambda j, i: (i[0], tcl(j), 0),
                         memory_space=pltpu.VMEM),                    # w2 pack
            pl.BlockSpec((1, TFh if wbits == 8 else 32, K),
                         lambda j, i: (i[0], w2blk + tcl(j)
                                       if wbits == 8 else 0, 0),
                         memory_space=pltpu.VMEM),            # w2 seg_hi (W8)
            pl.BlockSpec((1, 4, K), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                    # aux2
        ],
        out_specs=[
            pl.BlockSpec((1, K), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),                    # x out
            pl.BlockSpec((2 * Hkv, hd), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),                    # k/v new
        ],
        scratch_shapes=[
            pltpu.VMEM((1, max(Nq // 128, 1), 128), jnp.float32),     # v2
            pltpu.VMEM((R8, hd), jnp.float32),                        # qk
            pltpu.VMEM((R8, hd), jnp.float32),                        # q8 (f32)
            pltpu.VMEM((Hq, S), jnp.float32),                         # probs
            pltpu.VMEM((Hq, 1), jnp.float32),                         # p_self
            pltpu.VMEM((Hq, hd), jnp.float32),                        # attn
            pltpu.VMEM((1, Ko), jnp.float32),                         # flat
            pltpu.VMEM((1, K), jnp.float32),                          # resid
            pltpu.VMEM((1, K), jnp.int8),                             # h
            pltpu.VMEM((1, K), jnp.int32),                            # mlp acc
            pltpu.VMEM((1, 1), jnp.int32),                            # mlp rsum
        ],
    )
    wbytes = K2w * Nq + Kor * K + K2w * F2 + F2h * K
    out, kvnew = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, K), jnp.float32),
                   jax.ShapeDtypeStruct((2 * Hkv, hd), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * (K * Nq + Ko * K + K * F2 + F * K + 2 * Hq * S * hd),
            bytes_accessed=wbytes + 2 * Hkv * S * hd + K * 8,
            transcendentals=Hq * S + F),
        interpret=interpret,
    )(idx, meta, pos.astype(jnp.int32), x.astype(jnp.float32),
      rope_cs.astype(jnp.float32).reshape(1, 2, hd),
      qkv_ofq.astype(jnp.float32).reshape(1, 4, Nq),
      anw3, anb3, qkvsp["wq"], qaux, kcache, vcache, osp["wq"], oaux,
      mnw3, mnb3, w13sp["wq"], w13sp["wq"], w13sp["wq"], w13sp["wq"], aux13,
      w2sp["wq"], w2sp["wq"], aux2)
    return out, kvnew


@functools.partial(jax.jit, static_argnames=(
    "num_q_heads", "num_kv_heads", "head_dim", "rotary_dim", "act_kind",
    "norm_kind", "interpret"))
def fused_model_w4_stacked(x: jax.Array, pos: jax.Array, rope_cs: jax.Array,
                           qkv_ofq_L: jax.Array, anw_L, anb_L, qkvsp: dict,
                           osp: dict, mnw_L, mnb_L, w13sp: dict, w2sp: dict,
                           kcache: jax.Array, vcache: jax.Array,
                           meta_L: jax.Array, head: dict = None,
                           hnorm_w=None, hnorm_b=None, *,
                           num_q_heads: int, num_kv_heads: int, head_dim: int,
                           rotary_dim: int, act_kind: str = "silu",
                           norm_kind: str = "rmsnorm", interpret: bool = False):
    """ALL decoder layers of the packed W4 engine in ONE dispatch (bs=1 decode).

    Same per-layer contract as fused_layer_w4_stacked, but the grid runs flat
    over (layer, phase): the hidden state is carried in VMEM scratch between
    layers, and layer l+1's weight blocks prefetch during layer l's MLP tail,
    so the per-layer dispatch + DMA-startup cost of the single-layer kernel
    disappears. Supports decode batches up to 8 — measured at B=32 the
    phase structure collapses (14.5 ms/step vs the scan path's 3.7: the
    per-phase k/v slab fetches and attention scratch dwarf the weight
    stream) — (continuous batching:
    per-sequence cache positions in pos (B,), per-sequence RoPE rows in
    rope_cs (B,2,hd)). qkv_ofq_L (L,4,Nq); meta_L (L, LAYER_META_LEN).
    Returns (x_out (B,K) fp32, kv_new (L, B, 2*Hkv, hd) int8).

    With head (an engine.pack_head dict) + hnorm_w/hnorm_b, the final norm and
    the quantized lm_head fold in as tail grid phases (_head_phase) and the
    return gains logits (B, Vp) fp32 (padded vocab columns exactly 0)."""
    Hq, Hkv, hd, rot = num_q_heads, num_kv_heads, head_dim, rotary_dim
    B, K = x.shape
    assert B <= 8, "whole-model kernel supports decode batches up to 8"
    L, K2w, Nq = qkvsp["wq"].shape
    wbits = 4 if K2w * 2 == K else 8
    assert K2w * 2 == K or K2w == K
    assert w13sp["wq"].shape[1] == K2w, "qkv/w13 pack bitwidths must match"
    R = Hq + 2 * Hkv
    R8 = (R + 7) // 8 * 8
    assert Nq == R * hd, (Nq, R, hd)
    S = kcache.shape[3]
    Ko = Hq * hd
    Kor = osp["wq"].shape[1]            # Ko/2 (W4 nibble) or Ko (W8)
    F = w13sp["wq"].shape[2] // 2
    half_f = F // 2
    TFh = _pick_block_fh(K, half_f)
    assert TFh, (K, F)
    nh = half_f // TFh
    TNq = _pick_block_nq(K2w, Nq, hd)
    nq = Nq // TNq
    F2 = w13sp["wq"].shape[2]
    perm = hd % 128 != 0

    def aux(spd, n):
        def rowv(v):
            return jnp.broadcast_to(jnp.reshape(v, (L, 1, -1)),
                                    (L, 1, n)).astype(jnp.float32)
        return jnp.concatenate([rowv(spd["scale"]), rowv(spd["offset"]),
                                rowv(spd["colsum"]), rowv(spd["bias"])], axis=1)

    qaux = aux(qkvsp, Nq)
    oaux = aux(osp, K)
    aux13 = aux(w13sp, F2)
    aux2 = aux(w2sp, K)
    anw3 = jnp.reshape(anw_L, (L, 1, K)).astype(jnp.float32)
    anb3 = jnp.reshape(anb_L, (L, 1, K)).astype(jnp.float32)
    mnw3 = jnp.reshape(mnw_L, (L, 1, K)).astype(jnp.float32)
    mnb3 = jnp.reshape(mnb_L, (L, 1, K)).astype(jnp.float32)

    # attention sub-phases: ns scores + ns PV steps; batched decode splits the
    # per-sequence attention across two extra prefetch windows per split.
    # MQTPU_MODELK_ATTN_SPLITS overrides for on-chip sweeps (must divide B).
    # Read at TRACE time — jit's cache key does not include env vars, so each
    # sweep setting needs a fresh process (bench runs are one process each).
    ns_env = os.environ.get("MQTPU_MODELK_ATTN_SPLITS")
    if ns_env:
        ns_a = int(ns_env)
        assert B % ns_a == 0, (B, ns_a)
    else:
        ns_a = 2 if (B >= 4 and B % 2 == 0) else 1
    P = nq + 2 * ns_a + nh   # qkv cols | scores xns | PV xns (+o) | MLP
    Lm1 = L - 1              # layer index maps clamp here during head phases

    # folded final-norm + quantized-head tail phases
    nv = 0
    wbits_h = 4
    if head is not None:
        Kh, Vp = head["wq"].shape
        wbits_h = 8 if Kh == K else 4
        assert Kh in (K, K // 2), (Kh, K)
        TV = _pick_block_v(Kh, Vp)
        assert TV and Vp % TV == 0, (Kh, Vp)
        nv = Vp // TV
        haux = jnp.concatenate(
            [jnp.reshape(head["scale"], (1, Vp)),
             jnp.reshape(head["offset"], (1, Vp))], axis=0).astype(jnp.float32)
        hnw = jnp.reshape(hnorm_w, (1, K)).astype(jnp.float32)
        hnb = jnp.reshape(hnorm_b, (1, K)).astype(jnp.float32)

    def lyr(j):
        return jnp.minimum(j // P, Lm1)

    def ph(j):
        return j - lyr(j) * P

    def qcl(j):
        return jnp.minimum(ph(j), nq - 1)

    # fetch staggering (each index-map change triggers the DMA one grid step
    # earlier): without it ~7 MB of layer l's blocks all fetch during layer
    # l-1's LAST MLP phase (~2.5 us of compute) and stall the stream. The o
    # pack rides as TWO row-split blocks and the K/V slabs are offset so the
    # boundary load spreads over the qkv phases; w13/w2 block 0 fetches during
    # the attention phase (the longest-compute step).
    def d_lyr(j, delay):
        return jnp.minimum(jnp.maximum(j - delay, 0) // P, Lm1)

    def mlu(j):
        return jnp.maximum(j - (nq + 2 * ns_a), 0)

    def mlw(j):
        return jnp.minimum(mlu(j) // P, Lm1)

    def mlt(j):
        return jnp.clip(mlu(j) - mlw(j) * P, 0, nh - 1)

    w2blk = nh if wbits == 8 else 0     # W8: seg_hi row blocks start at nh
    Bh = B // ns_a

    def l_k(j):
        return jnp.minimum(jnp.maximum(j - (nq - 1), 0) // P, Lm1)

    def s_k(j):
        return jnp.clip(j - l_k(j) * P - nq, 0, ns_a - 1)

    def l_v(j):
        return jnp.minimum(jnp.maximum(j - (nq + ns_a - 1), 0) // P, Lm1)

    def s_v(j):
        return jnp.clip(j - l_v(j) * P - (nq + ns_a), 0, ns_a - 1)

    def hblk(j):
        return jnp.clip(j - L * P, 0, max(nv - 1, 0))

    kernel = functools.partial(
        _model_kernel, num_layers=L, nv=nv, wbits_h=wbits_h, Hq=Hq, Hkv=Hkv,
        hd=hd, rot=rot, nq=nq, nh=nh, half_f=half_f, act_kind=act_kind,
        norm_kind=norm_kind, perm=perm, wbits=wbits, B=B, attn_splits=ns_a)
    wbytes = L * (K2w * Nq + Kor * K + K2w * F2 + w2sp["wq"].shape[1] * K)
    in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # meta_L
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # pos
            pl.BlockSpec((B, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),                    # x
            pl.BlockSpec((B, 2, hd), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),                    # rope cs
            pl.BlockSpec((1, 4, TNq), lambda j: (lyr(j), 0, qcl(j)),
                         memory_space=pltpu.VMEM),                    # qkv ofq
            pl.BlockSpec((1, 1, K), lambda j: (lyr(j), 0, 0),
                         memory_space=pltpu.VMEM),                    # attn nw
            pl.BlockSpec((1, 1, K), lambda j: (lyr(j), 0, 0),
                         memory_space=pltpu.VMEM),                    # attn nb
            pl.BlockSpec((1, K2w, TNq), lambda j: (lyr(j), 0, qcl(j)),
                         memory_space=pltpu.VMEM),                    # qkv pack
            pl.BlockSpec((1, 4, TNq), lambda j: (lyr(j), 0, qcl(j)),
                         memory_space=pltpu.VMEM),                    # qkv aux
            pl.BlockSpec((1, Bh, Hkv, S, hd),
                         lambda j: (l_k(j), s_k(j), 0, 0, 0),
                         memory_space=pltpu.VMEM),                    # k cache
            pl.BlockSpec((1, Bh, Hkv, S, hd),
                         lambda j: (l_v(j), s_v(j), 0, 0, 0),
                         memory_space=pltpu.VMEM),                    # v cache
            pl.BlockSpec((1, Kor // 2, K),
                         lambda j: (d_lyr(j, nq + ns_a - 1), 0, 0),
                         memory_space=pltpu.VMEM),                    # o pack a
            pl.BlockSpec((1, Kor // 2, K),
                         lambda j: (d_lyr(j, nq + ns_a), 1, 0),
                         memory_space=pltpu.VMEM),                    # o pack b
            pl.BlockSpec((1, 4, K), lambda j: (lyr(j), 0, 0),
                         memory_space=pltpu.VMEM),                    # o aux
            pl.BlockSpec((1, 1, K), lambda j: (lyr(j), 0, 0),
                         memory_space=pltpu.VMEM),                    # mlp nw
            pl.BlockSpec((1, 1, K), lambda j: (lyr(j), 0, 0),
                         memory_space=pltpu.VMEM),                    # mlp nb
            pl.BlockSpec((1, K2w, TFh), lambda j: (mlw(j), 0, mlt(j)),
                         memory_space=pltpu.VMEM),                    # w1 lo
            pl.BlockSpec((1, K2w, TFh), lambda j: (mlw(j), 0, nh + mlt(j)),
                         memory_space=pltpu.VMEM),                    # w1 hi
            pl.BlockSpec((1, K2w, TFh),
                         lambda j: (mlw(j), 0, 2 * nh + mlt(j)),
                         memory_space=pltpu.VMEM),                    # w3 lo
            pl.BlockSpec((1, K2w, TFh),
                         lambda j: (mlw(j), 0, 3 * nh + mlt(j)),
                         memory_space=pltpu.VMEM),                    # w3 hi
            pl.BlockSpec((1, 4, F2), lambda j: (lyr(j), 0, 0),
                         memory_space=pltpu.VMEM),                    # aux13
            pl.BlockSpec((1, TFh, K), lambda j: (mlw(j), mlt(j), 0),
                         memory_space=pltpu.VMEM),                    # w2 pack
            pl.BlockSpec((1, TFh if wbits == 8 else 32, K),
                         lambda j: (mlw(j), w2blk + mlt(j)
                                    if wbits == 8 else 0, 0),
                         memory_space=pltpu.VMEM),            # w2 seg_hi (W8)
            pl.BlockSpec((1, 4, K), lambda j: (lyr(j), 0, 0),
                         memory_space=pltpu.VMEM),                    # aux2
    ]
    out_specs = [
        pl.BlockSpec((B, K), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),                        # x out
        pl.BlockSpec((1, B, 2 * Hkv, hd), lambda j: (lyr(j), 0, 0, 0),
                     memory_space=pltpu.VMEM),                        # k/v new
    ]
    out_shape = [jax.ShapeDtypeStruct((B, K), jnp.float32),
                 jax.ShapeDtypeStruct((L, B, 2 * Hkv, hd), jnp.int8)]
    scratch_shapes = [
        pltpu.VMEM((B, K), jnp.float32),                              # x carry
        pltpu.VMEM((B, max(Nq // 128, 1), 128), jnp.float32),         # v2
        pltpu.VMEM((B * R8, hd), jnp.float32),                        # qk
        pltpu.VMEM((B * R8, hd), jnp.float32),                        # q8 (f32)
        pltpu.VMEM((B * Hq, S), jnp.float32),                         # probs
        pltpu.VMEM((B * Hq, 1), jnp.float32),                         # p_self
        pltpu.VMEM((B * Hq, hd), jnp.float32),                        # attn
        pltpu.VMEM((B, Ko), jnp.float32),                             # flat
        pltpu.VMEM((B, K), jnp.float32),                              # resid
        pltpu.VMEM((B, K), jnp.int8),                                 # h
        pltpu.VMEM((B, K), jnp.int32),                                # mlp acc
        pltpu.VMEM((B, 1), jnp.int32),                                # mlp rsum
    ]
    args = [meta_L.astype(jnp.float32), pos.astype(jnp.int32),
            x.astype(jnp.float32), rope_cs.astype(jnp.float32),
            qkv_ofq_L.astype(jnp.float32),
            anw3, anb3, qkvsp["wq"], qaux, kcache, vcache, osp["wq"],
            osp["wq"], oaux, mnw3, mnb3, w13sp["wq"], w13sp["wq"],
            w13sp["wq"], w13sp["wq"], aux13, w2sp["wq"], w2sp["wq"], aux2]
    hbytes = 0
    if nv:
        in_specs += [
            pl.BlockSpec((1, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),                    # final nw
            pl.BlockSpec((1, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),                    # final nb
            pl.BlockSpec((Kh, TV), lambda j: (0, hblk(j)),
                         memory_space=pltpu.VMEM),                    # head pack
            pl.BlockSpec((2, TV), lambda j: (0, hblk(j)),
                         memory_space=pltpu.VMEM),                    # head aux
        ]
        out_specs.append(pl.BlockSpec((B, TV), lambda j: (0, hblk(j)),
                                      memory_space=pltpu.VMEM))       # logits
        out_shape.append(jax.ShapeDtypeStruct((B, Vp), jnp.float32))
        scratch_shapes.append(pltpu.VMEM((B, 2), jnp.float32))  # sx | rowsum
        args += [hnw, hnb, head["wq"], haux]
        hbytes = Kh * Vp + B * Vp * 4
    res = pl.pallas_call(
        kernel,
        grid=(L * P + nv,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * (K * Nq + Ko * K + K * F2 + F * K + 2 * Hq * S * hd)
            + (2 * B * K * (Vp if nv else 0)),
            bytes_accessed=wbytes + L * 2 * Hkv * S * hd + hbytes,
            transcendentals=L * (Hq * S + F)),
        interpret=interpret,
    )(*args)
    return res if nv else (res[0], res[1])
