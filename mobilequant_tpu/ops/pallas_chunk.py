"""Batched whole-model decode megakernel (serving batches, chunked staging).

ONE Pallas dispatch runs ALL decoder layers of the packed integer engine for a
B=16..128 decode step on the chunked-staging path (engine.decode_loop):

  norm1 -> qkv matmul -> per-column output fq -> RoPE -> segment quant ->
  decode-light attention over [stale int8 KV cache | staged chunk columns |
  self term] -> o-proj -> resid_add_1 -> whole MLP block   (x L layers)
  [-> final norm -> quantized lm_head tail phases]

This is the round-3 verdict's "whole-chunk kernel" lever: at bs=32-128 the
staged XLA path sits at 57-64% of its HBM floor purely on per-fusion
scheduling gaps and small-op tails (BENCHMARKS.md round 3); fusing the whole
step into one grid removes every XLA fusion boundary while streaming the same
weight/KV bytes. Differences vs ops/pallas_layer.fused_model_w4_stacked
(the bs<=8 kernel):

  - attention phases are blocked over the BATCH (a few sequences' whole-S
    K/V slabs per phase, ~1-2 MB tiles), each (sequence, kv-head) processed
    as one wide full-row dot + partwise softmax entirely in registers — the
    whole-batch slab fetches that collapsed the bs=32 phase pipeline in
    round 2 never happen, and there is no per-iteration running-softmax
    state (a first S-blocked online-softmax design measured 140 us/layer of
    small-op overhead — 4x the KV stream time);
  - the staged chunk columns (StagedKVCache.sk/sv) join as an extra masked
    score part, so the kernel drops into decode_loop's chunked-staging path
    unchanged (big caches stay read-only within a chunk);
  - the head transform / RoPE / segment quantization are fully vectorized
    over the batch in 3-D (B, R, hd) layout — no per-sequence unrolling, so
    the kernel compiles at B=128 as fast as at B=16;
  - per-sequence work that cannot vectorize (attention dots, o-proj head
    flatten) runs under lax.fori_loop with only 3-D leading-dim indexing
    (no dynamic sublane starts), which Mosaic accepts at any batch.

EXACTNESS CONTRACT: bit-faithful to engine._decode_light_attention for BOTH
policies — each (sequence, kv-head) row's softmax runs over the full
[cache | staged | self] parts with the same shared-max partwise math, so
the 16-bit qk_bmm.output and pv_bmm.input fake quants apply exactly where
the XLA path applies them (static trace-time flags skip their VPU cost
when the relaxed policy disables them).
Reference roles: the per-token QNN graph-execute loop this replaces
(/root/reference/capp/src/llm.cpp:545-648) and the sim<->device fidelity
ritual (/root/reference/device/export.py:433-437).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mobilequant_tpu.ops.pallas_mlp import (
    _fq, _quant_u8s, _w4_mlp_phase,
)
from mobilequant_tpu.ops.pallas_layer import (
    ATTN_META_LEN, _fqv, _head_phase, _pick_block_nq, _pick_block_v,
)


def _pick_block_fh_chunk(K: int, half_f: int, wbits: int = 4) -> int:
    """MLP F-segment width for the CHUNK kernel: as FEW, LARGE phases as VMEM
    allows (each grid step costs ~1.2 us of fixed overhead x 22 layers — the
    all-compute-stubbed skeleton measured 0.5 ms over the DMA floor at the
    shared picker's nh=11). Largest 128-multiple dividing F/2 with per-phase
    weight bytes <= ~20 MB (double-buffered blocks stay well under the
    100 MB VMEM limit)."""
    per_tfh = 3 * K if wbits == 4 else 6 * K
    cap_mb = int(os.environ.get("MQTPU_CHUNK_MLPMB", "20"))
    cap = (cap_mb * 1024 * 1024) // per_tfh
    for t in range(min(cap, half_f) // 128 * 128, 127, -128):
        if half_f % t == 0:
            return t
    from mobilequant_tpu.ops.pallas_mlp import _pick_block_fh
    return _pick_block_fh(K, half_f, wbits)


def _pick_attn_bblk(B: int, Hkv: int, S: int, hd: int,
                    target: int = 2 * 1024 * 1024) -> int:
    """Batch tile: K/V cache tile = (Bblk, Hkv, S, hd) int8 <= ~target bytes,
    Bblk dividing B — whole-S slabs per sequence (full-row softmax in one
    phase), a few sequences per phase so the fetches pipeline."""
    per_seq = Hkv * S * hd
    for Bblk in [d for d in range(B, 0, -1) if B % d == 0]:
        if Bblk * per_seq <= target:
            return Bblk
    return 1


def chunk_kernel_supported(c, max_seq_len: int, B: int) -> bool:
    """Static shape gate for fused_model_w4_chunk. B > 8 matches the engine's
    staging-extras gate (engine.forward only hands the kernel its cache/rope
    extras when staging is active and B > 8) — admitting B == 8 here would
    make bench_batch --chunk silently measure the XLA fallback at bs=8."""
    from mobilequant_tpu.ops.pallas_layer import layer_kernel_supported
    per_seq = c.num_kv_heads * max_seq_len * c.head_dim_
    return (8 < B <= 128 and B % 8 == 0
            and per_seq <= 4 * 1024 * 1024
            and layer_kernel_supported(c, max_seq_len))


def _pick_tc(half_f: int) -> int:
    """In-phase MLP compute-tile width: registers stay small regardless of the
    DMA block size (the whole half_f streams as ONE block per quarter; at
    TFh=half_f=2816 the monolithic _w4_mlp_phase body measured ~50 us/layer
    of spill traffic at B=32)."""
    for t in (512, 384, 256, 128):
        if half_f % t == 0:
            return t
    return half_f


def _chunk_mlp_phase(m, x_get, out_set, nw_ref, nb_ref,
                     w1lo_ref, w1hi_ref, w3lo_ref, w3hi_ref, aux13_ref,
                     w2p_refs, aux2_ref, acc_ref, rsum_ref, h_ref,
                     *, act_kind: str, norm_kind: str, half_f: int,
                     wbits: int, site_on: tuple = (True,) * 9):
    """Whole-MLP-block body for the chunk kernel's single MLP phase: the four
    w13 quarters + w2 arrive as FULL half_f-wide blocks (5 DMAs/layer), and
    the compute loops over _pick_tc-wide f-chunks so the (B, tc) gate-chain
    intermediates stay in registers. Same math as pallas_mlp._w4_mlp_phase
    (one fused norm->w13->act->w2->residual block).

    site_on: STATIC enables for the 9 optional fake-quant sites in
    _w4_mlp_phase order (x16, w1out, sig, actout, w3out, w2out, resid_in,
    resid_in2, resid_out) — the relaxed serving policy disables 5 of them,
    and skipping them at trace time saves the dead full-width VPU chains
    (the meta qmax=0 convention alone still computes and discards them)."""
    M, K = h_ref.shape
    K2 = K // 2
    tc = _pick_tc(half_f)
    F = 2 * half_f
    s_x16, s_w1, s_sig, s_act, s_w3, s_w2o, s_r1, s_r2, s_ro = site_on

    def fq_on(xv, i0, on):
        return _fq(xv, m(i0), m(i0 + 1), m(i0 + 2)) if on else xv

    x = fq_on(x_get(), 16, s_x16)
    if norm_kind == "layernorm":
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + m(19))
    else:
        y = x * jax.lax.rsqrt(jnp.mean(x * x, axis=1, keepdims=True) + m(19))
    y = y * nw_ref[0] + nb_ref[0]
    h8 = _quant_u8s(y, m(0), m(1))
    h_ref[:] = h8
    ox_h = m(1) - 128.0
    rowsum_h = jnp.sum(h8.astype(jnp.int32), axis=1,
                       keepdims=True).astype(jnp.float32)
    h_lo, h_hi = h8[:, :K2], h8[:, K2:]

    def w4_mm(wref, c0, a0):
        """f-chunk matmul: wref (1, K2w, half_f) quarter block, cols
        [c0, c0+tc); a0 = this chunk's column offset into aux13 (4, 2F)."""
        if wbits == 8:
            acc = jax.lax.dot_general(
                h8, wref[0][:, c0:c0 + tc], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            wp = wref[0][:, c0:c0 + tc]
            lo = wp & 0x0F
            hi = ((wp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
            acc = jax.lax.dot_general(h_lo, lo, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            acc = acc + jax.lax.dot_general(h_hi, hi, (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.int32)
        acc = acc.astype(jnp.float32)
        sc = aux13_ref[0, 0:1, pl.ds(a0, tc)]
        o = aux13_ref[0, 1:2, pl.ds(a0, tc)]
        cs = aux13_ref[0, 2:3, pl.ds(a0, tc)]
        b = aux13_ref[0, 3:4, pl.ds(a0, tc)]
        acc = acc - ox_h * cs - o * rowsum_h + K * ox_h * o
        return acc * (m(0) * sc) + b

    def gate(g1, g3):
        g1 = fq_on(g1, 2, s_w1)
        if act_kind == "silu":
            sig = 1.0 / (1.0 + jnp.exp(-g1))
            sig = fq_on(sig, 5, s_sig)
            act = g1 * sig
        else:
            t_ = 0.7978845608028654 * (g1 + 0.044715 * g1 * g1 * g1)
            act = 0.5 * g1 * (1.0 + jnp.tanh(t_))
        act = fq_on(act, 8, s_act)
        g3 = fq_on(g3, 11, s_w3)
        return act * g3

    for t in range(half_f // tc):
        c0 = t * tc
        act_lo = gate(w4_mm(w1lo_ref, c0, c0),
                      w4_mm(w3lo_ref, c0, F + c0))
        act_hi = gate(w4_mm(w1hi_ref, c0, half_f + c0),
                      w4_mm(w3hi_ref, c0, F + half_f + c0))
        g8_lo = _quant_u8s(act_lo, m(14), m(15))
        g8_hi = _quant_u8s(act_hi, m(14), m(15))
        if wbits == 8:
            part = jax.lax.dot_general(
                g8_lo, w2p_refs[0][0][c0:c0 + tc], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            part = part + jax.lax.dot_general(
                g8_hi, w2p_refs[1][0][c0:c0 + tc], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            w2p = w2p_refs[0][0][c0:c0 + tc]
            lo2 = w2p & 0x0F
            hi2 = ((w2p.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
            part = jax.lax.dot_general(
                g8_lo, lo2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            part = part + jax.lax.dot_general(
                g8_hi, hi2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        rs_part = (jnp.sum(g8_lo.astype(jnp.int32), axis=1, keepdims=True)
                   + jnp.sum(g8_hi.astype(jnp.int32), axis=1, keepdims=True))
        if t == 0:
            acc_ref[:] = part
            rsum_ref[:] = rs_part
        else:
            acc_ref[:] = acc_ref[:] + part
            rsum_ref[:] = rsum_ref[:] + rs_part

    ox2 = m(15) - 128.0
    s2 = aux2_ref[0, 0:1, :]
    o2 = aux2_ref[0, 1:2, :]
    c2 = aux2_ref[0, 2:3, :]
    b2 = aux2_ref[0, 3:4, :]
    yv = acc_ref[:].astype(jnp.float32)
    yv = (yv - ox2 * c2 - o2 * rsum_ref[:].astype(jnp.float32)
          + F * ox2 * o2) * (m(14) * s2) + b2
    yv = fq_on(yv, 20, s_w2o)
    xr = fq_on(x_get(), 23, s_r1)
    yv = fq_on(yv, 26, s_r2)
    out_set(fq_on(xr + yv, 29, s_ro))


def _chunk_kernel(meta_ref, pos_ref, mst_ref,
                  x_ref, cs_ref, ofq_ref,
                  anw_ref, anb_ref, qkvw_ref, qaux_ref,
                  k_ref, v_ref, kcs_ref, sk_ref, sv_ref, ow_ref, oaux_ref,
                  mnw_ref, mnb_ref,
                  w1lo_ref, w1hi_ref, w3lo_ref, w3hi_ref, aux13_ref,
                  w2p_ref, w2b_ref, aux2_ref,
                  *rest, num_layers: int, nv: int, wbits_h: int,
                  Hq: int, Hkv: int, hd: int, rot: int, nq: int, nh: int,
                  nab: int, Bblk: int,
                  half_f: int, act_kind: str, norm_kind: str, perm: bool,
                  wbits: int, B: int, qk_fq_on: bool, pv_fq_on: bool,
                  site_on: tuple = (True,) * 9, dbg: str = ""):
    if nv:
        (hnw_ref, hnb_ref, hwq_ref, haux_ref,
         out_ref, kvnew_ref, lout_ref,
         x_scr, v2_scr, q8_scr, qsum_scr, macc_scr,
         flat_scr, resid_scr, h_ref, acc_ref, rsum_ref, hs_scr) = rest
    else:
        (out_ref, kvnew_ref,
         x_scr, v2_scr, q8_scr, qsum_scr, macc_scr,
         flat_scr, resid_scr, h_ref, acc_ref, rsum_ref) = rest

    K = h_ref.shape[1]
    K2 = K // 2
    TNq = qkvw_ref.shape[2]
    G = Hq // Hkv
    R = Hq + 2 * Hkv
    Ko = Hq * hd
    Ko2 = Ko // 2
    Hq2 = Hq // 2
    cs_staged = sk_ref.shape[3]
    S_c = k_ref.shape[3]
    inv = 1.0 / math.sqrt(hd)

    jj = pl.program_id(0)
    P = nq + 1 + nab + 1 + nh
    LP = num_layers * P
    l = jnp.minimum(jj // P, num_layers - 1)
    j = jj - l * P

    def m(i):
        return meta_ref[l, i]

    @pl.when(jj == 0)
    def _():
        x_scr[:] = x_ref[:]

    # ---- phases [0, nq): norm1 (once) + qkv matmul column blocks -----------
    @pl.when(j == 0)
    def _():
        xx = _fq(x_scr[:], m(0), m(1), m(2))
        if norm_kind == "layernorm":
            mu = jnp.mean(xx, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(xx - mu), axis=1, keepdims=True)
            y = (xx - mu) * jax.lax.rsqrt(var + m(3))
        else:
            y = xx * jax.lax.rsqrt(jnp.mean(xx * xx, axis=1, keepdims=True)
                                   + m(3))
        y = y * anw_ref[0] + anb_ref[0]
        h_ref[:] = _quant_u8s(y, m(4), m(5))

    @pl.when(jnp.logical_and(j < nq, jnp.bool_("noqkvc" not in dbg)))
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
        if perm:
            rows = TNq // 128
            start = 0 if nq == 1 else j * rows
            v2_scr[:, pl.ds(start, rows), :] = yq.reshape(B, rows, 128)
        else:
            rows = TNq // hd
            start = 0 if nq == 1 else j * rows
            v2_scr[:, pl.ds(start, rows), :] = yq.reshape(B, rows, hd)

    # ---- phase nq: head transform + RoPE + segment quant (vectorized) ------
    @pl.when(jnp.logical_and(j == nq, jnp.bool_("noprep" not in dbg)))
    def _():
        if perm:
            # lane-split the (B, R/2, 128) matmul view into head-major
            # (B, R, hd) rows THROUGH the q8 scratch: a register concat of
            # two lane-slices is illegal in Mosaic (offset mismatch on the
            # non-concat dim), a store/load pair normalizes the layouts
            v2 = v2_scr[:]                         # (B, R/2, 128)
            R2h = R // 2
            q8_scr[:, :R2h, :] = v2[:, :, :hd]
            q8_scr[:, R2h:, :] = v2[:, :, hd:]
            qk3 = q8_scr[:]
        else:
            qk3 = v2_scr[:]                        # (B, R, hd)
        if rot == hd:
            partner = jnp.roll(qk3, -(rot // 2), 2)
        else:
            d = jax.lax.broadcasted_iota(jnp.int32, qk3.shape, 2)
            partner = jnp.where(d < rot // 2,
                                jnp.roll(qk3, -(rot // 2), 2),
                                jnp.roll(qk3, rot // 2, 2))
        cosr = cs_ref[:, 0:1, :]
        sinr = cs_ref[:, 1:2, :]
        roped = qk3 * cosr + partner * sinr
        row = jax.lax.broadcasted_iota(jnp.int32, qk3.shape, 1)
        xq = jnp.where(row < Hq + Hkv, roped, qk3)     # v rows pass through
        s_row = jnp.where(row < Hq, m(6),
                          jnp.where(row < Hq + Hkv, m(8), m(10)))
        o_row = jnp.where(row < Hq, m(7),
                          jnp.where(row < Hq + Hkv, m(9), m(11)))
        q8f = jnp.clip(jnp.round(xq / s_row) + o_row, 0.0, 255.0) - 128.0
        q8_scr[:] = q8f
        kvnew_ref[0] = q8f[:, Hq:R, :].astype(jnp.int8)
        qsum_scr[:] = jnp.sum(q8f[:, :Hq, :], axis=2, keepdims=True)

    # ---- phases (nq, nq+nab]: full-row attention, a batch tile per phase ---
    @pl.when(jnp.logical_and(j > nq, j <= nq + nab)
             if "noattn" not in dbg else jnp.bool_(False))
    def _():
        a = j - (nq + 1)
        bbl0 = a * Bblk
        sq, oqv = m(6), m(7) - 128.0
        skk, okv = m(8), m(9) - 128.0
        sv, ovv = m(10), m(11) - 128.0
        neg_inf = m(18)
        mst = mst_ref[0]

        # cf folds the sqrt(hd) into the score scale when no qk fq sits
        # between them (relaxed); with qk_fq_on the fq must see raw scores
        cf = (sq * skk) if qk_fq_on else (sq * skk * inv)

        def seq_blk(bb, _):
            gb = bbl0 + bb
            pos_b = pos_ref[gb]
            # per-sequence causal masks, hoisted out of the kv-head loop
            col = jax.lax.broadcasted_iota(jnp.int32, (1, S_c), 1)
            mask_c = jnp.where(col < pos_b, 0.0, neg_inf)
            col2 = jax.lax.broadcasted_iota(jnp.int32, (1, cs_staged), 1)
            mask_st = jnp.where(col2 < mst, 0.0, neg_inf)
            for hkv in range(Hkv):
                sl = hkv * G
                qf = q8_scr[gb, sl:sl + G, :]              # (G, hd) f32
                qi = qf.astype(jnp.int8)
                qs = qsum_scr[gb, sl:sl + G, :]            # (G, 1)

                def part_scores(kpart, ksT):               # (n,hd) i8, (1,n)
                    accp = jax.lax.dot_general(
                        qi, kpart, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32).astype(jnp.float32)
                    sc = (accp - okv * qs - oqv * ksT
                          + hd * oqv * okv) * cf
                    if qk_fq_on:
                        sc = _fq(sc, m(12), m(13), m(14)) * inv
                    return sc

                # cache part: chunk-constant K colsums ride as a host-side
                # input in (1, n) layout — no in-kernel colsum or transpose
                lg_c = part_scores(k_ref[0, bb, hkv],
                                   kcs_ref[0, gb, hkv]) + mask_c
                kst = sk_ref[0, gb, hkv]                   # (cs, hd) i8
                kss = jnp.sum(kst.astype(jnp.int32), axis=1,
                              keepdims=True).astype(jnp.float32)
                lg_st = part_scores(kst, kss.reshape(1, -1)) + mask_st
                # self term on the step's own K row (still f32 in q8_scr)
                kn = q8_scr[gb, Hq + hkv:Hq + hkv + 1, :]  # (1, hd)
                s_self = jnp.sum((qf - oqv) * (kn - okv), axis=1,
                                 keepdims=True) * (sq * skk)
                if qk_fq_on:
                    s_self = _fq(s_self, m(12), m(13), m(14))
                lg_self = s_self * inv                     # (G, 1)

                # partwise softmax: shared max, per-part exp, shared denom
                # (engine._decode_light_attention order exactly)
                mx = jnp.maximum(jnp.max(lg_c, axis=1, keepdims=True),
                                 lg_self)
                mx = jnp.maximum(mx, jnp.max(lg_st, axis=1, keepdims=True))
                e_c = jnp.exp(lg_c - mx)
                e_self = jnp.exp(lg_self - mx)
                e_st = jnp.exp(lg_st - mx)
                den = (jnp.sum(e_c, axis=1, keepdims=True) + e_self) \
                    + jnp.sum(e_st, axis=1, keepdims=True)

                vc = v_ref[0, bb, hkv].astype(jnp.float32)
                vst = sv_ref[0, gb, hkv].astype(jnp.float32)
                vn = q8_scr[gb, Hq + Hkv + hkv:Hq + Hkv + hkv + 1, :]
                if pv_fq_on:
                    # strict: the 16-bit fq applies to the normalized probs
                    def pvfq(x):
                        return _fq(x, m(15), m(16), m(17))

                    p_c = pvfq(e_c / den)
                    p_self = pvfq(e_self / den)
                    p_st = pvfq(e_st / den)
                    pv = jax.lax.dot_general(
                        p_c, vc, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    att = (pv - ovv * jnp.sum(p_c, axis=1,
                                              keepdims=True)) * sv
                    pv2 = jax.lax.dot_general(
                        p_st, vst, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    att = att + (pv2 - ovv * jnp.sum(p_st, axis=1,
                                                     keepdims=True)) * sv
                    att = att + p_self * ((vn + 128.0 - m(11)) * sv)
                else:
                    # relaxed: accumulate UNNORMALIZED (A = sum e*v), divide
                    # once — sum(e)/den == 1 exactly absorbs every zero-point
                    # correction: att = sv*(A/den - ovv)
                    A = jax.lax.dot_general(
                        e_c, vc, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    A = A + jax.lax.dot_general(
                        e_st, vst, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    A = A + e_self * vn
                    att = (A / den - ovv) * sv
                # pv_bmm output quantize (the o_proj input quantizer)
                macc_scr[gb, sl:sl + G, :] = jnp.clip(
                    jnp.round(att / m(19)) + m(20), 0.0, 255.0) - 128.0
            return 0

        jax.lax.fori_loop(0, Bblk, seq_blk, 0, unroll=False)

    # ---- phase nq+nab+1: flatten attention heads + o-proj + resid_add_1 ----
    @pl.when(jnp.logical_and(j == nq + nab + 1,
                             jnp.bool_("noflat" not in dbg)))
    def _():
        def flat8(g, _):
            g0 = pl.multiple_of(g * 8, 8)
            rows = []
            for i in range(8):
                ab = macc_scr[g0 + i]                      # (Hq, hd)
                if perm:
                    ab = jnp.concatenate([ab[0:Hq2], ab[Hq2:Hq]], axis=1)
                rows.append(ab.reshape(1, Ko))
            flat_scr[pl.ds(g0, 8), :] = jnp.concatenate(rows, axis=0)
            return 0

        jax.lax.fori_loop(0, B // 8, flat8, 0, unroll=False)

        a8 = flat_scr[:].astype(jnp.int8)
        if wbits == 8:
            oacc = jax.lax.dot_general(
                a8, ow_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            wo = ow_ref[0]
            lo2 = wo & 0x0F
            hi2 = ((wo.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
            oacc = jax.lax.dot_general(
                a8[:, :Ko2], lo2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            oacc = oacc + jax.lax.dot_general(
                a8[:, Ko2:], hi2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
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
        xr = _fq(x_scr[:], m(24), m(25), m(26))
        y = _fq(y, m(27), m(28), m(29))
        resid_scr[:] = _fq(xr + y, m(30), m(31), m(32))

    # ---- phases (nq+nab+1, nq+nab+1+nh]: whole MLP block -------------------
    nqa = nq + nab + 1

    def out_set(yv):
        x_scr[:] = yv

        @pl.when(l == num_layers - 1)
        def _():
            out_ref[:] = yv

    @pl.when(jnp.logical_and(jnp.logical_and(j > nqa, jj < LP),
                              jnp.bool_("nomlpc" not in dbg)))
    def _():
        if nh == 1:
            # single MLP phase: full-width DMA blocks, tc-wide compute chunks
            _chunk_mlp_phase(lambda i: m(ATTN_META_LEN + i),
                             lambda: resid_scr[:], out_set,
                             mnw_ref, mnb_ref,
                             w1lo_ref, w1hi_ref, w3lo_ref, w3hi_ref,
                             aux13_ref,
                             (w2p_ref,) if wbits == 4
                             else (w2p_ref, w2b_ref),
                             aux2_ref, acc_ref, rsum_ref, h_ref,
                             act_kind=act_kind, norm_kind=norm_kind,
                             half_f=half_f, wbits=wbits, site_on=site_on)
        else:
            _w4_mlp_phase(j - (nqa + 1), nh, lambda i: m(ATTN_META_LEN + i),
                          lambda: resid_scr[:], out_set,
                          mnw_ref, mnb_ref,
                          w1lo_ref, w1hi_ref, w3lo_ref, w3hi_ref, aux13_ref,
                          (w2p_ref,) if wbits == 4 else (w2p_ref, w2b_ref),
                          aux2_ref, acc_ref, rsum_ref, h_ref,
                          act_kind=act_kind, norm_kind=norm_kind,
                          half_f=half_f, wbits=wbits, site_on=site_on)

    if nv:
        @pl.when(jnp.logical_and(jj >= LP, jnp.bool_("nohead" not in dbg)))
        def _():
            _head_phase(jj - LP, meta_ref[num_layers - 1, 3],
                        lambda: x_scr[:], hnw_ref, hnb_ref, hwq_ref, haux_ref,
                        lout_ref, h_ref, hs_scr,
                        norm_kind=norm_kind, wbits_h=wbits_h)


@functools.partial(jax.jit, static_argnames=(
    "num_q_heads", "num_kv_heads", "head_dim", "rotary_dim", "act_kind",
    "norm_kind", "qk_fq_on", "pv_fq_on", "site_on", "interpret"))
def fused_model_w4_chunk(x: jax.Array, pos: jax.Array, rope_cs: jax.Array,
                         qkv_ofq_L: jax.Array, anw_L, anb_L, qkvsp: dict,
                         osp: dict, mnw_L, mnb_L, w13sp: dict, w2sp: dict,
                         kcache: jax.Array, vcache: jax.Array, kcsT: jax.Array,
                         sk: jax.Array, sv: jax.Array, m_staged,
                         meta_L: jax.Array, head: dict = None,
                         hnorm_w=None, hnorm_b=None, *,
                         num_q_heads: int, num_kv_heads: int, head_dim: int,
                         rotary_dim: int, act_kind: str = "silu",
                         norm_kind: str = "rmsnorm", qk_fq_on: bool = False,
                         pv_fq_on: bool = False,
                         site_on: tuple = (True,) * 9,
                         interpret: bool = False):
    """ALL decoder layers of the packed engine for one B-row decode step on
    the chunked-staging path, in ONE dispatch (see module docstring).

    x (B,K) fp32 residual (embedding rows); pos (B,) int32 per-sequence
    CHUNK-START cache positions; rope_cs (B,2,hd); kcsT (L,B,Hkv,1,S) fp32
    chunk-constant K-cache column sums (StagedKVCache.kcs, row layout so the
    kernel reads (1,S) slices directly); sk/sv (L,B,Hkv,cs,hd) int8 staged
    chunk columns; m_staged () int32 count of valid staged columns.
    Other operands as ops/pallas_layer.fused_model_w4_stacked.
    Returns (x_out (B,K) fp32, kv_new (L,B,2*Hkv,hd) int8[, logits (B,Vp)]).
    """
    Hq, Hkv, hd, rot = num_q_heads, num_kv_heads, head_dim, rotary_dim
    B, K = x.shape
    assert 8 <= B <= 128 and B % 8 == 0, B
    L, K2w, Nq = qkvsp["wq"].shape
    wbits = 4 if K2w * 2 == K else 8
    assert K2w * 2 == K or K2w == K
    assert w13sp["wq"].shape[1] == K2w, "qkv/w13 pack bitwidths must match"
    R = Hq + 2 * Hkv
    assert Nq == R * hd, (Nq, R, hd)
    S = kcache.shape[3]
    cs_staged = sk.shape[3]
    Ko = Hq * hd
    Kor = osp["wq"].shape[1]            # Ko/2 (W4 nibble) or Ko (W8)
    F = w13sp["wq"].shape[2] // 2
    half_f = F // 2
    TFh = _pick_block_fh_chunk(K, half_f, wbits)
    assert TFh, (K, F)
    nh = half_f // TFh
    TNq = _pick_block_nq(K2w, Nq, hd)
    nq = Nq // TNq
    F2 = w13sp["wq"].shape[2]
    perm = hd % 128 != 0
    bblk_env = os.environ.get("MQTPU_CHUNK_BBLK")
    if bblk_env:
        # round a non-divisor override DOWN to the nearest divisor of B:
        # nab = B // Bblk truncates, and a truncated nab would skip the
        # trailing B % Bblk sequences' attention phases entirely (their
        # macc_scr rows would be consumed as stale scratch — silent wrong
        # logits)
        Bblk = min(int(bblk_env), B)
        while B % Bblk:
            Bblk -= 1
    else:
        Bblk = _pick_attn_bblk(B, Hkv, S, hd)
    nab = B // Bblk

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

    P = nq + 1 + nab + 1 + nh
    Lm1 = L - 1

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

    # ---- fetch staggering ----------------------------------------------
    # Pallas prefetches ONE grid step ahead per operand, so each operand's
    # index-map flip phase IS its fetch window. Without staggering, layer
    # l's qkv pack + first K/V tiles + first MLP blocks all flip at the
    # layer boundary and must stream during the short last-MLP phase of
    # layer l-1 (the all-compute-stubbed skeleton measured 0.44 ms/step of
    # exactly such stalls). Each operand therefore flips at its own phase
    # `phi` (fetching during phase phi-1), spreading the ~60 us/layer of
    # DMA across every window:
    #   K/V batch-tile b0: 2-3 phases into the PREVIOUS layer's MLP tail;
    #   w13/w2 block 0:    during prep / the attention phases;
    #   o pack:            during prep;  qkv pack: at the layer boundary.
    def lyr_at(j, phi):
        # layer index that flips to l at within-layer phase phi (phi may be
        # negative = flip during the previous layer's tail)
        return jnp.minimum(jnp.maximum(j - phi, 0) // P, Lm1)

    def acl_at(j, phi):
        lw = lyr_at(j, phi)
        return lw, jnp.clip(j - lw * P - (nq + 1), 0, nab - 1)

    def k_map(j):
        return acl_at(j, -2)

    def v_map(j):
        return acl_at(j, -1)

    first_mlp = nq + nab + 2

    def ml_at(j, phi):
        # flip phase must not pass the first consuming phase (small nab)
        lw = lyr_at(j, min(phi, first_mlp))
        return lw, jnp.clip(j - lw * P - first_mlp, 0, nh - 1)

    def hblk(j):
        return jnp.clip(j - L * P, 0, max(nv - 1, 0))

    w2blk = nh if wbits == 8 else 0     # W8: seg_hi row blocks start at nh
    kernel = functools.partial(
        _chunk_kernel, num_layers=L, nv=nv, wbits_h=wbits_h, Hq=Hq, Hkv=Hkv,
        hd=hd, rot=rot, nq=nq, nh=nh, nab=nab, Bblk=Bblk,
        half_f=half_f, act_kind=act_kind, norm_kind=norm_kind, perm=perm,
        wbits=wbits, B=B, qk_fq_on=qk_fq_on, pv_fq_on=pv_fq_on,
        site_on=tuple(site_on),
        dbg=os.environ.get("MQTPU_CHUNK_DEBUG", ""))
    wbytes = L * (K2w * Nq + Kor * K + K2w * F2 + w2sp["wq"].shape[1] * K)
    R2rows = max(Nq // 128, 1) if perm else R
    v2_last = 128 if perm else hd
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # meta_L
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # pos
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # m_staged
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
        pl.BlockSpec((1, Bblk, Hkv, S, hd),
                     lambda j: (*k_map(j), 0, 0, 0),
                     memory_space=pltpu.VMEM),                    # k cache
        pl.BlockSpec((1, Bblk, Hkv, S, hd),
                     lambda j: (*v_map(j), 0, 0, 0),
                     memory_space=pltpu.VMEM),                    # v cache
        pl.BlockSpec((1, B, Hkv, 1, S),
                     lambda j: (lyr(j), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),                    # K colsums
        pl.BlockSpec((1, B, Hkv, cs_staged, hd),
                     lambda j: (lyr(j), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),                    # staged k
        pl.BlockSpec((1, B, Hkv, cs_staged, hd),
                     lambda j: (lyr(j), 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),                    # staged v
        pl.BlockSpec((1, Kor, K), lambda j: (lyr_at(j, nq + 2), 0, 0),
                     memory_space=pltpu.VMEM),                    # o pack
        pl.BlockSpec((1, 4, K), lambda j: (lyr(j), 0, 0),
                     memory_space=pltpu.VMEM),                    # o aux
        pl.BlockSpec((1, 1, K), lambda j: (lyr(j), 0, 0),
                     memory_space=pltpu.VMEM),                    # mlp nw
        pl.BlockSpec((1, 1, K), lambda j: (lyr(j), 0, 0),
                     memory_space=pltpu.VMEM),                    # mlp nb
        pl.BlockSpec((1, K2w, TFh),
                     lambda j: (lambda lw, t: (lw, 0, t))(*ml_at(j, nq + 1)),
                     memory_space=pltpu.VMEM),                    # w1 lo
        pl.BlockSpec((1, K2w, TFh),
                     lambda j: (lambda lw, t: (lw, 0, nh + t))(
                         *ml_at(j, nq + 2)),
                     memory_space=pltpu.VMEM),                    # w1 hi
        pl.BlockSpec((1, K2w, TFh),
                     lambda j: (lambda lw, t: (lw, 0, 2 * nh + t))(
                         *ml_at(j, nq + 3)),
                     memory_space=pltpu.VMEM),                    # w3 lo
        pl.BlockSpec((1, K2w, TFh),
                     lambda j: (lambda lw, t: (lw, 0, 3 * nh + t))(
                         *ml_at(j, nq + 4)),
                     memory_space=pltpu.VMEM),                    # w3 hi
        pl.BlockSpec((1, 4, F2), lambda j: (lyr(j), 0, 0),
                     memory_space=pltpu.VMEM),                    # aux13
        pl.BlockSpec((1, TFh, K),
                     lambda j: (lambda lw, t: (lw, t, 0))(*ml_at(j, nq + 5)),
                     memory_space=pltpu.VMEM),                    # w2 pack
        pl.BlockSpec((1, TFh if wbits == 8 else 32, K),
                     lambda j: (lambda lw, t: (lw, (w2blk + t)
                                               if wbits == 8 else 0, 0))(
                         *ml_at(j, nq + 5)),
                     memory_space=pltpu.VMEM),            # w2 seg_hi (W8)
        pl.BlockSpec((1, 4, K), lambda j: (lyr(j), 0, 0),
                     memory_space=pltpu.VMEM),                    # aux2
    ]
    out_specs = [
        pl.BlockSpec((B, K), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),                    # x out
        pl.BlockSpec((1, B, 2 * Hkv, hd), lambda j: (lyr(j), 0, 0, 0),
                     memory_space=pltpu.VMEM),                    # k/v new
    ]
    out_shape = [jax.ShapeDtypeStruct((B, K), jnp.float32),
                 jax.ShapeDtypeStruct((L, B, 2 * Hkv, hd), jnp.int8)]
    scratch_shapes = [
        pltpu.VMEM((B, K), jnp.float32),                          # x carry
        pltpu.VMEM((B, R2rows, v2_last), jnp.float32),            # v2/qk3
        pltpu.VMEM((B, R, hd), jnp.float32),                      # q8 (f32)
        pltpu.VMEM((B, Hq, 1), jnp.float32),                      # q row sums
        pltpu.VMEM((B, Hq, hd), jnp.float32),                     # attn a8
        pltpu.VMEM((B, Ko), jnp.float32),                         # flat
        pltpu.VMEM((B, K), jnp.float32),                          # resid
        pltpu.VMEM((B, K), jnp.int8),                             # h
        pltpu.VMEM((B, K), jnp.int32),                            # mlp acc
        pltpu.VMEM((B, 1), jnp.int32),                            # mlp rsum
    ]
    args = [meta_L.astype(jnp.float32), pos.astype(jnp.int32),
            jnp.reshape(jnp.asarray(m_staged, jnp.int32), (1,)),
            x.astype(jnp.float32), rope_cs.astype(jnp.float32),
            qkv_ofq_L.astype(jnp.float32),
            anw3, anb3, qkvsp["wq"], qaux, kcache, vcache,
            kcsT.astype(jnp.float32), sk, sv,
            osp["wq"], oaux, mnw3, mnb3, w13sp["wq"], w13sp["wq"],
            w13sp["wq"], w13sp["wq"], aux13, w2sp["wq"], w2sp["wq"], aux2]
    hbytes = 0
    if nv:
        in_specs += [
            pl.BlockSpec((1, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),                # final nw
            pl.BlockSpec((1, K), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),                # final nb
            pl.BlockSpec((Kh, TV), lambda j: (0, hblk(j)),
                         memory_space=pltpu.VMEM),                # head pack
            pl.BlockSpec((2, TV), lambda j: (0, hblk(j)),
                         memory_space=pltpu.VMEM),                # head aux
        ]
        out_specs.append(pl.BlockSpec((B, TV), lambda j: (0, hblk(j)),
                                      memory_space=pltpu.VMEM))   # logits
        out_shape.append(jax.ShapeDtypeStruct((B, Vp), jnp.float32))
        scratch_shapes.append(pltpu.VMEM((B, 2), jnp.float32))    # sx | rowsum
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
            vmem_limit_bytes=127 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * (B * K * Nq + B * Ko * K + B * K * F2 + B * F * K
                           + 2 * B * Hq * (S + cs_staged) * hd)
            + (2 * B * K * (Vp if nv else 0)),
            bytes_accessed=wbytes + L * 2 * Hkv * B * (S + cs_staged) * hd
            + hbytes,
            transcendentals=L * B * (Hq * (S + cs_staged) + F)),
        interpret=interpret,
    )(*args)
    return res if nv else (res[0], res[1])
