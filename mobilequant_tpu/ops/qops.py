"""Integer compute primitives (XLA path).

These are the building blocks of the integer inference engine: real int8/int4
storage and int32 MXU accumulation, numerically EXACT (up to fp32 rounding) to the
fake-quant simulation — `(x_q-o_x)(w_q-o_w)·s_x·s_w ≡ fq(x)@fq(w)`. That identity
is what makes the reference's fidelity ladder (sim ↔ device, ref export.py:433-437)
hold tightly on TPU.

Conventions:
  * asymmetric uint8 values are stored shifted by −128 as int8 (MXU consumes
    signed int8); the stored zero-point is shifted accordingly. This is exactly
    the reference runtime's uint8 affine encoding (qnn_context.cpp:1040-1092
    tf2any/any2tf) adapted to signed hardware.
  * weights live as (in, out) int8 — or int4 (packed by XLA) for W4 — with
    per-tensor or per-channel (1, out) fp32 scale and shifted offset, plus the
    precomputed per-out-channel column-sum correction.

The Pallas kernels in ops/pallas_matmul.py implement the same contracts with
explicit VMEM staging/fusion; engine code switches by flag.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mobilequant_tpu.quant.quantizer import (
    QuantConfig, scale_offset_from_min_max, weight_min_max,
)


def quantize_act(x, scale, offset, qmax=255.0):
    """fp → shifted-int8 (stored uint8 domain − 128). scale/offset per-tensor.

    qmax: the clip bound — 255 for 8-bit, 15 for 4-bit KV-cache values (may
    be an array for per-segment bounds, e.g. the joint q‖k quantization where
    q rows are 8-bit and k rows are the 4-bit cache encoding)."""
    q = jnp.round(x.astype(jnp.float32) / scale) + offset
    q = jnp.clip(q, 0.0, qmax) - 128.0
    return q.astype(jnp.int8)


def dequantize_act(q_i8, scale, offset):
    return (q_i8.astype(jnp.float32) + 128.0 - offset) * scale


def pack_nibbles(q_i8: jax.Array) -> jax.Array:
    """(..., K, N) int8 values in [-8, 7] → (..., K/2, N) int8, two per byte;
    leading axes (stacked MoE experts) pack independently along their K axis.

    BLOCK layout: row k of the packed array holds row k (low nibble) and row
    k + K/2 (high nibble) of the original. Unpacking is then a concat — or,
    inside a matmul kernel, NO unpack at all: dot(x[:, :K/2], lo) +
    dot(x[:, K/2:], hi). An interleaved (even/odd) layout forces stride-2
    sublane shuffles in Mosaic, which measured 5× slower than W8.
    `jnp.int4` arrays are avoided entirely (PJRT transfer bugs)."""
    assert q_i8.shape[-2] % 2 == 0, "K must be even for nibble packing"
    half = q_i8.shape[-2] // 2
    lo = q_i8[..., :half, :] & 0x0F
    hi = q_i8[..., half:, :] & 0x0F
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_nibbles(packed: jax.Array) -> jax.Array:
    """(..., K/2, N) packed bytes → (..., K, N) int8 in [0, 15] (block layout,
    UNSIGNED nibbles — the 4-bit zero-point absorbs the sign, so unpack is 3
    cheap bit ops with no widening or sign-extension selects)."""
    lo = packed & 0x0F
    hi = (packed >> 4) & 0x0F   # arithmetic i8 shift; mask clears sign bits
    return jnp.concatenate([lo, hi], axis=-2)


# ---------------------------------------------------------------------------
# int4 KV-cache (nibble-packed along the SEQUENCE axis)
# ---------------------------------------------------------------------------
# A 4-bit KV cache stores values quantized with the policy's 4-bit
# qk_bmm.input2 / pv_bmm.input2 encodings (q4 ∈ [0,15]); unpacked working
# values use the SAME shifted-int8 convention as the 8-bit cache (q4 − 128),
# so every affine correction in this module is reused unchanged:
# (q−128) − (o−128) == q − o. The big cache packs TWO SEQUENCE POSITIONS per
# byte (byte at column s holds position s (low nibble) and s + S/2 (high)),
# and is stored HD-MAJOR: (..., hd, S/2). Two reasons:
#   * packing along S lets attention run WITHOUT any unpack-concat — Q·Kᵀ
#     and P·V split into lo/hi part-dots and the engine's partwise softmax
#     already treats score parts independently (ops/pallas_kv4.py);
#   * hd-major storage puts S/2 (≥256 lanes) on the minor axis: Pallas
#     block DMAs of 64-lane-minor tiles stream at EXACTLY HALF the HBM rate
#     (374 vs 754 GB/s measured at identical bytes, scripts/probe_dma.py —
#     the DMA pads each row to the native 128-lane VMEM word), and hd is 64
#     on every mobile-class target. K arrives pre-transposed for the QK dot
#     for free.
# Note (q4 − 128) & 0x0F == q4 for q4 ∈ [0,16), so shifted staging rows pack
# with the same bit ops as raw nibbles.


def unpack_kv_s(packed: jax.Array) -> jax.Array:
    """(..., hd, S/2) packed KV → (..., S, hd) SHIFTED int8 (q4 − 128): the
    XLA materializing path for 4-bit caches (T>1 prefill) — downstream math
    is then identical to the 8-bit cache's."""
    t = jnp.swapaxes(packed, -1, -2)              # (..., S/2, hd)
    return (unpack_nibbles(t).astype(jnp.int32) - 128).astype(jnp.int8)


def pack_kv_s(k_shifted: jax.Array) -> jax.Array:
    """(..., S, hd) shifted int8 4-bit values → (..., hd, S/2) packed."""
    return jnp.swapaxes(pack_nibbles(k_shifted), -1, -2)


def kv_colsums_packed(packed: jax.Array) -> jax.Array:
    """Σ_hd of the SHIFTED unpacked values, computed from the packed bytes in
    one pass: (..., hd, S/2) → (..., S) fp32 in sequence order ([lo | hi]
    position planes). Feeds int_matmul_qk's k_colsum (chunk-constant inside
    a staged decode chunk, StagedKVCache.kcs)."""
    hd = packed.shape[-2]
    lo = jnp.sum((packed & 0x0F).astype(jnp.int32), axis=-2)
    hi = jnp.sum(((packed.astype(jnp.int32) >> 4) & 0x0F), axis=-2)
    return (jnp.concatenate([lo, hi], axis=-1) - 128 * hd).astype(jnp.float32)


def kv_flush_packed(cache_p: jax.Array, staged: jax.Array,
                    at: jax.Array) -> jax.Array:
    """Merge a chunk's staged rows into the hd-major nibble-packed cache.

    cache_p (L,B,Hkv,hd,S/2) packed; staged (L,B,Hkv,cs,hd) shifted int8
    4-bit rows; at (B,) absolute start positions (staged column c lands at
    position at[b]+c). Positions map to (column p mod S/2, nibble p div
    S/2), so a chunk may straddle the lo/hi boundary.

    Implementation: per slot, TWO windowed dynamic-slice read-modify-writes
    (one per nibble plane) of cs packed columns each — slice the window,
    merge the transposed staged rows (read through ONE shifted
    dynamic_slice of a both-sides zero-padded buffer, masked per column),
    write back. NO gather: an earlier take_along_axis formulation lowered
    to scalarized gather fusions under the decode loop's outer scan —
    84 ms per flush at bs=32 (traced 2026-08-21; the single-chunk program
    had constant-folded the indices, hiding it). Window traffic:
    2·B·L·Hkv·cs·hd bytes per cache per flush ≈ 0.4% of the slab reads the
    chunk saves."""
    L, B, Hkv, hd, S2 = cache_p.shape
    csn = staged.shape[3]
    # a chunk longer than one nibble plane (cs > S/2, tiny caches / long
    # staging chunks) covers the whole plane: the RMW window caps at S/2
    w = min(csn, S2)
    # (L,B,Hkv,cs,hd) shifted → raw nibbles, hd-major (L,B,Hkv,hd,cs)
    raw = jnp.swapaxes((staged & 0x0F).astype(jnp.int8), -1, -2)
    zpad = jnp.zeros((L, 1, Hkv, hd, csn), jnp.int8)
    j = jnp.arange(w)

    out = cache_p
    for b in range(B):
        atb = at[b]
        rawp = jnp.concatenate([zpad, raw[:, b:b + 1], zpad], axis=4)
        for nibb in (0, 1):
            base = nibb * S2
            wstart = jnp.clip(atb - base, 0, S2 - w)
            win = jax.lax.dynamic_slice(
                out, (0, b, 0, 0, wstart), (L, 1, Hkv, hd, w))
            p = base + wstart + j                    # absolute positions
            sel = ((p >= atb)
                   & (p < atb + csn))[None, None, None, None, :]
            # staged column for window column j is raw[…, p - atb] = one
            # SHIFTED slice: start csn + (base + wstart - atb), clamped
            # into the padded range (out-of-range columns are masked off)
            soff = jnp.clip(csn + base + wstart - atb, 0, 2 * csn)
            g = jax.lax.dynamic_slice(
                rawp, (0, 0, 0, 0, soff), (L, 1, Hkv, hd, w))
            lo = win & 0x0F
            hi = ((win.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
            if nibb == 0:
                lo = jnp.where(sel, g, lo)
            else:
                hi = jnp.where(sel, g, hi)
            merged = (lo | (hi << 4)).astype(jnp.int8)
            out = jax.lax.dynamic_update_slice(
                out, merged, (0, b, 0, 0, wstart))
    return out


def pack_weight(w, qcfg: QuantConfig):
    """Quantize an (in, out) fp weight to its integer representation.

    Returns dict with:
      wq      int8 shifted-signed values; for 4-bit: nibble-packed (in/2, out)
              (packedness is shape-inferred at use: wq.shape[0] == in/2)
      scale   fp32 () or (1, out); grouped: (G, 1, out) along the input axis
              (the reference's auto_gptq W4 g128 layout, ref qmodule.py:803-829)
      offset  fp32 shifted zero-point (same shape as scale)
      colsum  fp32 per-out-channel sum of q values (activation-offset
              correction; per group when grouped)
    """
    grouped = qcfg.is_per_channel and qcfg.group_size != -1
    assert qcfg.group_size == -1 or qcfg.is_per_channel, \
        "group_size requires is_per_channel (grouped-per-tensor is undefined)"
    mn, mx = weight_min_max(w, qcfg)
    scale, offset = scale_offset_from_min_max(mn, mx, qcfg)
    wf = w.astype(jnp.float32)
    if grouped:
        from mobilequant_tpu.quant.quantizer import _group_reshape
        wg = _group_reshape(wf, qcfg.group_size)
        q = jnp.round(wg / scale) + offset          # (..., G, gs, out)
        q = jnp.clip(q, qcfg.qmin, qcfg.qmax)
        q = q.reshape(wf.shape)
    else:
        q = jnp.round(wf / scale) + offset
        q = jnp.clip(q, qcfg.qmin, qcfg.qmax)
    if qcfg.bitwidth == 4:
        # store UNSIGNED nibbles q - qmin ∈ [0,15]; the zero-point shifts by
        # -qmin so the affine corrections are unchanged (see unpack_nibbles)
        shift = float(qcfg.qmin)
    elif qcfg.is_symmetric:
        shift = 0.0
    else:
        shift = float(2 ** (qcfg.bitwidth - 1))   # uint8 stored as int8 − 128
    q = q - shift
    q_i8 = q.astype(jnp.int8)
    wq = pack_nibbles(q_i8) if qcfg.bitwidth == 4 else q_i8
    if grouped:
        from mobilequant_tpu.quant.quantizer import _group_reshape
        colsum = jnp.sum(_group_reshape(q.astype(jnp.float32),
                                        qcfg.group_size), axis=-2)
    else:
        colsum = jnp.sum(q.astype(jnp.float32), axis=-2)  # (out,) / (E, out)
    return {
        "wq": wq,
        "scale": jnp.asarray(scale, jnp.float32),
        "offset": jnp.asarray(offset - shift, jnp.float32),
        "colsum": colsum,
    }


def int_linear(x_q: jax.Array, x_scale, x_offset, pack: dict, bias,
               k_dim: Optional[int] = None):
    """Integer matmul with affine corrections → fp32 output.

    x_q: (..., K) shifted-int8 activations with uint8-domain (scale, offset).
    pack: from pack_weight. bias: (N,) fp32 or None.

    out = s_x·s_w · [ acc − o'_x·colsum_w − o_w·rowsum_x + K·o'_x·o_w ] + bias
    with o'_x = x_offset − 128 (shifted domain) and o_w already shifted.
    """
    K = x_q.shape[-1] if k_dim is None else k_dim
    wq = pack["wq"]
    if wq.shape[0] * 2 == K:              # nibble-packed 4-bit (shape-inferred)
        wq = unpack_nibbles(wq)
    acc = jax.lax.dot_general(
        x_q, wq.astype(jnp.int8),
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    ox = x_offset - 128.0
    ow = jnp.reshape(pack["offset"], (-1,))   # (1,) or (N,)
    sw = jnp.reshape(pack["scale"], (-1,))    # (1,) or (N,)
    rowsum = jnp.sum(x_q.astype(jnp.int32), axis=-1, keepdims=True).astype(jnp.float32)
    acc = acc - ox * pack["colsum"] - ow * rowsum + K * ox * ow
    out = acc * (x_scale * sw)
    if bias is not None:
        out = out + bias
    return out


def dynamic_quantize_act(x):
    """Per-row (last-axis) symmetric dynamic int8 quantization: (q, scale).

    The dynamic analogue of quantize_act for sites with no calibrated static
    range (here: the final-norm output feeding the quantized lm_head). Stored
    as plain signed int8 (zero-point = 0), so in the shifted-uint8 convention
    of int_linear it corresponds to offset = 128 (ox = 0)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0)
    return q.astype(jnp.int8), scale


def int_head_linear(x, pack: dict, bias=None):
    """Quantized lm_head matmul: dynamic per-token symmetric A8 activations ×
    per-channel symmetric W8/W4 weights → fp32 logits.

    TPU-native twin of the reference's on-device head: the QNN graph runs
    w2/lm_head as `SLinear` = per-row scale × int linear (sim_layers.py:34-44,
    `impl_sym_pch_as_slinear`, convert_sim.py:144-159). With both sides
    symmetric the affine corrections vanish except the W4 unsigned-nibble
    zero-point term (ow·rowsum):

      out = s_x·s_w · (x_q @ w_q − o_w·Σ_k x_q) (+ bias)
    """
    x_q, sx = dynamic_quantize_act(x)
    K = x_q.shape[-1]
    wq = pack["wq"]
    if wq.shape[0] * 2 == K:              # nibble-packed 4-bit
        wq = unpack_nibbles(wq)
    acc = jax.lax.dot_general(
        x_q, wq.astype(jnp.int8),
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    ow = jnp.reshape(pack["offset"], (-1,))   # 0 for sym W8; −qmin shift for W4
    sw = jnp.reshape(pack["scale"], (-1,))
    rowsum = jnp.sum(x_q.astype(jnp.int32), axis=-1,
                     keepdims=True).astype(jnp.float32)
    acc = acc - ow * rowsum
    out = acc * (sx * sw)
    if bias is not None:
        out = out + bias
    return out


def weight_only_linear(x, pack: dict, bias):
    """W4A16/W8A16: fp activations × integer weights dequantized on the fly —
    the role of the reference's auto_gptq real-W4 kernels (qmodule.py:803-829),
    including the grouped (g128-style) layout: a (G, 1, out) scale/offset pack
    dequantizes per input-axis group. XLA path; ops/pallas_matmul.w4a16_matmul
    fuses the per-channel dequant in VMEM."""
    wq = pack["wq"]
    K = x.shape[-1]
    if wq.shape[0] * 2 == K:
        wq = unpack_nibbles(wq)
    scale, offset = pack["scale"], pack["offset"]
    if scale.ndim == 3:                  # grouped: (G, 1, out)
        G = scale.shape[0]
        wg = wq.astype(jnp.float32).reshape(G, K // G, -1)
        w = ((wg - offset) * scale).reshape(K, -1)
    else:
        w = (wq.astype(jnp.float32) - jnp.reshape(offset, (1, -1))) \
            * jnp.reshape(scale, (1, -1))
    y = x.astype(jnp.float32) @ w
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def weight_only_expert_linear(x, pack: dict, bias):
    """Weight-only MoE expert projection: fp activations × per-expert integer
    weight stacks dequantized on the fly (the W4A16/W8A16 twin of
    int_expert_linear; expert stacking as in models/model.Ops.expert_linear):

      x (..., K)    × wq (E, K, N) → (..., E, N)   (dispatch form: w1/w3)
      x (..., E, K) × wq (E, K, N) → (..., E, N)   (expert-axis form: w2)

    W4 stacks arrive nibble-packed (E, K/2, N); grouped scales are
    (E, G, 1, N) along each expert's input axis."""
    wq = pack["wq"]
    K = x.shape[-1]
    if wq.shape[-2] * 2 == K:
        wq = unpack_nibbles(wq)
    E, _, N = wq.shape
    scale, offset = pack["scale"], pack["offset"]
    wf = wq.astype(jnp.float32)
    if scale.ndim == 4:                       # grouped (E, G, 1, N)
        G = scale.shape[1]
        wg = wf.reshape(E, G, K // G, N)
        w = ((wg - offset[:, :, None, 0]) * scale[:, :, None, 0]).reshape(E, K, N)
    else:
        w = (wf - jnp.reshape(offset, (E, 1, -1))) * jnp.reshape(scale, (E, 1, -1))
    xf = x.astype(jnp.float32)
    if x.ndim == 3:
        y = jnp.einsum("btd,edf->btef", xf, w)
    else:
        y = jnp.einsum("btef,efd->bted", xf, w)
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def int_expert_linear(x_q, x_scale, x_offset, pack: dict, bias,
                      x_has_expert_axis: bool = False):
    """MoE expert integer matmul, affine-exact per expert (dense-dispatch twin of
    int_linear; plays the role of the reference's per-expert QLinear instances in
    HFMoEBlock, ref hf_model.py:1065-1162):

      x (..., K)    x wq (E, K, N) -> fp32 (..., E, N)   (dispatch form: w1/w3)
      x (..., E, K) x wq (E, K, N) -> fp32 (..., E, N)   (x_has_expert_axis: w2)

    W4 expert stacks arrive nibble-packed (E, K/2, N) and unpack along K
    (block layout, see unpack_nibbles).
    """
    wq = pack["wq"]
    K = x_q.shape[-1]
    if wq.shape[-2] * 2 == K:             # nibble-packed 4-bit (shape-inferred)
        wq = unpack_nibbles(wq)
    E, K, N = wq.shape
    if x_has_expert_axis:
        acc = jnp.einsum("...ek,ekn->...en", x_q.astype(jnp.int8),
                         wq.astype(jnp.int8),
                         preferred_element_type=jnp.int32).astype(jnp.float32)
        rowsum = jnp.sum(x_q.astype(jnp.int32), axis=-1)[..., None]   # (...,E,1)
    else:
        acc = jnp.einsum("...k,ekn->...en", x_q.astype(jnp.int8),
                         wq.astype(jnp.int8),
                         preferred_element_type=jnp.int32).astype(jnp.float32)
        rowsum = jnp.sum(x_q.astype(jnp.int32), axis=-1)[..., None, None]
    rowsum = rowsum.astype(jnp.float32)
    ox = x_offset - 128.0
    if pack["offset"].ndim == 3:      # per-channel (E, 1, N): broadcast as (E, N)
        ow, sw = pack["offset"][:, 0], pack["scale"][:, 0]
    else:                             # per-tensor scalar across the expert stack
        # (E,1) so per-expert x offsets/scales ((E,1) ox) broadcast cleanly
        ow = jnp.reshape(pack["offset"], (-1, 1))
        sw = jnp.reshape(pack["scale"], (-1, 1))
    acc = acc - ox * pack["colsum"] - ow * rowsum + K * ox * ow
    out = acc * (x_scale * sw)
    if bias is not None:
        out = out + bias
    return out


def int_matmul_qk(q_i8, k_i8, q_scale, q_offset, k_scale, k_offset,
                  k_colsum=None):
    """Quantized Q·Kᵀ: q (B,Hkv,GT,hd) × k (B,Hkv,S,hd) → fp32 (B,Hkv,GT,S).

    The head-major KV layout makes this a clean *batched* int8 dot_general on the
    MXU (the general einsum form lowers to a dilated s32 convolution on TPU —
    much slower). Affine-exact with per-tensor encodings; rowsums are cheap VPU
    reductions.

    k_colsum: optional precomputed Σ_hd k (B,Hkv,S) fp32. Inside a chunked
    decode the cache is stale for the whole chunk, but the inline reduction
    re-reads the 8.4 MB K slab every step (XLA keeps the dot and the reduce in
    separate fusions — 12.8 µs/layer at bs=32, traced 2026-08-19); the caller
    computes it once per chunk instead.
    """
    hd = q_i8.shape[-1]
    acc = jax.lax.dot_general(
        q_i8, k_i8,
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32).astype(jnp.float32)   # (B,Hkv,GT,S)
    oq = q_offset - 128.0
    ok = k_offset - 128.0
    qsum = jnp.sum(q_i8.astype(jnp.int32), axis=-1).astype(jnp.float32)  # (B,Hkv,GT)
    ksum = (jnp.sum(k_i8.astype(jnp.int32), axis=-1).astype(jnp.float32)
            if k_colsum is None else k_colsum)                   # (B,Hkv,S)
    acc = acc - ok * qsum[..., None] - oq * ksum[:, :, None, :] + hd * oq * ok
    return acc * (q_scale * k_scale)


def int_matmul_pv(p, v_i8, v_scale, v_offset):
    """P·V with int8 V: p fp32 (B,Hkv,GT,S) × v (B,Hkv,S,hd) → (B,Hkv,GT,hd).

    v = (v_q+128-o_v)·s_v ⇒ P@V = (P@v_shifted − (o_v−128)·Σ_s P)·s_v; softmax rows
    sum to 1 so Σ_s P = 1 (we keep the general form — masked prefill rows too).
    """
    vf = v_i8.astype(jnp.float32)
    acc = jax.lax.dot_general(
        p, vf, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)                      # (B,Hkv,GT,hd)
    psum = jnp.sum(p, axis=-1)                                   # (B,Hkv,GT)
    ov = v_offset - 128.0
    acc = acc - ov * psum[..., None]
    return acc * v_scale
