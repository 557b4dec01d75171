"""Integer inference engine — the TPU-native replacement of the reference's entire
on-device stack (AIMET/ONNX/QNN export + capp C++ runtime, SURVEY.md L4+L6).

Where the reference exports a fixed QNN graph (`qnn_model.bin`) and drives it
token-by-token from C++ with host-side int8 KV scatter (llm.cpp:545-648), here the
"export artifact" is a packed-int parameter pytree + jitted XLA executables:

  pack()        — quantize finalized weights to int8/int4 (+ scales/corrections),
                  bake 16-bit norm-weight quantization, freeze activation ranges;
                  the analogue of qnn-context-binary-generator.
  prefill()     — ONE batched pass over the whole prompt (the reference NPU graph
                  processes 1 token/step even for prompts — a real batched prefill
                  is the first structural TPU win).
  decode_step() — single-token step with device-resident int8 KV-cache updated via
                  lax.dynamic_update_slice (replaces the host uint8 memcpy loop,
                  llm.cpp:573-595).
  generate()    — prefill + jitted sampling loop (greedy/temperature/top-k/top-p).

Numerics: every 8-bit matmul runs on the MXU in int8×int8→int32 with affine
corrections (ops/qops.py) and is exactly the fake-quant sim's arithmetic; 16-bit
policy sites apply fp fake-quant (cheap VPU, fused). The fidelity ladder
FP ↔ sim ↔ engine is asserted in tests/test_engine.py, mirroring the reference's
HTP-vs-sim allclose gate (export.py:433-437).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mobilequant_tpu.models.config import ModelConfig
from mobilequant_tpu.models import model as M
from mobilequant_tpu.ops import qops
from mobilequant_tpu.quant.policy import QPolicy
from mobilequant_tpu.quant.quantizer import QuantConfig, fake_quant
from mobilequant_tpu.runtime.kernel_config import KernelConfig


class EngineKVCache(NamedTuple):
    """int8 KV cache: k/v (L, B, Hkv, S_max, hd) in shifted-uint8 domain.

    Head-major layout (vs the FP model's (…,S,Hkv,hd)): attention becomes a
    batched int8 dot_general over (B,Hkv) on the MXU instead of an einsum that
    XLA lowers to a slow dilated convolution."""
    k: jax.Array
    v: jax.Array


class StagedKVCache(NamedTuple):
    """Chunked-decode cache: the big k/v buffers stay READ-ONLY for a whole
    decode chunk while the chunk's new rows accumulate in the small sk/sv
    staging buffers (L, B, Hkv, n_chunk, hd); decode_loop flushes them into
    k/v with one slab write per slot per chunk.

    Why: XLA cannot alias a buffer consumed as scan xs into its own update,
    so the per-step per-slot row scatter costs a full slot-slab copy —
    18.8 µs/slot/step, 1.2 ms/step at bs=32, the single largest term of the
    batched decode step (trace 2026-08-19). Read-only within the chunk, that
    copy happens once per chunk instead of once per step. `m` is the number
    of staged rows so far; attention adds the staged columns (masked to
    col < m) between the stale cache and the self term.

    kcs: Σ_hd k (L, B, Hkv, S) fp32, the zero-point column sums of the stale
    K cache — computed ONCE per chunk (the cache is read-only, so they are
    chunk-constant) instead of re-reading the K slab every step inside
    qops.int_matmul_qk (a 12.8 µs/layer convert+reduce pass at bs=32).

    pk/pv: the current step's PENDING rows (L, B, Hkv, 1, hd). forward() does
    NOT append them to sk/sv itself — within one scan iteration that read-
    then-update pattern leaves the staging buffers live across the layer
    scan, and XLA's aliasing analysis inserts a full 11.6 MB defensive copy
    per step (the 89 µs/step residual of the round-2 trace). decode_loop
    instead writes the previous step's pending rows at the TOP of each step
    (the only write in the iteration, with the old buffer value dead), then
    the layer scan reads the already-updated buffers."""
    k: jax.Array
    v: jax.Array
    sk: jax.Array
    sv: jax.Array
    m: jax.Array
    kcs: Optional[jax.Array] = None
    pk: Optional[jax.Array] = None
    pv: Optional[jax.Array] = None


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    model: ModelConfig
    max_seq_len: int = 1024
    weight_bits: int = 8
    global_kv_encoding: bool = False   # reference uses one global K/V encoding
                                       # across layers (calibrate.py:275-281);
                                       # per-layer is strictly better on TPU
    kv_bits: int = 8                   # KV-cache bitwidth: 8 = int8 cache;
                                       # 4 = nibble-packed int4 cache (two
                                       # SEQUENCE positions per byte, qops
                                       # pack_kv_s block layout) — halves the
                                       # KV read traffic that dominates the
                                       # decode step at serving batches
                                       # (bs=64 reads 740 MB KV vs 550 MB W4
                                       # weights/step, BENCHMARKS.md). The
                                       # POLICY carries the matching 4-bit
                                       # qk/pv input2 configs
                                       # (quant/policy.kv_bits_policy);
                                       # engine paths key off the policy.
                                       # Decode runs the chunked-staging
                                       # path at every B (the B<=8 mega-
                                       # kernels read int8 caches); batched
                                       # attention goes through the fused
                                       # kv4 kernel (ops/pallas_kv4.py), the
                                       # XLA fallback unpacks per layer.
    act_dtype: jnp.dtype = jnp.float32
    act_bits: int = 8                  # 8 = the static-range integer engine;
                                       # 16 = weight-only mode (W4A16/W8A16,
                                       # runtime/wonly.py — fp activations, fp
                                       # KV cache, packs dequantized on the
                                       # fly; the reference's auto_gptq path,
                                       # ref qmodule.py:868-886)
    use_pallas: bool = True            # fused-unpack kernel for nibble-packed W4
                                       # (ops/pallas_matmul.py); 8-bit matmuls
                                       # always go through XLA (already BW-bound)
    fuse_projections: bool = True      # pack q|k|v and w1|w3 as single matmuls
                                       # (per-tensor scales become per-channel
                                       # segments — numerically exact); decode at
                                       # bs=1 is dispatch-overhead-bound, fewer
                                       # ops per layer measurably helps
    head_bits: int = 16                # lm_head weights: 16 = keep act_dtype
                                       # (bf16/fp32); 8/4 = per-channel symmetric
                                       # int weights × dynamic per-token A8 —
                                       # the reference device graph runs the
                                       # head as int8 SLinear (sim_layers.py:
                                       # 34-44, convert_sim.py:144-159); on TPU
                                       # this halves/quarters the head's HBM
                                       # read per decode step (dominant for
                                       # large-vocab models like Gemma's 256k)


# ---------------------------------------------------------------------------
# Packing
# ---------------------------------------------------------------------------

_PROJ_SITES = {
    "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
    "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
    "w1": "mlp.w1", "w2": "mlp.w2", "w3": "mlp.w3",
}


def pack(params: dict, ranges: dict, config: ModelConfig, policy: QPolicy,
         ecfg: Optional[EngineConfig] = None,
         smooth_last: Optional[jax.Array] = None) -> dict:
    """Finalized (LET-folded, LWC-clamped) params + learned ranges → packed model.

    smooth_last: optional (D,) per-channel equalization vector for the
    quantized head (calibrate.smooth_last_scales — the reference's
    --smooth_last, device/convert_sim.py:114-128): the packed final norm's
    weight/bias are divided by it and the head's input rows multiplied before
    per-channel quantization — FP-output-preserving, requires head_bits 4/8
    (a tied fp head shares the embedding table and cannot be rescaled)."""
    ecfg = ecfg or EngineConfig(model=config)
    c = config
    if smooth_last is not None and ecfg.head_bits not in (4, 8):
        raise ValueError("smooth_last requires a quantized head "
                         "(head_bits 4 or 8)")

    def pack_proj(pkey, site):
        wq_cfg = policy[site].weight
        entry = params["layers"][pkey]
        packed = jax.vmap(lambda w: qops.pack_weight(w, wq_cfg))(entry["w"])
        packed["bias"] = entry["b"].astype(jnp.float32)
        return packed

    def fuse(entries: list) -> dict:
        """Concatenate packed projections along the out axis; per-tensor scales
        and offsets become per-channel segments (exactly equivalent)."""
        def chan(e, key):
            v = e[key]
            if v.ndim == 1:  # per-tensor (L,) → (L,1,N)
                L_ = v.shape[0]
                return jnp.broadcast_to(v[:, None, None],
                                        (L_, 1, e["wq"].shape[-1]))
            return v
        return {
            "wq": jnp.concatenate([e["wq"] for e in entries], axis=-1),
            "scale": jnp.concatenate([chan(e, "scale") for e in entries], axis=-1),
            "offset": jnp.concatenate([chan(e, "offset") for e in entries], axis=-1),
            "colsum": jnp.concatenate([e["colsum"] for e in entries], axis=-1),
            "bias": jnp.concatenate([e["bias"] for e in entries], axis=-1),
        }

    rr0 = jax.tree.map(jnp.asarray, ranges)

    def fq_vec(sites, widths):
        """Per-channel output fq vectors for a fused projection: one fake_quant
        with segment-constant scales ≡ the per-tensor fq of each segment.
        Frozen from the ranges at pack time (pack = the freeze step)."""
        L_ = rr0[sites[0]]["output"]["scale"].shape[0]
        scs, ofs = [], []
        for site, w in zip(sites, widths):
            r = rr0[site]["output"]
            scs.append(jnp.broadcast_to(r["scale"][:, None, None], (L_, 1, w)))
            ofs.append(jnp.broadcast_to(r["offset"][:, None, None], (L_, 1, w)))
        return (jnp.concatenate(scs, -1).astype(jnp.float32),
                jnp.concatenate(ofs, -1).astype(jnp.float32))

    layers = {}
    for pkey, site in _PROJ_SITES.items():
        if pkey in params["layers"]:
            layers[pkey] = pack_proj(pkey, site)
    if c.is_moe:
        # router stays FP — the sim's moe_block routes on the unquantized
        # gate matmul (models/model.py moe_block; ref hf_model.py:1100-1108)
        layers["router"] = {"w": params["layers"]["router"]["w"].astype(jnp.float32)}
    if ecfg.fuse_projections and not config.is_moe:
        widths_qkv = [layers["q_proj"]["wq"].shape[-1],
                      layers["k_proj"]["wq"].shape[-1],
                      layers["v_proj"]["wq"].shape[-1]]
        layers["qkv_proj"] = fuse([layers.pop("q_proj"), layers.pop("k_proj"),
                                   layers.pop("v_proj")])
        osc, oof = fq_vec(["self_attn.q_proj", "self_attn.k_proj",
                           "self_attn.v_proj"], widths_qkv)
        layers["qkv_proj"]["out_scale"] = osc
        layers["qkv_proj"]["out_offset"] = oof
        if "w3" in layers:
            widths_w13 = [layers["w1"]["wq"].shape[-1], layers["w3"]["wq"].shape[-1]]
            layers["w13_proj"] = fuse([layers.pop("w1"), layers.pop("w3")])
            osc, oof = fq_vec(["mlp.w1", "mlp.w3"], widths_w13)
            layers["w13_proj"]["out_scale"] = osc
            layers["w13_proj"]["out_offset"] = oof

    def _rows(name):
        return layers[name]["wq"].shape[1]

    qkv_seg = None
    if "qkv_proj" in layers and "w13_proj" in layers:
        Ko_ = c.num_heads * c.head_dim_
        w4p = _rows("qkv_proj") * 2 == c.hidden_size          # nibble-packed?
        dv = 2 if w4p else 1
        aligned = (_rows("qkv_proj") * dv == c.hidden_size
                   and _rows("w13_proj") * dv == c.hidden_size
                   and _rows("o_proj") * dv == Ko_
                   and _rows("w2") * dv == c.intermediate_size)
        # W4- or W8-packed fused model: build the whole-layer/whole-model
        # kernels' permuted packs (ops/pallas_layer.py — identity/shared
        # arrays when hd % 128 == 0)
        from mobilequant_tpu.ops import pallas_layer as PL
        if aligned and PL.layer_kernel_supported(c, ecfg.max_seq_len):
            layers["qkvp"], layers["op"], qkv_seg = PL.build_layer_packs(
                layers["qkv_proj"], layers["o_proj"], c)

    # norm weights: bake the 16-bit weight quantization (policy norm_w16)
    def bake_norm(nkey, site):
        entry = params["layers"][nkey]
        ncfg = policy[site].weight
        if ncfg is not None and ncfg.enabled:
            from mobilequant_tpu.quant.quantizer import fake_quant_weight
            w = jax.vmap(lambda x: fake_quant_weight(x[None, :], ncfg)[0])(entry["w"])
        else:
            w = entry["w"]
        return {"w": w.astype(jnp.float32), "b": entry["b"].astype(jnp.float32)}

    layers["attn_norm"] = bake_norm("attn_norm", "input_layernorm")
    if "mlp_norm" in params["layers"]:
        layers["mlp_norm"] = bake_norm("mlp_norm", "post_attention_layernorm")

    rr = jax.tree.map(jnp.asarray, ranges)
    if ecfg.global_kv_encoding:
        # single (scale, offset) per K and per V across layers: widen to the
        # per-layer envelope exactly like ref calibrate.py:275-281
        from mobilequant_tpu.quant.quantizer import (
            min_max_from_scale_offset, scale_offset_from_min_max)
        for site, role in (("self_attn.qk_bmm", "input2"), ("self_attn.pv_bmm", "input2")):
            cfg8 = getattr(policy[site], role)
            mn, mx = min_max_from_scale_offset(rr[site][role]["scale"],
                                               rr[site][role]["offset"], cfg8)
            s, o = scale_offset_from_min_max(jnp.min(mn), jnp.max(mx), cfg8)
            L = rr[site][role]["scale"].shape[0]
            rr[site][role] = {"scale": jnp.full((L,), s), "offset": jnp.full((L,), o)}

    # consolidate all per-layer range scalars into ONE (L, 2R) array so the
    # layer scan slices a single vector instead of ~40 tiny leaves (profiling:
    # 0.3 µs/slice × 40 × 22 layers ≈ 0.27 ms/token)
    rvec = build_rvec(rr)                     # (L, 2R)

    norm_w = params["norm"]["w"].astype(jnp.float32)
    norm_b = params["norm"]["b"].astype(jnp.float32)
    if smooth_last is not None:
        s_last = jnp.asarray(smooth_last, jnp.float32)
        norm_w = norm_w / s_last
        norm_b = norm_b / s_last
    packed = {
        "embed": params["embed"]["w"].astype(ecfg.act_dtype),
        "layers": layers,
        "ranges": rr,
        "rvec": rvec,
        "norm": {"w": norm_w, "b": norm_b},
    }
    if qkv_seg is not None:
        packed["qkv_seg"] = qkv_seg
    if ecfg.head_bits in (4, 8):
        # quantized head (SLinear analogue): per-channel symmetric W8/W4 over
        # the (D, vocab) head matrix; activations quantized dynamically per
        # token at run time (qops.int_head_linear). The embed table keeps its
        # fp storage for the lookup path (one row read per token — the
        # reference keeps the embedding fp on host too, capp export_bin.py).
        head_w = params["embed"]["w"].T if c.tie_word_embeddings \
            else params["lm_head"]["w"]
        head_w = jnp.asarray(head_w)
        if smooth_last is not None:
            head_w = head_w * s_last[:, None]
        hcfg = QuantConfig(bitwidth=ecfg.head_bits, is_symmetric=True,
                           is_per_channel=True)
        packed["head_q"] = pack_head(head_w, hcfg)
    elif not c.tie_word_embeddings:
        packed["lm_head"] = {"w": params["lm_head"]["w"].astype(ecfg.act_dtype)}
    return packed


def pack_head(head_w: jax.Array, hcfg: QuantConfig) -> dict:
    """Pack the (D, vocab) head with per-channel symmetric W8/W4 quantization,
    padding the vocab axis to a multiple of 512 so the Pallas fused-unpack
    kernel runs full-width 512-column blocks (Gemma's 256128 vocab otherwise
    forces 128-wide blocks — 2001 tiny grid steps, measured slower than the
    bf16 head). forward() slices logits back to config.vocab_size (padded
    columns have scale 0 ⇒ logits exactly 0 — sliced away, never read)."""
    hq = qops.pack_weight(head_w, hcfg)
    V = head_w.shape[1]
    pad = (-V) % 4096
    if pad:
        hq = {
            "wq": jnp.pad(hq["wq"], ((0, 0), (0, pad))),
            "scale": jnp.pad(hq["scale"].reshape(1, -1), ((0, 0), (0, pad))),
            "offset": jnp.pad(hq["offset"].reshape(1, -1), ((0, 0), (0, pad))),
            "colsum": jnp.pad(hq["colsum"], (0, pad)),
        }
    return hq


def init_kv_cache(ecfg: EngineConfig, batch_size: int) -> EngineKVCache:
    c = ecfg.model
    if ecfg.kv_bits == 4:
        # nibble-packed along the sequence axis, stored HD-MAJOR
        # (qops.pack_kv_s layout: minor dim S/2 keeps Pallas slab DMAs at
        # full HBM rate — 64-lane-minor tiles stream at half rate)
        assert ecfg.max_seq_len % 2 == 0
        shape = (c.num_layers, batch_size, c.num_kv_heads,
                 c.head_dim_, ecfg.max_seq_len // 2)
        return EngineKVCache(k=jnp.zeros(shape, jnp.int8),
                             v=jnp.zeros(shape, jnp.int8))
    shape = (c.num_layers, batch_size, c.num_kv_heads, ecfg.max_seq_len, c.head_dim_)
    # -128 == uint8 zero; exact value is irrelevant (masked out until written)
    return EngineKVCache(k=jnp.full(shape, -128, jnp.int8),
                        v=jnp.full(shape, -128, jnp.int8))


def build_rvec(ranges: dict):
    """Stack all per-layer range scalars into one (L, 2R) fp32 array (see pack).
    Per-expert (L,E) MoE entries flatten to E scale/offset column pairs."""
    idx_map = _range_index_map(ranges)
    cols = []
    for (site, role), (k, ne) in sorted(idx_map.items(), key=lambda kv: kv[1][0]):
        sc = ranges[site][role]["scale"].astype(jnp.float32)
        of = ranges[site][role]["offset"].astype(jnp.float32)
        if ne == 1 and sc.ndim == 1:
            cols.append(sc)
            cols.append(of)
        else:
            for e in range(ne):
                cols.append(sc[:, e])
                cols.append(of[:, e])
    return jnp.stack(cols, axis=1)


def _range_index_map(ranges: dict) -> dict:
    """Canonical (site, role) → (column index, n_experts) into the packed rvec
    (per-expert entries occupy n_experts consecutive scale/offset pairs).
    Derived from the ranges dict structure so pack() and forward() agree
    regardless of the runtime policy."""
    out = {}
    k = 0
    for site in sorted(ranges):
        for role in sorted(ranges[site]):
            sc = ranges[site][role]["scale"]
            ne = sc.shape[-1] if getattr(sc, "ndim", 0) == 2 else 1
            out[(site, role)] = (k, ne)
            k += 2 * ne
    return out


def _lr_from_rvec(rv, ranges_struct: dict) -> dict:
    """Rebuild the per-layer lr dict from one sliced (2R,) vector; the element
    extractions are constant-index and fuse into their consumers. Per-expert
    entries come back as (E,) vectors."""
    idx = _range_index_map(ranges_struct)
    out = {}
    for (site, role), (k, ne) in idx.items():
        if ne == 1:
            entry = {"scale": rv[k], "offset": rv[k + 1]}
        else:
            entry = {"scale": jnp.stack([rv[k + 2 * e] for e in range(ne)]),
                     "offset": jnp.stack([rv[k + 2 * e + 1]
                                          for e in range(ne)])}
        out.setdefault(site, {})[role] = entry
    return out


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fq16(x, r, cfg: QuantConfig):
    if cfg is None or not cfg.enabled:
        return x
    return fake_quant(x, r["scale"], r["offset"], cfg)


def _site_role_cfg(policy, site, role):
    """QuantConfig for a site/role, or None (site absent / role absent)."""
    sq = policy.get(site)
    return getattr(sq, role, None) if sq is not None else None


def _chunk_supported(c, max_seq_len: int, B: int) -> bool:
    from mobilequant_tpu.ops.pallas_chunk import chunk_kernel_supported
    return chunk_kernel_supported(c, max_seq_len, B)


def _fq_site(x, lr, policy, site, role):
    """Policy-gated fake-quant for optional sites (resid adds): no-op when the
    site/role is absent from the policy or disabled (relaxed serving)."""
    sq = policy.get(site)
    cfg = getattr(sq, role, None) if sq is not None else None
    if cfg is None or not cfg.enabled:
        return x
    return fake_quant(x, lr[site][role]["scale"], lr[site][role]["offset"], cfg)


def _resid_add(a, b, lr, policy, site):
    """Skip-connection add with the strict policy's 16-bit quantizers on both
    inputs and the output (ref device/utils.py:68-77, module_add ind%5 in
    [2,3,4]); an unquantized a+b when the site is relaxed/absent."""
    a = _fq_site(a, lr, policy, site, "input")
    b = _fq_site(b, lr, policy, site, "input2")
    return _fq_site(a + b, lr, policy, site, "output")


def _int_linear(x_q, s, o, pack, bias, kc: KernelConfig, spack=None, li=None):
    """Integer matmul dispatch. kc.w4_matmul routes nibble-packed W4 through
    the fused-unpack Pallas kernels; kc.w8_matmul routes decode-sized 8-bit
    matmuls through the Pallas w8a8 kernel (XLA lowers M≲8 int8 dots as
    broadcast·multiply·reduce on the VPU instead of the MXU, several× slower
    than the bandwidth bound); kc.pad8 instead pads the rows to 8.

    spack/li: the layer-STACKED pack + traced layer index. Inside the layer
    scan the Pallas kernel must take the stacked array directly (layer selected
    by a scalar-prefetch index map) — XLA materializes the scan's per-layer
    dynamic-slice before a custom call, a full HBM→HBM weight copy per layer
    per step that costs more than the matmul itself (BENCHMARKS.md, Gemma W4
    trace: 102.6 µs/layer of slice copies vs 49.5 µs of kernel)."""
    K = x_q.shape[-1]
    lead = x_q.shape[:-1]
    m_flat = 1
    for d in lead:
        m_flat *= d
    if kc.w4_matmul and pack["wq"].shape[0] * 2 == K:
        from mobilequant_tpu.ops.pallas_matmul import (int_linear_pallas,
                                                       int_linear_pallas_stacked)
        if spack is not None and li is not None:
            return int_linear_pallas_stacked(x_q, s, o, spack, li)
        return int_linear_pallas(x_q, s, o, pack, bias)
    if kc.w8_matmul and pack["wq"].shape[0] == K and m_flat <= 32:
        from mobilequant_tpu.ops.pallas_matmul import w8a8_matmul
        N = pack["wq"].shape[1]
        out = w8a8_matmul(x_q.reshape(-1, K), pack["wq"], pack["scale"],
                          pack["offset"], pack["colsum"],
                          bias if bias is not None else jnp.zeros((N,)), s, o)
        return out.reshape(*lead, N)
    if kc.pad8 and m_flat < 8:
        # XLA lowers M<8 int8 dots to a VPU broadcast·multiply·reduce; padding
        # the activation rows to 8 flips it onto the MXU path (wasted rows are
        # free — the op is weight-bandwidth-bound)
        x2 = x_q.reshape(-1, K)
        xp = jnp.concatenate(
            [x2, jnp.zeros((8 - x2.shape[0], K), x2.dtype)], axis=0)
        out = qops.int_linear(xp, s, o, pack, bias)
        return out[:m_flat].reshape(*lead, pack["wq"].shape[1])
    return qops.int_linear(x_q, s, o, pack, bias)


def _qmax(cfg) -> float:
    """Kernel-meta encoding of a fake-quant site: the clip bound (qcfg.qmax)
    when enabled, 0.0 = disabled. One scalar carries both the enable flag and
    the bitwidth, so the kernels clip 8- and 16-bit sites correctly."""
    return float(cfg.qmax) if (cfg is not None and cfg.enabled) else 0.0


def _attn_meta(lr, policy, c):
    """(13,) fp32 meta vector shared by the fused attention kernels
    (ops/pallas_attention.py and ops/pallas_prefill_attention.py)."""
    qk = lr["self_attn.qk_bmm"]
    pv = lr["self_attn.pv_bmm"]

    qk_out_cfg = policy["self_attn.qk_bmm"].output
    pv_in_cfg = policy["self_attn.pv_bmm"].input
    qk_q = _qmax(qk_out_cfg)
    pv_q = _qmax(pv_in_cfg)
    return jnp.stack([
        qk["input"]["scale"], qk["input"]["offset"],
        qk["input2"]["scale"], qk["input2"]["offset"],
        pv["input2"]["scale"], pv["input2"]["offset"],
        jnp.where(qk_q > 0, qk["output"]["scale"], 1.0),
        jnp.where(qk_q > 0, qk["output"]["offset"], 0.0),
        jnp.float32(qk_q),
        jnp.where(pv_q > 0, pv["input"]["scale"], 1.0),
        jnp.where(pv_q > 0, pv["input"]["offset"], 0.0),
        jnp.float32(pv_q),
        jnp.float32(c.neg_inf),
    ]).astype(jnp.float32)


def _mlp_block_meta(lr, policy, c):
    """(BLOCK_META_LEN,) fp32 meta for the whole-MLP-block kernels
    (ops/pallas_mlp.py header documents the layout). Fake-quant entries are
    (scale, offset, qmax) triples — qmax 0 disables, 255/65535 pick the
    8/16-bit clip (so the Gemma use_16bit_output_for_mlp policy and the
    strict resid_add_2 site run bit-exactly in-kernel)."""
    def qm(site, role):
        return jnp.float32(_qmax(getattr(policy[site], role, None))
                           if site in policy else 0.0)

    def rngb(site, role, default=(1.0, 0.0)):
        entry = lr.get(site, {})
        if role in entry:
            return entry[role]["scale"], entry[role]["offset"]
        return jnp.float32(default[0]), jnp.float32(default[1])

    nsite = "post_attention_layernorm"
    w1s, w1o = rngb("mlp.w1", "output")
    sgs, sgo = rngb("mlp.act_fn", "input2")
    aos, aoo = rngb("mlp.act_fn", "output")
    w3s, w3o = rngb("mlp.w3", "output")
    lis, lio = rngb(nsite, "input")
    w2os, w2oo = rngb("mlp.w2", "output")
    r2is, r2io = rngb("resid_add_2", "input")
    r2js, r2jo = rngb("resid_add_2", "input2")
    r2os, r2oo = rngb("resid_add_2", "output")
    return jnp.stack([
        lr[nsite]["output"]["scale"], lr[nsite]["output"]["offset"],
        w1s, w1o, qm("mlp.w1", "output"),
        sgs, sgo, qm("mlp.act_fn", "input2"),
        aos, aoo, qm("mlp.act_fn", "output"),
        w3s, w3o, qm("mlp.w3", "output"),
        lr["mlp.w2"]["input"]["scale"], lr["mlp.w2"]["input"]["offset"],
        lis, lio, qm(nsite, "input"),
        jnp.float32(c.norm_eps),
        w2os, w2oo, qm("mlp.w2", "output"),
        r2is, r2io, qm("resid_add_2", "input"),
        r2js, r2jo, qm("resid_add_2", "input2"),
        r2os, r2oo, qm("resid_add_2", "output"),
    ]).astype(jnp.float32)


def _otail_meta_ext(lr, policy):
    """(14,) extension of _mlp_block_meta for the attention-tail kernel
    (ops/pallas_mlp._otail_block_kernel header documents the layout):
    a8 quant (pv_bmm output), o output fq, resid_add_1 in/in2/out."""
    def qm(site, role):
        sq = policy.get(site)
        return jnp.float32(_qmax(getattr(sq, role, None))
                           if sq is not None else 0.0)

    def rngb(site, role):
        entry = lr.get(site, {})
        if role in entry:
            return entry[role]["scale"], entry[role]["offset"]
        return jnp.float32(1.0), jnp.float32(0.0)

    pv = lr["self_attn.pv_bmm"]["output"]
    oos, ooo = rngb("self_attn.o_proj", "output")
    r1s, r1o = rngb("resid_add_1", "input")
    r2s, r2o = rngb("resid_add_1", "input2")
    ros, roo = rngb("resid_add_1", "output")
    return jnp.stack([
        pv["scale"], pv["offset"],
        oos, ooo, qm("self_attn.o_proj", "output"),
        r1s, r1o, qm("resid_add_1", "input"),
        r2s, r2o, qm("resid_add_1", "input2"),
        ros, roo, qm("resid_add_1", "output"),
    ]).astype(jnp.float32)


def _otail_site_on(policy) -> tuple:
    """STATIC enables for the attention-tail kernel's optional fq sites:
    (o_proj output, resid_add_1 input, input2, output)."""
    def on(site, role):
        sq = policy.get(site)
        cfg = getattr(sq, role, None) if sq is not None else None
        return bool(cfg is not None and cfg.enabled)

    return (on("self_attn.o_proj", "output"),
            on("resid_add_1", "input"),
            on("resid_add_1", "input2"),
            on("resid_add_1", "output"))


def _mlp_block_site_on(policy) -> tuple:
    """STATIC enable flags for the MLP-block kernel's optional fake-quant
    sites (ops/pallas_mlp._w4_mlp_phase site_on order). Mirrors the meta
    qmax-0-disables convention, but at trace time — the kernel skips the dead
    VPU chains instead of computing them and discarding (the relaxed serving
    policy disables 5 full-width sites per layer)."""
    def on(site, role):
        cfg = getattr(policy[site], role, None) if site in policy else None
        return bool(cfg is not None and cfg.enabled)

    return (on("post_attention_layernorm", "input"),
            on("mlp.w1", "output"),
            on("mlp.act_fn", "input2"),
            on("mlp.act_fn", "output"),
            on("mlp.w3", "output"),
            on("mlp.w2", "output"),
            on("resid_add_2", "input"),
            on("resid_add_2", "input2"),
            on("resid_add_2", "output"))


def _layer_meta(lr, policy, c):
    """(pallas_layer.LAYER_META_LEN,) fp32 meta for the whole-layer kernel:
    ATTN head section (ops/pallas_layer.py header) + the MLP section
    (_mlp_block_meta order). Fake-quant entries carry qmax (0 = disabled)."""
    def qm(site, role):
        return jnp.float32(_qmax(getattr(policy[site], role, None))
                           if site in policy else 0.0)

    def rng(site, role, default=(1.0, 0.0)):
        entry = lr.get(site, {})
        if role in entry:
            return entry[role]["scale"], entry[role]["offset"]
        return jnp.float32(default[0]), jnp.float32(default[1])

    qk = lr["self_attn.qk_bmm"]
    pv = lr["self_attn.pv_bmm"]
    lis, lio = rng("input_layernorm", "input")
    qos, qoo = rng("self_attn.qk_bmm", "output")
    pis, pio = rng("self_attn.pv_bmm", "input")
    oos, ooo = rng("self_attn.o_proj", "output")
    r1is, r1io = rng("resid_add_1", "input")
    r1js, r1jo = rng("resid_add_1", "input2")
    r1os, r1oo = rng("resid_add_1", "output")
    head = jnp.stack([
        lis, lio, qm("input_layernorm", "input"),
        jnp.float32(c.norm_eps),
        lr["input_layernorm"]["output"]["scale"],
        lr["input_layernorm"]["output"]["offset"],
        qk["input"]["scale"], qk["input"]["offset"],
        qk["input2"]["scale"], qk["input2"]["offset"],
        pv["input2"]["scale"], pv["input2"]["offset"],
        qos, qoo, qm("self_attn.qk_bmm", "output"),
        pis, pio, qm("self_attn.pv_bmm", "input"),
        jnp.float32(c.neg_inf),
        lr["self_attn.pv_bmm"]["output"]["scale"],
        lr["self_attn.pv_bmm"]["output"]["offset"],
        oos, ooo, qm("self_attn.o_proj", "output"),
        r1is, r1io, qm("resid_add_1", "input"),
        r1js, r1jo, qm("resid_add_1", "input2"),
        r1os, r1oo, qm("resid_add_1", "output"),
    ]).astype(jnp.float32)
    return jnp.concatenate([head, _mlp_block_meta(lr, policy, c)])


def _qkv_ofq_rows(lp, sp, lr, policy):
    """(4, Nq) [scale, offset, clipmax, enabled] per PACKED qkv column for the
    whole-layer kernel's qkv output fake-quant — branch-exact with
    _layer_forward: the fused per-channel qcfg8 fq when enabled, else the
    per-segment fq via the pack-time seg-id map (q=0/k=1/v=2)."""
    qcfg8 = policy["self_attn.q_proj"].output
    qkvp = lp["qkvp"]
    Nq = qkvp["wq"].shape[-1]
    if "out_scale" in qkvp and qcfg8 is not None and qcfg8.enabled:
        sc = jnp.reshape(qkvp["out_scale"], (1, Nq))   # lp slice: (1,Nq)/(L,1,Nq)
        of = jnp.reshape(qkvp["out_offset"], (1, Nq))
        cm = jnp.full((1, Nq), float(qcfg8.qmax), jnp.float32)
        en = jnp.ones((1, Nq), jnp.float32)
        return jnp.concatenate([sc, of, cm, en], axis=0)
    seg = sp["qkv_seg"]
    rows = []
    vals = []
    if lr is None:
        lr = {}
    for site in ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"):
        cfg = policy[site].output
        en_ = cfg is not None and cfg.enabled
        entry = lr.get(site, {}).get("output",
                                     {"scale": jnp.float32(1.0),
                                      "offset": jnp.float32(0.0)})
        vals.append((entry["scale"], entry["offset"],
                     jnp.float32(float(cfg.qmax) if en_ else 1.0),
                     jnp.float32(1.0 if en_ else 0.0)))
    for i in range(4):
        rows.append(jnp.where(seg == 0, vals[0][i],
                              jnp.where(seg == 1, vals[1][i], vals[2][i])))
    return jnp.stack(rows).astype(jnp.float32)


def _qkv_ofq_rows_stacked(packed: dict, policy: QPolicy, c) -> jax.Array:
    """(L, 4, Nq) qkv output-fq rows for the whole-model kernel (the stacked
    analogue of _qkv_ofq_rows)."""
    qkvp = packed["layers"]["qkvp"]
    L, _, Nq = qkvp["wq"].shape
    qcfg8 = policy["self_attn.q_proj"].output
    if "out_scale" in qkvp and qcfg8 is not None and qcfg8.enabled:
        sc = jnp.reshape(qkvp["out_scale"], (L, 1, Nq))
        of = jnp.reshape(qkvp["out_offset"], (L, 1, Nq))
        cm = jnp.full((L, 1, Nq), float(qcfg8.qmax), jnp.float32)
        en = jnp.ones((L, 1, Nq), jnp.float32)
        return jnp.concatenate([sc, of, cm, en], axis=1)
    seg = packed["qkv_seg"]
    fake_lp = {"qkvp": {"wq": qkvp["wq"][0]}}     # no out_scale -> seg branch

    def per_layer(rv):
        lr = _lr_from_rvec(rv, packed["ranges"])
        return _qkv_ofq_rows(fake_lp, {"qkv_seg": seg}, lr, policy)

    return jax.vmap(per_layer)(packed["rvec"])


def _rope_cs_rows(cos, sin, hd: int, rot: int):
    """(M, 2*hd) per-ROW [cos | sign-baked sin] for the prefill qkv epilogue
    kernel (ops/pallas_qkv.py) — the M-row analogue of _rope_cs_vec."""
    rd = cos.shape[-1]
    c1 = cos.reshape(-1, rd)[:, :rot].astype(jnp.float32)
    s1 = sin.reshape(-1, rd)[:, :rot].astype(jnp.float32)
    Mr = c1.shape[0]
    sgn = jnp.concatenate([jnp.full((rot // 2,), -1.0, jnp.float32),
                           jnp.ones((rot // 2,), jnp.float32)])[None, :]
    s1 = s1 * sgn
    if rot < hd:
        c1 = jnp.concatenate([c1, jnp.ones((Mr, hd - rot), jnp.float32)], 1)
        s1 = jnp.concatenate([s1, jnp.zeros((Mr, hd - rot), jnp.float32)], 1)
    return jnp.concatenate([c1, s1], axis=1)


def _qkv_outq_rows(lr, c):
    """(3, Nq) [segment quant scale, segment quant offset, rope mask] rows
    for the prefill qkv epilogue kernel (canonical q|k|v column order):
    q columns carry the qk_bmm input encoding, k the qk_bmm input2 (int8
    K-cache), v the pv_bmm input2 (int8 V-cache); v columns don't rope."""
    qk = lr["self_attn.qk_bmm"]
    pv = lr["self_attn.pv_bmm"]
    qd, kvd = c.q_dim, c.kv_dim

    def seg(qv, kv_, vv):
        return jnp.concatenate([jnp.broadcast_to(qv, (qd,)),
                                jnp.broadcast_to(kv_, (kvd,)),
                                jnp.broadcast_to(vv, (kvd,))])

    sc = seg(qk["input"]["scale"], qk["input2"]["scale"],
             pv["input2"]["scale"])
    of = seg(qk["input"]["offset"], qk["input2"]["offset"],
             pv["input2"]["offset"])
    mask = jnp.concatenate([jnp.ones((qd + kvd,), jnp.float32),
                            jnp.zeros((kvd,), jnp.float32)])
    return jnp.stack([sc, of, mask]).astype(jnp.float32)


def _rope_cs_vec(cos, sin, hd: int, rot: int):
    """(B, 2, hd) per-sequence [cos; sign-baked sin] rows for the layer/model
    kernels' in-VMEM RoPE (cos=1 / sin=0 outside the rotary dims; the
    rotate_half sign is baked into the sin row's first half)."""
    B = cos.shape[0]
    c1 = cos.reshape(B, -1)[:, :rot].astype(jnp.float32)
    s1 = sin.reshape(B, -1)[:, :rot].astype(jnp.float32)
    sgn = jnp.concatenate([jnp.full((rot // 2,), -1.0, jnp.float32),
                           jnp.ones((rot // 2,), jnp.float32)])[None, :]
    s1 = s1 * sgn
    if rot < hd:
        c1 = jnp.concatenate([c1, jnp.ones((B, hd - rot), jnp.float32)], 1)
        s1 = jnp.concatenate([s1, jnp.zeros((B, hd - rot), jnp.float32)], 1)
    return jnp.stack([c1, s1], axis=1)


def _decode_light_attention(q8, k8_new, v8_new, k_cache, v_cache, qk, pv,
                            policy, cache_position, c, B, Hkv, G, hd,
                            ks=None, vs=None, staged_len=None, k_colsum=None):
    """Decode-light attention math: scores over the STALE cache (masked to
    positions < cache_position) plus the self term for the step's own K/V
    rows — the cache is never rewritten inside the layer scan.

    ks/vs/staged_len: chunked-staging mode (StagedKVCache) — this layer's
    (B,Hkv,n,hd) staged rows from the chunk's earlier steps participate as
    extra columns masked to col < staged_len; cache_position is then the
    CHUNK-START position (the cache holds nothing newer).
    k_colsum: chunk-constant Σ_hd k_cache (B,Hkv,S) — see StagedKVCache.kcs.

    The softmax runs PARTWISE (one shared row-max, per-part exp/sum, shared
    denominator) instead of concatenating the cache/staged/self score parts
    into one (B,Hkv,G,S+n+1) row: the concat materialized a second full-width
    score tensor (4.98 µs/layer at bs=32 plus the softmax re-reading it,
    traced 2026-08-19). Same math to fp32 rounding — max is exact, exp is
    elementwise, only the denominator's summation order differs."""
    S = k_cache.shape[2]
    qg = jnp.transpose(q8.reshape(B, 1, Hkv, G, hd), (0, 2, 3, 1, 4))
    qg = qg.reshape(B, Hkv, G, hd)
    scores_c = qops.int_matmul_qk(qg, k_cache,
                                  qk["input"]["scale"], qk["input"]["offset"],
                                  qk["input2"]["scale"], qk["input2"]["offset"],
                                  k_colsum=k_colsum)
    # self term: (q−oq)·(k_new−ok)·sq·sk over hd
    oqv = qk["input"]["offset"] - 128.0
    okv = qk["input2"]["offset"] - 128.0
    qf = qg.astype(jnp.float32)                       # (B,Hkv,G,hd)
    kf = k8_new.astype(jnp.float32)                   # (B,Hkv,1,hd)
    s_self = jnp.sum((qf - oqv) * (kf - okv), axis=-1, keepdims=True) \
        * (qk["input"]["scale"] * qk["input2"]["scale"])  # (B,Hkv,G,1)
    qk_out_cfg = policy["self_attn.qk_bmm"].output
    scores_c = _fq16(scores_c, qk["output"], qk_out_cfg)
    s_self = _fq16(s_self, qk["output"], qk_out_cfg)
    inv = 1.0 / math.sqrt(hd)
    col = jnp.arange(S)[None, None, None, :]
    maskc = jnp.where(col < cache_position[:, None, None, None], 0.0, c.neg_inf)
    lg_c = (scores_c * inv + maskc).astype(jnp.float32)     # (B,Hkv,G,S)
    lg_self = (s_self * inv).astype(jnp.float32)            # (B,Hkv,G,1)
    m = jnp.maximum(jnp.max(lg_c, axis=-1), lg_self[..., 0])
    lg_st = None
    if ks is not None:
        n_st = ks.shape[2]
        scores_st = qops.int_matmul_qk(qg, ks,
                                       qk["input"]["scale"],
                                       qk["input"]["offset"],
                                       qk["input2"]["scale"],
                                       qk["input2"]["offset"])
        scores_st = _fq16(scores_st, qk["output"], qk_out_cfg)
        col_st = jnp.arange(n_st)[None, None, None, :]
        mask_st = jnp.where(col_st < staged_len, 0.0, c.neg_inf)
        lg_st = (scores_st * inv + mask_st).astype(jnp.float32)  # (B,Hkv,G,n)
        m = jnp.maximum(m, jnp.max(lg_st, axis=-1))
    m = m[..., None]
    e_c = jnp.exp(lg_c - m)
    e_self = jnp.exp(lg_self - m)
    denom = jnp.sum(e_c, axis=-1, keepdims=True) + e_self
    if lg_st is not None:
        e_st = jnp.exp(lg_st - m)
        denom = denom + jnp.sum(e_st, axis=-1, keepdims=True)
    pv_in_cfg = policy["self_attn.pv_bmm"].input
    p_c = _fq16(e_c / denom, pv["input"], pv_in_cfg)
    p_self = _fq16(e_self / denom, pv["input"], pv_in_cfg)
    attn = qops.int_matmul_pv(p_c, v_cache,
                              pv["input2"]["scale"], pv["input2"]["offset"])
    if lg_st is not None:
        p_st = _fq16(e_st / denom, pv["input"], pv_in_cfg)
        attn = attn + qops.int_matmul_pv(p_st, vs,
                                         pv["input2"]["scale"],
                                         pv["input2"]["offset"])
    v_new_f = (v8_new.astype(jnp.float32) + 128.0
               - pv["input2"]["offset"]) * pv["input2"]["scale"]  # (B,Hkv,1,hd)
    attn = attn + p_self * v_new_f
    attn = attn.reshape(B, Hkv, G, 1, hd)
    Hq = Hkv * G
    return jnp.transpose(attn, (0, 3, 1, 2, 4)).reshape(B, 1, Hq * hd)


def _kv4_decode_light_attention(q8, k8_new, v8_new, kp, vp, qk, pv, policy,
                                cache_position, c, B, Hkv, G, hd,
                                ks=None, vs=None, staged_len=None,
                                k_colsum=None):
    """Decode-light attention over the PACKED int4 cache — the XLA fallback
    that mirrors ops/pallas_kv4._kv4_attn_kernel op for op (same 4-part
    {cache_lo, cache_hi, staged, self} split, same summation order), so the
    kernel and the fallback produce bit-identical results on one backend and
    the decode stream never depends on which path dispatched. The nibble
    unpack materializes here (correctness path, not the serving path).

    kp/vp: (B, Hkv, hd, S/2) packed hd-major; k_colsum: (B, Hkv, S)
    SHIFTED-domain colsums (qops.kv_colsums_packed) or None (computed from
    the packed bytes)."""
    S2 = kp.shape[3]
    qg = jnp.transpose(q8.reshape(B, 1, Hkv, G, hd), (0, 2, 3, 1, 4))
    qi = qg.reshape(B, Hkv, G, hd)                       # int8 shifted
    qf = qi.astype(jnp.float32)
    qs = jnp.sum(qf, axis=-1, keepdims=True)             # (B,Hkv,G,1)
    sq = qk["input"]["scale"]
    oqs = qk["input"]["offset"] - 128.0
    skk, ok = qk["input2"]["scale"], qk["input2"]["offset"]
    sv_, ov = pv["input2"]["scale"], pv["input2"]["offset"]
    oks = ok - 128.0
    inv = 1.0 / math.sqrt(hd)
    qk_out_cfg = policy["self_attn.qk_bmm"].output
    pv_in_cfg = policy["self_attn.pv_bmm"].input
    qk_fq_on = bool(qk_out_cfg is not None and qk_out_cfg.enabled)
    pv_fq_on = bool(pv_in_cfg is not None and pv_in_cfg.enabled)
    cf = (sq * skk) if qk_fq_on else (sq * skk * inv)

    if k_colsum is None:
        k_colsum = qops.kv_colsums_packed(kp)            # (B,Hkv,S) shifted

    k_lo = kp & 0x0F                                     # (B,Hkv,hd,S2)
    k_hi = ((kp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)

    def part_raw(k4, ksum_sh):
        # q (B,Hkv,G,hd) × kT (B,Hkv,hd,S2) → (B,Hkv,G,S2)
        acc = jax.lax.dot_general(
            qi, k4, (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        sc = (acc - ok * qs - oqs * (ksum_sh[:, :, None, :] + 128.0 * hd)
              + hd * oqs * ok) * cf
        if qk_fq_on:
            sc = _fq16(sc, qk["output"], qk_out_cfg) * inv
        return sc

    col = jnp.arange(S2)[None, None, None, :]
    posb = cache_position[:, None, None, None]
    lg_lo = part_raw(k_lo, k_colsum[..., :S2]) \
        + jnp.where(col < posb, 0.0, c.neg_inf)
    lg_hi = part_raw(k_hi, k_colsum[..., S2:]) \
        + jnp.where(S2 + col < posb, 0.0, c.neg_inf)

    lg_st = None
    if ks is not None:
        n_st = ks.shape[2]
        kss = jnp.sum(ks.astype(jnp.int32), axis=-1).astype(jnp.float32)
        acc_st = jax.lax.dot_general(
            qi, ks, (((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        sc_st = (acc_st - oks * qs - oqs * kss[:, :, None, :]
                 + hd * oqs * oks) * cf
        if qk_fq_on:
            sc_st = _fq16(sc_st, qk["output"], qk_out_cfg) * inv
        col2 = jnp.arange(n_st)[None, None, None, :]
        lg_st = sc_st + jnp.where(col2 < staged_len, 0.0, c.neg_inf)

    kn = k8_new.astype(jnp.float32)                      # (B,Hkv,1,hd)
    s_self = jnp.sum((qf - oqs) * (kn - oks), axis=-1,
                     keepdims=True) * (sq * skk)
    if qk_fq_on:
        s_self = _fq16(s_self, qk["output"], qk_out_cfg)
    lg_self = s_self * inv                               # (B,Hkv,G,1)

    mx = jnp.maximum(jnp.max(lg_lo, axis=-1, keepdims=True),
                     jnp.max(lg_hi, axis=-1, keepdims=True))
    if lg_st is not None:
        mx = jnp.maximum(mx, jnp.max(lg_st, axis=-1, keepdims=True))
    mx = jnp.maximum(mx, lg_self)
    e_lo = jnp.exp(lg_lo - mx)
    e_hi = jnp.exp(lg_hi - mx)
    e_st = jnp.exp(lg_st - mx) if lg_st is not None else None
    e_self = jnp.exp(lg_self - mx)
    den = (jnp.sum(e_lo, axis=-1, keepdims=True)
           + jnp.sum(e_hi, axis=-1, keepdims=True))
    if e_st is not None:
        den = den + jnp.sum(e_st, axis=-1, keepdims=True)
    den = den + e_self

    v_lo = (vp & 0x0F).astype(jnp.float32)               # (B,Hkv,hd,S2)
    v_hi = ((vp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.float32)
    vst_raw = (vs & 0x0F).astype(jnp.float32) if vs is not None else None
    vn_raw = (v8_new & 0x0F).astype(jnp.float32)         # (B,Hkv,1,hd)

    def pvdot(p, vpart):
        # p (B,Hkv,G,S2) × vT (B,Hkv,hd,S2): contract the shared minor S2
        return jax.lax.dot_general(
            p, vpart, (((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)

    def pvdot_st(p, vpart):
        # staged V stays row-major (cs, hd)
        return jax.lax.dot_general(
            p, vpart, (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)

    if pv_fq_on:
        p_lo = _fq16(e_lo / den, pv["input"], pv_in_cfg)
        p_hi = _fq16(e_hi / den, pv["input"], pv_in_cfg)
        p_self = _fq16(e_self / den, pv["input"], pv_in_cfg)
        psum = (jnp.sum(p_lo, axis=-1, keepdims=True)
                + jnp.sum(p_hi, axis=-1, keepdims=True))
        A = pvdot(p_lo, v_lo) + pvdot(p_hi, v_hi)
        if e_st is not None:
            p_st = _fq16(e_st / den, pv["input"], pv_in_cfg)
            psum = psum + jnp.sum(p_st, axis=-1, keepdims=True)
            A = A + pvdot_st(p_st, vst_raw)
        psum = psum + p_self
        A = A + p_self * vn_raw
        attn = (A - ov * psum) * sv_
    else:
        A = pvdot(e_lo, v_lo) + pvdot(e_hi, v_hi)
        if e_st is not None:
            A = A + pvdot_st(e_st, vst_raw)
        A = A + e_self * vn_raw
        attn = (A / den - ov) * sv_
    attn = attn.reshape(B, Hkv, G, 1, hd)
    Hq = Hkv * G
    return jnp.transpose(attn, (0, 3, 1, 2, 4)).reshape(B, 1, Hq * hd)


def _layer_forward(lp, lr, x, cos, sin, mask, kv, cache_position,
                   config: ModelConfig, policy: QPolicy,
                   kc: KernelConfig = KernelConfig(),
                   kv_valid_len=None, positions=None, sp=None, li=None,
                   cp_mesh=None, cp_axis="cp", tp_mesh=None, tp_axis="tp",
                   st=None, staged_len=None, k_colsum=None,
                   kv_bits: int = 8, kv_packed: bool = False):
    """One decoder layer on packed ints. lp/lr = this layer's packed params/ranges.
    sp/li: the full layer-stacked packed dict + this layer's traced index —
    lets the W4 Pallas path read weights straight from the stack (see
    _int_linear) instead of through the scan's materialized slice.
    kv = (k8, v8) slices (B,S,Hkv,hd). Mirrors quant/qmodel.QuantOps order exactly."""
    c = config
    B, T, D = x.shape
    hd, Hq, Hkv = c.head_dim_, c.num_heads, c.num_kv_heads
    G = Hq // Hkv

    def _sp(key):
        return sp[key] if (sp is not None and li is not None
                           and key in sp) else None

    def _row_parallel_linear(x8, s, o, pack_, bias_, spk):
        """Row-parallel (K-sharded) site: with a tp_mesh, route through the
        ring matmul-reduce-scatter (collective matmul — the partial-sum
        transfer overlaps the chunk matmuls, vs GSPMD's matmul→all-reduce);
        W8 unfused packs only (nibble rows interleave K-halves)."""
        if (tp_mesh is not None and pack_["wq"].shape[0] == x8.shape[-1]
                and x8.shape[-1] % tp_mesh.shape[tp_axis] == 0
                and pack_["wq"].shape[1] % tp_mesh.shape[tp_axis] == 0):
            from mobilequant_tpu.parallel.collective_matmul import (
                int_linear_reduce_scatter)
            return int_linear_reduce_scatter(x8, s, o, pack_, bias_,
                                             tp_mesh, tp_axis)
        return _int_linear(x8, s, o, pack_, bias_, kc, spk, li)

    if (sp is not None and li is not None and T == 1 and B == 1
            and cache_position is not None and "qkvp" in sp and "op" in sp
            and "kcache" in sp and "w13_proj" in sp and "mlp_norm" in lp
            and kc.layer_kernel and not c.parallel_residual
            and not c.is_moe and c.hidden_act in ("silu", "gelu_tanh")):
        # whole-layer W4 megakernel: norm->qkv->rope->decode-light attention->
        # o-proj->residual->MLP block in ONE stacked-layer dispatch
        from mobilequant_tpu.ops import pallas_layer as _PL
        meta = _layer_meta(lr, policy, c)
        ofq = _qkv_ofq_rows(lp, sp, lr, policy)
        out, kvnew = _PL.fused_layer_w4_stacked(
            x.reshape(1, D).astype(jnp.float32), cache_position[0:1],
            sp["rope_cs"][0], ofq, sp["attn_norm"]["w"], sp["attn_norm"]["b"],
            sp["qkvp"], sp["op"], sp["mlp_norm"]["w"], sp["mlp_norm"]["b"],
            sp["w13_proj"], sp["w2"], sp["kcache"], sp["vcache"], meta, li,
            num_q_heads=Hq, num_kv_heads=Hkv, head_dim=hd,
            rotary_dim=c.rotary_dim, act_kind=c.hidden_act,
            norm_kind="layernorm" if c.norm_class == "layernorm" else "rmsnorm")
        k_new = kvnew[:Hkv].reshape(1, Hkv, 1, hd)
        v_new = kvnew[Hkv:].reshape(1, Hkv, 1, hd)
        return out.reshape(B, T, D).astype(x.dtype), (k_new, v_new)

    def norm(x, nw, site):
        x = _fq16(x, lr[site]["input"], policy[site].input)
        xf = x.astype(jnp.float32)
        if c.norm_class == "layernorm":
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
            y = (xf - mu) * jax.lax.rsqrt(var + c.norm_eps)
        else:
            y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + c.norm_eps)
        return y * nw["w"] + nw["b"]

    def out_q8(y, site):
        """Quantize an op output to its int8 representation + keep fp view."""
        r = lr[site]["output"]
        y8 = qops.quantize_act(y, r["scale"], r["offset"])
        return y8, r

    # --- attention ---
    h = norm(x, lp["attn_norm"], "input_layernorm")
    h8, hr = out_q8(h, "input_layernorm")

    def proj(pkey, site):
        y = _int_linear(h8, hr["scale"], hr["offset"], lp[pkey], lp[pkey]["bias"],
                        kc, _sp(pkey), li)
        return _fq16(y, lr[site]["output"], policy[site].output)

    qkv_done = False
    if (kc.gate_kernel and "qkv_proj" in lp and li is not None and T > 1
            and kv_bits == 8):
        # (kv_bits gate: the epilogue kernel's joint segment quantization
        # clips at 255; 4-bit K/V rows need the per-segment 15 clip)
        # prefill qkv epilogue kernel: output fq + RoPE + joint segment
        # quantization fold into the stacked qkv matmul (the attention-side
        # twin of w13_gate_stacked; ops/pallas_qkv.py)
        spq = _sp("qkv_proj")
        # W4 packs only: measured -0.88 ms/pass there (16.41 -> 15.53 at
        # T=1024); on W8 the custom-call boundary unfuses two ~54 us/layer
        # reduce fusions and the net is slightly NEGATIVE (15.05 -> 15.34)
        if spq is not None and spq["wq"].shape[1] * 2 == D:
            from mobilequant_tpu.ops import pallas_qkv as _PQ
            if _PQ.qkv_kernel_supported(c, spq["wq"].shape[2],
                                        spq["wq"].shape[1]):
                import numpy as _np
                qd, kvd = Hq * hd, Hkv * hd
                canon_seg = jnp.asarray(
                    _np.repeat(_np.array([0] * Hq + [1] * Hkv + [2] * Hkv),
                               hd), jnp.int32)
                # canonical (unpermuted) pack + seg map: reuse the ofq-row
                # builder with the qkv_proj entry standing in for qkvp
                ofq = _qkv_ofq_rows({"qkvp": lp["qkv_proj"]},
                                    {"qkv_seg": canon_seg}, lr, policy)
                outq = _qkv_outq_rows(lr, c)
                cs_rows = _rope_cs_rows(cos, sin, hd, c.rotary_dim)
                meta2 = jnp.stack([lr["input_layernorm"]["output"]["scale"],
                                   lr["input_layernorm"]["output"]["offset"]
                                   ]).astype(jnp.float32)
                q8kv = _PQ.qkv_rope_stacked(
                    h8.reshape(B * T, D), spq, ofq, outq, cs_rows, meta2, li,
                    head_dim=hd, rotary_dim=c.rotary_dim)
                q8 = q8kv[:, :qd].reshape(B, T, Hq, hd)
                k8_new = q8kv[:, qd:qd + kvd].reshape(B, T, Hkv, hd)
                v8_new = q8kv[:, qd + kvd:].reshape(B, T, Hkv, hd)
                k8_new = jnp.transpose(k8_new, (0, 2, 1, 3))
                v8_new = jnp.transpose(v8_new, (0, 2, 1, 3))
                qk = lr["self_attn.qk_bmm"]
                pv = lr["self_attn.pv_bmm"]
                qkv_done = True
    if qkv_done:
        pass
    elif "qkv_proj" in lp:
        qkv = _int_linear(h8, hr["scale"], hr["offset"], lp["qkv_proj"],
                          lp["qkv_proj"]["bias"], kc, _sp("qkv_proj"), li)
        qd, kvd = Hq * hd, Hkv * hd
        qcfg8 = policy["self_attn.q_proj"].output
        if "out_scale" in lp["qkv_proj"] and qcfg8 is not None and qcfg8.enabled:
            # one per-channel fq (segment-constant scales) ≡ three per-tensor fqs
            qkv = fake_quant(qkv, lp["qkv_proj"]["out_scale"][0],
                             lp["qkv_proj"]["out_offset"][0], qcfg8)
            q, k, v = (qkv[..., :qd], qkv[..., qd:qd + kvd], qkv[..., qd + kvd:])
        else:
            q = _fq16(qkv[..., :qd], lr["self_attn.q_proj"]["output"], qcfg8)
            k = _fq16(qkv[..., qd:qd + kvd], lr["self_attn.k_proj"]["output"],
                      policy["self_attn.k_proj"].output)
            v = _fq16(qkv[..., qd + kvd:], lr["self_attn.v_proj"]["output"],
                      policy["self_attn.v_proj"].output)
        q = q.reshape(B, T, Hq, hd)
        k = k.reshape(B, T, Hkv, hd)
        v = v.reshape(B, T, Hkv, hd)
    else:
        q = proj("q_proj", "self_attn.q_proj").reshape(B, T, Hq, hd)
        k = proj("k_proj", "self_attn.k_proj").reshape(B, T, Hkv, hd)
        v = proj("v_proj", "self_attn.v_proj").reshape(B, T, Hkv, hd)

    if not qkv_done:
        # joint RoPE over q‖k (same cos/sin, same head_dim) and joint
        # quantization with per-head-segment scales: 2 ops instead of 4
        qk = lr["self_attn.qk_bmm"]
        pv = lr["self_attn.pv_bmm"]
        qk_cat = jnp.concatenate([q, k], axis=2)        # (B,T,Hq+Hkv,hd)
        qk_cat = M.apply_rope(qk_cat, cos, sin, c.rotary_dim)
        seg_scale = jnp.concatenate([
            jnp.broadcast_to(qk["input"]["scale"], (Hq,)),
            jnp.broadcast_to(qk["input2"]["scale"],
                             (Hkv,))])[None, None, :, None]
        seg_off = jnp.concatenate([
            jnp.broadcast_to(qk["input"]["offset"], (Hq,)),
            jnp.broadcast_to(qk["input2"]["offset"],
                             (Hkv,))])[None, None, :, None]
        if kv_bits == 4:
            # per-segment clip: q rows stay 8-bit, k rows clip at the 4-bit
            # cache bound (stored shifted — (q4−128) reuses all int8 math)
            seg_qmax = jnp.concatenate([
                jnp.full((Hq,), 255.0, jnp.float32),
                jnp.full((Hkv,), 15.0, jnp.float32)])[None, None, :, None]
        else:
            seg_qmax = 255.0
        qk8 = qops.quantize_act(qk_cat, seg_scale, seg_off, seg_qmax)
        q8, k8_new = qk8[:, :, :Hq], qk8[:, :, Hq:]
        v8_new = qops.quantize_act(v, pv["input2"]["scale"],
                                   pv["input2"]["offset"],
                                   15.0 if kv_bits == 4 else 255.0)
        # → head-major (B,Hkv,T,hd) for the cache layout
        k8_new = jnp.transpose(k8_new, (0, 2, 1, 3))
        v8_new = jnp.transpose(v8_new, (0, 2, 1, 3))

    k_cache, v_cache = kv
    decode_light = (cache_position is not None and T == 1
                    and not kc.attn_kernel)
    assert cp_mesh is None or not kc.attn_kernel, \
        "cp_mesh shards the KV sequence axis — the single-chip attention " \
        "kernels cannot read a sharded cache; use the XLA attention paths"
    if decode_light and cp_mesh is not None:
        # context-parallel decode: the cache's S axis is sharded over cp_axis;
        # the flash-decoding merge in parallel/context_parallel.py reproduces
        # this branch's math (incl. fq sites + self term) across the shards
        from mobilequant_tpu.parallel.context_parallel import (
            cp_decode_attention)
        qg = jnp.transpose(q8.reshape(B, 1, Hkv, G, hd), (0, 2, 3, 1, 4))
        qg = qg.reshape(B, Hkv, G, hd)
        attn = cp_decode_attention(
            qg, k8_new, v8_new, k_cache, v_cache, cache_position, qk, pv,
            policy["self_attn.qk_bmm"].output, policy["self_attn.pv_bmm"].input,
            cp_mesh, axis=cp_axis, neg_inf=c.neg_inf)
        attn = attn.reshape(B, Hkv, G, 1, hd)
        attn = jnp.transpose(attn, (0, 3, 1, 2, 4)).reshape(B, 1, Hq * hd)
        k_all, v_all = k8_new, v8_new
    elif decode_light:
        # Decode fast path: do NOT rewrite the full cache inside the layer scan
        # (profiling showed the per-layer full-cache ys writes + while-boundary
        # carry copies cost ~80 µs/step). Attention decomposes into scores over
        # the *stale* cache (masked to positions < pos) plus the self-attention
        # term for the new token; the new K/V rows are emitted as scan outputs
        # and scattered into the cache ONCE after the scan (engine.forward).
        ks, vs = st if st is not None else (None, None)
        if (kv_packed and sp is not None and li is not None
                and "kcachep" in sp and ks is not None
                and staged_len is not None):
            # fused kv4 attention kernel: streams the PACKED slabs (half the
            # bytes) and unpacks in registers — the whole cache+staged+self
            # partwise softmax in one dispatch per layer (ops/pallas_kv4.py)
            from mobilequant_tpu.ops import pallas_kv4 as _PKV
            meta = _attn_meta(lr, policy, c)

            def _on(cfg_):
                return bool(cfg_ is not None and cfg_.enabled)

            BH = B * Hkv
            att = _PKV.kv4_decode_attention(
                q8.reshape(BH, G, hd), sp["kcachep"], sp["vcachep"],
                sp["kcsT"], sp["skst"], sp["svst"],
                k8_new.reshape(BH, 1, hd), v8_new.reshape(BH, 1, hd),
                meta, sp["kvpos"], staged_len, li,
                num_kv_heads=Hkv, head_dim=hd,
                qk_fq_on=_on(policy["self_attn.qk_bmm"].output),
                pv_fq_on=_on(policy["self_attn.pv_bmm"].input))
            attn = att.reshape(B, 1, Hq * hd)
        elif kv_packed:
            attn = _kv4_decode_light_attention(
                q8, k8_new, v8_new, k_cache, v_cache, qk, pv, policy,
                cache_position, c, B, Hkv, G, hd,
                ks=ks, vs=vs, staged_len=staged_len, k_colsum=k_colsum)
        else:
            attn = _decode_light_attention(
                q8, k8_new, v8_new, k_cache, v_cache, qk, pv, policy,
                cache_position, c, B, Hkv, G, hd,
                ks=ks, vs=vs, staged_len=staged_len, k_colsum=k_colsum)
        k_all, v_all = k8_new, v8_new        # scan ys: just the new rows
    elif True:
        if cache_position is not None:
            upd = jax.vmap(lambda cache, new, start: jax.lax.dynamic_update_slice(
                cache, new, (0, start, 0)))
            k_all = upd(k_cache, k8_new, cache_position)
            v_all = upd(v_cache, v8_new, cache_position)
        else:
            k_all, v_all = k8_new, v8_new
        S = k_all.shape[2]
    if decode_light:
        pass
    elif T == 1 and kc.attn_kernel and kv_valid_len is not None:
        # fused decode-attention kernel: one dispatch per layer
        from mobilequant_tpu.ops.pallas_attention import decode_attention

        meta = _attn_meta(lr, policy, c)
        qg = jnp.transpose(q8.reshape(B, 1, Hkv, G, hd), (0, 2, 3, 1, 4))
        qg = qg.reshape(B, Hkv, G, hd)
        attn = decode_attention(qg, k_all, v_all, meta, kv_valid_len)
        attn = attn.reshape(B, Hkv, G, 1, hd)
        attn = jnp.transpose(attn, (0, 3, 1, 2, 4)).reshape(B, 1, Hq * hd)
    elif T > 1 and kc.attn_kernel and positions is not None:
        # fused prefill-attention kernel: no HBM (T,S) score/prob tensors
        from mobilequant_tpu.ops.pallas_prefill_attention import prefill_attention

        meta = _attn_meta(lr, policy, c)
        valid = kv_valid_len if kv_valid_len is not None \
            else jnp.full((B,), S, jnp.int32)
        qg = jnp.transpose(q8.reshape(B, T, Hkv, G, hd), (0, 2, 3, 1, 4))

        def _on(cfg):
            return bool(cfg is not None and cfg.enabled)

        attn = prefill_attention(
            qg, k_all, v_all, meta, positions, valid,
            qk_fq=_on(policy["self_attn.qk_bmm"].output),
            pv_fq=_on(policy["self_attn.pv_bmm"].input))
        attn = jnp.transpose(attn, (0, 3, 1, 2, 4)).reshape(B, T, Hq * hd)
    elif cp_mesh is not None:
        # context-parallel prefill: scores only ever exist as per-shard
        # (…, S/cp) slabs (parallel/context_parallel.cp_prefill_attention)
        from mobilequant_tpu.parallel.context_parallel import (
            cp_prefill_attention)
        qg = jnp.transpose(q8.reshape(B, T, Hkv, G, hd), (0, 2, 3, 1, 4))
        qg = qg.reshape(B, Hkv, G * T, hd)
        pos_q = positions if positions is not None \
            else jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        attn = cp_prefill_attention(
            qg, k_all, v_all, pos_q, kv_valid_len, qk, pv,
            policy["self_attn.qk_bmm"].output, policy["self_attn.pv_bmm"].input,
            cp_mesh, num_groups=G, axis=cp_axis, neg_inf=c.neg_inf)
        attn = attn.reshape(B, Hkv, G, T, hd)
        attn = jnp.transpose(attn, (0, 3, 1, 2, 4)).reshape(B, T, Hq * hd)
    else:
        # q: (B,T,Hq,hd) → (B,Hkv,G·T,hd) batched over kv heads
        qg = jnp.transpose(q8.reshape(B, T, Hkv, G, hd), (0, 2, 3, 1, 4))
        qg = qg.reshape(B, Hkv, G * T, hd)
        scores = qops.int_matmul_qk(qg, k_all,
                                    qk["input"]["scale"], qk["input"]["offset"],
                                    qk["input2"]["scale"], qk["input2"]["offset"])
        scores = scores.reshape(B, Hkv, G, T, S)
        scores = _fq16(scores, qk["output"], policy["self_attn.qk_bmm"].output)
        scores = scores / math.sqrt(hd) + mask[:, :, None, :, :]
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        probs = _fq16(probs, pv["input"], policy["self_attn.pv_bmm"].input)

        attn = qops.int_matmul_pv(probs.reshape(B, Hkv, G * T, S), v_all,
                                  pv["input2"]["scale"], pv["input2"]["offset"])
        # (B,Hkv,G·T,hd) → (B,T,Hq·hd)
        attn = attn.reshape(B, Hkv, G, T, hd)
        attn = jnp.transpose(attn, (0, 3, 1, 2, 4)).reshape(B, T, Hq * hd)
    a8, ar = out_q8(attn, "self_attn.pv_bmm")

    if (kc.otail_kernel and sp is not None and li is not None
            and "o_proj" in sp and "w13_proj" in sp and "mlp_norm" in lp
            and tp_mesh is None and not c.parallel_residual
            and c.hidden_act in ("silu", "gelu_tanh")
            and B * T <= kc.stacked_bt_max
            and sp["w13_proj"]["wq"].shape[1] in (x.shape[-1],
                                                  x.shape[-1] // 2)):
        # attention-tail kernel: o-proj -> o fq -> resid_add_1 -> whole MLP
        # block in ONE dispatch (removes the o custom-call boundary + the
        # resid/fq fusions between it and the MLP kernel)
        from mobilequant_tpu.ops import pallas_mlp as _PMLP
        Dm = x.shape[-1]
        Fm = sp["w13_proj"]["wq"].shape[2] // 2
        w4p = sp["w13_proj"]["wq"].shape[1] * 2 == Dm
        w2_rows = Fm // 2 if w4p else Fm
        o_rows = (Hq * hd) // 2 if w4p else Hq * hd
        supported = (_PMLP.w4_mlp_block_supported(Dm, Fm) if w4p
                     else _PMLP.w8_mlp_block_supported(Dm, Fm))
        if (supported and sp["w2"]["wq"].shape[1] == w2_rows
                and sp["o_proj"]["wq"].shape[1] == o_rows):
            meta = jnp.concatenate([
                _mlp_block_meta(lr, policy, c),
                _otail_meta_ext(lr, policy)])
            out = _PMLP.fused_otail_block_stacked(
                a8.reshape(-1, Hq * hd),
                x.reshape(-1, Dm).astype(jnp.float32),
                sp["o_proj"], sp["mlp_norm"]["w"], sp["mlp_norm"]["b"],
                sp["w13_proj"], sp["w2"], meta, li, c.hidden_act,
                "layernorm" if c.norm_class == "layernorm" else "rmsnorm",
                site_on=_mlp_block_site_on(policy),
                osite_on=_otail_site_on(policy))
            return out.reshape(B, T, Dm).astype(x.dtype), (k_all, v_all)

    o = _row_parallel_linear(a8, ar["scale"], ar["offset"], lp["o_proj"],
                             lp["o_proj"]["bias"], _sp("o_proj"))
    o = _fq16(o, lr["self_attn.o_proj"]["output"], policy["self_attn.o_proj"].output)

    resid = _resid_add(x, o, lr, policy, "resid_add_1")
    hidden = h if c.parallel_residual else resid

    # --- mlp ---
    if (sp is not None and li is not None and "w13_proj" in sp
            and "mlp_norm" in lp and kc.stacked_mlp_kernel
            and sp["w13_proj"]["wq"].shape[1] in (resid.shape[-1],
                                                  resid.shape[-1] // 2)
            and c.hidden_act in ("silu", "gelu_tanh")
            and not c.parallel_residual):
        from mobilequant_tpu.ops import pallas_mlp as _PMLP
        Dm = resid.shape[-1]
        Fm = sp["w13_proj"]["wq"].shape[2] // 2
        w4p = sp["w13_proj"]["wq"].shape[1] * 2 == Dm   # nibble-packed W4
        w2_rows = Fm // 2 if w4p else Fm
        supported = (_PMLP.w4_mlp_block_supported(Dm, Fm) if w4p
                     else _PMLP.w8_mlp_block_supported(Dm, Fm))
        # decode-sized only: at prefill M the narrow-segment dots + in-program
        # VPU serialization lose to the split stacked matmuls + gate_quant
        # (523 vs ~300 µs/layer at M=1024 — see ops/pallas_mlp.py NOTE)
        if (B * T <= kc.stacked_bt_max
                and sp["w2"]["wq"].shape[1] == w2_rows
                and supported):
            # whole W4/W8 MLP block (norm→quant→w13→act→w2→requant→residual)
            # in ONE stacked-layer dispatch: weights stream straight from
            # the (L,·,·) stacks (scalar-prefetch layer select), all the small
            # inter-matmul fusions fold into the kernel; the W8 edition is the
            # batched-decode serving path (fused_mlp_block_w4_stacked sniffs
            # the pack bitwidth by shape)
            meta = _mlp_block_meta(lr, policy, c)
            out = _PMLP.fused_mlp_block_w4_stacked(
                resid.reshape(-1, Dm).astype(jnp.float32),
                sp["mlp_norm"]["w"], sp["mlp_norm"]["b"],
                sp["w13_proj"], sp["w2"], meta, li, c.hidden_act,
                "layernorm" if c.norm_class == "layernorm" else "rmsnorm",
                site_on=_mlp_block_site_on(policy))
            return out.reshape(B, T, Dm).astype(x.dtype), (k_all, v_all)

    if (kc.mlp_block_kernel and "w13_proj" in lp and "mlp_norm" in lp
            and lp["w13_proj"]["wq"].shape[0] == resid.shape[-1]
            and c.hidden_act in ("silu", "gelu_tanh") and not c.parallel_residual):
        # whole MLP block (norm→quant→MLP→requant→residual) in ONE dispatch
        from mobilequant_tpu.ops.pallas_mlp import fused_mlp_block

        meta = _mlp_block_meta(lr, policy, c)
        Dm = resid.shape[-1]
        mm_kind = "vpu" if (kc.vpu_matvec and B * T == 1) else "mxu"
        out = fused_mlp_block(
            resid.reshape(-1, Dm).astype(jnp.float32),
            lp["mlp_norm"]["w"], lp["mlp_norm"]["b"],
            lp["w13_proj"], lp["w2"], meta, c.hidden_act,
            "layernorm" if c.norm_class == "layernorm" else "rmsnorm",
            mm_kind=mm_kind)
        return out.reshape(B, T, Dm).astype(x.dtype), (k_all, v_all)

    if "mlp_norm" in lp:
        h2 = norm(hidden, lp["mlp_norm"], "post_attention_layernorm")
        h28, h2r = out_q8(h2, "post_attention_layernorm")
    else:
        h28, h2r = h8, hr

    if c.is_moe and "router" in lp:
        # --- MoE tail (Mixtral): integer expert matmuls ---
        # Router runs FP on the fake-quanted normed hidden == dequant(h28),
        # exactly the sim's moe_block input; combine-weight mixing replicates
        # models/model.py moe_block (ref HFMoEBlock, hf_model.py:1065-1162).
        h2fq = qops.dequantize_act(h28, h2r["scale"], h2r["offset"])
        logits = h2fq @ lp["router"]["w"]
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        top_vals, top_idx = jax.lax.top_k(probs, c.num_experts_per_tok)
        top_vals = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)

        kk = c.num_experts_per_tok
        E = c.num_local_experts

        def expert_chain(mm1, mm3, mm2, eidx=None):
            """The w1 -> act -> (w3) -> w2 chain with the MoE fq sites —
            ONE source of truth shared by the dense and sparse dispatches
            (mm1/mm3 produce the gate/up matmuls, mm2 maps act8 -> down).

            Per-expert activation ranges (the reference's per-expert QLinear
            quantizers, hf_model.py:1065-1162) arrive as (E,) vectors in lr:
            the dense dispatch broadcasts them over the (B,T,E,·) expert axis,
            the sparse dispatch (eidx set) picks the routed expert's scalars."""
            def er(entry):
                s_ = entry.get("scale")
                if getattr(s_, "ndim", 0) != 1:
                    return entry
                if eidx is not None:
                    return {"scale": entry["scale"][eidx],
                            "offset": entry["offset"][eidx]}
                return {"scale": entry["scale"][:, None],
                        "offset": entry["offset"][:, None]}

            g1 = _fq16(mm1(), er(lr["mlp.w1"]["output"]),
                       policy["mlp.w1"].output)
            if c.hidden_act == "silu":
                sig = jax.nn.sigmoid(g1)
                af = lr["mlp.act_fn"]
                if "input2" in af:
                    sig = _fq16(sig, er(af["input2"]),
                                policy["mlp.act_fn"].input2)
                act = g1 * sig
            elif c.hidden_act == "gelu_tanh":
                act = jax.nn.gelu(g1, approximate=True)
            else:
                act = jax.nn.gelu(g1, approximate=False)
            act = _fq16(act, er(lr["mlp.act_fn"]["output"]),
                        policy["mlp.act_fn"].output)
            if mm3 is not None:
                act = act * _fq16(mm3(), er(lr["mlp.w3"]["output"]),
                                  policy["mlp.w3"].output)
            w2r = er(lr["mlp.w2"]["input"])
            act8 = qops.quantize_act(act, w2r["scale"], w2r["offset"])
            return _fq16(mm2(act8, w2r), er(lr["mlp.w2"]["output"]),
                         policy["mlp.w2"].output)

        if T == 1 and B * kk < E:
            # --- sparse dispatch (decode): compute ONLY each sequence's top-k
            # experts. Numerically identical to dense dispatch (the combine
            # weights zero the other experts), but weight traffic drops from
            # E to k experts per token — the decode step is weight-bound.
            # W8: the expert dynamic-slice fuses into XLA's own matmul reads;
            # W4: the stacked-select Pallas kernel picks the expert via a
            # scalar-prefetch index into the (L*E)-flattened pack (the same
            # no-copy trick as the per-layer select, see _int_linear).
            def flat_sp(name):
                # (L, E, ...) leaves -> (L*E, ...); leaves without the expert
                # axis (per-tensor scale scalars / (L,) vectors) broadcast
                if sp is None or name not in sp:
                    return None

                def f(a):
                    if a.ndim >= 2 and a.shape[1] == E:
                        return a.reshape((a.shape[0] * E,) + a.shape[2:])
                    if a.ndim == 1:                    # (L,) per-layer scalar
                        return jnp.repeat(a, E, axis=0)
                    return a                           # 0-dim: shared scalar
                return {k2: f(a) for k2, a in sp[name].items()}

            sp1, sp3, sp2 = flat_sp("w1"), flat_sp("w3"), flat_sp("w2")

            def one(b, e):
                idx_e = top_idx[b, 0, e]
                fi = (li * E + idx_e) if li is not None else None

                def pick(entry):
                    # index the expert axis; shared leaves (per-tensor scale
                    # scalars, no leading E) pass through
                    return jax.tree.map(
                        lambda a: jax.lax.dynamic_index_in_dim(
                            a, idx_e, 0, keepdims=False)
                        if a.ndim >= 1 and a.shape[0] == E else a, entry)

                x1 = h28[b]                                       # (1, K)
                w1p, w2p = pick(lp["w1"]), pick(lp["w2"])
                w3p = pick(lp["w3"]) if "w3" in lp else None
                y1 = expert_chain(
                    lambda: _int_linear(x1, h2r["scale"], h2r["offset"], w1p,
                                        w1p["bias"], kc,
                                        spack=sp1, li=fi),
                    (lambda: _int_linear(x1, h2r["scale"], h2r["offset"], w3p,
                                         w3p["bias"], kc,
                                         spack=sp3, li=fi))
                    if w3p is not None else None,
                    lambda a8, w2r: _int_linear(a8, w2r["scale"],
                                                w2r["offset"], w2p,
                                                w2p["bias"], kc,
                                                spack=sp2, li=fi),
                    eidx=idx_e)
                return y1 * top_vals[b, 0, e]

            y = jnp.stack([sum(one(b, e) for e in range(kk))
                           for b in range(B)], axis=0)            # (B, 1, D)
            return _resid_add(resid, y, lr, policy, "resid_add_2"), (k_all, v_all)

        combine = jnp.sum(
            jax.nn.one_hot(top_idx, c.num_local_experts, dtype=top_vals.dtype)
            * top_vals[..., None], axis=-2)                       # (B,T,E)

        y = expert_chain(
            lambda: qops.int_expert_linear(h28, h2r["scale"], h2r["offset"],
                                           lp["w1"], lp["w1"]["bias"]),
            (lambda: qops.int_expert_linear(h28, h2r["scale"], h2r["offset"],
                                            lp["w3"], lp["w3"]["bias"]))
            if "w3" in lp else None,
            lambda a8, w2r: qops.int_expert_linear(
                a8, w2r["scale"], w2r["offset"], lp["w2"], lp["w2"]["bias"],
                x_has_expert_axis=True))                          # (B,T,E,D)
        y = jnp.einsum("bted,bte->btd", y, combine.astype(jnp.float32))
        return _resid_add(resid, y, lr, policy, "resid_add_2"), (k_all, v_all)

    mlp_mode = (kc.mlp_kernel and "w13_proj" in lp
                and lp["w13_proj"]["wq"].shape[0] == h28.shape[-1]
                and c.hidden_act in ("silu", "gelu_tanh"))
    if mlp_mode:
        # fused-MLP megakernel: one dispatch for w1/w3/act/mul/w2-contract
        from mobilequant_tpu.ops.pallas_mlp import fused_mlp

        def flag8(site, role):
            return _qmax(getattr(policy[site], role, None))

        def rng(site, role, default=(1.0, 0.0)):
            entry = lr.get(site, {})
            if role in entry:
                return entry[role]["scale"], entry[role]["offset"]
            return jnp.float32(default[0]), jnp.float32(default[1])

        w1s, w1o = rng("mlp.w1", "output")
        sgs, sgo = rng("mlp.act_fn", "input2")
        aos, aoo = rng("mlp.act_fn", "output")
        w3s, w3o = rng("mlp.w3", "output")
        w2s_in, w2o_in = lr["mlp.w2"]["input"]["scale"], lr["mlp.w2"]["input"]["offset"]
        meta = jnp.stack([
            h2r["scale"], h2r["offset"],
            w1s, w1o, jnp.float32(flag8("mlp.w1", "output")),
            sgs, sgo, jnp.float32(flag8("mlp.act_fn", "input2")),
            aos, aoo, jnp.float32(flag8("mlp.act_fn", "output")),
            w3s, w3o, jnp.float32(flag8("mlp.w3", "output")),
            w2s_in, w2o_in,
        ]).astype(jnp.float32)
        Dm = h28.shape[-1]
        acc, rsum = fused_mlp(h28.reshape(-1, Dm), lp["w13_proj"], lp["w2"],
                              meta, c.hidden_act)
        w2p = lp["w2"]
        Fk = w2p["wq"].shape[0]
        ox2 = w2o_in - 128.0
        ow2 = jnp.reshape(w2p["offset"], (-1,))
        sw2 = jnp.reshape(w2p["scale"], (-1,))
        y = (acc - ox2 * w2p["colsum"] - ow2 * rsum + Fk * ox2 * ow2) \
            * (w2s_in * sw2) + w2p["bias"]
        y = y.reshape(B, T, -1)
        y = _fq16(y, lr["mlp.w2"]["output"], policy["mlp.w2"].output)
        return _resid_add(resid, y, lr, policy, "resid_add_2"), (k_all, v_all)

    g3 = None
    if (kc.gate_kernel and "w13_proj" in lp and li is not None
            and _sp("w13_proj") is not None
            and c.hidden_act in ("silu", "gelu_tanh")):
        # prefill w13+gate epilogue kernel: the (M,2F) fp32 intermediate and
        # the two XLA gate fusions (129 µs/layer at T=1024) fold into the
        # stacked w13 matmul; emits the w2-input int8 directly
        from mobilequant_tpu.ops import pallas_mlp as _PMLP
        Dm = h28.shape[-1]
        Fm = sp["w13_proj"]["wq"].shape[2] // 2
        m_flat = 1
        for d in h28.shape[:-1]:
            m_flat *= d
        wb_ = 4 if sp["w13_proj"]["wq"].shape[1] * 2 == Dm else 8
        if (kc.w2fold_kernel and tp_mesh is None and _sp("w2") is not None
                and _PMLP.w13_gate_w2_supported(m_flat, Dm, Fm, wb_)):
            # whole prefill MLP in ONE dispatch: w2 folds into the gate
            # kernel's tail phases. MEASURED NEGATIVE on chip (2026-08-20):
            # 555 us/layer vs the split path's ~294 — off by default, kept
            # behind w2fold_kernel for re-evaluation
            meta = _mlp_block_meta(lr, policy, c)
            so = _mlp_block_site_on(policy)[1:5]
            y = _PMLP.w13_gate_w2_stacked(
                h28.reshape(m_flat, Dm), sp["w13_proj"], sp["w2"], meta, li,
                c.hidden_act, site_on=so).reshape(*h28.shape[:-1], Dm)
            y = _fq16(y, lr["mlp.w2"]["output"], policy["mlp.w2"].output)
            return _resid_add(resid, y, lr, policy, "resid_add_2"), \
                (k_all, v_all)
        if _PMLP.w13_gate_supported(m_flat, Dm, Fm, wb_):
            meta = _mlp_block_meta(lr, policy, c)
            so = _mlp_block_site_on(policy)[1:5]
            act8 = _PMLP.w13_gate_stacked(
                h28.reshape(m_flat, Dm), sp["w13_proj"], meta, li,
                c.hidden_act, site_on=so).reshape(*h28.shape[:-1], Fm)
            w2r = lr["mlp.w2"]["input"]
            y = _row_parallel_linear(act8, w2r["scale"], w2r["offset"],
                                     lp["w2"], lp["w2"]["bias"], _sp("w2"))
            y = _fq16(y, lr["mlp.w2"]["output"], policy["mlp.w2"].output)
            return _resid_add(resid, y, lr, policy, "resid_add_2"), \
                (k_all, v_all)
    if "w13_proj" in lp:
        F = lp["w13_proj"]["wq"].shape[-1] // 2
        g13 = _int_linear(h28, h2r["scale"], h2r["offset"], lp["w13_proj"],
                          lp["w13_proj"]["bias"], kc, _sp("w13_proj"), li)
        w1cfg8 = policy["mlp.w1"].output
        # NOTE (negative result, 2026-08-19): a one-pass Pallas "gate_quant"
        # kernel for this chain (w1/w3-fq → act → gate-mul → w2-quantize,
        # (M,2F) fp32 → (M,F) int8) measured 163 µs/layer at T=1024 vs XLA's
        # 129 µs two-fusion split, and the downstream w2 matmul regressed
        # 79→95 µs behind the custom call. The chain is VPU-floor-bound
        # (~40 elementwise ops/elem of fake-quant math), not HBM-bound —
        # XLA's fusions already overlap the traffic. Details: BENCHMARKS.md.
        if "out_scale" in lp["w13_proj"] and w1cfg8 is not None and w1cfg8.enabled:
            g13 = fake_quant(g13, lp["w13_proj"]["out_scale"][0],
                             lp["w13_proj"]["out_offset"][0], w1cfg8)
            g1, g3 = g13[..., :F], g13[..., F:]
        else:
            g1 = _fq16(g13[..., :F], lr["mlp.w1"]["output"], w1cfg8)
            g3 = _fq16(g13[..., F:], lr["mlp.w3"]["output"], policy["mlp.w3"].output)
    else:
        g1 = _int_linear(h28, h2r["scale"], h2r["offset"], lp["w1"], lp["w1"]["bias"],
                         kc, _sp("w1"), li)
        g1 = _fq16(g1, lr["mlp.w1"]["output"], policy["mlp.w1"].output)
    if c.hidden_act == "silu":
        sig = jax.nn.sigmoid(g1)
        af = lr["mlp.act_fn"]
        if "input2" in af:
            sig = _fq16(sig, af["input2"], policy["mlp.act_fn"].input2)
        act = g1 * sig
    elif c.hidden_act == "gelu_tanh":
        act = jax.nn.gelu(g1, approximate=True)
    else:
        act = jax.nn.gelu(g1, approximate=False)
    act = _fq16(act, lr["mlp.act_fn"]["output"], policy["mlp.act_fn"].output)

    if g3 is None and "w3" in lp:
        g3 = _int_linear(h28, h2r["scale"], h2r["offset"], lp["w3"], lp["w3"]["bias"],
                         kc, _sp("w3"), li)
        g3 = _fq16(g3, lr["mlp.w3"]["output"], policy["mlp.w3"].output)
    if g3 is not None:
        act = act * g3

    w2r = lr["mlp.w2"]["input"]
    act8 = qops.quantize_act(act, w2r["scale"], w2r["offset"])
    y = _row_parallel_linear(act8, w2r["scale"], w2r["offset"], lp["w2"],
                             lp["w2"]["bias"], _sp("w2"))
    y = _fq16(y, lr["mlp.w2"]["output"], policy["mlp.w2"].output)

    return _resid_add(resid, y, lr, policy, "resid_add_2"), (k_all, v_all)


def forward(packed: dict, tokens: jax.Array, config: ModelConfig, policy: QPolicy,
            positions=None, kv_cache: Optional[EngineKVCache] = None,
            cache_position=None, kv_valid_len=None, use_pallas=False,
            layer_unroll: int = 1, logits_at=None, cp_mesh=None,
            cp_axis: str = "cp", tp_mesh=None, tp_axis: str = "tp"):
    """Packed-int forward -> (logits, new_kv_cache).

    use_pallas: a runtime.kernel_config.KernelConfig, or any legacy value
    (bool / mode string) — coerced ONCE here; everything below dispatches on
    the typed config only.

    logits_at: optional (B,) per-sequence row index — compute the final norm +
    lm_head on that single position only and return (B, 1, vocab) logits.
    Generation prefill needs exactly one row; the full T-position head matmul
    it replaces is the prefill's largest single op (Gemma: 2·T·K·V ≈ 1 TFLOP
    bf16 at T=1024). Default None = full (B, T, vocab) logits (ppl eval).

    cp_mesh: optional Mesh with a `cp_axis` axis — context parallelism: the
    KV cache's sequence axis shards over it and attention runs as per-shard
    partials + flash split-softmax merge (parallel/context_parallel.py).
    Mutually exclusive with the fused attention / whole-model kernels (they
    are single-chip); shard the cache with
    NamedSharding(cp_mesh, P(None, None, None, cp_axis, None))."""
    c = config
    kc = KernelConfig.coerce(use_pallas)
    if tp_mesh is not None:
        # ring-TP serving runs the XLA engine body (the Pallas megakernels
        # are single-chip); the ring kernels replace GSPMD's matmul→all-reduce
        # at the row-parallel sites
        kc = KernelConfig.none()
    from mobilequant_tpu.quant.policy import policy_kv_bits
    kv_bits = policy_kv_bits(policy)
    staging = None
    if isinstance(kv_cache, StagedKVCache):
        # chunked staging (decode_loop): big caches are read-only this chunk;
        # the step's rows land in the staging buffers at column m
        staging = kv_cache
        kv_cache = EngineKVCache(k=staging.k, v=staging.v)
    B, T = tokens.shape
    kv_packed = False        # this forward's cache arrays are nibble-packed
    kv_unpacked = False      # T>1: cache was unpacked here, repack at the end
    if kv_bits == 4 and kv_cache is not None:
        assert cp_mesh is None, "int4 KV + context parallelism unsupported " \
            "(a sequence-sharded packed cache would unpack shard-locally)"
        if T > 1:
            # prefill-into-cache: unpack ONCE for the pass, run the int8
            # program verbatim, repack at the end (prefill is compute-bound;
            # the per-pass materialization is amortized over T rows)
            kv_cache = EngineKVCache(k=qops.unpack_kv_s(kv_cache.k),
                                     v=qops.unpack_kv_s(kv_cache.v))
            kv_unpacked = True
        else:
            assert not kc.attn_kernel, \
                "int4 KV decode: attn_kernel path reads int8 caches"
            kv_packed = True
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    x = packed["embed"][tokens].astype(jnp.float32)
    if c.normalize_embed:
        x = x * math.sqrt(c.hidden_size)

    cos, sin = M.rope_cos_sin(positions, c, jnp.float32)
    if kv_cache is None:
        S = T
    elif kv_packed:
        S = kv_cache.k.shape[4] * 2          # (L,B,Hkv,hd,S/2) hd-major
    else:
        S = kv_cache.k.shape[3]
    mask = M.causal_mask(positions, S, c.neg_inf, kv_valid_len)

    def body(carry, xs):
        h = carry
        lp, kv = xs["lp"], xs.get("kv")
        if "rv" in xs:
            lr = _lr_from_rvec(xs["rv"], packed["ranges"])
        else:
            lr = xs["lr"]
        if kv is None:
            kv = (None, None)
        h, kv_new = _layer_forward(lp, lr, h, cos, sin, mask, kv,
                                   cache_position, c, policy, kc,
                                   kv_valid_len, positions,
                                   sp=sp, li=xs.get("li"),
                                   cp_mesh=cp_mesh, cp_axis=cp_axis,
                                   tp_mesh=tp_mesh, tp_axis=tp_axis,
                                   st=xs.get("st"),
                                   staged_len=(staging.m if staging is not None
                                               else None),
                                   k_colsum=xs.get("kcs"),
                                   kv_bits=kv_bits, kv_packed=kv_packed)
        return h, kv_new

    # W4 Pallas path: hand the kernels the layer-STACKED weights (closure, a
    # loop-invariant operand of the scan) + a per-iteration layer index; the
    # sliced lp weights those sites no longer touch are DCE'd away, and with
    # them the per-layer HBM->HBM copies a custom call otherwise forces
    # (see _int_linear)
    sp = packed["layers"] if kc.use_stacked else None
    if (sp is not None and kv_cache is not None and T == 1
            and cache_position is not None and cp_mesh is None
            and "qkvp" in sp and kv_bits == 8
            and (B <= 8 and staging is None
                 and (kc.layer_kernel or kc.model_kernel)
                 or staging is not None and B > 8 and kc.chunk_kernel)):
        # whole-layer kernel extras: the FULL stacked cache (read by layer
        # index inside the kernel — the per-layer xs slices are DCE'd) and
        # the step's RoPE cos/sin vectors
        sp = dict(sp)
        sp["kcache"], sp["vcache"] = kv_cache.k, kv_cache.v
        sp["rope_cs"] = _rope_cs_vec(cos, sin, c.head_dim_, c.rotary_dim)
        if "qkv_seg" in packed:
            sp["qkv_seg"] = packed["qkv_seg"]

    if (sp is not None and staging is not None and kv_bits == 4 and T == 1
            and cache_position is not None and cp_mesh is None
            and kc.kv4_attn_kernel and staging.kcs is not None):
        from mobilequant_tpu.ops.pallas_kv4 import kv4_attn_supported
        if kv4_attn_supported(c.num_kv_heads, S, c.head_dim_, B):
            # fused kv4 attention extras: the kernel reads the FULL packed
            # cache/staged/colsum stacks by scalar-prefetch layer index (the
            # per-layer xs slices would materialize before a custom call —
            # the same slab-copy trap as the weights, see _int_linear).
            # Axes pre-flattened to (L, B·Hkv, …) — free contiguous
            # collapses; the kernel is batched over the BH axis. The packed
            # cache is hd-major (L,B,Hkv,hd,S/2): K arrives pre-transposed
            # for the QK dot and the S/2 minor dim keeps the slab DMAs at
            # full HBM rate (probe_dma: 64-lane-minor tiles stream at half).
            Lk_, Bk_, Hkvk_, hdk_, S2k_ = kv_cache.k.shape
            BHk_ = Bk_ * Hkvk_
            sp = dict(sp)
            sp["kcachep"] = kv_cache.k.reshape(Lk_, BHk_, hdk_, S2k_)
            sp["vcachep"] = kv_cache.v.reshape(Lk_, BHk_, hdk_, S2k_)
            sp["kcsT"] = staging.kcs.reshape(Lk_, BHk_, 1, S)
            csk_ = staging.sk.shape[3]
            sp["skst"] = staging.sk.reshape(Lk_, BHk_, csk_, hdk_)
            sp["svst"] = staging.sv.reshape(Lk_, BHk_, csk_, hdk_)
            sp["kvpos"] = jnp.repeat(cache_position,
                                     Hkvk_).reshape(BHk_, 1, 1)

    xs = {"lp": packed["layers"]}
    if sp is not None:
        xs["li"] = jnp.arange(c.num_layers, dtype=jnp.int32)
    if "rvec" in packed:
        xs["rv"] = packed["rvec"]
    else:
        xs["lr"] = packed["ranges"]

    if kv_cache is not None:
        xs["kv"] = (kv_cache.k, kv_cache.v)
        if staging is not None:
            xs["st"] = (staging.sk, staging.sv)
            if staging.kcs is not None:
                xs["kcs"] = staging.kcs
    else:
        # prefill without a cache object: keys/values come from the segment
        xs["kv"] = (jnp.zeros((c.num_layers, B, c.num_kv_heads, T, c.head_dim_), jnp.int8),
                    jnp.zeros((c.num_layers, B, c.num_kv_heads, T, c.head_dim_), jnp.int8))
        cache_position = jnp.zeros((B,), jnp.int32)

    pv_in_cfg = _site_role_cfg(policy, "self_attn.pv_bmm", "input")
    qk_out_cfg = _site_role_cfg(policy, "self_attn.qk_bmm", "output")
    if (sp is not None and "kcache" in sp and "rvec" in packed
            and staging is not None and kc.chunk_kernel and not c.is_moe
            and not c.parallel_residual
            and c.hidden_act in ("silu", "gelu_tanh")
            and "mlp_norm" in packed["layers"]
            and _chunk_supported(c, kv_cache.k.shape[3], B)):
        # batched whole-model CHUNK kernel (serving batches, B=16..128): the
        # entire decode step — every layer, staged-column decode-light
        # attention with the exact partwise full-row softmax, optional
        # quantized head — in one dispatch (ops/pallas_chunk.py). The 16-bit
        # attention fq sites are trace-time static flags (skipped VPU work
        # under the relaxed serving policy, exact under strict).
        from mobilequant_tpu.ops import pallas_chunk as _PC
        from mobilequant_tpu.ops import pallas_layer as _PL
        ly = packed["layers"]
        meta_L = jax.vmap(
            lambda rv: _layer_meta(_lr_from_rvec(rv, packed["ranges"]),
                                   policy, c))(packed["rvec"])
        ofq_L = _qkv_ofq_rows_stacked(packed, policy, c)
        hfold = ("head_q" in packed
                 and _PL.head_kernel_supported(packed["head_q"], c.hidden_size))
        hargs = (packed["head_q"], packed["norm"]["w"],
                 packed["norm"]["b"]) if hfold else (None, None, None)
        kcs = staging.kcs if staging.kcs is not None else \
            jnp.sum(kv_cache.k.astype(jnp.int32), axis=-1).astype(jnp.float32)
        Lk, Bk, Hkvk, Sk = kcs.shape
        res = _PC.fused_model_w4_chunk(
            x.reshape(B, -1).astype(jnp.float32), cache_position,
            sp["rope_cs"], ofq_L, ly["attn_norm"]["w"], ly["attn_norm"]["b"],
            ly["qkvp"], ly["op"], ly["mlp_norm"]["w"], ly["mlp_norm"]["b"],
            ly["w13_proj"], ly["w2"], kv_cache.k, kv_cache.v,
            kcs.reshape(Lk, Bk, Hkvk, 1, Sk),
            staging.sk, staging.sv, staging.m, meta_L, *hargs,
            num_q_heads=c.num_heads, num_kv_heads=c.num_kv_heads,
            head_dim=c.head_dim_, rotary_dim=c.rotary_dim,
            act_kind=c.hidden_act,
            norm_kind="layernorm" if c.norm_class == "layernorm" else "rmsnorm",
            qk_fq_on=bool(qk_out_cfg is not None and qk_out_cfg.enabled),
            pv_fq_on=bool(pv_in_cfg is not None and pv_in_cfg.enabled),
            site_on=_mlp_block_site_on(policy))
        if hfold:
            hm, kvnew, lg = res
            logits = lg[:, :c.vocab_size].reshape(B, T, c.vocab_size)
        else:
            hm, kvnew = res
            logits = None
        h = hm.reshape(B, T, -1).astype(x.dtype)
        Hkv_, hd_ = c.num_kv_heads, c.head_dim_
        kv_out = (kvnew[:, :, :Hkv_].reshape(c.num_layers, B, Hkv_, 1, hd_),
                  kvnew[:, :, Hkv_:].reshape(c.num_layers, B, Hkv_, 1, hd_))
    elif (sp is not None and "kcache" in sp and "rvec" in packed
            and staging is None and kc.model_kernel and not c.is_moe
            and not c.parallel_residual and c.hidden_act in ("silu", "gelu_tanh")
            and "mlp_norm" in packed["layers"]):
        # whole-MODEL kernel: the entire decode layer stack in ONE dispatch
        # (grid flat over layer x phase; hidden state carried in VMEM scratch;
        # layer l+1's weight blocks prefetch during layer l's MLP tail)
        from mobilequant_tpu.ops import pallas_layer as _PL
        ly = packed["layers"]
        meta_L = jax.vmap(
            lambda rv: _layer_meta(_lr_from_rvec(rv, packed["ranges"]),
                                   policy, c))(packed["rvec"])
        ofq_L = _qkv_ofq_rows_stacked(packed, policy, c)
        # fold the final norm + quantized lm_head into the model kernel as
        # tail grid phases: no separate head dispatch; head blocks 1..nv-1
        # stream behind the tail phases (block 0 rides the startup DMAs)
        hfold = ("head_q" in packed
                 and _PL.head_kernel_supported(packed["head_q"], c.hidden_size))
        hargs = (packed["head_q"], packed["norm"]["w"],
                 packed["norm"]["b"]) if hfold else (None, None, None)
        res = _PL.fused_model_w4_stacked(
            x.reshape(B, -1).astype(jnp.float32), cache_position,
            sp["rope_cs"], ofq_L, ly["attn_norm"]["w"], ly["attn_norm"]["b"],
            ly["qkvp"], ly["op"], ly["mlp_norm"]["w"], ly["mlp_norm"]["b"],
            ly["w13_proj"], ly["w2"], kv_cache.k, kv_cache.v, meta_L, *hargs,
            num_q_heads=c.num_heads, num_kv_heads=c.num_kv_heads,
            head_dim=c.head_dim_, rotary_dim=c.rotary_dim,
            act_kind=c.hidden_act,
            norm_kind="layernorm" if c.norm_class == "layernorm" else "rmsnorm")
        if hfold:
            hm, kvnew, lg = res
            logits = lg[:, :c.vocab_size].reshape(B, T, c.vocab_size)
        else:
            hm, kvnew = res
            logits = None
        h = hm.reshape(B, T, -1).astype(x.dtype)
        Hkv_, hd_ = c.num_kv_heads, c.head_dim_
        kv_out = (kvnew[:, :, :Hkv_].reshape(c.num_layers, B, Hkv_, 1, hd_),
                  kvnew[:, :, Hkv_:].reshape(c.num_layers, B, Hkv_, 1, hd_))
    else:
        h, kv_out = jax.lax.scan(body, x, xs, unroll=layer_unroll)
        logits = None
    if staging is not None and T == 1 and not kc.attn_kernel:
        # chunked staging: the step's rows come back as PENDING (pk/pv);
        # decode_loop writes them into the staging buffers at the top of the
        # NEXT step (see StagedKVCache docstring — appending here would leave
        # sk/sv live across the layer scan and force a defensive copy)
        new_cache = StagedKVCache(
            k=staging.k, v=staging.v, sk=staging.sk, sv=staging.sv,
            m=staging.m + 1, kcs=staging.kcs,
            pk=kv_out[0], pv=kv_out[1])
    elif kv_cache is not None and T == 1 and not kc.attn_kernel:
        # decode-light: the scan emitted only the new K/V rows; scatter them
        # into the cache with ONE batched update after the scan. This DUS
        # rewrites the whole cache (18.9 µs × 2/step at TinyLlama shapes — the
        # scan consumed the buffer as xs, so XLA cannot alias it), and it is
        # STILL the best variant measured (trace_decode, 2026-08-17):
        #   - post-scan unrolled per-batch DUS (this):        1135 µs/step
        #   - input/output-aliased Pallas window scatter:     XLA inserts
        #     24.9 µs defensive copies instead — worse
        #   - cache-as-carry with per-layer in-place DUS:     row writes drop
        #     to 0.6 µs but the carry serializes the scan, +65 µs/step gaps
        # (vmapped DUS is also out: it lowers to a scatter XLA cannot update
        # in place — 0.44 ms/step of copies at bs=8.)
        zero = jnp.int32(0)

        # NOTE (2026-08-19): when the caches ride the layer scan as xs, these
        # DUS cost 18.8 µs/slot — XLA copies each slot's whole slab because
        # the xs consumption forbids aliasing (at bs=32 that is one
        # full-cache copy per step, 1.2 ms). Measured dead ends, all reverted
        # (BENCHMARKS.md "Batched decode, round 2"): a pure-DMA Pallas row
        # scatter (Mosaic: lane slices must be 128-aligned), a windowed RMW
        # over an int32 view (the bitcast is a full-cache relayout,
        # 2×4.5 ms), a stacked-cache attention kernel (VPU-serialized,
        # 116 µs/layer vs XLA's 40), and closure dynamic-slices (the while
        # boundary still blocks aliasing). The fix that works is CHUNKED
        # STAGING (decode_loop): the cache is read-only within a chunk and
        # these slab copies amortize over n_steps.
        def scat(cache, new):
            for b in range(cache.shape[1]):
                cache = jax.lax.dynamic_update_slice(
                    cache, new[:, b:b + 1],
                    (zero, jnp.int32(b), zero, cache_position[b], zero))
            return cache

        if kv_packed:
            # int4 cache: the per-step row write is a nibble merge
            # (qops.kv_flush_packed with a 1-column chunk) — per-TOKEN ticks
            # on a packed cache pay a full packed-cache pass; chunked
            # staging (decode_loop) amortizes it to once per chunk
            new_cache = EngineKVCache(
                k=qops.kv_flush_packed(kv_cache.k, kv_out[0], cache_position),
                v=qops.kv_flush_packed(kv_cache.v, kv_out[1], cache_position))
        else:
            new_cache = EngineKVCache(k=scat(kv_cache.k, kv_out[0]),
                                      v=scat(kv_cache.v, kv_out[1]))
    else:
        if kv_unpacked:
            new_cache = EngineKVCache(k=qops.pack_kv_s(kv_out[0]),
                                      v=qops.pack_kv_s(kv_out[1]))
        else:
            new_cache = EngineKVCache(k=kv_out[0], v=kv_out[1])

    if logits is not None:          # head folded into the model kernel
        return logits, new_cache

    if logits_at is not None and T > 1:
        idx = jnp.asarray(logits_at, jnp.int32)
        h = jax.vmap(lambda hb, i: jax.lax.dynamic_slice_in_dim(
            hb, i, 1, axis=0))(h, idx)
        T = 1

    # final norm + lm_head: unquantized (ref qmodule.py:843-845)
    xf = h.astype(jnp.float32)
    if c.norm_class == "layernorm":
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + c.norm_eps)
    else:
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + c.norm_eps)
    y = y * packed["norm"]["w"] + packed["norm"]["b"]
    if "head_q" in packed:
        logits = quantized_head_logits(y, packed["head_q"], c.vocab_size,
                                       use_kernel=kc.any_kernel)
    else:
        head = packed["embed"].T if c.tie_word_embeddings else packed["lm_head"]["w"]
        logits = jnp.dot(y.astype(head.dtype), head,
                         preferred_element_type=jnp.float32)
    return logits, new_cache


def quantized_head_logits(y: jax.Array, hq: dict, vocab_size: int,
                          use_kernel: bool, interpret: bool = False) -> jax.Array:
    """Quantized lm_head dispatch: dynamic per-token A8 activations × the
    per-channel symmetric W8/W4 head pack (pack_head) → fp32 logits
    (B, T, vocab_size). Shared by the int engine and the weight-only mode.

    use_kernel: at decode rows (B·T ≤ 64), route a W4 head through the
    fused-unpack Pallas kernel — XLA would otherwise materialize the unpacked
    int8 table in HBM every step (128 µs at bs=32 vs the kernel's ~50 µs
    packed stream, trace 2026-08-19). The per-row dynamic scales multiply
    the kernel OUTPUT: acts are symmetric (shifted offset 128 ⇒ ox=0) and
    the head has no bias, so the kernel's affine bracket
    (acc − ow·rowsum) is row-local and the factorization is exact — the
    kernel runs with x_scale=1. Full-M blocks keep Mosaic legality for any
    row count (only 8-divisible-or-FULL sublane blocks lower). The packed
    head is vocab-padded to a 4096 multiple (pack_head): wide blocks keep
    the grid short — Gemma's 256k vocab at 512-wide blocks is 501 grid
    steps, measured per-step-overhead-bound."""
    B, T, D = y.shape
    w4_packed = hq["wq"].shape[0] * 2 == D
    if w4_packed and use_kernel and B * T <= 64:
        from mobilequant_tpu.ops.pallas_matmul import w4a8_matmul
        M = B * T
        x_q, sx = qops.dynamic_quantize_act(y.reshape(M, D))
        Vp = hq["wq"].shape[1]
        # forward interpret only when set: an explicit interpret=False would
        # override the interpret-mode partial CPU tests patch onto w4a8_matmul
        kw = {"interpret": True} if interpret else {}
        logits = w4a8_matmul(
            x_q, hq["wq"], hq["scale"], hq["offset"], hq["colsum"],
            jnp.zeros((Vp,), jnp.float32), jnp.float32(1.0),
            jnp.float32(128.0), block_n=4096, **kw)
        logits = logits * sx                       # (M,1) per-row scales
        return logits[:, :vocab_size].reshape(B, T, vocab_size)
    return qops.int_head_linear(y, hq)[..., :vocab_size]


def decode_loop(packed: dict, first_token: jax.Array, kv_cache: EngineKVCache,
                start_pos: jax.Array, n_steps: int, config: ModelConfig,
                policy: QPolicy, use_pallas=False,
                temperature: float = 0.0, key: Optional[jax.Array] = None,
                layer_unroll: int = 1, staging_chunk: int = 32):
    """n_steps of autoregressive greedy/temperature decode inside ONE jitted graph
    (lax.scan over steps) — the whole token loop lives on-device, removing the
    per-token host dispatch that dominates single-step decode latency. This is the
    TPU-native answer to the reference's C++ decode loop + burst mode
    (llm.cpp:545-648, qnn_context.cpp:818-920).

    first_token: (B,1). start_pos: (B,). Returns (tokens (B, n_steps), cache, last_logits).
    temperature: static float (0 = greedy) or per-slot (B,) array — 0-rows
    greedy, hot rows sample (sampling.loop_next_token).

    Scatter strategy: on the scan (non-megakernel) engine paths the loop
    runs in CHUNKED-STAGING mode — within a `staging_chunk`-step chunk the
    big caches stay READ-ONLY (their rows < the chunk-start position), each
    step's K/V rows accumulate in a small (L,B,Hkv,chunk,hd) staging buffer
    (attention adds them as extra masked columns), and the per-slot
    slab-copying cache scatter (18.8 µs/slot/step, 1.2 ms/step at bs=32)
    happens ONCE per chunk. For n_steps > staging_chunk an outer scan runs
    chunk after chunk (flush + fresh K colsums between chunks) — the same
    shape the ContinuousBatcher drives in production, so long bench loops
    don't grow the staging buffer (and the staged-column attention term)
    with n_steps.
    """
    B = first_token.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    from mobilequant_tpu.runtime.sampling import loop_next_token

    kc = KernelConfig.coerce(use_pallas)
    # decode steps are always T=1, so the stacked MLP-block kernel's
    # decode-sized gate can safely admit up to 128 rows (one full MXU tile)
    # here: measured 21,971 vs 17,260 tok/s (XLA fallback) at bs=128 W4A8.
    # No-op for B<=64 (same traced program); B>128 still falls back to XLA.
    # Only legacy bool/string callers get the auto-raise — an explicit
    # KernelConfig (e.g. bench_batch --btmax) keeps its own gate. The raised
    # kc is what the scan bodies below pass to forward(); passing the
    # original use_pallas would silently re-coerce back to the default gate.
    if not isinstance(use_pallas, KernelConfig):
        kc = kc.replace(stacked_bt_max=max(kc.stacked_bt_max, 128))
        # W8 serving batches: the batched whole-model CHUNK kernel measured
        # +12% at bs=32 (11,957 vs 10,662 tok/s, 89% of the W8 HBM floor,
        # 2026-08-20) and LOSES at B>=64 and on W4 (where the staged path's
        # fused-unpack kernels already sit closer to their deeper floor) —
        # auto-enable exactly where it wins.
        w13 = packed.get("layers", {}).get("w13_proj")
        if (kc.model_kernel and w13 is not None and 8 < B <= 48
                and w13["wq"].shape[1] == config.hidden_size):
            kc = kc.replace(chunk_kernel=True)
    from mobilequant_tpu.quant.policy import policy_kv_bits
    kv4 = policy_kv_bits(policy) == 4
    assert not (kv4 and kc.attn_kernel), \
        "int4 KV decode: attn_kernel reads int8 caches"
    # int4 KV always decodes on the chunked-staging path: the B<=8
    # whole-layer/model megakernels read int8 caches, and staging amortizes
    # the packed cache's nibble-merge write to once per chunk
    use_staging = (not kc.attn_kernel
                   and (kv4 or B > 8
                        or not (kc.layer_kernel or kc.model_kernel)))

    if use_staging:
        if kv4:        # hd-major packed cache (L,B,Hkv,hd,S/2)
            L, _, Hkv, hd, S2_ = kv_cache.k.shape
            S = 2 * S2_
        else:
            L, _, Hkv, S, hd = kv_cache.k.shape
        cs = staging_chunk if (n_steps > staging_chunk
                               and n_steps % staging_chunk == 0) else n_steps
        n_chunks = n_steps // cs
        zero = jnp.int32(0)

        def flush(cache, staged, at):
            if kv4:
                # nibble merge into the packed cache (one vectorized
                # gather-merge pass per chunk — qops.kv_flush_packed)
                return qops.kv_flush_packed(cache, staged, at)
            # one per-slot slab write for the whole chunk
            for b in range(B):
                cache = jax.lax.dynamic_update_slice(
                    cache, staged[:, b:b + 1],
                    (zero, jnp.int32(b), zero, at[b], zero))
            return cache

        def chunk_body(carry, keys_chunk):
            token, cache, pos0 = carry
            pshape = (L, B, Hkv, 1, hd)
            st0 = StagedKVCache(
                k=cache.k, v=cache.v,
                sk=jnp.zeros((L, B, Hkv, cs, hd), cache.k.dtype),
                sv=jnp.zeros((L, B, Hkv, cs, hd), cache.v.dtype),
                m=jnp.int32(0),
                pk=jnp.zeros(pshape, cache.k.dtype),
                pv=jnp.zeros(pshape, cache.v.dtype))
            # zero-point column sums of the stale K cache: chunk-constant, so
            # ONE full K pass per chunk replaces a per-step per-layer slab
            # re-read inside int_matmul_qk (12.8 µs/layer at bs=32). A
            # loop-invariant closure operand of the inner scan, NOT part of
            # its carry (carried buffers risk per-step while-boundary copies).
            if kv4:
                # packed cache: one pass over the packed bytes yields the
                # shifted-domain colsums in sequence order
                kcs0 = qops.kv_colsums_packed(cache.k)
            else:
                kcs0 = jnp.sum(cache.k.astype(jnp.int32),
                               axis=-1).astype(jnp.float32)
            zero = jnp.int32(0)

            append_k = (cs % 8 == 0 and jax.default_backend() != "cpu")

            def stage_pending(st):
                # top-of-step append: the PREVIOUS step's rows land at column
                # m-1 (step 0 writes its zero-init pending over the zeroed
                # column 0 — harmless). This is the iteration's ONLY write to
                # sk/sv and the pre-write value has no later use — yet XLA
                # still copies both buffers defensively when expressed as a
                # DUS (BENCHMARKS.md round-3 staging dead-ends), so on TPU
                # the append is a Pallas kernel with MUST-alias outputs that
                # touches only the 8-column window containing the column.
                at_m = jnp.maximum(st.m - 1, 0)
                if append_k:
                    from mobilequant_tpu.ops.pallas_scatter import (
                        staged_append)
                    sk2, sv2 = staged_append(st.sk, st.sv, st.pk, st.pv, at_m)
                    return st._replace(sk=sk2, sv=sv2)
                at = (zero, zero, zero, at_m, zero)
                return st._replace(
                    sk=jax.lax.dynamic_update_slice(st.sk, st.pk, at),
                    sv=jax.lax.dynamic_update_slice(st.sv, st.pv, at))

            def step_st(c, k_step):
                # `last` rides the CARRY, not the ys: a (cs,B,V) logits ys
                # buffer (131 MB at bs=32, S=1024) would be materialized for
                # one consumed row
                tok_c, st, pos, _ = c
                st = stage_pending(st)
                logits, st = forward(packed, tok_c, config, policy,
                                     positions=pos[:, None],
                                     kv_cache=st._replace(kcs=kcs0),
                                     cache_position=pos0,
                                     kv_valid_len=pos + 1,
                                     use_pallas=kc,
                                     layer_unroll=layer_unroll)
                last = logits[:, -1]
                nxt = loop_next_token(last, k_step, temperature)[:, None]
                return (nxt, st._replace(kcs=None), pos + 1, last), nxt[:, 0]

            last0 = jnp.zeros((B, config.vocab_size), jnp.float32)
            (tok_c, st, pos, last), toks_c = jax.lax.scan(
                step_st, (token, st0, pos0, last0), keys_chunk)
            # the last step's rows are still pending: one post-scan append
            # (single-use buffer here — in-place without gymnastics)
            st = stage_pending(st)
            cache = EngineKVCache(k=flush(st.k, st.sk, pos0),
                                  v=flush(st.v, st.sv, pos0))
            return (tok_c, cache, pos), (toks_c, last)

        keys = jax.random.split(key, n_steps)
        if n_chunks == 1:
            (tok, cache, pos), (tokens, last) = chunk_body(
                (first_token, kv_cache, start_pos), keys)
        else:
            (tok, cache, pos), (tokens, last) = jax.lax.scan(
                chunk_body, (first_token, kv_cache, start_pos),
                keys.reshape(n_chunks, cs, *keys.shape[1:]))
            tokens = tokens.reshape(n_steps, B)
            last = last[-1]
        return jnp.transpose(tokens, (1, 0)), cache, last

    def step(carry, k_step):
        token, cache, pos, _ = carry
        logits, cache = forward(packed, token, config, policy,
                                positions=pos[:, None], kv_cache=cache,
                                cache_position=pos, kv_valid_len=pos + 1,
                                use_pallas=kc, layer_unroll=layer_unroll)
        last = logits[:, -1]
        nxt = loop_next_token(last, k_step, temperature)[:, None]
        return (nxt, cache, pos + 1, last), nxt[:, 0]

    keys = jax.random.split(key, n_steps)
    last0 = jnp.zeros((B, config.vocab_size), jnp.float32)
    (tok, cache, pos, last), tokens = jax.lax.scan(
        step, (first_token, kv_cache, start_pos, last0), keys)
    return jnp.transpose(tokens, (1, 0)), cache, last
