"""Quantizer-placement policy.

The reference scatters quantizer wiring across three places: `create_sim_qmodel`
(which ops get wrapped and which input quantizers are dropped, qmodule.py:835-865),
`update_quant_cfg` (mixed-precision exceptions, ptq/mobilequant.py:175-203) and
`ptq/generate_qcfg.py:85-113`. SURVEY.md §7.4 flags this as a hard part: encode it
as ONE declarative table. This module is that table.

Site naming (inside one decoder layer):
  input_layernorm, post_attention_layernorm,
  self_attn.{q_proj,k_proj,v_proj,o_proj,qk_bmm,pv_bmm},
  mlp.{w1,w2,w3,act_fn}
The final norm and lm_head are never quantized (ref qmodule.py:843-845).

Key placement facts reproduced here:
  * q/k/v/o/w1/w3 projections have NO input quantizer — their input is already the
    quantized output of the preceding op (ref qmodule.py:848-858);
  * w2 keeps an input quantizer (the gate-mul product) and gets per-channel weights
    + 16-bit output (ref mobilequant.py:180-183);
  * o_proj output is 16-bit (residual stream precision, ref mobilequant.py:184-185);
  * norms: 16-bit input/weight, 8-bit output (ref mobilequant.py:186-190);
  * qk_bmm output (softmax input) 16-bit unless use_8bit_softmax_input;
    pv_bmm input (softmax output) 16-bit unless use_8bit_softmax_output
    (ref mobilequant.py:191-195);
  * qk_bmm.input2 / pv_bmm.input2 are the int8 KV-cache quantizers
    (ref calibrate.py:246-281 derives the global K/V encodings from them);
  * act_fn (SiLU): sigmoid output quantized as input2, product as output
    (ref qmodule.py:691-753); GELU: output only;
  * resid_add_1/resid_add_2: the device graph forces 16-bit quantizers on
    both inputs AND the output of every skip-connection add
    (ref device/utils.py:68-77, `module_add` ind % 5 in [2,3,4]) — these
    sites exist only in the exported graph, not the reference's training-time
    sim, so they live in the STRICT policy and are exactly what relax_16bit
    removes for TPU serving;
  * use_16bit_output_for_mlp: Gemma recipes run w1/w3 outputs at 16 bits
    (ref ptq/generate_qcfg.py:34,93-94).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from mobilequant_tpu.models.config import ModelConfig
from mobilequant_tpu.quant.quantizer import QuantConfig


@dataclasses.dataclass(frozen=True)
class SiteQuant:
    input: Optional[QuantConfig] = None
    input2: Optional[QuantConfig] = None
    weight: Optional[QuantConfig] = None
    output: Optional[QuantConfig] = None

    def roles(self):
        for r in ("input", "input2", "weight", "output"):
            if getattr(self, r) is not None:
                yield r, getattr(self, r)


QPolicy = dict  # site -> SiteQuant


def default_policy(config: ModelConfig,
                   weight_qcfg: QuantConfig = QuantConfig(bitwidth=8),
                   act_qcfg: QuantConfig = QuantConfig(bitwidth=8),
                   use_8bit_softmax_input: bool = False,
                   use_8bit_softmax_output: bool = False,
                   use_16bit_output_for_mlp: bool = False) -> QPolicy:
    """The reference's default mixed-precision W8A8/W4A8 policy as one table."""
    a8 = act_qcfg
    # ">16 bits" disables a quantizer; keep the 16-bit exception slots disabled too
    # when the caller asks for a no-quant policy (bitwidth 32 acts/weights)
    a16 = act_qcfg if act_qcfg.bitwidth > 16 else act_qcfg.replace(bitwidth=16)
    w = weight_qcfg
    w_pc = weight_qcfg.replace(is_per_channel=True)
    # norm "weights" are quantized with a 16-bit per-tensor asymmetric quantizer
    # (ref mobilequant.py:186-190 forces bitwidth 16, asym, per-tensor)
    norm_w16 = (weight_qcfg if weight_qcfg.bitwidth > 16
                else QuantConfig(bitwidth=16, is_symmetric=False, is_per_channel=False))

    qk_out = a8 if use_8bit_softmax_input else a16
    pv_in = a8 if use_8bit_softmax_output else a16
    mlp_out = a16 if use_16bit_output_for_mlp else a8

    policy = {
        "input_layernorm": SiteQuant(input=a16, weight=norm_w16, output=a8),
        "self_attn.q_proj": SiteQuant(weight=w, output=a8),
        "self_attn.k_proj": SiteQuant(weight=w, output=a8),
        "self_attn.v_proj": SiteQuant(weight=w, output=a8),
        "self_attn.qk_bmm": SiteQuant(input=a8, input2=a8, output=qk_out),
        "self_attn.pv_bmm": SiteQuant(input=pv_in, input2=a8, output=a8),
        "self_attn.o_proj": SiteQuant(weight=w, output=a16),
        # the NPU datapath quantizes the residual stream at 16 bits on both
        # inputs and the output of each skip-connection add
        # (ref device/utils.py:68-77); relax_16bit disables these for serving
        "resid_add_1": SiteQuant(input=a16, input2=a16, output=a16),
        "resid_add_2": SiteQuant(input=a16, input2=a16, output=a16),
        "mlp.w1": SiteQuant(weight=w, output=mlp_out),
        "mlp.w2": SiteQuant(input=a8, weight=w_pc, output=a16),
    }
    if not config.shared_attention_norm:
        policy["post_attention_layernorm"] = SiteQuant(input=a16, weight=norm_w16, output=a8)
    if config.num_linears_per_mlp == 3:
        policy["mlp.w3"] = SiteQuant(weight=w, output=mlp_out)
    if config.hidden_act == "silu":
        policy["mlp.act_fn"] = SiteQuant(input2=a8, output=a8)
    else:  # gelu variants: output-only (ref QGELU, qmodule.py:756-799)
        policy["mlp.act_fn"] = SiteQuant(output=a8)
    return policy


def policy_to_dict(policy: QPolicy) -> dict:
    """Serialize in the reference's default_qcfg.json per-site schema."""
    return {site: {role: cfg.to_dict() for role, cfg in sq.roles()}
            for site, sq in policy.items()}


def policy_from_dict(d: dict) -> QPolicy:
    out = {}
    for site, roles in d.items():
        kw = {role: QuantConfig.from_dict(cfg) for role, cfg in roles.items()}
        out[site] = SiteQuant(**kw)
    return out


def relax_16bit(policy: QPolicy) -> QPolicy:
    """Disable the 16-bit exception sites (norm I/O, o_proj/w2 outputs, softmax
    I/O). On an NPU these sites must be quantized because the datapath is integer
    end-to-end; on TPU the inter-op datapath is fp32 registers/VMEM, so 16-bit
    fake-quant there is purely *simulation* of an NPU constraint — dropping it
    changes outputs by ~1e-4 relative and removes a measurable per-token op-count
    overhead at bs=1. Keep the strict policy for fidelity gating; serve with the
    relaxed one."""
    out = {}
    for site, sq in policy.items():
        kw = {}
        for role, cfg in sq.roles():
            kw[role] = cfg.replace(bitwidth=32) if cfg.bitwidth == 16 else cfg
        out[site] = SiteQuant(**kw)
    return out


KV_CACHE_SITES = (("self_attn.qk_bmm", "input2"),   # K cache quantizer
                  ("self_attn.pv_bmm", "input2"))   # V cache quantizer


def kv_bits_policy(policy: QPolicy, kv_bits: int) -> QPolicy:
    """Set the KV-cache quantizer bitwidth (the qk_bmm.input2 / pv_bmm.input2
    sites — ref calibrate.py:246-281 derives the device K/V encodings from
    exactly these). kv_bits=4 is the int4-KV serving option: at serving batch
    sizes the decode step is KV-read-dominated (BENCHMARKS.md: bs=64 reads
    740 MB of KV vs 550 MB of W4 weights per step), so a 4-bit cache halves
    the dominant traffic term; the engine stores it nibble-packed along the
    sequence axis (runtime/engine.py kv4 paths). Placement/bitwidth live
    HERE, per the policy invariant."""
    if kv_bits == 8:
        return policy
    assert kv_bits == 4, kv_bits
    out = dict(policy)
    for site, role in KV_CACHE_SITES:
        sq = out[site]
        cfg = getattr(sq, role)
        out[site] = dataclasses.replace(
            sq, **{role: cfg.replace(bitwidth=kv_bits)})
    return out


def policy_kv_bits(policy: QPolicy) -> int:
    """The KV-cache bitwidth a policy encodes (engine paths key off this)."""
    cfg = policy["self_attn.qk_bmm"].input2
    cfg2 = policy["self_attn.pv_bmm"].input2
    assert cfg.bitwidth == cfg2.bitwidth, \
        "K and V cache bitwidths must match (one packed-cache layout)"
    return cfg.bitwidth


def static_range_sites(policy: QPolicy):
    """(site, role) pairs that need static activation scale/offset state —
    every activation quantizer that is enabled and not dynamic."""
    for site, sq in policy.items():
        for role, cfg in sq.roles():
            if role == "weight":
                continue
            if cfg.enabled and not cfg.is_dynamic:
                yield site, role, cfg


# Projection param keys carrying weight-only quantizers (the reference's
# create_weight_only_qmodel wraps exactly the decoder Linears and leaves
# norms/lm_head fp, ref qmodule.py:868-886). Placement lives HERE so
# runtime/wonly.py never encodes bitwidth decisions of its own.
WEIGHT_ONLY_PROJ_KEYS = ("q_proj", "k_proj", "v_proj", "o_proj",
                         "w1", "w2", "w3")

_WEIGHT_ONLY_SITES = ("self_attn.q_proj", "self_attn.k_proj",
                      "self_attn.v_proj", "self_attn.o_proj",
                      "mlp.w1", "mlp.w2", "mlp.w3")


def weight_only_policy(config: ModelConfig, wcfg: QuantConfig,
                       head_bits: int = 16) -> QPolicy:
    """W4A16/W8A16 placement: weight quantizers on every projection, no
    activation quantizers anywhere — the artifact's default_qcfg.json for a
    weight-only pack describes exactly this. head_bits 8/4 records the
    quantized lm_head (per-channel symmetric weights × dynamic per-token A8,
    engine.pack_head) so the artifact's placement record covers every
    quantizer the pack actually carries."""
    sites = [s for s in _WEIGHT_ONLY_SITES
             if config.num_linears_per_mlp == 3 or not s.endswith("w3")]
    policy = {s: SiteQuant(weight=wcfg) for s in sites}
    if head_bits in (4, 8):
        policy["lm_head"] = SiteQuant(
            weight=QuantConfig(bitwidth=head_bits, is_symmetric=True,
                               is_per_channel=True),
            input=QuantConfig(bitwidth=8, is_symmetric=True, is_dynamic=True))
    return policy
