"""Fake-quant simulation model: the quantized forward pass.

The functional analogue of the reference's in-place module swapping
(`create_sim_qmodel`, qmodule.py:835-865): the same unified decoder
(models/model.py) runs with a `QuantOps` interceptor that applies fake
quantization at every policy site, reparameterizes layer weights with LET, and —
in collect mode — records per-site min/max ranges instead (the analogue of
`ptq/generate_act_range.py` forward hooks).

State layout (all stacked over layers, scan-sliced per layer):
  ranges[site][role] = {"scale": (L,), "offset": (L,)}   — LRL-learnable leaves
  lwc[site]          = {"up": (L,...), "low": (L,...)}    — learned weight clipping
  let[...]                                                — see quant/smooth.py
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mobilequant_tpu.models import model as M
from mobilequant_tpu.models.config import ModelConfig
from mobilequant_tpu.quant.policy import QPolicy, static_range_sites
from mobilequant_tpu.quant.quantizer import (
    QuantConfig, fake_quant, fake_quant_weight, lwc_init,
    scale_offset_from_min_max, weight_min_max,
)
from mobilequant_tpu.quant import smooth


# ---------------------------------------------------------------------------
# Quant state constructors
# ---------------------------------------------------------------------------

def ranges_init(policy: QPolicy, config: ModelConfig) -> dict:
    """Placeholder static ranges (scale=1, offset mid) — overwritten by calibration."""
    L = config.num_layers
    out = {}
    for site, role, cfg in static_range_sites(policy):
        out.setdefault(site, {})[role] = {
            "scale": jnp.ones((L,), jnp.float32),
            "offset": jnp.zeros((L,), jnp.float32),
        }
    return out


def ranges_from_stats(stats: dict, policy: QPolicy) -> dict:
    """stats[site][role] = (min (L,), max (L,)) → scale/offset leaves."""
    out = {}
    for site, role, cfg in static_range_sites(policy):
        mn, mx = stats[site][role]
        scale, offset = scale_offset_from_min_max(mn, mx, cfg)
        out.setdefault(site, {})[role] = {"scale": scale, "offset": offset}
    return out


SITE_TO_PARAM = {
    "self_attn.q_proj": "q_proj", "self_attn.k_proj": "k_proj",
    "self_attn.v_proj": "v_proj", "self_attn.o_proj": "o_proj",
    "mlp.w1": "w1", "mlp.w2": "w2", "mlp.w3": "w3",
    "input_layernorm": "attn_norm", "post_attention_layernorm": "mlp_norm",
}


def lwc_init_all(params: dict, policy: QPolicy) -> dict:
    """LWC bound factors for every weight-quantized *projection* site, stacked over
    layers (norm weights don't get LWC — reference enables it on QLinear/QNorm
    weight quantizers but 16-bit norm quantizers are range-benign)."""
    out = {}
    L = next(iter(params["layers"].values()))["w"].shape[0]
    for site, sq in policy.items():
        if sq.weight is None or not sq.weight.enabled or sq.weight.bitwidth > 8:
            continue
        pkey = SITE_TO_PARAM.get(site)
        if pkey is None or pkey not in params["layers"]:
            continue
        w0 = params["layers"][pkey]["w"][0]
        one = lwc_init(w0, sq.weight)
        out[site] = jax.tree.map(lambda a: jnp.broadcast_to(a, (L,) + a.shape).copy(), one)
    return out


# ---------------------------------------------------------------------------
# The interceptor
# ---------------------------------------------------------------------------

class QuantOps(M.Ops):
    """Fake-quant / range-collection op implementations.

    mode:
      "sim"     — apply fake quantization with static ranges (+LET/LWC if given)
      "collect" — no quantization; record per-site min/max (generate_act_range analogue)
    """

    def __init__(self, policy: QPolicy, config: ModelConfig, mode: str = "sim"):
        self.policy = policy
        self.config = config
        self.mode = mode
        self.ranges = None
        self.lwc = None
        self.let = None
        self._stats: dict = {}
        self._expert_mask = None   # (B,T,E) bool, set by moe_dispatch

    # scan slices the stacked quant state and hands it over before each layer
    def begin_layer(self, extras: Optional[dict]):
        extras = extras or {}
        self.ranges = extras.get("ranges")
        self.lwc = extras.get("lwc")
        self.let = extras.get("let")
        self._expert_mask = None

    def moe_dispatch(self, combine):
        """Per-expert activation ranges (ref: one QLinear PER EXPERT, each
        with its own quantizers, hf_model.py:1065-1162): remember which tokens
        route where so collect mode records each expert's stats over ITS
        routed tokens only, and sim mode has the expert axis to broadcast
        per-expert scale/offset vectors over."""
        self._expert_mask = combine > 0

    def pop_stats(self) -> dict:
        s, self._stats = self._stats, {}
        return s

    # --- helpers ---------------------------------------------------------

    # linear sites whose *inputs* get per-channel stats (for SmoothQuant init,
    # ref ptq/generate_act_scale_shift.py:41-149)
    PER_CHANNEL_INPUT_SITES = frozenset({
        "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
        "self_attn.o_proj", "mlp.w1", "mlp.w2", "mlp.w3",
    })

    def _spec(self, site: str):
        return self.policy.get(site)

    def _record(self, site, role, x):
        xf = x.astype(jnp.float32)
        entry = {"min": jnp.min(xf), "max": jnp.max(xf)}
        if role == "input" and site in self.PER_CHANNEL_INPUT_SITES:
            axes = tuple(range(x.ndim - 1))
            entry["cmin"] = jnp.min(xf, axis=axes)
            entry["cmax"] = jnp.max(xf, axis=axes)
        mask = self._expert_mask
        if (mask is not None and x.ndim == 4 and site.startswith("mlp.")
                and x.shape[2] == mask.shape[2]):
            # per-expert envelopes over each expert's ROUTED tokens (an
            # unrouted expert's +-inf merges away; stats_to_ranges falls back
            # to the per-stack envelope if an expert is never routed)
            mk = mask[..., None]
            entry["emin"] = jnp.min(jnp.where(mk, xf, jnp.inf), axis=(0, 1, 3))
            entry["emax"] = jnp.max(jnp.where(mk, xf, -jnp.inf), axis=(0, 1, 3))
        self._stats.setdefault(site, {})[role] = entry

    def _fq_act(self, site: str, role: str, x):
        if self.mode == "collect":
            # record every observable tensor, even where the policy has no
            # quantizer (SmoothQuant needs q/k/v/o/w1/w3 input stats)
            self._record(site, role, x)
            return x
        sq = self._spec(site)
        if sq is None:
            return x
        cfg: Optional[QuantConfig] = getattr(sq, role)
        if cfg is None or not cfg.enabled:
            return x
        if cfg.is_dynamic:
            mn, mx = jnp.min(x), jnp.max(x)
            scale, offset = scale_offset_from_min_max(mn, mx, cfg)
        else:
            r = self.ranges[site][role]
            scale, offset = r["scale"], r["offset"]
        if getattr(scale, "ndim", 0) == 1 and x.ndim == 4 \
                and scale.shape[0] == x.shape[2]:
            # per-expert (E,) ranges broadcast over the (B,T,E,·) expert axis
            scale, offset = scale[:, None], offset[:, None]
        return fake_quant(x, scale, offset, cfg)

    def _fq_weight(self, site: str, w):
        sq = self._spec(site)
        if sq is None or sq.weight is None or not sq.weight.enabled or self.mode == "collect":
            return w
        lwc = self.lwc.get(site) if self.lwc is not None else None
        return fake_quant_weight(w, sq.weight, lwc)

    # --- op overrides ----------------------------------------------------

    def transform_layer(self, lp, config):
        return smooth.apply_let(lp, self.let, config)

    def linear(self, site, x, w, b):
        x = self._fq_act(site, "input", x)
        w = self._fq_weight(site, w)
        y = x @ w + b
        return self._fq_act(site, "output", y)

    def expert_linear(self, site, x, w, b):
        """MoE expert projections: same policy table as the dense site, with
        PER-EXPERT activation ranges when calibration produced them — the
        emin/emax envelopes recorded over each expert's routed tokens
        (_record above; calibrate.stats_to_ranges) arrive as (E,) scale/
        offset vectors that _fq_act broadcasts over the (B,T,E,·) expert
        axis, matching the reference's per-expert QLinear instances
        (ref hf_model.py:1065-1162). Scalar per-stack ranges remain the
        fallback for experts never routed during calibration."""
        x = self._fq_act(site, "input", x)
        w = self._fq_weight(site, w)
        y = super().expert_linear(site, x, w, b)
        return self._fq_act(site, "output", y)

    def rmsnorm(self, site, x, w, b, eps):
        x = self._fq_act(site, "input", x)
        w = self._fq_weight(site, w)
        y = super().rmsnorm(site, x, w, b, eps)
        return self._fq_act(site, "output", y)

    def layernorm(self, site, x, w, b, eps):
        x = self._fq_act(site, "input", x)
        w = self._fq_weight(site, w)
        y = super().layernorm(site, x, w, b, eps)
        return self._fq_act(site, "output", y)

    def qk_matmul(self, site, q, k):
        q = self._fq_act(site, "input", q)
        k = self._fq_act(site, "input2", k)   # ← int8 KV-cache K encoding
        y = super().qk_matmul(site, q, k)
        return self._fq_act(site, "output", y)

    def pv_matmul(self, site, p, v):
        p = self._fq_act(site, "input", p)
        v = self._fq_act(site, "input2", v)   # ← int8 KV-cache V encoding
        y = super().pv_matmul(site, p, v)
        return self._fq_act(site, "output", y)

    def add(self, site, a, b):
        """Residual-stream adds (resid_add_1/2): the device graph quantizes
        both inputs and the output at 16 bits (ref device/utils.py:68-77);
        the strict policy carries these sites, relax_16bit drops them."""
        a = self._fq_act(site, "input", a)
        b = self._fq_act(site, "input2", b)
        y = a + b
        return self._fq_act(site, "output", y)

    def act_fn(self, site, x, kind):
        if kind == "silu":
            sig = jax.nn.sigmoid(x)
            sig = self._fq_act(site, "input2", sig)
            out = x * sig
        else:
            out = super().act_fn(site, x, kind)
        return self._fq_act(site, "output", out)


# ---------------------------------------------------------------------------
# Quantized forwards
# ---------------------------------------------------------------------------

def qforward_hidden(params, qstate, tokens, config: ModelConfig, policy: QPolicy,
                    mode: str = "sim", positions=None, kv_cache=None,
                    cache_position=None, kv_valid_len=None, apply_final_norm=True,
                    remat: bool = False):
    """Backbone with quantization. qstate = {"ranges","lwc","let"} (any may be None).
    Returns (hidden, kv, stats-or-None)."""
    ops = QuantOps(policy, config, mode)
    extras = {k: v for k, v in (qstate or {}).items() if v is not None}
    return M.forward_hidden(params, tokens, config, ops, positions, kv_cache,
                            cache_position, kv_valid_len,
                            collect_stats=(mode == "collect"),
                            layer_extras=extras or None,
                            apply_final_norm=apply_final_norm, remat=remat)


def qforward(params, qstate, tokens, config: ModelConfig, policy: QPolicy,
             mode: str = "sim", positions=None, kv_cache=None,
             cache_position=None, kv_valid_len=None):
    """Quantized CausalLM forward -> (logits, kv, stats-or-None)."""
    x, kv, stats = qforward_hidden(params, qstate, tokens, config, policy, mode,
                                   positions, kv_cache, cache_position, kv_valid_len)
    head_w = params["embed"]["w"].T if config.tie_word_embeddings else params["lm_head"]["w"]
    return x @ head_w, kv, stats
