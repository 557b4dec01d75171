"""Calibration passes: activation scales/shifts and static activation ranges.

TPU-native analogue of the reference's three hook-based drivers:
  * ptq/generate_act_scale_shift.py — per-channel abs-max of linear inputs
    (`act_scales`) and EMA(0.99) of per-channel midpoints (`act_shifts`);
  * ptq/generate_act_range.py — per-site input/output/input2 min-max → act_dict;
  * both become ONE jitted collect-mode forward (quant/qmodel.py mode="collect")
    whose per-layer stats come back stacked from the scan — no hooks, no mutation.

The merge rules across calibration batches follow the reference exactly:
  min/max     — running min / running max        (generate_act_range.py:60-101)
  act_scales  — running max of per-channel |x|   (generate_act_scale_shift.py:49-56)
  act_shifts  — EMA: 0.99·prev + 0.01·(cmax+cmin)/2  (generate_act_scale_shift.py:108-111)
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mobilequant_tpu.models.config import ModelConfig
from mobilequant_tpu.quant.policy import QPolicy, static_range_sites
from mobilequant_tpu.quant.qmodel import qforward_hidden, ranges_from_stats

EMA_DECAY = 0.99


def _collect_one_batch(params, let, tokens, config, policy):
    _, _, stats = qforward_hidden(params, {"let": let}, tokens, config, policy,
                                  mode="collect")
    return stats


def run_calibration(params, tokens: np.ndarray, config: ModelConfig, policy: QPolicy,
                    let: Optional[dict] = None, batch_size: int = 4):
    """Run the calibration corpus through the FP model (optionally LET-transformed)
    and return merged stats: stats[site][role] = {"min": (L,), "max": (L,),
    ["cmin"/"cmax"/"cabsmax"/"cshift": (L, C)]}.

    tokens: (N, T) int array of calibration sequences.
    """
    # policy is a plain dict (unhashable) — close over config+policy
    collect = jax.jit(lambda p, l, t: _collect_one_batch(p, l, t, config, policy))

    merged = None
    n = tokens.shape[0]
    for i in range(0, n, batch_size):
        batch = jnp.asarray(tokens[i:i + batch_size], jnp.int32)
        stats = jax.device_get(collect(params, let, batch))
        if merged is None:
            merged = {s: {r: dict(e) for r, e in roles.items()}
                      for s, roles in stats.items()}
            for s, roles in merged.items():
                for r, e in roles.items():
                    if "cmin" in e:
                        e["cabsmax"] = np.maximum(np.abs(e["cmin"]), np.abs(e["cmax"]))
                        e["cshift"] = (e["cmax"] + e["cmin"]) / 2.0
        else:
            for s, roles in stats.items():
                for r, e in roles.items():
                    m = merged[s][r]
                    m["min"] = np.minimum(m["min"], e["min"])
                    m["max"] = np.maximum(m["max"], e["max"])
                    if "emin" in e:   # per-expert MoE envelopes
                        m["emin"] = np.minimum(m["emin"], e["emin"])
                        m["emax"] = np.maximum(m["emax"], e["emax"])
                    if "cmin" in e:
                        cab = np.maximum(np.abs(e["cmin"]), np.abs(e["cmax"]))
                        m["cabsmax"] = np.maximum(m["cabsmax"], cab)
                        mid = (e["cmax"] + e["cmin"]) / 2.0
                        m["cshift"] = EMA_DECAY * m["cshift"] + (1 - EMA_DECAY) * mid
                        m["cmin"] = np.minimum(m["cmin"], e["cmin"])
                        m["cmax"] = np.maximum(m["cmax"], e["cmax"])
    return merged


# ---------------------------------------------------------------------------
# Derivations from merged stats
# ---------------------------------------------------------------------------

def stats_to_ranges(stats: dict, policy: QPolicy) -> dict:
    """Static activation ranges (LRL-learnable scale/offset leaves).

    MoE sites with per-expert envelopes ("emin"/"emax", (L,E)) produce
    per-expert (L,E) scale/offset leaves — the reference's one-QLinear-per-
    expert quantizers (hf_model.py:1065-1162). An expert never routed during
    calibration has +-inf envelopes and falls back to the per-stack range."""
    def mnmx(e):
        if "emin" in e:
            emn, emx = np.asarray(e["emin"]), np.asarray(e["emax"])
            mn = np.where(np.isfinite(emn), emn,
                          np.asarray(e["min"])[..., None])
            mx = np.where(np.isfinite(emx), emx,
                          np.asarray(e["max"])[..., None])
            return jnp.asarray(mn), jnp.asarray(mx)
        return jnp.asarray(e["min"]), jnp.asarray(e["max"])

    mm = {s: {r: mnmx(e)
              for r, e in roles.items()} for s, roles in stats.items()}
    return ranges_from_stats(mm, policy)


def ranges_for_kv_bits(ranges: dict, kv_bits: int,
                       old_bits: int = 8) -> dict:
    """Re-derive the KV-cache range entries for a different cache bitwidth:
    the learned min/max envelope is bitwidth-independent, so converting an
    8-bit-calibrated artifact to the int4-KV serving option is exact at the
    envelope level — scale/offset re-derive for the new qmax
    (quant/policy.kv_bits_policy supplies the matching policy). A
    kv_bits-aware quantize run (ranges learned under the 4-bit config) is
    strictly better; this is the pack-time conversion path."""
    from mobilequant_tpu.quant.policy import KV_CACHE_SITES
    from mobilequant_tpu.quant.quantizer import (
        QuantConfig, min_max_from_scale_offset, scale_offset_from_min_max)
    if kv_bits == old_bits:
        return ranges
    old_cfg = QuantConfig(bitwidth=old_bits)
    new_cfg = QuantConfig(bitwidth=kv_bits)
    out = {s: dict(roles) for s, roles in ranges.items()}
    for site, role in KV_CACHE_SITES:
        r = ranges[site][role]
        mn, mx = min_max_from_scale_offset(jnp.asarray(r["scale"]),
                                           jnp.asarray(r["offset"]), old_cfg)
        s, o = scale_offset_from_min_max(mn, mx, new_cfg)
        out[site] = dict(out[site])
        out[site][role] = {"scale": s, "offset": o}
    return out


def smooth_calib_inputs(stats: dict):
    """(act_scales, act_shifts) keyed for quant/smooth.smoothquant_let_init:
    per-layer (L, C) arrays for q_proj / w1 / o_proj / w2 inputs
    (the keys ptq/smoothquant.py:117-139 reads)."""
    key_map = {"q_proj": "self_attn.q_proj", "w1": "mlp.w1",
               "o_proj": "self_attn.o_proj", "w2": "mlp.w2"}
    act_scales, act_shifts = {}, {}
    for short, site in key_map.items():
        if site in stats and "input" in stats[site]:
            e = stats[site]["input"]
            act_scales[short] = jnp.asarray(e["cabsmax"])
            act_shifts[short] = jnp.asarray(e["cshift"])
    return act_scales, act_shifts


def stats_to_act_dict(stats: dict, config: ModelConfig) -> dict:
    """Reference-interchange act_dict.json: per-op {input/input2/output: [min, max]}
    keyed by full module names (ref ptq/generate_act_range.py output schema)."""
    out: dict = {}
    for site, roles in stats.items():
        for i in range(config.num_layers):
            name = f"model.layers.{i}.{site}"
            entry = out.setdefault(name, {})
            for role, e in roles.items():
                if "emin" in e:    # per-expert MoE envelopes -> lists
                    emn = np.asarray(e["emin"])[i]
                    emx = np.asarray(e["emax"])[i]
                    fb_n = float(np.asarray(e["min"])[i])
                    fb_x = float(np.asarray(e["max"])[i])
                    entry[role] = [
                        [float(v) if np.isfinite(v) else fb_n for v in emn],
                        [float(v) if np.isfinite(v) else fb_x for v in emx]]
                else:
                    entry[role] = [float(np.asarray(e["min"])[i]),
                                   float(np.asarray(e["max"])[i])]
    return out


def act_dict_to_stats(act_dict: dict, config: ModelConfig) -> dict:
    """Inverse: load a reference act_dict.json into stacked stats min/max."""
    stats: dict = {}
    for name, roles in act_dict.items():
        parts = name.split(".")
        if len(parts) < 4 or parts[0] != "model" or parts[1] != "layers":
            continue
        layer = int(parts[2])
        site = ".".join(parts[3:])
        for role, (mn, mx) in roles.items():
            e = stats.setdefault(site, {}).setdefault(role, {})
            if isinstance(mn, (list, tuple)):   # per-expert MoE entry
                E = len(mn)
                e.setdefault("emin", np.zeros((config.num_layers, E),
                                              np.float32))
                e.setdefault("emax", np.zeros((config.num_layers, E),
                                              np.float32))
                e["emin"][layer] = mn
                e["emax"][layer] = mx
                mn, mx = min(mn), max(mx)
            e.setdefault("min", np.zeros(config.num_layers, np.float32))
            e.setdefault("max", np.zeros(config.num_layers, np.float32))
            e["min"][layer] = mn
            e["max"][layer] = mx
    return stats


def ranges_to_act_dict(ranges: dict, policy: QPolicy, config: ModelConfig) -> dict:
    """Export learned (LRL) ranges back to act_dict.json min/max — the analogue of
    export_act_range (ref qmodule.py:908-946)."""
    from mobilequant_tpu.quant.quantizer import min_max_from_scale_offset
    out: dict = {}
    for site, role, cfg in static_range_sites(policy):
        r = ranges[site][role]
        mn, mx = min_max_from_scale_offset(jnp.asarray(r["scale"]),
                                           jnp.asarray(r["offset"]), cfg)
        mn, mx = np.asarray(mn), np.asarray(mx)
        for i in range(config.num_layers):
            if mn.ndim == 2:   # per-expert MoE entry -> per-expert lists
                val = [mn[i].tolist(), mx[i].tolist()]
            else:
                val = [float(mn[i]), float(mx[i])]
            out.setdefault(f"model.layers.{i}.{site}", {})[role] = val
    return out


# ---------------------------------------------------------------------------
# smooth_last: final-norm -> lm_head SmoothQuant fold (ref device/convert_sim.py
# :114-128 — equalize the head input's per-channel envelope against the head
# weight's per-row envelope before the head is per-channel quantized)
# ---------------------------------------------------------------------------

def head_input_absmax(params, tokens, config, batch_size: int = 4):
    """Per-channel absmax of the final-norm OUTPUT (the lm_head input) over a
    calibration corpus — the `act_scales` of the reference's --smooth_last
    (`get_last_act_scales(...)["lm_head_input"]`, device/convert_sim.py:123)."""
    from mobilequant_tpu.models import model as M

    @jax.jit
    def one(p, t):
        h, _, _ = M.forward_hidden(p, t, config, apply_final_norm=True)
        return jnp.max(jnp.abs(h.reshape(-1, h.shape[-1])), axis=0)

    am = None
    n = tokens.shape[0]
    for i in range(0, n, batch_size):
        t = jnp.asarray(tokens[i:i + batch_size], jnp.int32)
        cur = np.asarray(one(params, t))
        am = cur if am is None else np.maximum(am, cur)
    return jnp.asarray(am)


def smooth_last_scales(act_absmax, head_w, alpha: float = 0.5):
    """s = clamp(act^alpha / w^(1-alpha), 1e-5): divide into the final norm's
    weight/bias, multiply into the head's input rows — FP-output-preserving,
    shifts quantization difficulty from head input outlier channels into the
    per-channel-quantized head weights (ref device/convert_sim.py:124-127).
    head_w: (D, vocab)."""
    w_absmax = jnp.max(jnp.abs(head_w), axis=1)
    s = (jnp.asarray(act_absmax, jnp.float32) ** alpha
         / jnp.maximum(w_absmax.astype(jnp.float32), 1e-8) ** (1.0 - alpha))
    return jnp.clip(s, 1e-5, None)
