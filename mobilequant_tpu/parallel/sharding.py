"""Mesh + sharding rules: tensor/data parallelism for training and inference.

The reference's only parallelism is bin-packing decoder layers onto GPUs with
forward-pre-hook `tensor.to()` moves (mobilellm/utils/parallel_utils.py) — purely
sequential pipeline placement. The TPU-native replacement (SURVEY.md §2.3) is a
`jax.sharding.Mesh` with ("dp", "tp") axes and NamedSharding annotations on the
big tensors; GSPMD propagates the rest and inserts the all-reduce/all-gather
collectives over ICI. No hand-written transport, no hooks.

TP layout (Megatron-style, int8-aware):
  * q/k/v/w1/w3 weights: shard the OUT axis over "tp"  (column parallel)
  * o/w2 weights:        shard the IN axis over "tp"   (row parallel → psum)
  * per-channel weight scales/offsets/colsums follow their out axis
  * int8 KV cache: shard the kv-head axis over "tp" — attention is fully local
    per head; the only tp collective per layer is the o_proj/w2 partial-sum
    all-reduce (int32 partials stay on-chip; the reduce is fp32)
  * embed/lm_head: shard the vocab axis (logits gather at the end)
  * activations: batch over "dp", replicated over "tp"
  * LET/LWC/LRL quant state: tiny — replicated, except per-channel LWC bounds
    which follow their weight's out axis.

Constraint: num_kv_heads % tp == 0 for cache sharding (tinyllama: 4; stablelm: 32;
gemma: 1 → gemma shards only the MLP/vocab axes, attention stays replicated).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mobilequant_tpu.models.config import ModelConfig


def make_mesh(dp: int = 1, tp: Optional[int] = None, devices=None,
              ep: Optional[int] = None) -> Mesh:
    """("dp","tp") mesh, or ("dp","ep","tp") when ep is given (expert parallelism
    gets its own axis so MoE expert sharding composes with TP)."""
    devices = devices if devices is not None else jax.devices()
    if ep is not None:
        if tp is None:
            tp = len(devices) // (dp * ep)
        assert dp * ep * tp == len(devices), (dp, ep, tp, len(devices))
        arr = np.asarray(devices).reshape(dp, ep, tp)
        return Mesh(arr, ("dp", "ep", "tp"))
    if tp is None:
        tp = len(devices) // dp
    assert dp * tp == len(devices), (dp, tp, len(devices))
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _kv_heads_shardable(config: ModelConfig, tp: int) -> bool:
    return config.num_kv_heads % tp == 0 and config.num_kv_heads >= tp


def param_pspecs(params: dict, config: ModelConfig, mesh: Mesh) -> dict:
    """PartitionSpec tree matching the model params pytree (stacked layers)."""
    tp = mesh.shape["tp"]
    attn_ok = _kv_heads_shardable(config, tp)

    col = P(None, None, "tp")    # (L, in, out) shard out
    row = P(None, "tp", None)    # (L, in, out) shard in
    col_b = P(None, "tp")        # (L, out) bias of column-parallel
    rep2 = P(None, None)
    rep1 = P(None)

    def proj(kind):
        if kind == "col":
            return {"w": col, "b": col_b}
        if kind == "row":
            return {"w": row, "b": rep2}
        return {"w": P(None, None, None), "b": rep2}

    attn_kind = ("col", "row") if attn_ok else ("rep", "rep")
    specs_layers = {
        "attn_norm": {"w": rep2, "b": rep2},
        "q_proj": proj(attn_kind[0]), "k_proj": proj(attn_kind[0]),
        "v_proj": proj(attn_kind[0]), "o_proj": proj(attn_kind[1]),
        "w1": proj("col"), "w2": proj("row"),
    }
    if "mlp_norm" in params["layers"]:
        specs_layers["mlp_norm"] = {"w": rep2, "b": rep2}
    if "w3" in params["layers"]:
        specs_layers["w3"] = proj("col")

    specs = {
        "embed": {"w": P("tp", None)},   # vocab-sharded
        "layers": specs_layers,
        "norm": {"w": rep1, "b": rep1},
    }
    if "lm_head" in params:
        specs["lm_head"] = {"w": P(None, "tp")}
    return specs


def qstate_pspecs(qstate: dict, params_specs: dict, config: ModelConfig,
                  mesh: Mesh) -> dict:
    """Quant-state specs: replicate everything except per-channel LWC bounds,
    which follow their weight's out axis."""
    from mobilequant_tpu.quant.qmodel import SITE_TO_PARAM

    def replicate(tree):
        return jax.tree.map(lambda a: P(*([None] * a.ndim)), tree)

    specs = {}
    for key, sub in qstate.items():
        if key == "lwc":
            lwc_specs = {}
            for site, bounds in sub.items():
                pkey = SITE_TO_PARAM[site]
                wspec = params_specs["layers"].get(pkey, {}).get("w")
                # bounds: (L, 1, out) for per-channel, (L,) for per-tensor
                out_axis = wspec[-1] if wspec is not None else None
                lwc_specs[site] = jax.tree.map(
                    lambda a: (P(None, None, out_axis) if a.ndim == 3
                               else P(*([None] * a.ndim))), bounds)
            specs[key] = lwc_specs
        else:
            specs[key] = replicate(sub)
    return specs


def packed_pspecs(packed: dict, config: ModelConfig, mesh: Mesh) -> dict:
    """Specs for the integer engine's packed pytree (TP inference serving)."""
    tp = mesh.shape["tp"]
    attn_ok = _kv_heads_shardable(config, tp)

    def proj(kind):
        if kind == "col":
            return {"wq": P(None, None, "tp"), "scale": _scale_spec("tp"),
                    "offset": _scale_spec("tp"), "colsum": P(None, "tp"),
                    "bias": P(None, "tp")}
        if kind == "row":
            return {"wq": P(None, "tp", None), "scale": _scale_spec(None),
                    "offset": _scale_spec(None), "colsum": P(None, None),
                    "bias": P(None, None)}
        return {"wq": P(None, None, None), "scale": _scale_spec(None),
                "offset": _scale_spec(None), "colsum": P(None, None),
                "bias": P(None, None)}

    def _scale_spec(axis):
        # per-tensor scales are (L,); per-channel are (L, 1, out)
        def f(a):
            if a.ndim == 3:
                return P(None, None, axis)
            return P(None)
        return f

    # materialize callable specs against actual arrays
    def build_proj(entry, kind):
        template = proj(kind)
        out = {}
        for k, v in entry.items():
            spec = template.get(k)
            if spec is None:
                # auxiliary leaves (e.g. fused out_scale/out_offset) replicate
                out[k] = P(*([None] * v.ndim))
                continue
            out[k] = spec(v) if callable(spec) else spec
        return out

    # MoE packed experts (L, E, K, N): shard the stacked expert axis over "ep"
    # when the mesh has one that divides E (dense-dispatch EP — each device
    # computes its expert slice, the combine einsum reduces across ep).
    ep = None
    if "ep" in mesh.shape and mesh.shape["ep"] > 1 \
            and config.is_moe and config.num_local_experts % mesh.shape["ep"] == 0:
        ep = "ep"

    def build_moe_proj(entry):
        out = {}
        for k, v in entry.items():
            spec = [None] * v.ndim
            if v.ndim >= 2:           # (L, E, ...) leaves; (L,) scalars replicate
                spec[1] = ep
            out[k] = P(*spec)
        return out

    attn_kind = ("col", "row") if attn_ok else ("rep", "rep")
    layers = {}
    for pkey, entry in packed["layers"].items():
        if pkey in ("attn_norm", "mlp_norm"):
            layers[pkey] = {"w": P(None, None), "b": P(None, None)}
        elif pkey == "router":
            layers[pkey] = {"w": P(None, None, None)}
        elif pkey in ("q_proj", "k_proj", "v_proj"):
            layers[pkey] = build_proj(entry, attn_kind[0])
        elif pkey in ("qkv_proj", "w13_proj"):
            # fused projections: TP would split the concatenated out axis across
            # segment boundaries — keep replicated (pack with
            # fuse_projections=False for TP serving)
            layers[pkey] = build_proj(entry, "rep")
        elif pkey == "o_proj":
            layers[pkey] = build_proj(entry, attn_kind[1])
        elif pkey in ("w1", "w3"):
            layers[pkey] = build_moe_proj(entry) if entry["wq"].ndim == 4 \
                else build_proj(entry, "col")
        elif pkey == "w2":
            layers[pkey] = build_moe_proj(entry) if entry["wq"].ndim == 4 \
                else build_proj(entry, "row")
        elif pkey in ("qkvp", "op"):
            # whole-layer/whole-model kernel packs (permuted layouts): the
            # kernels read them single-chip — replicate (TP serving reshards
            # the canonical per-projection packs instead)
            layers[pkey] = build_proj(entry, "rep")
        else:
            layers[pkey] = jax.tree.map(
                lambda a: P(*([None] * a.ndim)), entry)

    specs = {
        "embed": P("tp", None),
        "layers": layers,
        "ranges": jax.tree.map(lambda a: P(*([None] * a.ndim)), packed["ranges"]),
        "norm": {"w": P(None), "b": P(None)},
    }
    if "rvec" in packed:
        specs["rvec"] = P(None, None)
    if "lm_head" in packed:
        specs["lm_head"] = {"w": P(None, "tp")}
    if "qkv_seg" in packed:
        specs["qkv_seg"] = P(None)
    if "head_q" in packed:
        # quantized head: per-out-channel leaves shard the (padded) vocab axis
        hq = packed["head_q"]
        specs["head_q"] = {"wq": P(None, "tp"),
                           "scale": P(*([None] * (hq["scale"].ndim - 1) + ["tp"])),
                           "offset": P(*([None] * (hq["offset"].ndim - 1) + ["tp"])),
                           "colsum": P("tp")}
    return specs


def kv_cache_pspec(config: ModelConfig, mesh: Mesh):
    """Engine cache (L, B, Hkv, S, hd): batch over dp, kv heads over tp (if
    divisible), sequence over cp when the mesh carries a context-parallel
    axis (long-context serving: GSPMD partitions the masked decode-attention
    contractions over the S shards)."""
    tp = mesh.shape["tp"]
    head_axis = "tp" if _kv_heads_shardable(config, tp) else None
    seq_axis = "cp" if "cp" in mesh.axis_names else None
    return P(None, "dp", head_axis, seq_axis, None)


def shard_tree(tree, specs, mesh: Mesh):
    """device_put a pytree with NamedShardings from a spec tree."""
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), tree, specs)


def wonly_pspecs(packed: dict, config: ModelConfig, mesh: Mesh) -> dict:
    """Specs for the weight-only packed pytree (runtime/wonly.py): Megatron
    column/row TP of the integer packs; the fp skeleton mostly replicates
    (norm weights, biases, placeholder projection leaves) with the embedding
    and head vocab-sharded as in param_pspecs. The XLA dequant path runs
    under plain jit — GSPMD propagates these shardings through
    unpack→dequant→matmul and inserts the o_proj/w2 all-reduces. (The
    stacked Pallas kernel is single-chip: TP serving sets use_pallas=False.)"""
    tp = mesh.shape["tp"]
    attn_ok = _kv_heads_shardable(config, tp)
    ep = None
    if "ep" in mesh.shape and mesh.shape["ep"] > 1 and config.is_moe \
            and config.num_local_experts % mesh.shape["ep"] == 0:
        ep = "ep"

    def scale_spec(v, axis):
        # per-tensor (L,), per-channel (L,1,N), grouped (L,G,1,N)
        if v.ndim == 1:
            return P(None)
        if v.ndim == 3:
            return P(None, None, axis)
        return P(None, None, None, axis)

    def pack_spec(entry, kind):
        out = {}
        for k, v in entry.items():
            if k == "wq" and kind == "col":
                out[k] = P(None, None, "tp")
            elif k == "wq" and kind == "row":
                # W4 packs shard the PACKED row axis; unpack_nibbles' concat
                # re-associates halves — GSPMD reshards as needed (correct by
                # construction, the K-reduction all-reduce still fires once)
                out[k] = P(None, "tp", None)
            elif k in ("scale", "offset"):
                out[k] = scale_spec(v, "tp" if kind == "col" else None)
            elif k == "bias":
                out[k] = P(None, "tp") if kind == "col" else P(None, None)
            else:
                out[k] = P(*([None] * v.ndim))
        return out

    attn_kind = ("col", "row") if attn_ok else ("rep", "rep")
    kinds = {"q_proj": attn_kind[0], "k_proj": attn_kind[0],
             "v_proj": attn_kind[0], "o_proj": attn_kind[1],
             "w1": "col", "w3": "col", "w2": "row"}
    packs = {}
    for pkey, entry in packed["packs"].items():
        if entry["wq"].ndim == 4:            # MoE expert stacks (L,E,...)
            packs[pkey] = {
                k: P(*[ep if i == 1 and v.ndim >= 2 else None
                       for i in range(v.ndim)])
                for k, v in entry.items()}
        else:
            packs[pkey] = pack_spec(entry, kinds.get(pkey, "rep"))

    sk = packed["skeleton"]
    skeleton = {
        "embed": {"w": P("tp", None)},
        "layers": jax.tree.map(lambda a: P(*([None] * a.ndim)), sk["layers"]),
        "norm": jax.tree.map(lambda a: P(*([None] * a.ndim)), sk["norm"]),
    }
    if "lm_head" in sk:
        # with a quantized head the fp lm_head is a (1,1) placeholder
        skeleton["lm_head"] = {"w": P(None, None) if "head_q" in packed
                               else P(None, "tp")}
    out = {"skeleton": skeleton, "packs": packs}
    if "head_q" in packed:
        # quantized head: vocab (last) axis over tp — int_head_linear is
        # column-separable (per-column scale/offset/colsum; rowsum replicates)
        out["head_q"] = {k: P(*([None] * (v.ndim - 1) + ["tp"]))
                         for k, v in packed["head_q"].items()}
    return out


def wonly_kv_cache_pspec(config: ModelConfig, mesh: Mesh):
    """Weight-only (fp) cache in the FP model layout (L, B, S, Hkv, hd):
    batch over dp, kv heads over tp (if divisible)."""
    tp = mesh.shape["tp"]
    head_axis = "tp" if _kv_heads_shardable(config, tp) else None
    return P(None, "dp", None, head_axis, None)
