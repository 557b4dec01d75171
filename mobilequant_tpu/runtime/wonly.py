"""Weight-only (W4A16 / W8A16) serving mode — the end-to-end twin of the
reference's `create_weight_only_qmodel` real-W4 path (auto_gptq CUDA kernels,
ref qmodule.py:803-829, 868-886; driven by `eval/simple_eval.py --mode w4a16`).

Where the int engine (runtime/engine.py) quantizes activations against learned
static ranges, this mode keeps activations in floating point and only the
weights are integer: fp matmuls against W4/W8 packs dequantized on the fly.
No calibration or range learning is needed — `pack_weight_only` quantizes a
converted FP checkpoint directly (per-channel or grouped g128-style, matching
the reference's auto_gptq default layout).

Design: the forward IS the FP model (models/model.py) driven through the Ops
interception protocol — `WeightOnlyOps.linear` swaps each projection's fp
weight for its pack. Two execution paths per call site:
  * decode (≤8 rows, TPU): `wonly_matmul_stacked` Pallas kernel — weights
    stream straight out of the (L,·,·) HBM stack (scalar-prefetch layer
    select) and dequantize in VMEM; neither the unpacked integers nor the
    dequantized fp weights ever round-trip through HBM. (Inside the layer
    scan XLA would otherwise materialize both: the per-layer slice copy AND a
    full fp32 weight tensor per projection per step — see
    ops/pallas_matmul.w4a8_matmul_stacked for the measured cost of the same
    effect on the int path.)
  * prefill / CPU: `qops.weight_only_linear` (XLA) — the dequantized weight
    materializes once per layer per pass, amortized over the whole segment.

The KV cache stays floating point (the reference's auto_gptq mode likewise
keeps fp16 activations and cache); the int8 KV cache belongs to the A8 engine.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mobilequant_tpu.models.config import ModelConfig
from mobilequant_tpu.models import model as M
from mobilequant_tpu.ops import qops
from mobilequant_tpu.quant.policy import WEIGHT_ONLY_PROJ_KEYS as _PROJ_KEYS
from mobilequant_tpu.quant.quantizer import QuantConfig


def default_weight_cfg(weight_bits: int = 4, group_size: int = 128) -> QuantConfig:
    """The reference's auto_gptq default: grouped per-channel, g128
    (ref qmodule.py:815-821 `sym=False, group_size=128`)."""
    return QuantConfig(bitwidth=weight_bits, is_per_channel=True,
                       group_size=group_size, is_symmetric=False)


def pack_weight_only(params: dict, config: ModelConfig, wcfg: QuantConfig,
                     act_dtype=jnp.float32, head_bits: int = 16) -> dict:
    """FP params (models/model layout) → weight-only packed model.

    Returns {"skeleton": params-with-placeholder-projection-weights,
             "packs": {proj_key: stacked pack (+ stacked bias)}}.
    The skeleton keeps everything the packs don't cover (embeddings, norms,
    biases, router, lm_head) in `act_dtype`; projection weight leaves become
    (L,1,1) placeholders so the layer scan slices nothing of substance.

    head_bits 8/4 additionally packs the lm_head per-channel symmetric
    (engine.pack_head) with dynamic per-token A8 activations at run time —
    the same SLinear-analogue head as the int engine's EngineConfig.head_bits
    (the head is the single largest weight read per decode step: TinyLlama
    131 MB bf16, Gemma 1.05 GB). The embed table keeps fp storage for the
    lookup path."""
    gs = wcfg.group_size
    if gs != -1:
        d_ins = {"q_proj": config.hidden_size, "k_proj": config.hidden_size,
                 "v_proj": config.hidden_size, "o_proj": config.q_dim,
                 "w1": config.hidden_size, "w3": config.hidden_size,
                 "w2": config.intermediate_size}
        for k, d in d_ins.items():
            assert d % gs == 0 and (wcfg.bitwidth != 4 or (d // gs) % 2 == 0 or
                                    d // gs == 1), \
                f"group_size {gs} must divide {k}'s input dim {d} evenly " \
                "(and into an even group count for W4 nibble halves)"

    def cast(t):
        return t.astype(act_dtype) if jnp.issubdtype(t.dtype, jnp.floating) else t

    packs: dict = {}
    skeleton_layers: dict = {}
    for key, entry in params["layers"].items():
        if key in _PROJ_KEYS and "w" in entry:
            w = entry["w"]
            if w.ndim == 4:      # MoE expert stacks (L,E,K,N)
                pk = jax.vmap(jax.vmap(lambda wi: qops.pack_weight(wi, wcfg)))(w)
            else:                # (L,K,N)
                pk = jax.vmap(lambda wi: qops.pack_weight(wi, wcfg))(w)
            pk.pop("colsum", None)        # activation-offset correction: A16 has none
            pk["bias"] = entry["b"].astype(jnp.float32)
            packs[key] = pk
            skeleton_layers[key] = {
                "w": jnp.zeros((w.shape[0], 1, 1), act_dtype),
                "b": entry["b"].astype(act_dtype),
            }
        else:
            skeleton_layers[key] = jax.tree.map(cast, entry)

    skeleton = {k: (skeleton_layers if k == "layers" else jax.tree.map(cast, v))
                for k, v in params.items()}
    packed = {"skeleton": skeleton, "packs": packs}
    if head_bits in (4, 8):
        from mobilequant_tpu.runtime.engine import pack_head
        head_w = params["embed"]["w"].T if config.tie_word_embeddings \
            else params["lm_head"]["w"]
        hcfg = QuantConfig(bitwidth=head_bits, is_symmetric=True,
                           is_per_channel=True)
        packed["head_q"] = pack_head(jnp.asarray(head_w, jnp.float32), hcfg)
        if not config.tie_word_embeddings:
            # the fp head is never read again — placeholder keeps the tree shape
            skeleton["lm_head"] = {"w": jnp.zeros((1, 1), act_dtype)}
    return packed


class WeightOnlyOps(M.Ops):
    """Ops override that runs every projection against its weight-only pack."""

    def __init__(self, packs: dict, use_pallas: bool = False,
                 interpret: bool = False):
        self.packs = packs
        self.use_pallas = use_pallas
        self.interpret = interpret
        self._sliced: Optional[dict] = None
        self._li = None

    def begin_layer(self, extras):
        self._sliced = extras["packs"] if extras is not None else None
        self._li = extras.get("li") if extras is not None else None

    def linear(self, site, x, w, b):
        key = site.split(".")[-1]
        if key not in self.packs:
            return x @ w + b
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        if self.use_pallas and rows <= 8 and self._li is not None:
            from mobilequant_tpu.ops.pallas_matmul import (
                wonly_linear_pallas_stacked)
            out = wonly_linear_pallas_stacked(
                x, self.packs[key], self.packs[key]["bias"], self._li,
                interpret=self.interpret)
            return out.astype(x.dtype)
        return qops.weight_only_linear(x, self._sliced[key], b)

    def expert_linear(self, site, x, w, b):
        key = site.split(".")[-1]
        if key not in self.packs:
            return super().expert_linear(site, x, w, b)
        return qops.weight_only_expert_linear(x, self._sliced[key], b)


def init_kv_cache(ecfg, batch_size: int) -> M.KVCache:
    """fp KV cache in the FP model's (L,B,S,Hkv,hd) layout."""
    c = ecfg.model
    shape = (c.num_layers, batch_size, ecfg.max_seq_len, c.num_kv_heads,
             c.head_dim_)
    dt = ecfg.act_dtype
    return M.KVCache(k=jnp.zeros(shape, dt), v=jnp.zeros(shape, dt))


def forward(packed: dict, tokens: jax.Array, config: ModelConfig, policy=None,
            positions=None, kv_cache: Optional[M.KVCache] = None,
            cache_position=None, kv_valid_len=None, use_pallas=False,
            logits_at=None, interpret: bool = False, **_unused):
    """Weight-only forward → (logits fp32, new_kv_cache).

    Signature-compatible with engine.forward so Generator/bench drive either
    engine through one code path; `policy` is ignored (no activation
    quantization in this mode). `use_pallas`: truthy routes decode-sized
    matmuls through the stacked weight-only kernel."""
    c = config
    B, T = tokens.shape
    sk = packed["skeleton"]
    ops = WeightOnlyOps(packed["packs"], use_pallas=bool(use_pallas),
                        interpret=interpret)
    extras = {"packs": packed["packs"],
              "li": jnp.arange(c.num_layers, dtype=jnp.int32)}
    x, new_cache, _ = M.forward_hidden(
        sk, tokens, c, ops, positions=positions, kv_cache=kv_cache,
        cache_position=cache_position, kv_valid_len=kv_valid_len,
        layer_extras=extras)
    if logits_at is not None:
        x = x[jnp.arange(B)[:, None], logits_at[:, None]]        # (B,1,D)
    if "head_q" in packed:
        from mobilequant_tpu.runtime.engine import quantized_head_logits
        logits = quantized_head_logits(x.astype(jnp.float32), packed["head_q"],
                                       c.vocab_size,
                                       use_kernel=bool(use_pallas),
                                       interpret=interpret)
    else:
        head_w = sk["embed"]["w"].T if c.tie_word_embeddings \
            else sk["lm_head"]["w"]
        logits = x.astype(jnp.float32) @ head_w.astype(jnp.float32)
    return logits, new_cache


def decode_loop(packed: dict, first_token: jax.Array, kv_cache: M.KVCache,
                start_pos: jax.Array, n_steps: int, config: ModelConfig,
                policy=None, use_pallas: bool = False, temperature: float = 0.0,
                key: Optional[jax.Array] = None, interpret: bool = False,
                **_unused):
    """In-graph decode loop (lax.scan over steps) on the weight-only forward —
    same contract as engine.decode_loop."""
    if key is None:
        key = jax.random.PRNGKey(0)

    def step(carry, k_step):
        token, cache, pos = carry
        logits, cache = forward(packed, token, config, policy,
                                positions=pos[:, None], kv_cache=cache,
                                cache_position=pos, kv_valid_len=pos + 1,
                                use_pallas=use_pallas, interpret=interpret)
        last = logits[:, -1]
        from mobilequant_tpu.runtime.sampling import loop_next_token
        nxt = loop_next_token(last, k_step, temperature)[:, None]
        return (nxt, cache, pos + 1), (nxt[:, 0], last)

    keys = jax.random.split(key, n_steps)
    (tok, cache, pos), (tokens, logits_seq) = jax.lax.scan(
        step, (first_token, kv_cache, start_pos), keys)
    return jnp.transpose(tokens, (1, 0)), cache, logits_seq[-1]
