"""Unified functional decoder (TPU-native analogue of reference mobilellm/model/hf_model.py).

Design notes (vs the reference):
  * The reference implements one torch `nn.Module` tree whose sub-modules are later
    swapped in-place for quantized wrappers (qmodule.create_sim_qmodel). Here the model
    is a pure function over a parameter pytree, and quantization attaches through an
    `Ops` interception object: every quantizable op site (linear / norm / bmm / act /
    mul / add / softmax) is routed through `ops.<op>(site, ...)`. `Ops` = plain FP math;
    quant/qmodel.py subclasses it for fake-quant simulation and range collection.
    This mirrors the reference's quantizer placement exactly (ref qmodule.py:835-865)
    without any module mutation, and keeps the whole forward jit/scan/grad-friendly.
  * Decoder layers are *stacked*: every per-layer leaf has a leading layer axis and the
    layer loop is a `lax.scan`, so XLA compiles one layer body regardless of depth.
  * Weights are stored (in_features, out_features) so the hot op is `x @ w` — the
    transpose of torch's Linear layout; models/convert.py handles the flip.
  * Biases are always present (zeros when the architecture has none): the learned
    equivalent transformations create biases on projections and norms
    (ref algorithm.py:47-68 smooth_ln_fcs), so uniform leaves keep the pytree static.

Behavioural parity points with the reference (checked in tests/test_model_parity.py):
  * additive causal mask value neg_inf = -40000 (ref hf_model.py:1650);
  * qk_bmm consumes *unscaled* q/k; /sqrt(head_dim) happens after (ref hf_model.py:522);
  * softmax in fp32 (ref hf_model.py:534);
  * KV-cache holds num_kv_heads (pre-GQA-expansion) K/V (ref hf_model.py:505-508);
  * partial rotary: only the first rotary_dim dims rotate (ref hf_model.py:489-501);
  * Gemma: embeddings scaled by sqrt(hidden) (ref hf_model.py:1555), norm weight has
    the +1 folded at conversion (ref scripts/convert_ckpt.py:48-54).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from mobilequant_tpu.models.config import ModelConfig

Params = dict
PyTree = Any


# ---------------------------------------------------------------------------
# Op interception (quantization attachment points)
# ---------------------------------------------------------------------------

class Ops:
    """Plain-FP implementations of every quantizable op site.

    `site` is the op name inside one decoder layer (e.g. "self_attn.q_proj"); the
    layer index is implicit because the layer loop is a scan. Subclasses (fake-quant
    sim, range collector) override these; they may also override `transform_layer`
    to reparameterize layer weights (the functional analogue of the reference's
    LET `smooth_lm_temporary`, algorithm.py:190-234).
    """

    def transform_layer(self, lp: Params, config: ModelConfig) -> Params:
        return lp

    def linear(self, site: str, x, w, b):
        return x @ w + b

    def rmsnorm(self, site: str, x, w, b, eps: float):
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
        return (y * w + b).astype(x.dtype)

    def layernorm(self, site: str, x, w, b, eps: float):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + eps)
        return (y * w + b).astype(x.dtype)

    def qk_matmul(self, site: str, q, k):
        """q: (B,T,Hkv,G,hd); k: (B,S,Hkv,hd) -> scores (B,Hkv,G,T,S).

        GQA is expressed in the einsum instead of materializing repeat_kv
        (ref hf_model.py:371-379) — per-tensor quantization of k is unaffected.
        """
        return jnp.einsum("btkgh,bskh->bkgts", q, k)

    def pv_matmul(self, site: str, p, v):
        """p: (B,Hkv,G,T,S); v: (B,S,Hkv,hd) -> (B,T,Hkv,G,hd)."""
        return jnp.einsum("bkgts,bskh->btkgh", p, v)

    def softmax(self, site: str, x, dtype):
        return jax.nn.softmax(x.astype(jnp.float32), axis=-1).astype(dtype)

    def act_fn(self, site: str, x, kind: str):
        if kind == "silu":
            # decomposed so the sigmoid output is an interceptable site
            # (ref qmodule.py:691-753 QSiLU quantizes sigmoid(x) as input2)
            return x * jax.nn.sigmoid(x)
        if kind == "gelu_tanh":
            return jax.nn.gelu(x, approximate=True)
        if kind == "gelu":
            return jax.nn.gelu(x, approximate=False)
        raise ValueError(f"unknown activation {kind!r}")

    def mul(self, site: str, a, b):
        return a * b

    def add(self, site: str, a, b):
        return a + b

    def expert_linear(self, site: str, x, w, b):
        """MoE expert projection over stacked experts.
        x (B,T,D) with w (E,D,F) -> (B,T,E,F);  x (B,T,E,F) with w (E,F,D) ->
        (B,T,E,D). The expert axis is the EP-shardable dimension."""
        if x.ndim == 3:
            return jnp.einsum("btd,edf->btef", x, w) + b
        return jnp.einsum("btef,efd->bted", x, w) + b

    def moe_dispatch(self, combine):
        """Hook: the (B,T,E) combine weights of the current MoE block, called
        before the expert sites run. The fake-quant sim uses it to apply /
        collect PER-EXPERT activation ranges over each expert's routed tokens
        (the reference's per-expert QLinear instances, hf_model.py:1065-1162);
        plain-FP ops ignore it."""


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def _dense(key, d_in, d_out, dtype, std=0.02):
    return (jax.random.normal(key, (d_in, d_out)) * std).astype(dtype)


def init_params(config: ModelConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random-init parameter pytree with stacked layer leaves."""
    c = config
    hd, qd, kvd = c.head_dim_, c.q_dim, c.kv_dim
    L, D, F = c.num_layers, c.hidden_size, c.intermediate_size
    keys = jax.random.split(key, 16)

    def stack_dense(k, d_in, d_out, std=0.02):
        ks = jax.random.split(k, L)
        return jnp.stack([_dense(ks[i], d_in, d_out, dtype, std) for i in range(L)])

    layers = {
        "attn_norm": {"w": jnp.ones((L, D), dtype), "b": jnp.zeros((L, D), dtype)},
        "q_proj": {"w": stack_dense(keys[0], D, qd), "b": jnp.zeros((L, qd), dtype)},
        "k_proj": {"w": stack_dense(keys[1], D, kvd), "b": jnp.zeros((L, kvd), dtype)},
        "v_proj": {"w": stack_dense(keys[2], D, kvd), "b": jnp.zeros((L, kvd), dtype)},
        "o_proj": {"w": stack_dense(keys[3], qd, D), "b": jnp.zeros((L, D), dtype)},
    }
    if c.is_moe:
        E = c.num_local_experts

        def stack_experts(k, d_in, d_out):
            ks = jax.random.split(k, L * E)
            w = jnp.stack([_dense(ks[i], d_in, d_out, dtype) for i in range(L * E)])
            return w.reshape(L, E, d_in, d_out)

        layers["router"] = {"w": stack_dense(keys[9], D, E)}
        layers["w1"] = {"w": stack_experts(keys[4], D, F), "b": jnp.zeros((L, E, F), dtype)}
        layers["w2"] = {"w": stack_experts(keys[5], F, D), "b": jnp.zeros((L, E, D), dtype)}
        if c.num_linears_per_mlp == 3:
            layers["w3"] = {"w": stack_experts(keys[6], D, F), "b": jnp.zeros((L, E, F), dtype)}
    else:
        layers["w1"] = {"w": stack_dense(keys[4], D, F), "b": jnp.zeros((L, F), dtype)}
        layers["w2"] = {"w": stack_dense(keys[5], F, D), "b": jnp.zeros((L, D), dtype)}
        if c.num_linears_per_mlp == 3:
            layers["w3"] = {"w": stack_dense(keys[6], D, F), "b": jnp.zeros((L, F), dtype)}
    if not c.shared_attention_norm:
        layers["mlp_norm"] = {"w": jnp.ones((L, D), dtype), "b": jnp.zeros((L, D), dtype)}

    params = {
        "embed": {"w": (jax.random.normal(keys[7], (c.vocab_size, D)) * 0.02).astype(dtype)},
        "layers": layers,
        "norm": {"w": jnp.ones((D,), dtype), "b": jnp.zeros((D,), dtype)},
    }
    if not c.tie_word_embeddings:
        params["lm_head"] = {"w": _dense(keys[8], D, c.vocab_size, dtype)}
    return params


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def rope_cos_sin(positions: jax.Array, config: ModelConfig, dtype=jnp.float32):
    """cos/sin tables for given positions: (..., T, rotary_dim).

    HF "rotate_half" convention: freqs duplicated [f, f] along the last axis
    (ref hf_model.py:289-345 HFRotaryEmbedding / apply_rotary_pos_emb).
    """
    rd = config.rotary_dim
    inv_freq = 1.0 / (config.rope_theta ** (jnp.arange(0, rd, 2, dtype=jnp.float32) / rd))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., T, rd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array, rotary_dim: int):
    """x: (B,T,H,hd); cos/sin: (B,T,rd). Rotates the first rotary_dim dims only."""
    if rotary_dim == x.shape[-1]:
        xr = x
        x_pass = None
    else:
        xr, x_pass = x[..., :rotary_dim], x[..., rotary_dim:]
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    xr = xr * c + _rotate_half(xr) * s
    if x_pass is None:
        return xr
    return jnp.concatenate([xr, x_pass], axis=-1)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

class KVCache(NamedTuple):
    """Stacked int-or-float KV cache: k/v are (L, B, S_max, Hkv, hd)."""
    k: jax.Array
    v: jax.Array


def causal_mask(q_positions: jax.Array, kv_len: int, neg_inf: float,
                kv_valid_len: Optional[jax.Array] = None) -> jax.Array:
    """Additive mask (B, 1, T, S): 0 where kv_pos <= q_pos (and kv slot valid), else neg_inf."""
    kv_pos = jnp.arange(kv_len)[None, None, :]                    # (1,1,S)
    q_pos = q_positions[:, :, None]                                # (B,T,1)
    ok = kv_pos <= q_pos
    if kv_valid_len is not None:
        ok = ok & (kv_pos < kv_valid_len[:, None, None])
    return jnp.where(ok, 0.0, neg_inf)[:, None, :, :].astype(jnp.float32)


def attention(ops: Ops, lp: Params, x: jax.Array, cos, sin, mask,
              config: ModelConfig, kv: Optional[tuple] = None,
              cache_position: Optional[jax.Array] = None):
    """Self-attention for one layer.

    x: (B,T,D). kv: optional (k_cache, v_cache) each (B,S_max,Hkv,hd) to be updated
    at cache_position (decode); when None, keys/values come from the current segment
    (prefill / calibration).
    Returns (attn_out (B,T,D), (k_new, v_new)).
    """
    c = config
    B, T, _ = x.shape
    hd, Hq, Hkv = c.head_dim_, c.num_heads, c.num_kv_heads
    G = Hq // Hkv

    q = ops.linear("self_attn.q_proj", x, lp["q_proj"]["w"], lp["q_proj"]["b"])
    k = ops.linear("self_attn.k_proj", x, lp["k_proj"]["w"], lp["k_proj"]["b"])
    v = ops.linear("self_attn.v_proj", x, lp["v_proj"]["w"], lp["v_proj"]["b"])

    q = q.reshape(B, T, Hq, hd)
    k = k.reshape(B, T, Hkv, hd)
    v = v.reshape(B, T, Hkv, hd)

    q = apply_rope(q, cos, sin, c.rotary_dim)
    k = apply_rope(k, cos, sin, c.rotary_dim)

    if kv is not None:
        # scatter the T new entries at cache_position (B,) per-sequence start offsets
        # (ref Cache.update, hf_model.py:505-508)
        k_cache, v_cache = kv
        upd = jax.vmap(lambda cache, new, start: jax.lax.dynamic_update_slice(
            cache, new.astype(cache.dtype), (start, 0, 0)))
        k_use = upd(k_cache, k, cache_position)
        v_use = upd(v_cache, v, cache_position)
        k_new, v_new = k_use, v_use
    else:
        k_use, v_use = k, v
        k_new, v_new = k, v

    qg = q.reshape(B, T, Hkv, G, hd)
    scores = ops.qk_matmul("self_attn.qk_bmm", qg, k_use)          # (B,Hkv,G,T,S)
    scores = scores / math.sqrt(hd)
    scores = scores + mask[:, :, None, :, :]                        # (B,1,1,T,S)
    probs = ops.softmax("self_attn.softmax", scores, x.dtype)
    out = ops.pv_matmul("self_attn.pv_bmm", probs, v_use)           # (B,T,Hkv,G,hd)
    out = out.reshape(B, T, Hq * hd)
    out = ops.linear("self_attn.o_proj", out, lp["o_proj"]["w"], lp["o_proj"]["b"])
    return out, (k_new, v_new)


def mlp(ops: Ops, lp: Params, x: jax.Array, config: ModelConfig):
    if config.is_moe:
        return moe_block(ops, lp, x, config)
    h = ops.linear("mlp.w1", x, lp["w1"]["w"], lp["w1"]["b"])
    h = ops.act_fn("mlp.act_fn", h, config.hidden_act)
    if config.num_linears_per_mlp == 3:
        g = ops.linear("mlp.w3", x, lp["w3"]["w"], lp["w3"]["b"])
        h = ops.mul("mlp.gate_mul", h, g)
    return ops.linear("mlp.w2", h, lp["w2"]["w"], lp["w2"]["b"])


def moe_block(ops: Ops, lp: Params, x: jax.Array, config: ModelConfig):
    """Mixtral-style top-k MoE (ref HFMoEBlock, hf_model.py:1065-1162).

    TPU-native formulation: instead of the reference's per-expert token-gather
    loop (data-dependent shapes — untileable on TPU), all experts run densely and
    a (B,T,E) combine-weight tensor (zero outside the top-k) mixes them. This is
    numerically identical to the reference (full capacity, no token dropping) and
    shards over an "ep" mesh axis on the stacked expert dimension.
    """
    c = config
    logits = x @ lp["router"]["w"]                               # (B,T,E)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top_vals, top_idx = jax.lax.top_k(probs, c.num_experts_per_tok)
    top_vals = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)
    combine = jnp.sum(
        jax.nn.one_hot(top_idx, c.num_local_experts, dtype=top_vals.dtype)
        * top_vals[..., None], axis=-2)                          # (B,T,E)
    combine = combine.astype(x.dtype)
    ops.moe_dispatch(combine)

    h = ops.expert_linear("mlp.w1", x, lp["w1"]["w"], lp["w1"]["b"])   # (B,T,E,F)
    h = ops.act_fn("mlp.act_fn", h, c.hidden_act)
    if c.num_linears_per_mlp == 3:
        g = ops.expert_linear("mlp.w3", x, lp["w3"]["w"], lp["w3"]["b"])
        h = ops.mul("mlp.gate_mul", h, g)
    y = ops.expert_linear("mlp.w2", h, lp["w2"]["w"], lp["w2"]["b"])   # (B,T,E,D)
    return jnp.einsum("bted,bte->btd", y, combine)


def decoder_layer(ops: Ops, lp: Params, x: jax.Array, cos, sin, mask,
                  config: ModelConfig, kv=None, cache_position=None):
    """One pre-norm decoder layer (ref HFDecoderLayer.forward, hf_model.py:1208-1283)."""
    c = config
    lp = ops.transform_layer(lp, c)
    norm_fn = ops.layernorm if c.norm_class == "layernorm" else ops.rmsnorm
    h = norm_fn("input_layernorm", x, lp["attn_norm"]["w"], lp["attn_norm"]["b"], c.norm_eps)
    attn_out, kv_new = attention(ops, lp, h, cos, sin, mask, c, kv, cache_position)
    residual = ops.add("resid_add_1", x, attn_out)
    # parallel_residual: MLP consumes the (normed) pre-attention stream instead of
    # the post-attention residual (ref hf_model.py:1262-1270)
    hidden = h if c.parallel_residual else residual
    if not c.shared_attention_norm:
        hidden = norm_fn("post_attention_layernorm", hidden,
                         lp["mlp_norm"]["w"], lp["mlp_norm"]["b"], c.norm_eps)
    mlp_out = mlp(ops, lp, hidden, c)
    out = ops.add("resid_add_2", residual, mlp_out)
    return out, kv_new


def forward_hidden(params: Params, tokens: jax.Array, config: ModelConfig,
                   ops: Optional[Ops] = None,
                   positions: Optional[jax.Array] = None,
                   kv_cache: Optional[KVCache] = None,
                   cache_position: Optional[jax.Array] = None,
                   kv_valid_len: Optional[jax.Array] = None,
                   collect_stats: bool = False,
                   layer_extras: Optional[PyTree] = None,
                   apply_final_norm: bool = True,
                   remat: bool = False):
    """Backbone forward.

    tokens: (B,T) int32. `layer_extras` is an optional pytree whose leaves are
    stacked over layers (e.g. quant ranges / LWC / LET state); scan slices it per
    layer and hands it to `ops.begin_layer` before the layer body runs.
    remat: rematerialize each scanned layer on the backward pass
    (jax.checkpoint) — activation memory drops from O(L·ops) to O(L) layer
    boundaries, the standard TPU trade for recipe-scale PTQ batches.
    Returns (hidden (B,T,D), new KVCache or per-segment K/V stacks
    (L,B,T,Hkv,hd), stats or None).
    """
    c = config
    ops = ops or Ops()
    B, T = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))

    x = params["embed"]["w"][tokens]
    if c.normalize_embed:
        x = x * jnp.asarray(math.sqrt(c.hidden_size), x.dtype)

    cos, sin = rope_cos_sin(positions, c, x.dtype)
    S = kv_cache.k.shape[2] if kv_cache is not None else T
    mask = causal_mask(positions, S, c.neg_inf, kv_valid_len).astype(x.dtype)

    def body(carry, xs):
        h = carry
        lp = xs["lp"]
        kv = xs.get("kv")
        if hasattr(ops, "begin_layer"):
            ops.begin_layer(xs.get("extras"))
        h, kv_new = decoder_layer(ops, lp, h, cos, sin, mask, c, kv, cache_position)
        stats = ops.pop_stats() if collect_stats and hasattr(ops, "pop_stats") else {}
        return h, (kv_new, stats)

    xs = {"lp": params["layers"]}
    if kv_cache is not None:
        xs["kv"] = (kv_cache.k, kv_cache.v)
    if layer_extras is not None:
        xs["extras"] = layer_extras
    if remat:
        body = jax.checkpoint(body)
    x, (kv_out, stats) = jax.lax.scan(body, x, xs)
    new_cache = KVCache(k=kv_out[0], v=kv_out[1])

    # final norm + head are not quantized (ref qmodule.py:843-845) — use plain ops
    if apply_final_norm:
        plain = Ops()
        nf = plain.layernorm if c.norm_class == "layernorm" else plain.rmsnorm
        x = nf("norm", x, params["norm"]["w"], params["norm"]["b"], c.norm_eps)
    return x, new_cache, (stats if collect_stats else None)


def forward(params: Params, tokens: jax.Array, config: ModelConfig,
            ops: Optional[Ops] = None,
            positions: Optional[jax.Array] = None,
            kv_cache: Optional[KVCache] = None,
            cache_position: Optional[jax.Array] = None,
            kv_valid_len: Optional[jax.Array] = None):
    """Full CausalLM forward -> (logits (B,T,V), new_kv_cache)."""
    x, new_cache, _ = forward_hidden(params, tokens, config, ops, positions,
                                     kv_cache, cache_position, kv_valid_len)
    head_w = params["embed"]["w"].T if config.tie_word_embeddings else params["lm_head"]["w"]
    logits = x @ head_w
    return logits, new_cache
