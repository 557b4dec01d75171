"""Token sampling (TPU-native analogue of the reference sampler, capp/src/llm.cpp:268-317,
656-682: argmax / temperature multinomial / top-p — plus top-k, which the reference
stubs). All jit-friendly; randomness via jax PRNG keys instead of xorshift."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0          # 0 = disabled
    greedy: bool = False


def sample(logits: jax.Array, key: jax.Array, cfg: SamplerConfig) -> jax.Array:
    """logits: (B, V) -> token ids (B,)."""
    if cfg.greedy or cfg.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits = logits / jnp.maximum(cfg.temperature, 1e-6)

    if cfg.top_k and cfg.top_k > 0:
        kth = jax.lax.top_k(logits, cfg.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)

    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative mass > top_p (inclusive)
        cutoff_idx = jnp.sum((cum - probs) < cfg.top_p, axis=-1, keepdims=True) - 1
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)

    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@jax.jit
def sample_batched(logits: jax.Array, key: jax.Array,
                   temperature: jax.Array, top_p: jax.Array,
                   top_k: jax.Array, greedy: jax.Array) -> jax.Array:
    """Per-row sampler params: logits (B, V); temperature/top_p (B,) float,
    top_k (B,) int (0 = disabled), greedy (B,) bool -> token ids (B,).

    One compiled function serves every parameter combination (params are
    runtime arrays, not trace constants) — the continuous batcher uses this
    when live requests carry heterogeneous sampling settings, so mixing
    temperatures never triggers a recompile mid-serve. Row-wise semantics
    match `sample(logits[i:i+1], key, SamplerConfig(...))` (ties kept, the
    top-p prefix is inclusive of the crossing token).
    """
    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]

    # one descending sort serves both filters
    sorted_logits = jnp.sort(scaled, axis=-1)[..., ::-1]
    V = logits.shape[-1]

    # top-k cutoff: value at rank k-1 (k=0 -> disabled)
    k = jnp.clip(top_k, 0, V)
    k_idx = jnp.clip(k - 1, 0, V - 1)[:, None]
    kth = jnp.take_along_axis(sorted_logits, k_idx, axis=-1)
    kth = jnp.where((k > 0)[:, None], kth, -jnp.inf)

    # top-p cutoff: smallest prefix with cumulative mass > p (inclusive)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum((cum - probs) < top_p[:, None], axis=-1,
                         keepdims=True) - 1
    p_cut = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    p_cut = jnp.where((top_p < 1.0)[:, None], p_cut, -jnp.inf)

    filtered = jnp.where(scaled < jnp.maximum(kth, p_cut), -jnp.inf, scaled)
    sampled = jax.random.categorical(key, filtered, axis=-1).astype(jnp.int32)
    arg = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jnp.where(greedy | (temperature == 0.0), arg, sampled)


def loop_next_token(last: jax.Array, k_step: jax.Array, temperature):
    """Next-token select inside an in-graph decode loop (engine/wonly
    decode_loop). temperature: static Python float (0.0 = pure greedy, no RNG
    ops in the graph) or a per-slot (B,) array — rows with temperature 0 take
    the argmax, hot rows sample, all in one traced graph so a continuous
    batcher can serve mixed plain-temperature requests through chunked ticks
    without recompiling per combination."""
    if isinstance(temperature, (int, float)):
        if temperature > 0.0:
            return jax.random.categorical(
                k_step, last / temperature, axis=-1).astype(jnp.int32)
        return jnp.argmax(last, axis=-1).astype(jnp.int32)
    t = jnp.asarray(temperature, jnp.float32)
    sampled = jax.random.categorical(
        k_step, last / jnp.maximum(t, 1e-6)[:, None], axis=-1)
    return jnp.where(t > 0.0, sampled,
                     jnp.argmax(last, axis=-1)).astype(jnp.int32)


def sampler_arrays(cfgs):
    """Stack a list of SamplerConfig into the (B,)-array operands of
    `sample_batched`."""
    import numpy as np
    return (np.asarray([c.temperature for c in cfgs], np.float32),
            np.asarray([c.top_p for c in cfgs], np.float32),
            np.asarray([c.top_k for c in cfgs], np.int32),
            np.asarray([c.greedy for c in cfgs], bool))
