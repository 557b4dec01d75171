"""Autoregressive generation on the integer engine.

Replaces the reference decode loop (capp/src/llm.cpp:545-648). Structural upgrades
over the reference on TPU:
  * real batched prefill (one pass over the prompt) instead of 1 token/step;
  * the int8 KV-cache lives in device HBM and is updated in-graph
    (`lax.dynamic_update_slice`) — no host round-trips per token;
  * decode step jitted once with donated cache buffers (the TPU analogue of the
    reference's ION zero-copy buffers, qnn_context.cpp:429-443).
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mobilequant_tpu.models.config import ModelConfig
from mobilequant_tpu.quant.policy import QPolicy
from mobilequant_tpu.runtime import engine as E
from mobilequant_tpu.runtime.sampling import SamplerConfig, sample


class Generator:
    """Compiled prefill + decode executables over a packed model."""

    def __init__(self, packed: dict, config: ModelConfig, policy: QPolicy,
                 ecfg: Optional[E.EngineConfig] = None):
        self.packed = packed
        self.config = config
        self.policy = policy
        self.ecfg = ecfg or E.EngineConfig(model=config)

        cfg, pol = config, policy

        @jax.jit
        def _prefill(packed, tokens, cache):
            B, T = tokens.shape
            positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
            logits, new_cache = E.forward(
                packed, tokens, cfg, pol, positions=positions, kv_cache=cache,
                cache_position=jnp.zeros((B,), jnp.int32),
                kv_valid_len=jnp.full((B,), T, jnp.int32))
            return logits, new_cache

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _decode(packed, token, cache, pos):
            # token: (B,1); pos: (B,) current position
            logits, new_cache = E.forward(
                packed, token, cfg, pol, positions=pos[:, None], kv_cache=cache,
                cache_position=pos, kv_valid_len=pos + 1)
            return logits[:, 0], new_cache

        self._prefill = _prefill
        self._decode = _decode

    def generate(self, prompt_tokens: np.ndarray, max_new_tokens: int,
                 sampler: SamplerConfig = SamplerConfig(greedy=True),
                 seed: int = 0, eos_token_id: Optional[int] = None,
                 return_stats: bool = False):
        """prompt_tokens: (B, T_prompt) -> (B, ≤max_new_tokens) generated ids."""
        B, T0 = prompt_tokens.shape
        cache = E.init_kv_cache(self.ecfg, B)
        key = jax.random.PRNGKey(seed)

        t_start = time.perf_counter()
        logits, cache = self._prefill(self.packed, jnp.asarray(prompt_tokens, jnp.int32), cache)
        last = logits[:, -1]
        jax.block_until_ready(last)
        t_prefill = time.perf_counter() - t_start

        out = []
        token = None
        t_dec = time.perf_counter()
        for step in range(max_new_tokens):
            key, k = jax.random.split(key)
            token = sample(last, k, sampler)
            out.append(np.asarray(token))
            if eos_token_id is not None and bool(np.all(out[-1] == eos_token_id)):
                break
            pos = jnp.full((B,), T0 + step, jnp.int32)
            last, cache = self._decode(self.packed, token[:, None], cache, pos)
        jax.block_until_ready(last)
        t_decode = time.perf_counter() - t_dec

        tokens_out = np.stack(out, axis=1)
        if return_stats:
            n = tokens_out.shape[1]
            stats = {
                "prefill_s": t_prefill,
                "decode_s": t_decode,
                "decode_tok_s": (n * B) / t_decode if t_decode > 0 else float("inf"),
            }
            return tokens_out, stats
        return tokens_out
