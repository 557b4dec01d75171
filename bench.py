"""Benchmark: TinyLlama-1.1B integer-engine decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "tok/s", "vs_baseline": N}

vs_baseline = W8A8 decode tok/s ÷ bf16-FP decode tok/s on the same chip/shapes —
the reference's headline claim is 20-50% latency reduction vs FP on-device
(README.md:4); at bs=1 decode is weight-bandwidth-bound, so int8 weights should
approach 2× and int4 ~4× (HBM-bytes ratio).

Extra metrics (W4A8, prefill, per-config details) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_decode(step_fn, packed, cache_k, cache_v, steps=50, warmup=5):
    import jax
    import jax.numpy as jnp
    token = jnp.zeros((1, 1), jnp.int32)
    pos0 = 512
    k, v = cache_k, cache_v
    for i in range(warmup):
        logits, k, v = step_fn(packed, token, k, v,
                               jnp.full((1,), pos0 + i, jnp.int32))
    jax.block_until_ready(logits)
    t0 = time.perf_counter()
    for i in range(steps):
        logits, k, v = step_fn(packed, token, k, v,
                               jnp.full((1,), pos0 + warmup + i, jnp.int32))
    jax.block_until_ready(logits)
    dt = time.perf_counter() - t0
    return steps / dt


def main():
    import jax
    import jax.numpy as jnp
    import functools
    from __graft_entry__ import _build_packed_tinyllama
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.runtime import engine as E

    log(f"devices: {jax.devices()}")
    results = {}

    # --- integer engine: W8A8 and W4A8 ---
    for w_bits in (8, 4):
        packed, cfg, policy, ecfg = _build_packed_tinyllama(max_seq_len=1024,
                                                            w_bits=w_bits)
        cache = E.init_kv_cache(ecfg, 1)

        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def step(packed, token, k_cache, v_cache, pos):
            logits, nc = E.forward(packed, token, cfg, policy,
                                   positions=pos[:, None],
                                   kv_cache=E.EngineKVCache(k=k_cache, v=v_cache),
                                   cache_position=pos, kv_valid_len=pos + 1)
            return logits, nc.k, nc.v

        tps = time_decode(step, packed, cache.k, cache.v)
        results[f"w{w_bits}a8_decode_tok_s"] = tps
        log(f"W{w_bits}A8 decode: {tps:.1f} tok/s (bs=1, S=1024)")
        del packed, cache

    # --- bf16 FP baseline ---
    cfg = get_config("tinyllama-1.1b")
    params = M.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    S_max = 1024
    kvshape = (cfg.num_layers, 1, S_max, cfg.num_kv_heads, cfg.head_dim_)
    kc = jnp.zeros(kvshape, jnp.bfloat16)
    vc = jnp.zeros(kvshape, jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def fp_step(params, token, kc, vc, pos):
        logits, nc = M.forward(params, token, cfg, positions=pos[:, None],
                               kv_cache=M.KVCache(k=kc, v=vc),
                               cache_position=pos, kv_valid_len=pos + 1)
        return logits, nc.k, nc.v

    fp_tps = time_decode(fp_step, params, kc, vc)
    results["bf16_decode_tok_s"] = fp_tps
    log(f"bf16 FP decode: {fp_tps:.1f} tok/s (bs=1, S=1024)")

    # --- prefill throughput (W8A8) ---
    packed, cfg, policy, ecfg = _build_packed_tinyllama(max_seq_len=1024, w_bits=8)
    prompt = jnp.zeros((1, 1024), jnp.int32)
    prefill = jax.jit(lambda p, t: E.forward(p, t, cfg, policy)[0])
    out = prefill(packed, prompt)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = prefill(packed, prompt)
    jax.block_until_ready(out)
    pf_tps = 5 * 1024 / (time.perf_counter() - t0)
    results["w8a8_prefill_tok_s"] = pf_tps
    log(f"W8A8 prefill: {pf_tps:.0f} tok/s (bs=1, T=1024)")

    log(json.dumps(results))
    headline = results["w8a8_decode_tok_s"]
    print(json.dumps({
        "metric": "tinyllama1.1b_w8a8_decode_tok_s_per_chip",
        "value": round(headline, 2),
        "unit": "tok/s",
        "vs_baseline": round(headline / fp_tps, 3),
    }))


if __name__ == "__main__":
    main()
