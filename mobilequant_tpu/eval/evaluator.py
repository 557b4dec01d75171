"""Last-word-prediction accuracy + latency evaluator (analogue of the reference
`Evaluator` on LAMBADA, mobilellm/utils/bench.py:31-81) and model-size reporting
(print_model_size, bench.py:12-28)."""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def last_word_accuracy(forward_fn: Callable, examples: Sequence[tuple[list[int], int]],
                       pad_to: int = 128) -> dict:
    """examples: (context_token_ids, target_token_id) pairs.
    Returns {"accuracy", "avg_latency_s"} like Evaluator.evaluate (bench.py:44-78)."""
    hits, total = 0, 0
    latencies = []

    @jax.jit
    def run(tok, last_idx):
        logits = forward_fn(tok)
        return jnp.argmax(logits[jnp.arange(tok.shape[0]), last_idx], axis=-1)

    for ctx, target in examples:
        ctx = list(ctx)[-pad_to:]
        last_idx = len(ctx) - 1
        tok = np.zeros((1, pad_to), np.int32)
        tok[0, :len(ctx)] = ctx
        t0 = time.perf_counter()
        pred = run(jnp.asarray(tok), jnp.asarray([last_idx]))
        pred = int(jax.device_get(pred)[0])
        latencies.append(time.perf_counter() - t0)
        hits += int(pred == target)
        total += 1
    return {"accuracy": hits / max(total, 1),
            "avg_latency_s": float(np.mean(latencies[1:] if len(latencies) > 1 else latencies))}


def model_size_bytes(params) -> dict:
    """Total parameter count/bytes per dtype (print_model_size analogue)."""
    leaves = jax.tree.leaves(params)
    n_params = sum(int(np.prod(l.shape)) for l in leaves)
    n_bytes = sum(int(np.prod(l.shape)) * l.dtype.itemsize for l in leaves)
    by_dtype = {}
    for l in leaves:
        k = str(l.dtype)
        by_dtype[k] = by_dtype.get(k, 0) + int(np.prod(l.shape))
    return {"params": n_params, "bytes": n_bytes, "by_dtype": by_dtype}
