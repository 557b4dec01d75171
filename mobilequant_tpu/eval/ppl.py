"""Perplexity evaluation (the reference's WikiText-ppl regression metric,
eval/harness_eval.py --tasks wikitext; numbers in eval/README.md:20-73).

Works over any forward function (FP model, fake-quant sim, integer engine) so the
fidelity ladder can be scored at every rung with the same code.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def perplexity(forward_fn: Callable, token_stream: np.ndarray,
               seqlen: int = 2048, stride: int = None, batch_size: int = 1,
               max_windows: int = None) -> float:
    """forward_fn(tokens (B,T) int32) -> logits (B,T,V).

    token_stream: 1D token ids. Non-overlapping windows by default (the
    reference harness's wikitext convention: rolling loglikelihood over
    contiguous max-length segments).
    """
    stride = stride or seqlen
    ids = np.asarray(token_stream)
    n_windows = (len(ids) - seqlen - 1) // stride + 1
    if max_windows is not None:
        n_windows = min(n_windows, max_windows)
    if n_windows <= 0:
        raise ValueError(f"stream too short: {len(ids)} tokens < seqlen+1")

    @jax.jit
    def batch_nll(windows):
        """windows: (B, seqlen+1) → (sum NLL, token count)."""
        logits = forward_fn(windows[:, :-1])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = windows[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return jnp.sum(nll), nll.size

    total_nll, total_tok = 0.0, 0
    batch = []

    def flush():
        nonlocal total_nll, total_tok, batch
        if not batch:
            return
        nlls, count = batch_nll(jnp.asarray(np.stack(batch), jnp.int32))
        total_nll += float(nlls)
        total_tok += int(count)
        batch = []

    for w in range(n_windows):
        s = w * stride
        window = ids[s:s + seqlen + 1]
        if len(window) < seqlen + 1:
            break
        batch.append(window)
        if len(batch) == batch_size:
            flush()
    flush()
    return math.exp(total_nll / max(total_tok, 1))
