"""Self-contained multiple-choice evaluation (ARC / HellaSwag / MMLU style).

The reference runs these tasks through an lm-eval-harness fork
(ref eval/harness_eval.py:43-108; task configs wikitext / arc_challenge /
hellaswag / hendrycksTest*, 0-shot). `eval/harness.JaxCausalLM` bridges this
build into the current harness when it is installed; this module is the
harness-free rung: loglikelihood-ranked multiple choice over LOCAL task files,
so accuracy regressions run in a sealed environment (no datasets egress).

Scoring matches the harness convention: per choice, sum of token logprobs of
the continuation given the context ("acc"), and the byte-length-normalized
variant ("acc_norm", what ARC-C/HellaSwag report — eval/README.md's numbers).

Task file schema (JSON list; either pre-tokenized ids or raw text + a
tokenizer at load time):
  [{"ctx": [int...] | str, "choices": [[int...] | str, ...], "label": int,
    "choice_bytes": [int, ...]   # optional: byte lengths for acc_norm when
   }, ...]                       # choices are pre-tokenized
"""

from __future__ import annotations

import json
from typing import Callable, Optional, Sequence

import numpy as np


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n


def make_logp_fn(forward_fn: Callable):
    """Jit the forward+log_softmax once; the shape buckets then mean one XLA
    executable per (n_choices, T) bucket instead of eager per-op dispatch
    (decisive on the tunneled TPU, where every dispatch pays a fixed RTT)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(tok):
        return jax.nn.log_softmax(
            forward_fn(tok).astype(jnp.float32), axis=-1)
    return f


def score_continuations(forward_fn: Callable, ctx_ids: Sequence[int],
                        choices_ids: Sequence[Sequence[int]],
                        max_length: int = 2048,
                        buckets: Sequence[int] = (64, 128, 256, 512, 1024, 2048),
                        logp_fn: Optional[Callable] = None):
    """Sum-logprob of each choice continuation given the context.

    One padded batched forward over all choices of the example (right-padded
    to a shared shape bucket so XLA compiles one executable per bucket, the
    fixed-shape discipline of the whole build). Pass logp_fn=make_logp_fn(
    forward_fn) to share the compiled executable across examples.

    Continuation tokens whose predictor row fell off the [-max_length:]
    window (empty context, or a continuation longer than the window) are
    skipped rather than scored from wrapped/garbage positions."""
    import jax.numpy as jnp

    if logp_fn is None:
        logp_fn = make_logp_fn(forward_fn)
    n_ch = len(choices_ids)
    fulls, n_ctxs = [], []
    for cont in choices_ids:
        full = (list(ctx_ids) + list(cont))[-max_length:]
        fulls.append(full)
        n_ctxs.append(len(full) - len(cont))
    T = _bucket(max(len(f) for f in fulls), buckets)
    tok = np.zeros((n_ch, T), np.int32)
    for i, f in enumerate(fulls):
        tok[i, :len(f)] = f
    logp = np.asarray(logp_fn(jnp.asarray(tok)))
    lls = []
    for i, cont in enumerate(choices_ids):
        ll = 0.0
        start_j = max(1 - n_ctxs[i], 0)   # token j is predicted from row
        for j in range(start_j, len(cont)):  # n_ctx+j-1, which needs >= 0
            ll += float(logp[i, n_ctxs[i] + j - 1, cont[j]])
        lls.append(ll)
    return lls


def multiple_choice_accuracy(forward_fn: Callable, examples: Sequence[dict],
                             max_length: int = 2048) -> dict:
    """examples: [{"ctx": ids, "choices": [ids...], "label": int,
    "choice_bytes": optional [int...]}]. Returns {"acc", "acc_norm", "n"}."""
    n = correct = correct_norm = 0
    logp_fn = make_logp_fn(forward_fn)
    for ex in examples:
        lls = score_continuations(forward_fn, ex["ctx"], ex["choices"],
                                  max_length=max_length, logp_fn=logp_fn)
        nbytes = ex.get("choice_bytes") or [max(len(c), 1)
                                            for c in ex["choices"]]
        pick = int(np.argmax(lls))
        pick_norm = int(np.argmax([ll / max(b, 1)
                                   for ll, b in zip(lls, nbytes)]))
        n += 1
        correct += int(pick == ex["label"])
        correct_norm += int(pick_norm == ex["label"])
    return {"acc": correct / max(n, 1), "acc_norm": correct_norm / max(n, 1),
            "n": n}


def load_task_file(path: str, tokenizer=None, bos_id: Optional[int] = None) -> list[dict]:
    """JSON task file → pre-tokenized examples. Raw-text ctx/choices need a
    tokenizer with .encode(text) (runtime/native.NativeTokenizer works)."""
    raw = json.loads(open(path).read())
    out = []
    for ex in raw:
        ctx, choices = ex["ctx"], ex["choices"]
        if isinstance(ctx, str):
            assert tokenizer is not None, "raw-text task file needs --tokenizer"
            ctx_ids = tokenizer.encode(
                ctx, prefix=[bos_id] if bos_id is not None and bos_id >= 0 else [])
            ch_ids = [tokenizer.encode(c) for c in choices]
            nbytes = [len(c.encode()) for c in choices]
        else:
            ctx_ids = [int(t) for t in ctx]
            ch_ids = [[int(t) for t in c] for c in choices]
            nbytes = ex.get("choice_bytes")
        out.append({"ctx": ctx_ids, "choices": ch_ids,
                    "label": int(ex["label"]), "choice_bytes": nbytes})
    return out
