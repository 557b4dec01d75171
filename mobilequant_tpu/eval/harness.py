"""lm-evaluation-harness adaptor (analogue of LMEvalAdaptor, reference
mobilellm/utils/bench.py:84-170, which bridges HF-style and sim-style models into
the old fork's BaseLM API).

Targets the *current* harness API (`lm_eval.api.model.LM`) per SURVEY.md §7.4.
Import is gated: lm_eval is not baked into this image; the adaptor activates when
the package is available in the deployment environment.

Version pin: the adaptor is written against lm-eval 0.4.x
(TARGETED_LM_EVAL below, enforced at construction — the 0.3 fork the
reference uses has a different BaseLM surface, and a future 0.5 may break
Instance/arguments shapes). Set MQTPU_HARNESS_ANY_VERSION=1 to try an
unpinned version anyway. tests/test_harness.py exercises the plumbing
against a stub of this exact surface; the REAL-harness integration smoke
(test_real_lm_eval_wikitext_smoke) self-activates wherever lm_eval is
importable.

KNOWN RISK (standing, environment-bound): lm_eval is NOT installed in the
build image, so this adaptor has never executed against the real harness —
only against the stub. The version pin and self-activating smoke bound the
risk; the first checkpoint-equipped deployment should run
`pytest tests/test_harness.py -k real_lm_eval` before trusting harness
numbers (PARITY_RUNBOOK.md step 5).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

TARGETED_LM_EVAL = (0, 4)     # major.minor the adaptor surface targets

try:
    from lm_eval.api.model import LM
    from lm_eval.api.instance import Instance
    HAS_LM_EVAL = True
except Exception:  # pragma: no cover - optional dep
    LM = object
    HAS_LM_EVAL = False


def check_harness_version() -> Optional[str]:
    """None if the installed lm_eval matches the targeted major.minor (or is
    a stub without metadata); else a human-readable mismatch description."""
    if not HAS_LM_EVAL:
        return "lm_eval not importable"
    try:
        from importlib.metadata import version
        v = version("lm_eval")
    except Exception:
        return None          # test stub / editable install without metadata
    parts = tuple(int(x) for x in v.split(".")[:2])
    if parts != TARGETED_LM_EVAL:
        return (f"lm_eval {v} installed; adaptor targets "
                f"{TARGETED_LM_EVAL[0]}.{TARGETED_LM_EVAL[1]}.x")
    return None


class JaxCausalLM(LM):
    """Wrap any `forward_fn(tokens (B,T) int32) -> logits (B,T,V)` + HF tokenizer
    into the harness LM interface (loglikelihood / rolling / generate_until)."""

    def __init__(self, forward_fn: Callable, tokenizer, max_length: int = 2048,
                 batch_size: int = 1, generator=None):
        if not HAS_LM_EVAL:
            raise ImportError("lm_eval is not installed in this environment")
        mismatch = check_harness_version()
        if mismatch and not os.environ.get("MQTPU_HARNESS_ANY_VERSION"):
            raise ImportError(
                f"{mismatch} — set MQTPU_HARNESS_ANY_VERSION=1 to override")
        super().__init__()
        self.forward_fn = forward_fn
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.batch_size = batch_size
        self.generator = generator  # optional runtime.generate.Generator

    # -- helpers ----------------------------------------------------------
    def _logprobs(self, tokens: np.ndarray) -> np.ndarray:
        import jax
        import jax.numpy as jnp
        logits = self.forward_fn(jnp.asarray(tokens, jnp.int32))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return np.asarray(logp)

    def _score_pair(self, context_ids: list[int], cont_ids: list[int]):
        full = (context_ids + cont_ids)[-(self.max_length):]
        n_ctx = len(full) - len(cont_ids)
        tok = np.asarray([full], np.int32)
        logp = self._logprobs(tok)[0]
        ll, greedy = 0.0, True
        for i, tid in enumerate(cont_ids):
            pos = n_ctx + i - 1
            ll += float(logp[pos, tid])
            greedy &= int(np.argmax(logp[pos])) == tid
        return ll, greedy

    # -- LM API -----------------------------------------------------------
    def loglikelihood(self, requests):
        out = []
        for req in requests:
            context, continuation = req.args
            ctx_ids = self.tokenizer(context).input_ids if context else \
                [self.tokenizer.bos_token_id or 1]
            cont_ids = self.tokenizer(continuation, add_special_tokens=False).input_ids
            out.append(self._score_pair(ctx_ids, cont_ids))
        return out

    def loglikelihood_rolling(self, requests):
        out = []
        for req in requests:
            (text,) = req.args
            ids = self.tokenizer(text).input_ids
            total = 0.0
            for s in range(0, max(len(ids) - 1, 1), self.max_length - 1):
                window = ids[s:s + self.max_length]
                if len(window) < 2:
                    break
                tok = np.asarray([window], np.int32)
                logp = self._logprobs(tok)[0]
                for i in range(1, len(window)):
                    total += float(logp[i - 1, window[i]])
            out.append(total)
        return out

    def generate_until(self, requests):
        if self.generator is None:
            raise NotImplementedError("pass a Generator for generate_until tasks")
        outs = []
        for req in requests:
            context, gen_kwargs = req.args
            ids = np.asarray([self.tokenizer(context).input_ids], np.int64)
            max_new = int(gen_kwargs.get("max_gen_toks", 128))
            tokens = self.generator.generate(ids, max_new_tokens=max_new)
            outs.append(self.tokenizer.decode(tokens[0]))
        return outs
