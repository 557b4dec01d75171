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

        # weight-only mode (act_bits=16): same Generator, the engine module
        # swaps to runtime/wonly.py (signature-compatible forward/decode_loop/
        # init_kv_cache over fp activations + fp KV cache)
        if getattr(self.ecfg, "act_bits", 8) == 16:
            from mobilequant_tpu.runtime import wonly as _mod
        else:
            _mod = E
            from mobilequant_tpu.quant.policy import policy_kv_bits
            assert policy_kv_bits(policy) == getattr(self.ecfg, "kv_bits", 8), \
                "policy KV bitwidth must match EngineConfig.kv_bits " \
                "(quant/policy.kv_bits_policy builds the matching policy)"
        self._mod = _mod

        # fused prefill-attention kernel on TPU (23% less device time at
        # T=1024, BENCHMARKS.md); CPU backends fall back to the XLA path
        if _mod is not E:
            up_prefill = False            # wonly prefill: XLA dequant path
        elif jax.default_backend() != "cpu":
            # prefill adds the w13+gate epilogue kernel for both bitwidths
            # (W4 16.41, W8 15.05 vs 17.2 ms/pass at T=1024 — the kernel is
            # MXU/VPU-bound at prefill M, so W8's 2x weight bytes are free;
            # BENCHMARKS.md round-3 prefill)
            up_prefill = "w4_attn_gatek" if self.ecfg.weight_bits == 4 \
                else "attn_gatek"
        else:
            up_prefill = False

        @jax.jit
        def _prefill(packed, tokens, cache):
            B, T = tokens.shape
            positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
            # logits_at: generation needs only the last prompt position, so
            # the lm_head runs on one row instead of all T (the prefill's
            # largest single matmul); consumers index logits[:, -1] as before
            logits, new_cache = _mod.forward(
                packed, tokens, cfg, pol, positions=positions, kv_cache=cache,
                cache_position=jnp.zeros((B,), jnp.int32),
                kv_valid_len=jnp.full((B,), T, jnp.int32),
                use_pallas=up_prefill,
                logits_at=jnp.full((B,), T - 1, jnp.int32))
            return logits, new_cache

        dec_pallas = (_mod is not E and self.ecfg.use_pallas
                      and jax.default_backend() != "cpu")

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _decode(packed, token, cache, pos):
            # token: (B,1); pos: (B,) current position
            logits, new_cache = _mod.forward(
                packed, token, cfg, pol, positions=pos[:, None], kv_cache=cache,
                cache_position=pos, kv_valid_len=pos + 1,
                use_pallas=dec_pallas)
            return logits[:, 0], new_cache

        self._prefill = _prefill
        self._decode = _decode

        use_pallas = dec_pallas if _mod is not E else self.ecfg.use_pallas

        @functools.partial(jax.jit, static_argnums=(3, 6), donate_argnums=(2,))
        def _decode_chunk(packed, token, cache, n_steps, pos, key, temperature):
            toks, cache, last = _mod.decode_loop(
                packed, token, cache, pos, n_steps, cfg, pol,
                use_pallas=use_pallas, temperature=temperature, key=key)
            return toks, cache, last

        self._decode_chunk = _decode_chunk

    def generate_fast(self, prompt_tokens: np.ndarray, max_new_tokens: int,
                      temperature: float = 0.0, seed: int = 0,
                      eos_token_id: Optional[int] = None, chunk: int = 32,
                      return_stats: bool = False):
        """In-graph decode: the token loop runs on-device in `chunk`-step scans
        (EOS is checked between chunks). Greedy (temperature=0) or temperature
        sampling; for top-k/top-p use generate()."""
        B, T0 = prompt_tokens.shape
        cache = self._mod.init_kv_cache(self.ecfg, B)
        key = jax.random.PRNGKey(seed)

        t0 = time.perf_counter()
        logits, cache = self._prefill(self.packed, jnp.asarray(prompt_tokens, jnp.int32), cache)
        first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
        jax.block_until_ready(first)
        t_prefill = time.perf_counter() - t0

        pieces = [np.asarray(first)]
        n_done = 1
        token = first
        t_dec = time.perf_counter()
        while n_done < max_new_tokens:
            n = min(chunk, max_new_tokens - n_done)
            key, k = jax.random.split(key)
            # `token` is the n_done-th generated token → sequence index T0+n_done-1
            pos = jnp.full((B,), T0 + n_done - 1, jnp.int32)
            toks, cache, last = self._decode_chunk(
                self.packed, token, cache, n, pos, k, float(temperature))
            pieces.append(np.asarray(toks))
            n_done += n
            token = toks[:, -1:]
            if eos_token_id is not None and np.all(
                    np.any(np.concatenate(pieces, 1) == eos_token_id, axis=1)):
                break
        jax.block_until_ready(token)
        t_decode = time.perf_counter() - t_dec
        out = np.concatenate(pieces, axis=1)[:, :max_new_tokens]
        if return_stats:
            n = out.shape[1]
            return out, {"prefill_s": t_prefill, "decode_s": t_decode,
                         "decode_tok_s": ((n - 1) * B) / t_decode if t_decode > 0 else 0.0}
        return out

    def generate(self, prompt_tokens: np.ndarray, max_new_tokens: int,
                 sampler: SamplerConfig = SamplerConfig(greedy=True),
                 seed: int = 0, eos_token_id: Optional[int] = None,
                 return_stats: bool = False):
        """prompt_tokens: (B, T_prompt) -> (B, ≤max_new_tokens) generated ids."""
        B, T0 = prompt_tokens.shape
        cache = self._mod.init_kv_cache(self.ecfg, B)
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

    def generate_speculative(self, prompt_tokens: np.ndarray,
                             max_new_tokens: int, *, k: int = 4,
                             draft_fn=None, self_draft_layers: int = 0,
                             eos_token_id: Optional[int] = None,
                             return_stats: bool = False):
        """Greedy speculative decoding (B=1): a cheap draft proposes k-1
        tokens and ONE chunked engine forward verifies the whole pack — at
        bs=1 the decode step is weight-stream-bound, so verifying k tokens
        costs nearly the same HBM traffic as one. The emitted sequence is
        exactly the verify program's own greedy chain for ANY draft (wrong
        drafts only cost speed, never correctness).

        No KV rollback: the verify chunk writes K/V rows for rejected drafts
        too, but a later query at position p only attends columns ≤ p, and
        every such column is either previously accepted or rewritten by the
        same chunk before its attention runs — stale rows are unreachable.

        draft_fn(history: list[int], n: int) -> list[int] (n proposals);
        default = prompt-lookup n-gram continuation (the zero-extra-model
        draft: copy what followed the last occurrence of the trailing bigram
        in the history — strong on repetitive/template text).

        self_draft_layers > 0 selects the truncated-layer SELF-draft instead
        (SelfDraft): the first N decoder layers of the same packed engine +
        the final norm and (quantized) head as an early-exit proposer —
        model-based drafting on arbitrary text, no extra weights, ~N/L of a
        step per proposal.
        """
        B, T0 = prompt_tokens.shape
        assert B == 1, "speculative decoding is a bs=1 latency optimization"
        assert k >= 2
        self_draft = None
        if self_draft_layers > 0:
            assert draft_fn is None, "pass draft_fn OR self_draft_layers"
            self_draft = SelfDraft(self, self_draft_layers)
        elif draft_fn is None:
            draft_fn = prompt_lookup_draft
        cfg, pol = self.config, self.policy
        if self._mod is not E:
            up = self.ecfg.use_pallas and jax.default_backend() != "cpu"
        else:
            up = False if jax.default_backend() == "cpu" else \
                ("w4nomodelk" if self.ecfg.weight_bits == 4 else False)

        @functools.partial(jax.jit, donate_argnums=(2,))
        def verify(packed, toks, cache, start):
            # toks (1,k) = [current token, k-1 drafts]; writes K/V rows
            # start..start+k-1 and returns the greedy next-token per row
            positions = (start + jnp.arange(k))[None, :]
            logits, cache = self._mod.forward(
                packed, toks, cfg, pol, positions=positions, kv_cache=cache,
                cache_position=jnp.full((1,), start, jnp.int32),
                kv_valid_len=jnp.asarray([start + k], jnp.int32),
                use_pallas=up)
            return jnp.argmax(logits[0], axis=-1).astype(jnp.int32), cache

        cache = self._mod.init_kv_cache(self.ecfg, 1)
        t0 = time.perf_counter()
        logits, cache = self._prefill(
            self.packed, jnp.asarray(prompt_tokens, jnp.int32), cache)
        cur = int(np.asarray(jnp.argmax(logits[0, -1])))
        if self_draft is not None:
            self_draft.prefill(prompt_tokens)
        t_prefill = time.perf_counter() - t0

        history = [int(t) for t in prompt_tokens[0]]
        out = [cur]
        pos = T0
        n_verify = 0
        t_dec = time.perf_counter()
        while len(out) < max_new_tokens and \
                (eos_token_id is None or out[-1] != eos_token_id):
            if self_draft is not None:
                drafts = self_draft.propose(out, T0, pos, k - 1)
            else:
                drafts = list(draft_fn(history + out, k - 1))[:k - 1]
            drafts += [out[-1]] * (k - 1 - len(drafts))      # pad (degenerate)
            toks = jnp.asarray([[out[-1]] + drafts], jnp.int32)
            am, cache = verify(self.packed, toks, cache,
                               jnp.int32(pos))
            am = np.asarray(am)
            n_verify += 1
            n_acc = 0
            while n_acc < k - 1 and drafts[n_acc] == am[n_acc]:
                n_acc += 1
            emitted = drafts[:n_acc] + [int(am[n_acc])]
            if eos_token_id is not None and eos_token_id in emitted:
                emitted = emitted[:emitted.index(eos_token_id) + 1]
            room = max_new_tokens - len(out)
            out.extend(emitted[:room])
            pos += n_acc + 1
        t_decode = time.perf_counter() - t_dec

        tokens_out = np.asarray([out], np.int32)
        if return_stats:
            n = len(out)
            stats = {
                "prefill_s": t_prefill,
                "decode_s": t_decode,
                "decode_tok_s": n / t_decode if t_decode > 0 else float("inf"),
                "verify_calls": n_verify,
                "tokens_per_verify": (n - 1) / max(n_verify, 1),
            }
            return tokens_out, stats
        return tokens_out

    def _spec_chunk_fn(self, k: int, n_rounds: int, draft_layers: int = 0):
        """Jitted IN-GRAPH speculative chunk: `n_rounds` draft→verify rounds
        as one lax.scan dispatch — draft proposals (prompt-lookup n-gram, or
        the truncated-layer self-draft) are computed ON DEVICE, so the host
        never enters the accept/reject loop. One dispatch per n_rounds rounds
        instead of 1 (+k−1 for self-draft) per round; on the tunneled TPU
        that is the difference between a measurable end-to-end number and
        ~25 ms of relay round-trip per round.

        Self-draft cache discipline inside the scan: each round first runs a
        draft CATCH-UP forward over the previous round's verify tokens
        (positions pos_prev..pos_prev+k−1) — rows for accepted positions are
        bit-identical to what per-step drafting would have written, and rows
        for rejected positions are rewritten by this round's draft steps
        before any query can attend to them (same no-rollback argument as
        generate_speculative's verify cache). Round 0's catch-up replays the
        last k prompt tokens over rows the prefill already wrote (identical
        values)."""
        key_ = (k, n_rounds, draft_layers)
        cache_attr = self.__dict__.setdefault("_spec_chunks", {})
        if key_ in cache_attr:
            return cache_attr[key_]
        cfg, pol = self.config, self.policy
        if self._mod is not E:
            up = self.ecfg.use_pallas and jax.default_backend() != "cpu"
        else:
            up = False if jax.default_backend() == "cpu" else \
                ("w4nomodelk" if self.ecfg.weight_bits == 4 else False)
        # ONE SelfDraft per depth (shared across chunk sizes): its truncated
        # pack is a real device-memory slice of the engine pack
        sd_cache = self.__dict__.setdefault("_sd_cache", {})
        sd = (sd_cache.setdefault(draft_layers, SelfDraft(self, draft_layers))
              if draft_layers > 0 else None)

        @functools.partial(jax.jit, donate_argnums=(3,))
        def chunk(packed, dpacked, cur, cache, pos, buf, blen, dstate):
            # cur (1,) current token; pos (1,) its position; buf (S,) token
            # history (prompt + emitted, buf[blen-1] == cur); dstate = None or
            # (draft_cache, prev_toks (k,), start_prev). dpacked = the
            # truncated self-draft pack as an ARGUMENT (a closure capture
            # bakes ~200 MB into the HLO — the relay rejects the upload with
            # HTTP 413; same gotcha as bench jits / the training teacher)
            def round_(carry, _):
                cur, cache, pos, buf, blen, nem, dstate = carry
                if sd is None:
                    drafts = _ig_lookup_draft(buf, blen, k - 1)
                else:
                    dcache, prev, start_prev = dstate
                    # catch-up: replay the previous round's verify tokens
                    # (positions start_prev..start_prev+k-1) through the
                    # truncated draft model — fixed T=k shape
                    _, dcache = E.forward(
                        dpacked, prev[None, :], sd.cfg, pol,
                        positions=(start_prev + jnp.arange(k))[None, :],
                        kv_cache=dcache,
                        cache_position=start_prev[None],
                        kv_valid_len=(start_prev + k)[None],
                        use_pallas=up,
                        logits_at=jnp.zeros((1,), jnp.int32))
                    # k-1 sequential T=1 draft steps from cur at pos
                    def dstep(dc, j):
                        dcache, tok = dc
                        p = pos + j
                        lg, dcache = E.forward(
                            dpacked, tok[None], sd.cfg, pol,
                            positions=p[None], kv_cache=dcache,
                            cache_position=p, kv_valid_len=p + 1,
                            use_pallas=up)
                        nxt = jnp.argmax(lg[0, -1]).astype(jnp.int32)[None]
                        return (dcache, nxt), nxt[0]
                    (dcache, _), drafts = jax.lax.scan(
                        dstep, (dcache, cur), jnp.arange(k - 1))
                toks = jnp.concatenate([cur, drafts])[None, :]     # (1,k)
                logits, cache = self._mod.forward(
                    packed, toks, cfg, pol,
                    positions=(pos[0] + jnp.arange(k))[None, :],
                    kv_cache=cache, cache_position=pos,
                    kv_valid_len=pos + k, use_pallas=up)
                am = jnp.argmax(logits[0], -1).astype(jnp.int32)   # (k,)
                acc = jnp.cumprod((drafts == am[:k - 1]).astype(jnp.int32))
                n_acc = jnp.sum(acc)
                # emitted (k,): drafts[:n_acc], then the bonus token am[n_acc]
                # everywhere else (consumers truncate to n_acc+1)
                bonus = am[n_acc]
                emitted = jnp.where(jnp.arange(k) < n_acc,
                                    jnp.concatenate([drafts, drafts[-1:]]),
                                    bonus)
                buf = jax.lax.dynamic_update_slice(buf, emitted, (blen,))
                adv = n_acc + 1
                if sd is not None:
                    dstate = (dcache, toks[0], pos[0])
                return (bonus[None], cache, pos + adv, buf, blen + adv,
                        nem + adv, dstate), (emitted, adv)

            init = (cur, cache, pos, buf, blen, jnp.int32(0), dstate)
            (cur, cache, pos, buf, blen, nem, dstate), (toks_r, counts) = \
                jax.lax.scan(round_, init, None, length=n_rounds)
            return cur, cache, pos, buf, blen, nem, dstate, toks_r, counts

        cache_attr[key_] = (chunk, sd)
        return cache_attr[key_]

    def _spec_state(self, prompt_tokens: np.ndarray, k: int,
                    self_draft_layers: int = 0):
        """Prefill + initial carry for the in-graph speculative chunk:
        (cur, cache, pos, buf, blen, dstate)."""
        B, T0 = prompt_tokens.shape
        assert B == 1 and T0 >= k, \
            "speculative decode: bs=1, prompt >= k (catch-up window)"
        S = self.ecfg.max_seq_len
        _, sd = self._spec_chunk_fn(k, 1, self_draft_layers)
        cache = self._mod.init_kv_cache(self.ecfg, 1)
        logits, cache = self._prefill(
            self.packed, jnp.asarray(prompt_tokens, jnp.int32), cache)
        cur = jnp.argmax(logits[0, -1]).astype(jnp.int32)[None]
        dstate = None
        if sd is not None:
            sd.prefill(prompt_tokens)
            dstate = (sd.cache, jnp.asarray(prompt_tokens[0, -k:], jnp.int32),
                      jnp.int32(T0 - k))
        buf = jnp.zeros((S,), jnp.int32)
        buf = buf.at[:T0].set(jnp.asarray(prompt_tokens[0], jnp.int32))
        buf = buf.at[T0].set(cur[0])
        return cur, cache, jnp.full((1,), T0, jnp.int32), buf, \
            jnp.int32(T0 + 1), dstate

    def generate_speculative_fast(self, prompt_tokens: np.ndarray,
                                  max_new_tokens: int, *, k: int = 4,
                                  self_draft_layers: int = 0,
                                  rounds_per_chunk: int = 8,
                                  eos_token_id: Optional[int] = None,
                                  return_stats: bool = False):
        """In-graph greedy speculative decoding (B=1): chunks of
        `rounds_per_chunk` draft→verify rounds run as single dispatches (the
        accept/reject bookkeeping lives in the scan). Emits the verify
        program's own greedy chain for any draft quality; may overshoot
        max_new_tokens by up to k·rounds_per_chunk−1 tokens of wasted compute
        (truncated before returning)."""
        B, T0 = prompt_tokens.shape
        assert B == 1 and k >= 2
        S = self.ecfg.max_seq_len

        t0 = time.perf_counter()
        cur, cache, pos, buf, blen, dstate = self._spec_state(
            prompt_tokens, k, self_draft_layers)
        t_prefill = time.perf_counter() - t0

        _, sd = self._spec_chunk_fn(k, 1, self_draft_layers)
        dpacked = sd.packed if sd is not None else None
        out = [int(np.asarray(cur[0]))]
        n_rounds = 0
        t_dec = time.perf_counter()
        while len(out) < max_new_tokens and \
                (eos_token_id is None or eos_token_id not in out):
            # shrink the tail chunk so a full round of k rows always fits in
            # the KV cache / history buffer (each round advances <= k)
            room = (S - 1 - int(np.asarray(pos[0]))) // k
            rpc = min(rounds_per_chunk, room)
            if rpc < 1:
                break
            chunk, _sd = self._spec_chunk_fn(k, rpc, self_draft_layers)
            cur, cache, pos, buf, blen, nem, dstate, toks_r, counts = chunk(
                self.packed, dpacked, cur, cache, pos, buf, blen, dstate)
            toks_r, counts = np.asarray(toks_r), np.asarray(counts)
            for r in range(toks_r.shape[0]):
                out.extend(int(t) for t in toks_r[r, :counts[r]])
            n_rounds += toks_r.shape[0]
        t_decode = time.perf_counter() - t_dec
        if eos_token_id is not None and eos_token_id in out:
            out = out[:out.index(eos_token_id) + 1]
        out = out[:max_new_tokens]

        tokens_out = np.asarray([out], np.int32)
        if return_stats:
            n = len(out)
            stats = {
                "prefill_s": t_prefill,
                "decode_s": t_decode,
                "decode_tok_s": n / t_decode if t_decode > 0 else float("inf"),
                "verify_calls": n_rounds,
                "tokens_per_verify": (n - 1) / max(n_rounds, 1),
            }
            return tokens_out, stats
        return tokens_out


class SelfDraft:
    """Truncated-layer self-draft (LayerSkip-style draft&verify, no extra
    weights): the first `num_layers` decoder layers of the SAME packed engine
    + the final norm and (quantized) lm_head act as an early-exit proposer.
    Each proposal costs ~num_layers/L of a decode step plus the head; the
    draft predicts from the model's own early hidden state, so it works on
    arbitrary text where the prompt-lookup n-gram draft only covers
    repetitive spans.

    Cache discipline (mirrors generate_speculative's no-rollback argument):
    the draft keeps its OWN num_layers-deep KV cache, written only by draft
    forwards. Each round drafts from a growing segment [cur, d1..dj] anchored
    at the verified position, so rows < the verified position are always
    rows the draft itself wrote for tokens that later verified identically
    (same token prefix ⇒ bit-identical early-layer K/V), and stale rows from
    rejected drafts sit at positions ≥ the next anchor, where the next
    segment rewrites them before any query can attend to them."""

    def __init__(self, gen: "Generator", num_layers: int = 4):
        import dataclasses
        L = gen.config.num_layers
        nd = max(1, min(num_layers, L))
        self.nd = nd
        self.gen = gen
        assert gen._mod is E, "self-draft targets the integer engine"

        def cut(tree):
            return jax.tree.map(lambda a: a[:nd], tree)

        p = dict(gen.packed)
        p["layers"] = cut(gen.packed["layers"])
        if "rvec" in p:
            p["rvec"] = gen.packed["rvec"][:nd]
        else:
            p["ranges"] = cut(gen.packed["ranges"])
        self.packed = p
        self.cfg = dataclasses.replace(gen.config, num_layers=nd)
        self.ecfg = dataclasses.replace(gen.ecfg, model=self.cfg)
        self.cache = None
        self._steps = {}
        self._up = (False if jax.default_backend() == "cpu"
                    else ("w4nomodelk" if gen.ecfg.weight_bits == 4
                          else False))

    def prefill(self, prompt_tokens: np.ndarray):
        cfg, pol = self.cfg, self.gen.policy
        B, T = prompt_tokens.shape
        cache = E.init_kv_cache(self.ecfg, B)
        positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        _, self.cache = E.forward(
            self.packed, jnp.asarray(prompt_tokens, jnp.int32), cfg, pol,
            positions=positions, kv_cache=cache,
            cache_position=jnp.zeros((B,), jnp.int32),
            kv_valid_len=jnp.full((B,), T, jnp.int32),
            logits_at=jnp.full((B,), T - 1, jnp.int32))
        self._next_pos = T          # first draft-cache row not yet written

    def _step(self, j: int):
        """Jitted draft forward over a length-j segment (one per length)."""
        if j not in self._steps:
            cfg, pol, up = self.cfg, self.gen.policy, self._up

            @functools.partial(jax.jit, donate_argnums=(2,))
            def step(packed, toks, cache, start):
                positions = (start + jnp.arange(j))[None, :]
                logits, cache = E.forward(
                    packed, toks, cfg, pol, positions=positions,
                    kv_cache=cache,
                    cache_position=jnp.full((1,), start, jnp.int32),
                    kv_valid_len=jnp.asarray([start + j], jnp.int32),
                    use_pallas=up,
                    logits_at=jnp.full((1,), j - 1, jnp.int32))
                return jnp.argmax(logits[0, -1]).astype(jnp.int32), cache

            self._steps[j] = step
        return self._steps[j]

    def propose(self, out: list, prompt_len: int, pos: int, n: int):
        """n proposals continuing out[-1] (at absolute position `pos`).

        The segment is anchored at the first position whose draft-cache row
        is not yet valid (all-accepted rounds leave the bonus token's row
        unwritten), so every row < the anchor is always one the draft itself
        wrote for a token that verified identically. out[i] is the token at
        position prompt_len + i."""
        p0 = int(min(self._next_pos, pos))
        seg = [int(t) for t in out[p0 - prompt_len:]]   # positions p0..pos
        npfx = len(seg)
        start = jnp.int32(p0)
        for _ in range(n):
            toks = jnp.asarray([seg], jnp.int32)
            nxt, self.cache = self._step(len(seg))(self.packed, toks,
                                                   self.cache, start)
            seg.append(int(np.asarray(nxt)))
        self._next_pos = p0 + len(seg) - 1   # last forward wrote p0..that-1
        return seg[npfx:]


def _ig_lookup_draft(buf, blen, n: int):
    """In-graph prompt-lookup draft: the device-side twin of
    prompt_lookup_draft (ngram=2) over a fixed-size history buffer.
    buf (S,) int32 holds the prompt + emitted tokens, valid length blen
    (buf[blen-1] = the current token). Vectorized: match positions where
    (buf[i], buf[i+1]) equals the trailing bigram and i+1 <= blen-2 (strictly
    earlier than the trailing bigram itself), take the most recent, slice the
    n tokens that followed; fall back to repeating the last token when there
    is no match or no continuation — exactly the host function's semantics."""
    S = buf.shape[0]
    t1, t2 = buf[blen - 2], buf[blen - 1]
    idx = jnp.arange(S)
    nxt = jnp.roll(buf, -1)
    match = (buf == t1) & (nxt == t2) & (idx + 1 <= blen - 2)
    last = jnp.max(jnp.where(match, idx, -1))
    start = jnp.clip(last + 2, 0, S - n)
    d = jax.lax.dynamic_slice(buf, (start,), (n,))
    # truncate at blen, padding with the last valid continuation token
    j = start + jnp.arange(n)
    pad_idx = jnp.clip(blen - 1 - start, 0, n - 1)
    d = jnp.where(j < blen, d, d[pad_idx])
    # no earlier occurrence, or occurrence with empty continuation -> repeat
    return jnp.where((last < 0) | (last + 2 >= blen), t2, d)


def prompt_lookup_draft(history, n: int, ngram: int = 2):
    """Draft by n-gram continuation: find the most recent earlier occurrence
    of the trailing `ngram` tokens and propose what followed it. No model, no
    extra memory traffic; acceptance is high exactly when decode is cheap to
    predict (templates, code, quoted context)."""
    h = list(history)
    if len(h) >= ngram:
        key = h[-ngram:]
        for i in range(len(h) - ngram - 1, -1, -1):
            if h[i:i + ngram] == key:
                cont = h[i + ngram:i + ngram + n]
                if cont:
                    return (cont + [cont[-1]] * n)[:n]
                break
    return [h[-1]] * n if h else [0] * n
