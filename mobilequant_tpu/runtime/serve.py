"""Continuous batching over the integer engine.

The reference's serving story is a single-stream C++ REPL (capp/test/simple_app.cpp
driving llm.cpp::generate one token at a time). The TPU-native replacement
(BASELINE north star: "continuous batching across hosts") is slot-based:

  * a fixed number of batch slots share one device-resident int8 KV cache
    (L, B_slots, S_max, Hkv, hd);
  * new requests prefill into a free slot with a bucketed-length jit (one compile
    per bucket), writing their K/V block into the slot;
  * ONE jitted decode step advances every active slot per tick — per-slot
    positions/valid-lengths make ragged occupancy exact;
  * finished slots (EOS or budget) free immediately and are refilled from the
    queue mid-flight — no batch barrier.

Multi-host scale-out = shard the slot axis over "dp" and heads over "tp" with
mobilequant_tpu/parallel (the cache pspec already carries ("dp","tp")).
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
import logging
import time
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mobilequant_tpu.models.config import ModelConfig
from mobilequant_tpu.quant.policy import QPolicy
from mobilequant_tpu.runtime import engine as E
from mobilequant_tpu.runtime.sampling import (SamplerConfig, sample,
                                              sample_batched, sampler_arrays)

_log = logging.getLogger(__name__)


@dataclasses.dataclass
class Request:
    rid: int
    prompt: np.ndarray            # (T,) int32
    max_new_tokens: int
    sampler: Optional[SamplerConfig] = None   # None -> batcher default
    out: list = dataclasses.field(default_factory=list)
    slot: int = -1
    pos: int = 0                  # next position to write


class ContinuousBatcher:
    def __init__(self, packed: dict, config: ModelConfig, policy: QPolicy,
                 ecfg: Optional[E.EngineConfig] = None, batch_slots: int = 8,
                 prefill_buckets: tuple = (32, 128, 512, 1024),
                 sampler: SamplerConfig = SamplerConfig(greedy=True),
                 eos_token_id: Optional[int] = None, seed: int = 0,
                 mesh=None, chunk_prefill: Optional[int] = None,
                 chunk_decode: int = 1, pipeline_ticks: int = 0,
                 spec_k: int = 0):
        """mesh: optional jax.sharding.Mesh — weights go tensor-parallel over
        "tp" and the slot axis of the KV cache shards over "dp"
        (parallel/sharding.packed_pspecs / kv_cache_pspec). batch_slots must be
        divisible by the dp size.

        chunk_prefill: if set, prompts prefill in fixed chunks of this size
        through a per-slot scratch cache (ONE compiled shape regardless of
        prompt length, prompts up to max_seq_len with no length buckets);
        the causal-block-skipping prefill kernel makes each chunk pay only
        for the KV prefix it can see.

        chunk_decode: if >1, scheduler ticks advance every active slot by N
        tokens in ONE in-graph lax.scan (engine.decode_loop) instead of one
        jitted step per token — N× fewer host dispatches per generated token
        (the decode twin of chunk_prefill; slots still retire/refill between
        chunks, trading ≤N-1 tokens of wasted tail compute per retirement).
        Greedy and plain-temperature sampling only; top-k/top-p fall back to
        per-token ticks.

        pipeline_ticks: 0 (default) = ADAPTIVE — each wave pipelines as many
        chunked decode ticks as the minimum remaining budget/headroom across
        active slots allows (chunk i+1 consumes chunk i's last token ON
        DEVICE), so one host sync serves the whole wave; slots that finish
        inside the wave get the next request's prefill dispatched BEFORE the
        sync (overlapped refill). An explicit P>0 caps the depth instead.
        On a tunneled/remote runtime the
        per-tick round trip dominates serving throughput (BENCHMARKS.md
        "Serving"), so this roughly divides scheduler latency overhead by P.
        A slot that hits EOS mid-pipeline wastes its remaining rows (the
        output is truncated at EOS; KV rows past it are overwritten by the
        next prefill into the slot — the same invariant chunked ticks
        already rely on).

        Refill prefills BATCH: all pending installs in a wave run as ONE
        (Bn, C) chunked-prefill dispatch sequence (or one bucketed pass) —
        batched prefill is measured flat-in-B (BENCHMARKS.md), so a 32-slot
        refill wave pays 1 relay dispatch per chunk instead of 32
        (_prefill_many; group sizes pad to powers of two so compiled shapes
        are reused, padded rows duplicate a real row and their adopt is a
        bit-identical no-op write).

        spec_k >= 2 enables SPECULATIVE tail ticks: when exactly one greedy
        request is active and the queue is empty (the latency-bound drain
        phase / single-stream serving), the batcher runs in-graph
        prompt-lookup draft→verify rounds (generate._ig_lookup_draft; the
        bs=1 path realizes 2.2-2.5× — BENCHMARKS.md speculative) against a
        copy of the slot's cache rows and writes them back. Emitted tokens
        are the verify program's own greedy chain (draft quality only
        affects speed). Replaces the single-stream C++ loop's role,
        ref capp/src/llm.cpp:545-648."""
        self.ecfg = ecfg or E.EngineConfig(model=config)
        # weight-only mode (act_bits=16): same batcher over the wonly engine
        # (fp activations + fp KV cache; slot axis is 1 in both cache layouts)
        wonly_mode = getattr(self.ecfg, "act_bits", 8) == 16
        if wonly_mode:
            from mobilequant_tpu.models.model import KVCache as _KVC
            from mobilequant_tpu.runtime import wonly as _mod
        else:
            _mod, _KVC = E, E.EngineKVCache
            from mobilequant_tpu.quant.policy import policy_kv_bits
            assert policy_kv_bits(policy) == \
                getattr(self.ecfg, "kv_bits", 8), \
                "policy KV bitwidth must match EngineConfig.kv_bits"
            if getattr(self.ecfg, "kv_bits", 8) == 4:
                # bucketed prefill writes unpacked K/V segments with a plain
                # slot DUS — only the chunked path (scratch cache through
                # forward's unpack→repack) understands the packed layout
                assert chunk_prefill is not None, \
                    "int4 KV serving requires chunk_prefill"
                # kv_cache_pspec maps axes of the ROW-MAJOR (L,B,Hkv,S,hd)
                # cache; the hd-major packed layout would silently shard
                # the wrong axes
                assert mesh is None, \
                    "int4 KV + mesh sharding: not yet supported (the cache " \
                    "pspec assumes the row-major int8 layout)"
        self._mod, self._kvc = _mod, _KVC
        if mesh is not None:
            from jax.sharding import NamedSharding
            from mobilequant_tpu.parallel import sharding as S
            if wonly_mode:
                # weight-only TP is the XLA dequant path (the stacked Pallas
                # kernel is single-chip) — GSPMD inserts the o/w2 all-reduces
                specs = S.wonly_pspecs(packed, config, mesh)
                cache_spec = S.wonly_kv_cache_pspec(config, mesh)
                self.ecfg = dataclasses.replace(self.ecfg, use_pallas=False)
            else:
                specs = S.packed_pspecs(packed, config, mesh)
                cache_spec = S.kv_cache_pspec(config, mesh)
            packed = S.shard_tree(packed, specs, mesh)
            self._cache_sharding = NamedSharding(mesh, cache_spec)
        else:
            self._cache_sharding = None
        self.mesh = mesh
        self.packed = packed
        self.config = config
        self.policy = policy
        self.B = batch_slots
        self.buckets = tuple(b for b in sorted(prefill_buckets)
                             if b <= self.ecfg.max_seq_len)
        self.sampler = sampler
        self.eos = eos_token_id
        self.key = jax.random.PRNGKey(seed)

        self.cache = _mod.init_kv_cache(self.ecfg, self.B)
        if self._cache_sharding is not None:
            self.cache = _KVC(
                k=jax.device_put(self.cache.k, self._cache_sharding),
                v=jax.device_put(self.cache.v, self._cache_sharding))
        self.queue: deque[Request] = deque()
        self.active: dict[int, Request] = {}       # slot -> request
        self.done: dict[int, Request] = {}
        self._rid = itertools.count()
        self._last_tokens = np.zeros((self.B,), np.int32)

        cfg, pol = config, policy
        # batched decode rides the whole-model kernel when the pack supports
        # it and batch_slots <= 8 (engine.forward gates itself); CPU backends
        # can't compile the Pallas kernels
        up_decode = self.ecfg.use_pallas if jax.default_backend() != "cpu" \
            else False

        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def decode_step(packed, tokens, k_cache, v_cache, pos, valid):
            logits, nc = _mod.forward(
                packed, tokens, cfg, pol, positions=pos[:, None],
                kv_cache=_KVC(k=k_cache, v=v_cache),
                cache_position=pos, kv_valid_len=valid,
                use_pallas=up_decode)
            return logits[:, 0], nc.k, nc.v

        self._decode = decode_step

        self.chunk_decode = max(int(chunk_decode), 1)
        self.pipeline_ticks = max(int(pipeline_ticks), 0)   # 0 = adaptive
        self._chunk_ok = sampler.greedy or (sampler.top_k == 0
                                            and sampler.top_p >= 1.0)
        chunk_temp = 0.0 if sampler.greedy else float(sampler.temperature)

        @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(2, 3))
        def decode_chunk(packed, tokens, k_cache, v_cache, n, pos, key):
            toks, nc, _ = _mod.decode_loop(
                packed, tokens, _KVC(k=k_cache, v=v_cache), pos, n, cfg, pol,
                use_pallas=up_decode, temperature=chunk_temp, key=key)
            return toks, nc.k, nc.v

        self._decode_chunk_fn = decode_chunk

        # heterogeneous-plain variant: per-slot temperature ARRAY (0 = greedy)
        # keeps chunked ticks engaged when live requests mix temperatures —
        # one compiled graph for every combination
        @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(2, 3))
        def decode_chunk_temps(packed, tokens, k_cache, v_cache, n, pos, key,
                               temps):
            toks, nc, _ = _mod.decode_loop(
                packed, tokens, _KVC(k=k_cache, v=v_cache), pos, n, cfg, pol,
                use_pallas=up_decode, temperature=temps, key=key)
            return toks, nc.k, nc.v

        self._decode_chunk_temps_fn = decode_chunk_temps

        # fused prefill-attention kernel on TPU (23% less device time at
        # T=1024, BENCHMARKS.md); CPU backends fall back to the XLA path
        if _mod is not E:
            up_prefill = False        # wonly prefill: XLA dequant path
        elif jax.default_backend() != "cpu":
            # prefill adds the w13+gate epilogue kernel for both bitwidths
            # (W4 16.41, W8 15.05 vs 17.2 ms/pass at T=1024 — the kernel is
            # MXU/VPU-bound at prefill M, so W8's 2x weight bytes are free;
            # BENCHMARKS.md round-3 prefill)
            up_prefill = "w4_attn_gatek" if self.ecfg.weight_bits == 4 \
                else "attn_gatek"
        else:
            up_prefill = False

        @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(2, 3))
        def prefill_slot(packed, tokens, k_cache, v_cache, bucket, slot, length):
            # tokens: (1, bucket) padded prompt; writes K/V into `slot`.
            # logits_at: generation needs only the last prompt position's
            # logits — skips the bucket-wide lm_head matmul
            positions = jnp.arange(bucket)[None, :]
            logits, seg = _mod.forward(packed, tokens, cfg, pol, positions=positions,
                                    kv_valid_len=jnp.asarray([length]),
                                    use_pallas=up_prefill,
                                    logits_at=(length - 1)[None])
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, seg.k, (0, slot[0], 0, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, seg.v, (0, slot[0], 0, 0, 0))
            last = logits[0, -1]
            return last, k_cache, v_cache

        self._prefill = prefill_slot

        @functools.partial(jax.jit, donate_argnums=(2, 3))
        def prefill_slots_b(packed, tokens, k_cache, v_cache, slots, lengths):
            # batched bucketed refill: tokens (Bn, bucket), per-sequence
            # lengths; writes every sequence's K/V segment into its slot
            # (slots (Bn,)) — ONE dispatch for the whole wave
            Bn, bucket = tokens.shape
            positions = jnp.broadcast_to(jnp.arange(bucket)[None, :],
                                         (Bn, bucket))
            logits, seg = _mod.forward(
                packed, tokens, cfg, pol, positions=positions,
                kv_valid_len=lengths, use_pallas=up_prefill,
                logits_at=lengths - 1)
            for i in range(Bn):
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, seg.k[:, i:i + 1], (0, slots[i], 0, 0, 0))
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, seg.v[:, i:i + 1], (0, slots[i], 0, 0, 0))
            return logits, k_cache, v_cache

        self._prefill_slots_b = prefill_slots_b

        self.chunk = chunk_prefill
        if chunk_prefill is not None:
            assert self.ecfg.max_seq_len % chunk_prefill == 0

            @functools.partial(jax.jit, donate_argnums=(2,))
            def prefill_chunk(packed, tokens, slot_cache, start, valid):
                # tokens (1, C); slot_cache (L, 1, Hkv, S, hd); start scalar.
                # logits_at: only the final chunk's last valid row is ever
                # consumed (valid-1-start is C-1 on intermediate chunks)
                C = tokens.shape[1]
                positions = (start + jnp.arange(C))[None, :]
                logits, nc = _mod.forward(
                    packed, tokens, cfg, pol, positions=positions,
                    kv_cache=slot_cache,
                    cache_position=jnp.full((1,), start, jnp.int32),
                    kv_valid_len=jnp.asarray([valid], jnp.int32),
                    use_pallas=up_prefill,
                    logits_at=jnp.clip(valid - 1 - start, 0, C - 1)[None])
                return logits, nc.k, nc.v

            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def adopt_slot(slot, k_cache, v_cache, sk, sv):
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, sk, (0, slot, 0, 0, 0))
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, sv, (0, slot, 0, 0, 0))
                return k_cache, v_cache

            @functools.partial(jax.jit, donate_argnums=(2,))
            def prefill_chunk_b(packed, tokens, scratch_cache, start, valid):
                # batched chunked refill: tokens (Bn, C) through a (L, Bn, …)
                # scratch cache, per-sequence valid lengths (the group shares
                # n_chunks, so every sequence's last valid row lands in the
                # final chunk and logits_at selects it per row)
                Bn, C = tokens.shape
                positions = jnp.broadcast_to(
                    (start + jnp.arange(C))[None, :], (Bn, C))
                logits, nc = _mod.forward(
                    packed, tokens, cfg, pol, positions=positions,
                    kv_cache=scratch_cache,
                    cache_position=jnp.full((Bn,), start, jnp.int32),
                    kv_valid_len=valid,
                    use_pallas=up_prefill,
                    logits_at=jnp.clip(valid - 1 - start, 0, C - 1))
                return logits, nc.k, nc.v

            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def adopt_slots(slots, k_cache, v_cache, sk, sv):
                # (duplicate slots from padded rows rewrite identical bytes)
                for i in range(sk.shape[1]):
                    k_cache = jax.lax.dynamic_update_slice(
                        k_cache, sk[:, i:i + 1], (0, slots[i], 0, 0, 0))
                    v_cache = jax.lax.dynamic_update_slice(
                        v_cache, sv[:, i:i + 1], (0, slots[i], 0, 0, 0))
                return k_cache, v_cache

            self._prefill_chunk = prefill_chunk
            self._adopt_slot = adopt_slot
            self._prefill_chunk_b = prefill_chunk_b
            self._adopt_slots = adopt_slots

        # --- speculative tail ticks (spec_k >= 2) -------------------------
        self.spec_k = max(int(spec_k), 0)
        if self.spec_k >= 2:
            if _mod is not E:
                up_spec = self.ecfg.use_pallas \
                    and jax.default_backend() != "cpu"
            elif jax.default_backend() == "cpu":
                up_spec = False
            else:
                # T=k verify rows: the scan engine path (the whole-model
                # kernel is T=1-only) — same choice as Generator's verify
                up_spec = "w4nomodelk" if self.ecfg.weight_bits == 4 \
                    else False

            kk = self.spec_k
            from mobilequant_tpu.runtime.generate import _ig_lookup_draft

            @functools.partial(jax.jit, static_argnums=(6,),
                               donate_argnums=(2, 3))
            def spec_rounds(packed, cur, k_cache, v_cache, slot, pos, n_rounds,
                            buf, blen):
                # n_rounds greedy draft→verify rounds on the slot's cache
                # rows — slicing AND write-back live in-graph, so one wave is
                # ONE dispatch + one combined fetch (each extra relay
                # interaction is a ~25-45 ms round trip; the earlier
                # extract/rounds/write/2-fetch shape paid 5 per wave).
                # Emits the verify program's own greedy chain for any draft
                # quality (the batcher twin of Generator._spec_chunk_fn
                # without the self-draft arm).
                k1 = jax.lax.dynamic_slice_in_dim(k_cache, slot, 1, 1)
                v1 = jax.lax.dynamic_slice_in_dim(v_cache, slot, 1, 1)

                def round_(carry, _):
                    cur, cache, pos, buf, blen = carry
                    drafts = _ig_lookup_draft(buf, blen, kk - 1)
                    toks = jnp.concatenate([cur, drafts])[None, :]
                    logits, cache = _mod.forward(
                        packed, toks, cfg, pol,
                        positions=(pos[0] + jnp.arange(kk))[None, :],
                        kv_cache=cache, cache_position=pos,
                        kv_valid_len=pos + kk, use_pallas=up_spec)
                    am = jnp.argmax(logits[0], -1).astype(jnp.int32)
                    acc = jnp.cumprod(
                        (drafts == am[:kk - 1]).astype(jnp.int32))
                    n_acc = jnp.sum(acc)
                    bonus = am[n_acc]
                    emitted = jnp.where(
                        jnp.arange(kk) < n_acc,
                        jnp.concatenate([drafts, drafts[-1:]]), bonus)
                    buf = jax.lax.dynamic_update_slice(buf, emitted, (blen,))
                    adv = n_acc + 1
                    return (bonus[None], cache, pos + adv, buf, blen + adv), \
                        (emitted, adv)

                init = (cur, self._kvc(k=k1, v=v1), pos, buf, blen)
                (cur, cache, pos, buf, blen), (toks_r, counts) = \
                    jax.lax.scan(round_, init, None, length=n_rounds)
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, cache.k, (0, slot, 0, 0, 0))
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, cache.v, (0, slot, 0, 0, 0))
                return k_cache, v_cache, toks_r, counts

            self._spec_rounds = spec_rounds

    def _prefill_chunked(self, req: "Request", slot: int):
        """Chunked prefill: run the prompt through a per-slot scratch cache in
        fixed-size pieces, then adopt the scratch into the slot."""
        C = self.chunk
        T = len(req.prompt)
        n_chunks = -(-T // C)
        scratch = self._mod.init_kv_cache(self.ecfg, 1)
        sk, sv = scratch.k, scratch.v
        last = None
        for ci in range(n_chunks):
            tok = np.zeros((1, C), np.int32)
            piece = req.prompt[ci * C:(ci + 1) * C]
            tok[0, :len(piece)] = piece
            last, sk, sv = self._prefill_chunk(
                self.packed, jnp.asarray(tok),
                self._kvc(k=sk, v=sv),
                jnp.int32(ci * C), jnp.int32(min(T, (ci + 1) * C)))
        k, v = self._adopt_slot(jnp.int32(slot), self.cache.k, self.cache.v,
                                sk, sv)
        self.cache = self._kvc(k=k, v=v)
        return last[0, -1]       # logits_at already selected the last row

    # ------------------------------------------------------------------
    def submit(self, prompt_tokens, max_new_tokens: int,
               sampler: Optional[SamplerConfig] = None) -> int:
        """sampler: per-request override of the batcher-level SamplerConfig
        (temperature/top_p/top_k/greedy). Mixed settings across live slots are
        served by ONE compiled batched sampler (sampling.sample_batched —
        params are runtime arrays), so heterogeneous requests never recompile;
        chunked decode ticks stay engaged for any mix of greedy and
        plain-temperature requests (per-slot temperature array in-graph);
        top-k/top-p requests fall back to per-token ticks."""
        rid = next(self._rid)
        self.queue.append(Request(rid, np.asarray(prompt_tokens, np.int32),
                                  max_new_tokens, sampler=sampler))
        return rid

    def _eff_sampler(self, req: Request) -> SamplerConfig:
        return req.sampler if req.sampler is not None else self.sampler

    @staticmethod
    def _plain(e: SamplerConfig) -> bool:
        """greedy or plain-temperature (no top-k/top-p) — servable by the
        in-graph chunked decode loop."""
        return e.greedy or (e.top_k == 0 and e.top_p >= 1.0)

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds buckets {self.buckets}")

    def _prefill_into(self, req: Request, slot: int):
        """Dispatch a request's prefill + first-token sample into `slot`;
        returns the first token as a DEVICE array (not fetched) so callers
        can overlap the prefill with other in-flight work before syncing."""
        req.slot = slot
        T = len(req.prompt)
        if self.chunk is not None:
            last_logits = self._prefill_chunked(req, slot)
        else:
            bucket = self._bucket_for(T)
            tok = np.zeros((1, bucket), np.int32)
            tok[0, :T] = req.prompt
            last_logits, k, v = self._prefill(
                self.packed, jnp.asarray(tok), self.cache.k, self.cache.v,
                bucket, jnp.asarray([slot]), jnp.asarray(T))
            self.cache = self._kvc(k=k, v=v)
        self.key, sk = jax.random.split(self.key)
        eff = self._eff_sampler(req)
        if eff == self.sampler:
            first = sample(last_logits[None], sk, eff)[0]
        else:   # one shared jit regardless of the request's params
            t, p, k_, g = sampler_arrays([eff])
            first = sample_batched(last_logits[None], sk, t, p, k_, g)[0]
        req.pos = T
        return first

    @staticmethod
    def _pad_pow2(n: int) -> int:
        return 1 << (n - 1).bit_length()

    def _prefill_many(self, pairs):
        """Batched refill: prefill all pending (slot, request) pairs with ONE
        device dispatch per chunk/bucket wave instead of one per request —
        batched prefill is flat-in-B (BENCHMARKS.md), so this is Bn× fewer
        relay round trips for free. Groups by n_chunks (chunked mode) or
        bucket; singleton groups fall back to the per-request path. Returns
        (slot, req, first_token_device) tuples for _install_many."""
        if len(pairs) == 1:
            slot, req = pairs[0]
            return [(slot, req, self._prefill_into(req, slot))]
        pending = []
        groups: dict = {}
        if self.chunk is not None:
            for slot, req in pairs:
                nck = -(-len(req.prompt) // self.chunk)
                groups.setdefault(nck, []).append((slot, req))
            for nck, grp in groups.items():
                if len(grp) == 1:
                    slot, req = grp[0]
                    pending.append((slot, req,
                                    self._prefill_into(req, slot)))
                else:
                    pending.extend(self._prefill_group_chunked(grp, nck))
        else:
            for slot, req in pairs:
                groups.setdefault(self._bucket_for(len(req.prompt)),
                                  []).append((slot, req))
            for bucket, grp in groups.items():
                if len(grp) == 1:
                    slot, req = grp[0]
                    pending.append((slot, req,
                                    self._prefill_into(req, slot)))
                else:
                    pending.extend(self._prefill_group_bucketed(grp, bucket))
        return pending

    def _group_sample_first(self, grp, last_logits):
        """One batched first-token sample for a refill group; returns
        (slot, req, first_device) pending tuples (padded rows discarded)."""
        self.key, skey = jax.random.split(self.key)
        Bp = last_logits.shape[0]
        effs = [self._eff_sampler(req) for _, req in grp]
        effs += [SamplerConfig(greedy=True)] * (Bp - len(grp))
        t, p, k_, g = sampler_arrays(effs)
        firsts = sample_batched(last_logits, skey, t, p, k_, g)
        pending = []
        for i, (slot, req) in enumerate(grp):
            req.slot = slot
            req.pos = len(req.prompt)
            pending.append((slot, req, firsts[i]))
        return pending

    def _prefill_group_chunked(self, grp, n_chunks):
        """One (Bp, C)-batched chunked prefill for a same-n_chunks group,
        adopted into all slots with one scatter dispatch. Bp pads the group
        to a power of two so compiled shapes are reused across waves; padded
        rows DUPLICATE the last real request (bit-identical K/V), and their
        adopt rewrites that slot with identical bytes — a no-op."""
        C = self.chunk
        Bn = len(grp)
        Bp = self._pad_pow2(Bn)
        rows = [req for _, req in grp] + [grp[-1][1]] * (Bp - Bn)
        slots = [slot for slot, _ in grp] + [grp[-1][0]] * (Bp - Bn)
        scratch = self._mod.init_kv_cache(self.ecfg, Bp)
        sk, sv = scratch.k, scratch.v
        lens = np.asarray([len(r.prompt) for r in rows], np.int32)
        last = None
        for ci in range(n_chunks):
            tok = np.zeros((Bp, C), np.int32)
            for i, r in enumerate(rows):
                piece = r.prompt[ci * C:(ci + 1) * C]
                tok[i, :len(piece)] = piece
            valid = np.minimum(lens, (ci + 1) * C).astype(np.int32)
            last, sk, sv = self._prefill_chunk_b(
                self.packed, jnp.asarray(tok), self._kvc(k=sk, v=sv),
                jnp.int32(ci * C), jnp.asarray(valid))
        k, v = self._adopt_slots(jnp.asarray(slots, jnp.int32),
                                 self.cache.k, self.cache.v, sk, sv)
        self.cache = self._kvc(k=k, v=v)
        return self._group_sample_first(grp, last[:, -1])

    def _prefill_group_bucketed(self, grp, bucket):
        """One (Bp, bucket)-batched prefill for a same-bucket group; the jit
        writes every K/V segment into its slot in the same dispatch."""
        Bn = len(grp)
        Bp = self._pad_pow2(Bn)
        rows = [req for _, req in grp] + [grp[-1][1]] * (Bp - Bn)
        slots = [slot for slot, _ in grp] + [grp[-1][0]] * (Bp - Bn)
        tok = np.zeros((Bp, bucket), np.int32)
        for i, r in enumerate(rows):
            tok[i, :len(r.prompt)] = r.prompt
        lens = np.asarray([len(r.prompt) for r in rows], np.int32)
        last, k, v = self._prefill_slots_b(
            self.packed, jnp.asarray(tok), self.cache.k, self.cache.v,
            jnp.asarray(slots, jnp.int32), jnp.asarray(lens))
        self.cache = self._kvc(k=k, v=v)
        return self._group_sample_first(grp, last[:, -1])

    def _install_many(self, pending):
        """Install prefilled requests into their slots with ONE host fetch
        for all first tokens (each individual device_get is a full relay
        round trip — measured ~15-25 ms; a 32-slot refill wave paid it 32x)."""
        if not pending:
            return
        firsts = jax.device_get(jnp.stack([f for _, _, f in pending]))
        for (slot, req, _), first in zip(pending, firsts):
            first = int(first)
            req.out.append(first)
            self._last_tokens[slot] = first
            self.active[slot] = req

    def _fill_free_slots(self):
        free = [s for s in range(self.B) if s not in self.active]
        pairs = []
        while free and self.queue:
            pairs.append((free.pop(0), self.queue.popleft()))
        if pairs:
            self._install_many(self._prefill_many(pairs))

    def _retire(self, slot: int):
        req = self.active.pop(slot)
        self.done[req.rid] = req

    def step(self) -> int:
        """One scheduler tick: refill slots, one batched decode (1 or
        chunk_decode tokens in-graph), sample, retire. Returns number of
        active slots after the tick."""
        self._fill_free_slots()
        if not self.active:
            return 0

        if self.spec_k >= 2 and len(self.active) == 1:
            # latency-bound tail / single-stream phase: speculative rounds.
            # (After _fill_free_slots, one active slot + a non-empty queue
            # can only mean batch_slots == 1 — no other request could join
            # this tick either way.)
            slot, req = next(iter(self.active.items()))
            if self._eff_sampler(req).greedy and req.pos >= 2:
                r = self._step_speculative(slot, req)
                if r is not None:
                    return r

        n = self.chunk_decode
        if n > 1 and all(req.pos + n <= self.ecfg.max_seq_len - 1
                         and len(req.out) < req.max_new_tokens
                         for req in self.active.values()):
            # pipeline depth: pipeline_ticks=0 (default) adapts P to the
            # wave's MIN remaining budget/headroom across slots — every slot
            # either finishes inside the pipelined batch (and its slot is
            # refilled with an OVERLAPPED prefill, see _step_chunked) or
            # uses all P chunks, so one host sync serves the whole wave with
            # zero wasted tail compute. An explicit pipeline_ticks caps P.
            S1 = self.ecfg.max_seq_len - 1
            p = None
            for req in self.active.values():
                bud = -(-max(req.max_new_tokens - len(req.out), 1) // n)
                head = max((S1 - req.pos) // n, 1)
                pi = max(1, min(bud, head))
                p = pi if p is None else min(p, pi)
            p = max(p or 1, 1)
            if self.pipeline_ticks > 0:
                p = min(p, self.pipeline_ticks)
            while p > 1 and not all(
                    req.pos + p * n <= self.ecfg.max_seq_len - 1
                    for req in self.active.values()):
                p -= 1
            effs = [self._eff_sampler(r) for r in self.active.values()]
            if self._chunk_ok and all(e == self.sampler for e in effs):
                return self._step_chunked(n, pipeline=p)  # homogeneous
            if all(self._plain(e) for e in effs):         # mixed temperatures
                return self._step_chunked(n, per_slot_temps=True, pipeline=p)

        pos = np.zeros((self.B,), np.int32)
        valid = np.ones((self.B,), np.int32)
        for slot, req in self.active.items():
            pos[slot] = req.pos
            valid[slot] = req.pos + 1

        logits, k, v = self._decode(
            self.packed, jnp.asarray(self._last_tokens[:, None]),
            self.cache.k, self.cache.v, jnp.asarray(pos), jnp.asarray(valid))
        self.cache = self._kvc(k=k, v=v)

        self.key, sk = jax.random.split(self.key)
        effs = {s: self._eff_sampler(r) for s, r in self.active.items()}
        if all(e == self.sampler for e in effs.values()):
            nxt = np.asarray(jax.device_get(sample(logits, sk, self.sampler)))
        else:
            # per-slot params; free slots sample greedily (result discarded)
            per_slot = [effs.get(s, SamplerConfig(greedy=True))
                        for s in range(self.B)]
            t, p, k_, g = sampler_arrays(per_slot)
            nxt = np.asarray(jax.device_get(
                sample_batched(logits, sk, t, p, k_, g)))

        for slot in list(self.active):
            req = self.active[slot]
            tok = int(nxt[slot])
            req.out.append(tok)
            req.pos += 1
            self._last_tokens[slot] = tok
            hit_eos = self.eos is not None and tok == self.eos
            if hit_eos or len(req.out) >= req.max_new_tokens or \
                    req.pos >= self.ecfg.max_seq_len - 1:
                self._retire(slot)
        return len(self.active)

    def _step_speculative(self, slot: int, req: Request) -> Optional[int]:
        """Speculative tail tick: in-graph prompt-lookup draft→verify rounds
        for the lone active greedy request, against a bs=1 copy of its slot's
        cache rows (written back in the same dispatch). One dispatch + one
        sync per ≤64 rounds; each
        round emits 1..spec_k tokens of the verify program's greedy chain.
        Returns None when there is no KV headroom for a full round (caller
        falls through to the regular tick)."""
        k = self.spec_k
        S = self.ecfg.max_seq_len
        budget = req.max_new_tokens - len(req.out)
        room = (S - 1 - req.pos) // k
        # cap 64: one wave covers a typical request's whole budget
        # (each wave is a full dispatch+fetch relay round trip; the
        # in-graph round costs only ~2.7 ms)
        rounds = min(-(-budget // k), room, 64)
        if rounds < 1:
            return None
        hist = [int(t) for t in req.prompt] + req.out
        buf = np.zeros((S,), np.int32)
        buf[:len(hist)] = hist                 # buf[blen-1] == current token
        cur = jnp.asarray([self._last_tokens[slot]], jnp.int32)
        pos = jnp.full((1,), req.pos, jnp.int32)
        kc, vc, toks_r, counts = self._spec_rounds(
            self.packed, cur, self.cache.k, self.cache.v, jnp.int32(slot),
            pos, rounds, jnp.asarray(buf), jnp.int32(len(hist)))
        self.cache = self._kvc(k=kc, v=vc)
        toks_r, counts = jax.device_get((toks_r, counts))         # ONE sync
        piece = []
        for r in range(toks_r.shape[0]):
            piece.extend(int(t) for t in toks_r[r, :counts[r]])
        # any truncation below (budget / EOS) retires the request, so the
        # device-side cache/pos overshoot lands in rows the next prefill
        # into this slot overwrites — the standard chunked-tick invariant
        piece = piece[:budget]
        if self.eos is not None and self.eos in piece:
            piece = piece[:piece.index(self.eos) + 1]
        req.out.extend(piece)
        req.pos += len(piece)
        hit_eos = self.eos is not None and piece and piece[-1] == self.eos
        if hit_eos or len(req.out) >= req.max_new_tokens or \
                req.pos >= S - 1:
            self._retire(slot)
        else:
            self._last_tokens[slot] = piece[-1]
        return len(self.active)

    def _step_chunked(self, n: int, per_slot_temps: bool = False,
                      pipeline: int = 1) -> int:
        """Advance every active slot by n·pipeline tokens: `pipeline` chained
        in-graph scans dispatched back to back (chunk i+1 consumes chunk i's
        last-token column ON DEVICE), then ONE host sync for all of them."""
        pos = np.zeros((self.B,), np.int32)
        for slot, req in self.active.items():
            pos[slot] = req.pos
        temps = None
        if per_slot_temps:
            temps = np.zeros((self.B,), np.float32)
            for slot, req in self.active.items():
                e = self._eff_sampler(req)
                temps[slot] = 0.0 if e.greedy else e.temperature

        tok_dev = jnp.asarray(self._last_tokens[:, None])
        k, v = self.cache.k, self.cache.v
        pieces = []
        pos_j = jnp.asarray(pos)
        for _ in range(max(pipeline, 1)):
            self.key, sk = jax.random.split(self.key)
            if per_slot_temps:
                toks, k, v = self._decode_chunk_temps_fn(
                    self.packed, tok_dev, k, v, n, pos_j, sk,
                    jnp.asarray(temps))
            else:
                toks, k, v = self._decode_chunk_fn(
                    self.packed, tok_dev, k, v, n, pos_j, sk)
            pieces.append(toks)
            tok_dev = toks[:, -1:]
            pos_j = pos_j + n
        self.cache = self._kvc(k=k, v=v)
        n = n * max(pipeline, 1)

        # OVERLAPPED REFILL: slots whose requests are GUARANTEED to retire
        # after this pipelined batch (budget/headroom exhaustion — EOS only
        # retires earlier, never later) get their next request's prefill
        # dispatched NOW, before the decode results are synced: the prefill
        # compute rides the device queue behind the decode chunks while the
        # host is still waiting on the token fetch below.
        pending = []
        if self.queue:
            S1 = self.ecfg.max_seq_len - 1
            pairs = []
            for slot, req in list(self.active.items()):
                if not self.queue:
                    break
                if (len(req.out) + n >= req.max_new_tokens
                        or req.pos + n >= S1):
                    pairs.append((slot, self.queue.popleft()))
            if pairs:
                pending = self._prefill_many(pairs)

        toks = np.concatenate([np.asarray(t) for t in pieces], axis=1)
        # toks: (B, n)

        for slot in list(self.active):
            req = self.active[slot]
            piece = [int(t) for t in
                     toks[slot][:req.max_new_tokens - len(req.out)]]
            if self.eos is not None and self.eos in piece:
                piece = piece[:piece.index(self.eos) + 1]
            req.out.extend(piece)
            req.pos += len(piece)
            hit_eos = self.eos is not None and piece and piece[-1] == self.eos
            if hit_eos or len(req.out) >= req.max_new_tokens or \
                    req.pos >= self.ecfg.max_seq_len - 1:
                self._retire(slot)       # tail rows past EOS are overwritten
            else:                         # by the next prefill into this slot
                self._last_tokens[slot] = piece[-1]
        installable = []
        for slot, nreq, first_dev in pending:
            if slot in self.active:
                # Should be impossible: the overlapped-refill condition above
                # only picks slots whose retirement after this batch is
                # guaranteed (EOS retires earlier, never later). If a future
                # change to the piece-trimming/retire conditions breaks that,
                # never overwrite the live request's slot state — requeue the
                # prefilled request at the queue head (its state reset for a
                # fresh prefill) and surface the anomaly loudly. The live
                # request's cache rows were already clobbered by the
                # dispatched prefill; its output is suspect from here on.
                _log.error(
                    "overlapped refill anomaly: slot %d did not retire; "
                    "requeuing request %d (live request %d's KV rows were "
                    "overwritten — its output is corrupt)",
                    slot, nreq.rid, self.active[slot].rid)
                nreq.slot = -1
                nreq.pos = 0
                nreq.out.clear()
                self.queue.appendleft(nreq)
                continue
            installable.append((slot, nreq, first_dev))
        self._install_many(installable)
        return len(self.active)

    def run(self) -> dict[int, list[int]]:
        """Drain the queue; returns rid -> generated token ids."""
        t0 = time.perf_counter()
        ticks = 0
        tokens = 0
        occupancy = 0
        while self.queue or self.active:
            n_active = self.step()
            ticks += 1
            tokens += max(n_active, 0)
            occupancy += n_active
        dt = time.perf_counter() - t0
        total_out = sum(len(r.out) for r in self.done.values())
        self.stats = {
            "wall_s": dt,
            "ticks": ticks,
            "tokens_out": total_out,
            "tok_s": total_out / dt if dt > 0 else 0.0,
            "avg_slot_occupancy": occupancy / max(ticks, 1),
        }
        return {rid: req.out for rid, req in self.done.items()}
