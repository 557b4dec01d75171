"""Benchmark: TinyLlama-1.1B integer-engine decode throughput on one TPU chip.

Prints the headline JSON line to stdout:
  {"metric": "...", "value": N, "unit": "tok/s", "vs_baseline": N}

vs_baseline = best quantized decode tok/s ÷ bf16-FP decode tok/s on the same
chip/shapes — the reference's headline claim is 20-50% latency reduction vs FP
on-device (README.md:4); at bs=1 decode is weight-bandwidth-bound.

Robustness contract (VERDICT r2 item 1 — the official record must survive a
driver timeout):
  * the HEADLINE config (W4A8 whole-model kernel + W4 head) runs FIRST;
  * the cumulative results dict goes to stderr and the current-best headline
    JSON line is re-printed to stdout after EVERY row (flushed) — a timeout at
    any point still leaves a parseable record whose last line is correct;
  * a persistent XLA compilation cache (.jax_cache/) makes reruns cheap;
  * a wall-clock budget (MQTPU_BENCH_BUDGET_S, default 2700s) skips remaining
    sections gracefully instead of letting `timeout` SIGKILL mid-row.

Methodology notes (both matter on this tunneled device):
  * every measured iteration is data-chained into the next (token feedback /
    cache threading) — the execution relay lazily skips computations whose
    results are never consumed, so unchained loops report impossible numbers;
  * the decode loop runs IN-GRAPH (lax.scan over steps, engine.decode_loop), so
    per-token host dispatch overhead is excluded — that's also the production
    configuration;
  * marginal cost over loop LENGTH (n=64 vs n=320) cancels the relay's ~1.8s
    fixed per-dispatch overhead.

Extra metrics (per-config details) go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("MQTPU_BENCH_BUDGET_S", "2700"))
# last-known bf16 baseline on this chip (BENCH_r01.json); used for the early
# headline emits until this run's own bf16 row lands, then overwritten
FALLBACK_BF16 = 306.4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def past_budget(margin_s: float = 300.0) -> bool:
    """True once there's less than margin_s of budget left — callers skip
    their section (a row's compile alone can take minutes on the relay)."""
    return (time.perf_counter() - T_START) > (BUDGET_S - margin_s)


N_STEPS = 64          # kept for smoke paths
N1, N2 = 64, 320      # marginal-method loop lengths (short chunks are noise-
                      # dominated: 16/80 once reported W4 at 1296 tok/s — 8%
                      # above the SOL bound; 64/320 reproduces within ±1%)

_run_counter = [0]

# headline preference order: best production serving config wins (relaxed
# 16-bit sim sites are accuracy-neutral per scripts/accuracy_gate.py)
HEADLINE_ORDER = ("w4a8_pallas_h4", "w4a8_pallas", "w8a8_kernel_h8",
                  "w8a8_fast_h8", "w8a8_fast", "w8a8")


def emit(results: dict, fp_tps: float | None):
    """Incremental official record: cumulative dict to stderr, current-best
    headline JSON line to stdout. Called after every row so a timeout at any
    point leaves the last-printed line correct and parseable."""
    log("RESULTS " + json.dumps(results))
    # physical ceiling: no bs=1 decode config on this chip can exceed ~1e5
    # tok/s — anything above is a degenerate marginal (d2<=d1 under relay
    # variance) that must never become the headline
    cands = [(t, results[f"{t}_decode_tok_s"]) for t in HEADLINE_ORDER
             if f"{t}_decode_tok_s" in results
             and results[f"{t}_decode_tok_s"] < 1e5]
    if not cands:
        return
    tag, headline = max(cands, key=lambda kv: kv[1])
    short = "w4a8" if "w4a8" in tag else "w8a8"
    base = fp_tps if fp_tps else FALLBACK_BF16
    print(json.dumps({
        "metric": f"tinyllama1.1b_{short}_decode_tok_s_per_chip",
        "value": round(headline, 2),
        "unit": "tok/s",
        "vs_baseline": round(headline / base, 3),
    }), flush=True)


def time_decode_loop(make_chunk, packed, cache_fn, batch, vocab):
    """Marginal-cost timing: time an n1-step and an n2-step in-graph decode loop
    (fresh cache + distinct first token per run so the relay cannot memoize) and
    divide the difference. Returns tok/s per sequence.

    make_chunk(n) -> jitted fn(packed, token, cache, pos) -> tokens (B,n)."""
    import jax
    import jax.numpy as jnp

    def run(n, fn):
        _run_counter[0] += 1
        tok = jnp.full((batch, 1), _run_counter[0] % vocab, jnp.int32)
        t0 = time.perf_counter()
        toks = fn(packed, tok, cache_fn(), jnp.full((batch,), 0, jnp.int32))
        np.asarray(toks)   # full fetch forces execution
        return time.perf_counter() - t0

    f1, f2 = make_chunk(N1), make_chunk(N2)
    run(N1, f1); run(N2, f2)          # compile + first exec
    # a physical step cannot be faster than ~20 µs (bs=1 floor is ~0.9 ms);
    # d2<=d1 means relay timing variance swallowed the marginal — retry the
    # pair rather than report a degenerate number (BENCH_r03 guard)
    for attempt in range(3):
        d1 = run(N1, f1)
        d2 = run(N2, f2)
        if d2 - d1 > (N2 - N1) * 20e-6:
            return (N2 - N1) / (d2 - d1)
        log(f"  marginal degenerate (d1={d1:.3f}s d2={d2:.3f}s), retry "
            f"{attempt + 1}/3")
    raise RuntimeError(f"non-physical marginal after 3 tries "
                       f"(d1={d1:.3f}s d2={d2:.3f}s)")


def main():
    # Smoke mode validates the bench *paths* on a tiny model; default it to the
    # CPU backend so it never blocks on the axon relay (which hangs device
    # enumeration when down). MQTPU_SMOKE_TPU=1 opts back into the real chip.
    if (os.environ.get("MQTPU_BENCH_SMOKE") == "1" or "--smoke" in sys.argv) \
            and os.environ.get("MQTPU_SMOKE_TPU") != "1":
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass   # backend already initialized; run wherever we are

    import jax

    # persistent compile cache: reruns of unchanged programs skip the relay's
    # remote_compile entirely (verified to work through the axon backend).
    # Real-chip runs only — CPU smoke would pollute it with host-specific AOT
    # entries that warn/SIGILL when reloaded on a different machine.
    if os.environ.get("MQTPU_BENCH_SMOKE") != "1" and "--smoke" not in sys.argv:
        try:
            cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                     ".jax_cache")
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception as e:
            log(f"compile cache unavailable: {e!r}")

    import jax.numpy as jnp
    from __graft_entry__ import _build_packed_tinyllama as _build_base
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant.policy import relax_16bit
    from mobilequant_tpu.runtime import engine as E

    # --smoke / MQTPU_BENCH_SMOKE=1: tiny model, CPU-runnable path validation
    smoke = os.environ.get("MQTPU_BENCH_SMOKE") == "1" or "--smoke" in sys.argv
    model_name = "test-llama" if smoke else "tinyllama-1.1b"
    seq = 64 if smoke else 1024
    global N_STEPS, N1, N2
    if smoke:
        N_STEPS, N1, N2 = 8, 4, 12

    def _build_packed_tinyllama(max_seq_len=1024, w_bits=8, head_bits=16,
                                kv_bits=8):
        return _build_base(max_seq_len=seq, w_bits=w_bits, model_name=model_name,
                           head_bits=head_bits, kv_bits=kv_bits)

    on_cpu = jax.default_backend() == "cpu"
    log(f"devices: {jax.devices()} smoke={smoke} budget={BUDGET_S:.0f}s")
    results = {}
    fp_tps = None

    def decode_row(name, w_bits, use_pallas, relax, head_bits, B=1,
                   kv_bits=8):
        """One marginal-method decode row; returns tok/s TOTAL (×B)."""
        packed, cfg, policy, ecfg = _build_packed_tinyllama(
            w_bits=w_bits, head_bits=head_bits, kv_bits=kv_bits)
        if relax:
            policy = relax_16bit(policy)

        def make_chunk(n, _up=use_pallas, _c=cfg, _p=policy):
            @jax.jit
            def chunk(packed, token, cache, pos):
                toks, _, _ = E.decode_loop(packed, token, cache, pos, n, _c, _p,
                                           use_pallas=_up)
                return toks
            return chunk

        tps = time_decode_loop(make_chunk, packed,
                               lambda: E.init_kv_cache(ecfg, B), B,
                               cfg.vocab_size) * B
        key = f"{name}_decode_tok_s" if B == 1 else f"{name}_bs{B}_decode_tok_s"
        results[key] = tps
        bs_note = f"bs={B}" + (" total" if B > 1 else "")
        log(f"{name}{'' if B == 1 else f' bs={B}'} decode: {tps:.1f} tok/s "
            f"({bs_note}, S={seq}, marginal)")
        del packed
        emit(results, fp_tps)
        return tps

    # MQTPU_BENCH_BS8_ONLY=1: only the batched-decode section (for the
    # MQTPU_MODELK_ATTN_SPLITS sweep — each setting needs a fresh process)
    bs8_only = os.environ.get("MQTPU_BENCH_BS8_ONLY") == "1"

    # --- 1. HEADLINE first: W4A8 whole-model kernel + W4 head -------------
    if not bs8_only and not on_cpu:
        try:
            decode_row("w4a8_pallas_h4", 4, True, True, 4)
        except Exception as e:
            log(f"headline w4a8_pallas_h4 failed: {e!r}")

    # --- 2. bf16 FP baseline (same in-graph loop shape) -------------------
    if not bs8_only:
        cfg = get_config(model_name)
        params = M.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        kvshape = (cfg.num_layers, 1, seq, cfg.num_kv_heads, cfg.head_dim_)

        def make_fp_chunk(n):
            @jax.jit
            def fp_chunk(params, token, cache, pos):
                def step(carry, _):
                    token, cache, pos = carry
                    logits, cache = M.forward(params, token, cfg,
                                              positions=pos[:, None],
                                              kv_cache=cache, cache_position=pos,
                                              kv_valid_len=pos + 1)
                    nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
                    return (nxt, cache, pos + 1), nxt[:, 0]
                (tok, cache, pos), tokens = jax.lax.scan(
                    step, (token, cache, pos), None, length=n)
                return jnp.transpose(tokens, (1, 0))
            return fp_chunk

        def fp_cache_fn():
            return M.KVCache(k=jnp.zeros(kvshape, jnp.bfloat16),
                             v=jnp.zeros(kvshape, jnp.bfloat16))

        try:
            fp_tps = time_decode_loop(make_fp_chunk, params, fp_cache_fn, 1,
                                      cfg.vocab_size)
            results["bf16_decode_tok_s"] = fp_tps
            log(f"bf16 FP decode: {fp_tps:.1f} tok/s (bs=1, S={seq}, marginal)")
        except Exception as e:
            log(f"bf16 baseline failed: {e!r}")   # emit() falls back
        emit(results, fp_tps)
        fp_params, fp_cfg = params, cfg   # reused by the wonly section

    # --- 3. batched decode, bs=32 (large-batch serving: chunked KV staging
    # + windowed scatter; the W8 kernel row is the staged W8 pack path).
    # Kernel rows run the relaxed serving policy; the plain "w8a8" row stays
    # STRICT like its bs=1 twin (key continuity with the r01/r02 records) ---
    B32 = 32
    for bname, bw, bup, brelax, bhb in (("w4a8_kernel", 4, True, True, 4),
                                        ("w8a8_kernel", 8, True, True, 8),
                                        ("w8a8", 8, False, False, 16)):
        if (bup and on_cpu) or past_budget():
            continue
        try:
            decode_row(bname, bw, bup, brelax, bhb, B=B32)
        except Exception as e:
            log(f"{bname} bs=32 failed: {e!r}")

    # --- 4. batched decode, bs=8 ------------------------------------------
    B8 = 8
    for bname, bw, bup, brelax, bhb in (("w4a8_kernel", 4, True, True, 4),
                                        ("w8a8_kernel", 8, True, True, 8),
                                        ("w8a8", 8, False, False, 16)):
        if bup and on_cpu:
            continue
        if past_budget() and not bs8_only:
            continue
        try:
            decode_row(bname, bw, bup, brelax, bhb, B=B8)
        except Exception as e:
            log(f"{bname} bs=8 failed: {e!r}")

    # --- 4b. batch-scaling tail: bs=64 (B*T=64, gate-exact) and bs=128 (one
    # full MXU tile of rows — decode_loop raises the stacked-kernel gate to
    # 128 for T=1 steps; measured +27% over the XLA fallback) ---
    for bname, bw, bhb, Bb in (("w4a8_kernel", 4, 4, 64),
                               ("w8a8_kernel", 8, 8, 64),
                               ("w4a8_kernel", 4, 4, 128),
                               ("w8a8_kernel", 8, 8, 128)):
        if on_cpu or past_budget():
            continue
        try:
            decode_row(bname, bw, True, True, bhb, B=Bb)
        except Exception as e:
            log(f"{bname} bs={Bb} failed: {e!r}")

    # --- 4c. int4 KV cache (pack --kv_bits 4): the KV-read-dominated
    # serving shapes through the fused kv4 attention kernel over the
    # hd-major nibble-packed cache (ops/pallas_kv4.py; round-5 record:
    # +15/+29/+37% over the int8 cache at bs=32/64/128) ---
    for bname, bw, bhb, Bb in (("w4a8_kv4", 4, 4, 32),
                               ("w4a8_kv4", 4, 4, 64),
                               ("w4a8_kv4", 4, 4, 128),
                               ("w8a8_kv4", 8, 8, 128)):
        if on_cpu or past_budget():
            continue
        try:
            decode_row(bname, bw, True, True, bhb, B=Bb, kv_bits=4)
        except Exception as e:
            log(f"{bname} bs={Bb} failed: {e!r}")

    if bs8_only:
        log(json.dumps(results))
        tag, best = max(results.items(), key=lambda kv: kv[1])
        print(json.dumps({
            "metric": f"tinyllama1.1b_{tag}",
            "value": round(best, 2), "unit": "tok/s",
            "vs_baseline": None}))
        return

    # --- 5. remaining bs=1 configs: W8A8 strict/relaxed/kernel, W4 h16 ----
    for name, w_bits, use_pallas, relax, head_bits in (
            ("w4a8_pallas", 4, True, True, 16),
            ("w8a8_kernel_h8", 8, True, True, 8),
            ("w8a8_fast_h8", 8, False, True, 8),
            ("w8a8_fast", 8, False, True, 16),
            ("w8a8", 8, False, False, 16)):
        if use_pallas and on_cpu:
            continue
        if head_bits == 4 and on_cpu:
            continue   # W4 head decode path uses the Pallas fused-unpack kernel
        if past_budget():
            log(f"budget: skipping {name}")
            continue
        try:
            decode_row(name, w_bits, use_pallas, relax, head_bits)
        except Exception as e:
            log(f"{name} failed: {e!r}")

    # --- 6. end-to-end serving throughput: the continuous batcher with
    # chunked prefill + chunked decode ticks, refills included. Marginal
    # method (mnt=32 vs 96 after a warmup run) cancels compiles and the
    # relay's fixed per-dispatch overhead ---
    if (not past_budget() or smoke) \
            and os.environ.get("MQTPU_BENCH_SERVE") != "0":
        try:
            from mobilequant_tpu.runtime.serve import ContinuousBatcher
            from mobilequant_tpu.runtime.sampling import SamplerConfig
            packed, cfgS, policyS, ecfgS = _build_packed_tinyllama(w_bits=8)
            policyS = relax_16bit(policyS)
            rngS = np.random.default_rng(0)
            lens = rngS.integers(seq // 8, seq // 2, 24)
            prompts = [rngS.integers(0, cfgS.vocab_size,
                                     (int(l),)).astype(np.int32)
                       for l in lens]
            cd = 8 if smoke else 32

            cb = ContinuousBatcher(
                packed, cfgS, policyS, ecfgS, batch_slots=8,
                chunk_prefill=max(seq // 8, 16), chunk_decode=cd,
                sampler=SamplerConfig(greedy=True))

            def run_serve(mnt, salt):
                # ONE batcher instance across runs — its jitted closures
                # compile once (a fresh instance per run would re-trace
                # everything and the marginal difference = compile noise)
                for p in prompts:
                    cb.submit((p + salt) % cfgS.vocab_size, mnt)
                t0 = time.perf_counter()
                out = cb.run()
                n = sum(len(v) for v in out.values())
                cb.done.clear()
                return n, time.perf_counter() - t0

            run_serve(8 if smoke else 32, 0)                  # warmup/compile
            # ABSOLUTE end-to-end throughput of the long run (prefills,
            # refills and syncs included) — a lower bound the relay cannot
            # inflate; marginal pairs on ~1 s batcher runs exceed even the
            # in-graph ceiling under relay hiccups (26.7k observed at bs=32
            # W8 whose raw rate is ~12k), so the marginal is only a logged
            # diagnostic here
            n1, t1 = run_serve(8 if smoke else 32, 1)
            n2, t2 = run_serve(16 if smoke else 96, 2)
            abs_tps = n2 / t2
            marg = (n2 - n1) / (t2 - t1) \
                if t2 - t1 > (n2 - n1) * 20e-6 else None
            results["serve_tok_s"] = abs_tps
            log(f"serving (batcher, 8 slots, chunked): {abs_tps:.1f} tok/s "
                f"absolute ({n2} tokens in {t2:.2f}s; marginal diagnostic "
                f"{marg and round(marg, 1)})")
            emit(results, fp_tps)
            del packed
        except Exception as e:
            log(f"serve bench failed: {e!r}")

    # --- 6b. speculative decoding END TO END: the in-graph loop
    # (generate_speculative_fast — draft, verify, accept/reject all inside
    # one lax.scan dispatch), marginal over ROUND count so the relay's fixed
    # per-dispatch overhead cancels. Realized tok/s = d(tokens)/d(time).
    # Caveat (BENCHMARKS.md): synthetic weights collapse to repetitive greedy
    # chains, so acceptance is an upper bound, not a text statistic. ---
    if not past_budget() and (not on_cpu or smoke):
        try:
            from mobilequant_tpu.runtime.generate import Generator
            packed, cfg, policy, ecfg = _build_packed_tinyllama(
                w_bits=8 if on_cpu else 4, head_bits=16 if on_cpu else 4)
            policy = relax_16bit(policy)
            gen = Generator(packed, cfg, policy, ecfg)
            rngK = np.random.default_rng(7)
            motif = rngK.integers(0, cfg.vocab_size, 16)
            prompt = np.tile(motif, 4)[None, :].astype(np.int32)   # 64 toks
            K = 4
            R1, R2 = (2, 4) if smoke else (16, 48)

            def spec_row(layers, tag):
                chunk, sd_ = gen._spec_chunk_fn(K, R1, layers)
                chunk2, _ = gen._spec_chunk_fn(K, R2, layers)
                dpk = sd_.packed if sd_ is not None else None

                def run(fn, salt):
                    p = (prompt + salt) % cfg.vocab_size
                    st = gen._spec_state(p, K, layers)
                    np.asarray(st[0])              # force prefill
                    t0 = time.perf_counter()
                    out = fn(packed, dpk, *st)
                    nem = int(np.asarray(out[5]))
                    return nem, time.perf_counter() - t0

                run(chunk, 1); run(chunk2, 2)      # compile + warm
                n1, d1 = run(chunk, 3)
                n2, d2 = run(chunk2, 4)
                if d2 - d1 <= (n2 - n1) * 20e-6:
                    log(f"speculative ({tag}): degenerate marginal "
                        f"(d1={d1:.3f}s d2={d2:.3f}s), row dropped")
                    return
                tps = (n2 - n1) / (d2 - d1)
                tpv = (n2 - n1) / (R2 - R1)
                results[f"spec_{tag}_decode_tok_s"] = tps
                results[f"spec_{tag}_tok_per_verify"] = tpv
                log(f"speculative ({tag}, k={K}, in-graph rounds): "
                    f"{tps:.1f} tok/s realized, {tpv:.2f} tok/verify "
                    "(synthetic-weight acceptance = upper bound)")
                emit(results, fp_tps)

            spec_row(0, "lookup")
            spec_row(4, "selfdraft4")
            del packed, gen
        except Exception as e:
            log(f"speculative bench failed: {e!r}")

    # --- 7. weight-only W4A16 (g128) decode: fp activations/KV, stacked-
    # kernel dequant (runtime/wonly.py — the reference's auto_gptq mode) ---
    if not past_budget():
        from mobilequant_tpu.runtime import wonly as WW
        w_gs = 16 if smoke else 128
        ecfg_w = E.EngineConfig(model=fp_cfg, max_seq_len=seq, act_bits=16,
                                act_dtype=jnp.bfloat16)
        wonly_pallas = not on_cpu

        def make_wonly_chunk(n):
            @jax.jit
            def chunk(packed, token, cache, pos):
                toks, _, _ = WW.decode_loop(packed, token, cache, pos, n,
                                            fp_cfg, None,
                                            use_pallas=wonly_pallas)
                return toks
            return chunk

        for w_tag, w_hb in (("w4a16", 16), ("w4a16_h4", 4)):
            if w_hb == 4 and on_cpu and not smoke:
                continue
            if past_budget():
                continue
            wpacked = WW.pack_weight_only(fp_params, fp_cfg,
                                          WW.default_weight_cfg(4, w_gs),
                                          act_dtype=jnp.bfloat16,
                                          head_bits=w_hb)
            try:
                w_tps = time_decode_loop(make_wonly_chunk, wpacked,
                                         lambda: WW.init_kv_cache(ecfg_w, 1),
                                         1, fp_cfg.vocab_size)
                results[f"{w_tag}_decode_tok_s"] = w_tps
                log(f"{w_tag} weight-only decode: {w_tps:.1f} tok/s "
                    f"(bs=1, S={seq}, marginal)")
                emit(results, fp_tps)
            except Exception as e:   # first on-chip Mosaic compile of the
                log(f"{w_tag} weight-only bench failed: {e!r}")
                # grouped dequant kernel happens here — never fatal
            del wpacked
    del fp_params

    # --- 8. prefill throughput, marginal method with per-rep token fetch
    # (block_until_ready alone is NOT enough: the relay lazily skips chained
    # work whose results are never fetched — np.asarray each rep forces it) ---
    packed, cfg, policy8, ecfg = _build_packed_tinyllama(w_bits=8)
    policy_pf = relax_16bit(policy8)
    r1, r2 = (2, 4) if smoke else (2, 8)

    def measure_prefill(use_pallas, last_only=False, B=1):
        # last_only: generation-style prefill (engine logits_at) — the lm_head
        # runs on the final prompt row only, as Generator/batcher prefill do.
        # The chain stays forced: the last row's logits depend on every prompt
        # position through attention, and the sampled token perturbs the whole
        # next prompt.
        Tq = seq // B              # batched prefill: same total tokens/pass

        @jax.jit
        def step(p, t):
            la = jnp.full((B,), Tq - 1, jnp.int32) if last_only else None
            logits, _ = E.forward(p, t, cfg, policy_pf, use_pallas=use_pallas,
                                  logits_at=la)
            return jnp.argmax(logits, -1).astype(jnp.int32)   # (B,Tq) | (B,1)

        rng = np.random.default_rng(0)

        def run(reps, salt):
            t = jnp.asarray((rng.integers(0, cfg.vocab_size, (B, Tq)) + salt)
                            % cfg.vocab_size, jnp.int32)
            t0 = time.perf_counter()
            for _ in range(reps):
                t = (t + step(packed, t) + 1) % cfg.vocab_size   # broadcasts
                np.asarray(t)                      # fetch forces the chain
            return time.perf_counter() - t0

        run(r1, 0)                                 # compile + warm
        d1, d2 = run(r1, 1), run(r2, 2)
        return (r2 - r1) * B * Tq / max(d2 - d1, 1e-9)

    if not past_budget(150):
        pf_tps = measure_prefill(False)
        results["w8a8_prefill_tok_s"] = pf_tps
        log(f"W8A8 prefill (xla): {pf_tps:.0f} tok/s (bs=1, T={seq}, marginal)")
        emit(results, fp_tps)
    if not on_cpu:
        # production W8 prefill = attn + w13+gate epilogue kernel (15.05 vs
        # 17.2 ms/pass device-side); the plain-attn row stays for continuity
        for key, mode, kwargs, note in (
                ("w8a8_prefill_pallas_tok_s", "attn", {}, "fused attn kernel"),
                ("w8a8_prefill_gatek_tok_s", "attn_gatek", {},
                 "attn + w13-gate kernels"),
                ("w8a8_prefill_gen_tok_s", "attn_gatek", {"last_only": True},
                 "gatek, last-only head"),
                ("w8a8_prefill_bs4_tok_s", "attn_gatek",
                 {"last_only": True, "B": 4}, f"B=4, T={seq // 4}, gatek"),
                ("w8a8_prefill_bs8_tok_s", "attn_gatek",
                 {"last_only": True, "B": 8}, f"B=8, T={seq // 8}, gatek")):
            if past_budget(150):
                continue
            try:
                v = measure_prefill(mode, **kwargs)
                results[key] = v
                log(f"W8A8 prefill ({note}): {v:.0f} tok/s")
                emit(results, fp_tps)
            except Exception as e:
                log(f"prefill {key} failed: {e!r}")
        # W4 prefill (stacked fused-unpack matmul kernels + attn kernel)
        del packed
        if not past_budget(150):
            packed, cfg, policy4, ecfg = _build_packed_tinyllama(w_bits=4)
            policy_pf = relax_16bit(policy4)
            # W4 prefill: stacked matmul kernels + the w13+gate epilogue
            # kernel (16.41 vs 17.2 ms/pass device-side — BENCHMARKS.md)
            for key, kwargs, note in (
                    ("w4a8_prefill_tok_s", {}, f"stacked kernels, bs=1 T={seq}"),
                    ("w4a8_prefill_bs4_tok_s", {"last_only": True, "B": 4},
                     f"B=4, T={seq // 4}"),
                    ("w4a8_prefill_bs8_tok_s", {"last_only": True, "B": 8},
                     f"B=8, T={seq // 8}")):
                if past_budget(150):
                    continue
                try:
                    v = measure_prefill("attn_gatek", **kwargs)
                    results[key] = v
                    log(f"W4A8 prefill ({note}): {v:.0f} tok/s")
                    emit(results, fp_tps)
                except Exception as e:
                    log(f"prefill {key} failed: {e!r}")

    # --- 8b. production-scale models (MQTPU_BENCH_BIG=1): Llama-2-7B /
    # Llama-3-8B W4A8+h4 on one chip — ~90-95% of the HBM floor
    # (BENCHMARKS.md "production-scale models") ---
    if os.environ.get("MQTPU_BENCH_BIG") == "1" and not smoke and not on_cpu:
        for mname in ("llama-2-7b", "llama-3-8b"):
            try:
                packed, bcfg, bpolicy, becfg = _build_base(
                    max_seq_len=seq, w_bits=4, model_name=mname, head_bits=4)
                bpolicy = relax_16bit(bpolicy)

                def make_chunk_b(n, _c=bcfg, _p=bpolicy):
                    @jax.jit
                    def chunk(packed, token, cache, pos):
                        toks, _, _ = E.decode_loop(packed, token, cache, pos,
                                                   n, _c, _p, use_pallas=True)
                        return toks
                    return chunk

                o1, o2 = N1, N2
                try:
                    N1, N2 = 32, 160      # big-model steps are ~6 ms each
                    tps = time_decode_loop(make_chunk_b, packed,
                                           lambda: E.init_kv_cache(becfg, 1),
                                           1, bcfg.vocab_size)
                finally:
                    N1, N2 = o1, o2
                results[f"{mname}_w4a8_h4_decode_tok_s"] = tps
                log(f"{mname} w4a8+h4 decode: {tps:.1f} tok/s (bs=1, marginal)")
                emit(results, fp_tps)
                del packed
            except Exception as e:
                log(f"{mname} failed: {e!r}")

    # --- 9. other reference target models (gemma-2b, stablelm-2-1.6b):
    # gated — each adds several minutes of compile+run ---
    if os.environ.get("MQTPU_BENCH_ALL_MODELS") == "1" and not smoke:
        for mname in ("stablelm-2-1.6b", "gemma-2b"):
            mcfg = get_config(mname)
            for mtag, mw, mup, mhb in (("w8a8", 8, False, 16),
                                       ("w8a8_h8", 8, False, 8),
                                       ("w8a8_kernel_h8", 8, True, 8),
                                       ("w4a8_h4", 4, True, 4)):
                packed, _, mpolicy, mecfg = _build_base(
                    max_seq_len=seq, w_bits=mw, model_name=mname, head_bits=mhb)
                mpolicy = relax_16bit(mpolicy)

                def make_chunk_m(n, _c=mcfg, _p=mpolicy, _up=mup):
                    @jax.jit
                    def chunk(packed, token, cache, pos):
                        toks, _, _ = E.decode_loop(packed, token, cache, pos, n,
                                                   _c, _p, use_pallas=_up)
                        return toks
                    return chunk

                tps = time_decode_loop(make_chunk_m, packed,
                                       lambda: E.init_kv_cache(mecfg, 1), 1,
                                       mcfg.vocab_size)
                results[f"{mname}_{mtag}_decode_tok_s"] = tps
                log(f"{mname} {mtag} decode: {tps:.1f} tok/s (bs=1, marginal)")
                del packed

            params = M.init_params(mcfg, jax.random.PRNGKey(0),
                                   dtype=jnp.bfloat16)
            kvshape_m = (mcfg.num_layers, 1, seq, mcfg.num_kv_heads,
                         mcfg.head_dim_)

            def make_fp_m(n, _c=mcfg):
                @jax.jit
                def fp_chunk(params, token, cache, pos):
                    def step(carry, _):
                        token, cache, pos = carry
                        logits, cache = M.forward(
                            params, token, _c, positions=pos[:, None],
                            kv_cache=cache, cache_position=pos,
                            kv_valid_len=pos + 1)
                        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
                        return (nxt, cache, pos + 1), nxt[:, 0]
                    (tok, cache, pos), tokens = jax.lax.scan(
                        step, (token, cache, pos), None, length=n)
                    return jnp.transpose(tokens, (1, 0))
                return fp_chunk

            fp_m = time_decode_loop(
                make_fp_m, params,
                lambda: M.KVCache(k=jnp.zeros(kvshape_m, jnp.bfloat16),
                                  v=jnp.zeros(kvshape_m, jnp.bfloat16)),
                1, mcfg.vocab_size)
            results[f"{mname}_bf16_decode_tok_s"] = fp_m
            log(f"{mname} bf16 decode: {fp_m:.1f} tok/s "
                f"(W8A8 is {results[f'{mname}_w8a8_decode_tok_s']/fp_m:.2f}x)")
            del params

    log(f"total wall: {time.perf_counter() - T_START:.0f}s")
    log(json.dumps(results))
    emit(results, fp_tps)


if __name__ == "__main__":
    main()
