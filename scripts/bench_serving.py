"""Online serving benchmark: HTTP p50/p95 per-request latency + offline
batcher throughput at bs=8/32 (VERDICT r2 item 3).

The HTTP path measures what a client sees: stdlib HTTP front-end ->
InferenceServer scheduler thread -> ContinuousBatcher chunked ticks on the
chip. Requests are issued CONCURRENTLY (the whole point of continuous
batching) from a thread pool; per-request wall latency includes queueing,
chunked prefill, and all decode ticks until the request's last token.

Caveat (BENCHMARKS.md "serving-batcher variance"): every tick is a host
dispatch over the tunneled relay (~25 ms round trip), so absolute numbers are
a lower bound on real-chip serving; the relative bs=8-vs-32 and p50-vs-p95
structure is what transfers.

Usage:  python scripts/bench_serving.py [--slots 8] [--requests 24]
        [--mnt 64] [--http] [--smoke]
"""

import argparse
import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--mnt", type=int, default=64)
    ap.add_argument("--chunk_decode", type=int, default=32)
    ap.add_argument("--spec_k", type=int, default=0,
                    help=">=2: speculative tail ticks in the batcher + a "
                         "single-stream speculative row")
    ap.add_argument("--w_bits", type=int, default=8)
    ap.add_argument("--kv_bits", type=int, choices=(4, 8), default=8,
                    help="4 = int4 KV cache serving (packed slot caches + "
                         "the fused kv4 attention kernel)")
    ap.add_argument("--http", action="store_true", default=True)
    ap.add_argument("--no-http", dest="http", action="store_false")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import jax

    if args.smoke:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    else:
        try:
            import os
            cache_dir = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache")
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception as e:
            print(f"compile cache unavailable: {e!r}", file=sys.stderr)

    from __graft_entry__ import _build_packed_tinyllama
    from mobilequant_tpu.quant.policy import relax_16bit
    from mobilequant_tpu.runtime.sampling import SamplerConfig
    from mobilequant_tpu.runtime.serve import ContinuousBatcher

    model = "test-llama" if args.smoke else "tinyllama-1.1b"
    seq = 64 if args.smoke else 1024
    mnt = 8 if args.smoke else args.mnt
    print(f"devices: {jax.devices()}", flush=True)

    packed, cfg, policy, ecfg = _build_packed_tinyllama(
        max_seq_len=seq, w_bits=args.w_bits, model_name=model,
        head_bits=(4 if args.w_bits == 4 else 16),
        kv_bits=args.kv_bits)
    policy = relax_16bit(policy)
    rng = np.random.default_rng(0)

    def make_prompts(n):
        lens = rng.integers(seq // 8, seq // 2, n)
        return [rng.integers(0, cfg.vocab_size, (int(l),)).astype(np.int32)
                for l in lens]

    prompts = make_prompts(args.requests)

    results = {}

    # --- offline batcher throughput at bs=8 and bs=32 ------------------
    for slots in ((4,) if args.smoke else (8, 32)):
        # enough requests to keep every slot occupied for several waves
        slot_prompts = prompts if len(prompts) >= 3 * slots \
            else make_prompts(3 * slots)
        cb = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=slots,
                               chunk_prefill=max(seq // 8, 16),
                               chunk_decode=args.chunk_decode,
                               sampler=SamplerConfig(greedy=True),
                               spec_k=args.spec_k)

        def run(n_mnt, salt):
            for p in slot_prompts:
                cb.submit((p + salt) % cfg.vocab_size, n_mnt)
            t0 = time.perf_counter()
            out = cb.run()
            n = sum(len(v) for v in out.values())
            cb.done.clear()
            return n, time.perf_counter() - t0

        run(mnt // 2, 0)                              # warmup/compile
        # HEADLINE = absolute end-to-end throughput of the long run (all
        # prefills, refills and syncs included — an honest lower bound the
        # relay cannot inflate). The marginal pair is kept as a secondary
        # diagnostic: on ~1 s runs a single relay hiccup in t1 makes it
        # exceed even the in-graph ceiling (26.7k observed for a bs=32 W8
        # batcher whose raw decode rate is ~12k), so it is reported but
        # never the recorded metric.
        n1, t1 = run(mnt // 2, 1)
        n2, t2 = run(mnt * 2, 2)
        abs_tps = n2 / t2
        results[f"offline_bs{slots}_tok_s"] = round(abs_tps, 1)
        marg = (n2 - n1) / (t2 - t1) if t2 - t1 > (n2 - n1) * 20e-6 else None
        print(f"offline batcher bs={slots}: {abs_tps:.1f} tok/s absolute "
              f"({n2} tokens in {t2:.2f}s incl prefills/refills; marginal "
              f"diagnostic {marg and round(marg, 1)})", flush=True)
        del cb

    # --- single-stream speculative batcher row (spec_k) -----------------
    if args.spec_k >= 2:
        cb = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=1,
                               chunk_prefill=max(seq // 8, 16),
                               chunk_decode=args.chunk_decode,
                               sampler=SamplerConfig(greedy=True),
                               spec_k=args.spec_k)
        # repetitive prompt: lookup drafting's favorable case (the same one
        # the Generator speculative rows use — BENCHMARKS.md speculative);
        # sized to leave the generation budget inside max_seq_len
        rep = np.tile(np.asarray([7, 3, 9, 4, 11, 5], np.int32),
                      max(2, (seq // 2 - 2 * mnt) // 6))

        def run1(n_mnt, salt, nreq=1):
            for i in range(nreq):
                cb.submit((rep + salt + i) % cfg.vocab_size, n_mnt)
            t0 = time.perf_counter()
            out = cb.run()
            n = sum(len(v) for v in out.values())
            cb.done.clear()
            return n, time.perf_counter() - t0

        run1(mnt // 2, 0)                      # warmup/compile
        # several sequential requests: amortizes the fixed relay overhead
        # the ABSOLUTE metric cannot cancel (marginal is banned for batcher
        # rows — see the official-record note)
        n2, t2 = run1(mnt * 2, 1, nreq=8 if not args.smoke else 2)
        results["single_stream_spec_tok_s"] = round(n2 / t2, 1)
        print(f"single-stream spec_k={args.spec_k}: {n2 / t2:.1f} tok/s "
              f"absolute ({n2} tokens in {t2:.2f}s incl prefill)", flush=True)
        del cb

    # --- online HTTP: concurrent requests, per-request wall latency -----
    if args.http:
        import http.client
        import threading

        from mobilequant_tpu.runtime.server import (InferenceServer,
                                                    make_http_server)

        # ONLINE serving: cap the pipeline depth — adaptive (0) maximizes
        # throughput but holds every wave's tokens until one big sync, which
        # is the wrong tradeoff for per-request latency
        cb = ContinuousBatcher(packed, cfg, policy, ecfg,
                               batch_slots=args.slots,
                               chunk_prefill=max(seq // 8, 16),
                               chunk_decode=args.chunk_decode,
                               pipeline_ticks=2,
                               sampler=SamplerConfig(greedy=True))
        srv = InferenceServer(cb)
        srv.start()
        httpd = make_http_server(srv, port=0)     # ephemeral port
        port = httpd.server_address[1]
        th = threading.Thread(target=httpd.serve_forever, daemon=True)
        th.start()

        def request(i, salt):
            ids = ((prompts[i % len(prompts)] + salt)
                   % cfg.vocab_size).tolist()
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            t0 = time.perf_counter()
            conn.request("POST", "/generate", json.dumps(
                {"prompt_ids": ids, "max_new_tokens": mnt}))
            resp = conn.getresponse()
            body = json.loads(resp.read())
            dt = time.perf_counter() - t0
            conn.close()
            assert resp.status == 200, body
            return dt, len(body["completion_ids"])

        # warmup (compiles all tick shapes)
        with ThreadPoolExecutor(max_workers=args.slots) as ex:
            list(ex.map(lambda i: request(i, 0), range(args.slots)))
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=args.slots) as ex:
            lat = list(ex.map(lambda i: request(i, 1), range(args.requests)))
        wall = time.perf_counter() - t0
        import math
        times = sorted(d for d, _ in lat)
        total = sum(n for _, n in lat)
        p50 = times[len(times) // 2]
        # nearest-rank p95 (ceil), never below the median index
        p95 = times[min(len(times) - 1,
                        max(len(times) // 2,
                            math.ceil(0.95 * len(times)) - 1))]
        results["http_p50_s"] = round(p50, 3)
        results["http_p95_s"] = round(p95, 3)
        results["http_tok_s"] = round(total / wall, 1)
        print(f"HTTP online ({args.requests} concurrent reqs, {args.slots} "
              f"slots, mnt={mnt}): p50 {p50:.3f}s p95 {p95:.3f}s, "
              f"{total / wall:.1f} tok/s aggregate", flush=True)
        httpd.shutdown()
        srv.close()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
