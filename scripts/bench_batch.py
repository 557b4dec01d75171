"""Batch-scaling decode bench: tok/s vs batch size on the chunked-staging path.

Produces the BENCHMARKS.md batch-curve rows (bs ∈ {16,32,64,128,...}) with the
marginal method (n1/n2 in-graph chunks, fresh cache + distinct first token per
run so the relay cannot memoize). The stacked MLP-block/otail kernels admit
rows up to `--btmax` (KernelConfig.stacked_bt_max; 128 = one full MXU tile of
rows); above that the engine falls back to the XLA mlp path.

Usage (real chip; scripts insert "." so no PYTHONPATH override needed):
  python scripts/bench_batch.py --batches 64,128 --wbits 4,8 --btmax 128
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

_counter = [0]


def time_marginal(make_chunk, packed, cache_fn, batch, vocab, n1, n2):
    import jax.numpy as jnp

    def run(n, fn):
        _counter[0] += 1
        tok = jnp.full((batch, 1), _counter[0] % vocab, jnp.int32)
        t0 = time.perf_counter()
        toks = fn(packed, tok, cache_fn(), jnp.full((batch,), 0, jnp.int32))
        np.asarray(toks)
        return time.perf_counter() - t0

    f1, f2 = make_chunk(n1), make_chunk(n2)
    run(n1, f1); run(n2, f2)            # compile + first exec
    # same guard as bench.py time_decode_loop: a physical step cannot be
    # faster than ~20 µs, so d2<=d1 means relay variance swallowed the
    # marginal — retry the pair, raise rather than print a 1e11-scale row
    for attempt in range(3):
        d1 = run(n1, f1)
        d2 = run(n2, f2)
        if d2 - d1 > (n2 - n1) * 20e-6:
            return (n2 - n1) / (d2 - d1)
        print(f"  marginal degenerate (d1={d1:.3f}s d2={d2:.3f}s), retry "
              f"{attempt + 1}/3", flush=True)
    raise RuntimeError(f"non-physical marginal after 3 tries "
                       f"(d1={d1:.3f}s d2={d2:.3f}s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,128")
    ap.add_argument("--wbits", default="4,8")
    ap.add_argument("--kv_bits", type=int, choices=(4, 8), default=8,
                    help="4 = nibble-packed int4 KV cache (the fused kv4 "
                         "attention kernel path; ops/pallas_kv4.py)")
    ap.add_argument("--btmax", type=int, default=128)
    ap.add_argument("--n1", type=int, default=64)
    ap.add_argument("--n2", type=int, default=320)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--xla", action="store_true",
                    help="also measure the pure-XLA engine at each point")
    ap.add_argument("--otail", action="store_true",
                    help="also measure with the attention-tail kernel "
                         "(o-proj+resid_add_1 folded into the MLP block)")
    ap.add_argument("--chunk", action="store_true",
                    help="also measure the batched whole-model chunk kernel "
                         "(ops/pallas_chunk.py)")
    ap.add_argument("--chunk_only", action="store_true",
                    help="measure ONLY the chunk kernel row")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build_packed_tinyllama
    from mobilequant_tpu.quant.policy import relax_16bit
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.runtime.kernel_config import KernelConfig

    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:
        print(f"compile cache unavailable: {e!r}", flush=True)

    print(f"devices: {jax.devices()}", flush=True)
    for wb in [int(w) for w in args.wbits.split(",")]:
        hb = 4 if wb == 4 else 8
        packed, cfg, policy, ecfg = _build_packed_tinyllama(
            max_seq_len=args.seq, w_bits=wb, head_bits=hb,
            kv_bits=args.kv_bits)
        policy = relax_16bit(policy)
        kcs = [("kernel", KernelConfig.default().replace(
            stacked_bt_max=args.btmax))]
        if args.chunk_only:
            kcs = []
        if args.chunk or args.chunk_only:
            kcs.append(("chunk", KernelConfig.default().replace(
                stacked_bt_max=args.btmax, chunk_kernel=True)))
        if args.otail:
            kcs.append(("otail", KernelConfig.default().replace(
                stacked_bt_max=args.btmax, otail_kernel=True)))
        if args.xla:
            kcs.append(("xla", False))
        for B in [int(b) for b in args.batches.split(",")]:
            for tag, kc in kcs:
                def make_chunk(n, _kc=kc):
                    @jax.jit
                    def chunk(packed, token, cache, pos):
                        toks, _, _ = E.decode_loop(packed, token, cache, pos,
                                                   n, cfg, policy,
                                                   use_pallas=_kc)
                        return toks
                    return chunk

                # dispatch spy: a "chunk" row where the kernel never engaged
                # (e.g. a gate mismatch) would silently measure the XLA
                # fallback and mislabel it — flag it instead
                spy_calls = [0]
                spy_restore = None
                if tag == "chunk":
                    import mobilequant_tpu.ops.pallas_chunk as PC
                    _orig = PC.fused_model_w4_chunk

                    def _spy(*a, _orig=_orig, **kw):
                        spy_calls[0] += 1
                        return _orig(*a, **kw)

                    PC.fused_model_w4_chunk = _spy
                    spy_restore = (PC, _orig)
                try:
                    tps = time_marginal(
                        make_chunk, packed, lambda: E.init_kv_cache(ecfg, B),
                        B, cfg.vocab_size, args.n1, args.n2) * B
                    kvtag = "+kv4" if args.kv_bits == 4 else ""
                    warn = ""
                    if tag == "chunk" and spy_calls[0] == 0:
                        warn = " [WARN: chunk kernel DID NOT DISPATCH — " \
                               "this row is the XLA/staged fallback]"
                    print(f"W{wb}A8+h{hb}{kvtag} bs={B} "
                          f"[{tag}, btmax={args.btmax}]: "
                          f"{tps:.1f} tok/s total "
                          f"({1000.0 * B / tps:.3f} ms/step, marginal "
                          f"{args.n1}/{args.n2}){warn}", flush=True)
                except Exception as e:
                    print(f"W{wb} bs={B} [{tag}] failed: {e!r}", flush=True)
                finally:
                    if spy_restore is not None:
                        spy_restore[0].fused_model_w4_chunk = spy_restore[1]
        del packed


if __name__ == "__main__":
    main()
