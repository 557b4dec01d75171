"""Capture + aggregate a jax.profiler trace of one decode chunk.

The round-1 perf work lives and dies by this tool (BENCHMARKS.md): it showed the
big int8 matmuls already stream at speed-of-light and located the remaining time
in the small-fusion tail, the KV-cache scan copies, and the lm_head matmul.

Usage (on the TPU):
  PYTHONPATH=. python scripts/trace_decode.py [use_pallas_mode] [w_bits] [batch]
  PYTHONPATH=. python scripts/trace_decode.py --analyze /tmp/jax-trace-decode
"""

import collections
import functools
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")

TRACE_DIR = "/tmp/jax-trace-decode"


def capture(mode: str = "", w_bits: int = 8, n_steps: int = 32, batch: int = 1,
            model: str = "tinyllama-1.1b", head_bits: int = 16):
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build_packed_tinyllama
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.quant.policy import relax_16bit

    kv_bits = int(os.environ.get("MQTPU_TRACE_KV_BITS", "8"))
    packed, cfg, policy, ecfg = _build_packed_tinyllama(max_seq_len=1024,
                                                        w_bits=w_bits,
                                                        model_name=model,
                                                        head_bits=head_bits,
                                                        kv_bits=kv_bits)
    policy = relax_16bit(policy)

    @functools.partial(jax.jit, static_argnums=(4,))
    def chunk(packed, token, cache, pos, n):
        toks, _, _ = E.decode_loop(packed, token, cache, pos, n, cfg, policy,
                                   use_pallas=mode if mode else False)
        return toks

    def run(seed):
        t = chunk(packed, jnp.full((batch, 1), seed, jnp.int32),
                  E.init_kv_cache(ecfg, batch), jnp.zeros((batch,), jnp.int32),
                  n_steps)
        np.asarray(t)

    run(3)  # compile
    import jax.profiler
    jax.profiler.start_trace(TRACE_DIR)
    run(4)
    jax.profiler.stop_trace()
    print(f"trace written to {TRACE_DIR}")
    analyze(TRACE_DIR, n_steps)


def analyze(trace_dir: str, n_steps: int = 32, top: int = 25,
            csv_out: str = None):
    """Aggregate the device trace into a per-op table; also write it as CSV —
    the qnn_profiling.csv analogue (ref device/export.py:419-424,
    device/utils.py:583-635) so per-op perf regressions diff between rounds.
    csv_out default: PROFILE_decode.csv next to the trace's caller cwd
    (bench/driver copies it beside BENCH_rN.json)."""
    f = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(f) as fh:
        data = json.load(fh)
    agg = collections.defaultdict(lambda: [0.0, 0])
    pids = {e["pid"]: e["args"].get("name", "") for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = [p for p, n in pids.items() if "TPU" in n]
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e["pid"] in tpu_pids:
            agg[e["name"]][0] += e.get("dur", 0)
            agg[e["name"]][1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"top device ops ({f}):")
    for n, (d, c) in rows[:top]:
        per = f" ({d/c:.1f} us/call)" if c > 1 else ""
        print(f"  {d/1e3:9.2f} ms x{c:5d}{per}  {n[:80]}")
    layer_ops = [(n, d, c) for n, (d, c) in agg.items() if c % (n_steps * 2) == 0
                 and c >= n_steps]
    tail = sum(d for _, d, _ in layer_ops)
    print(f"\nsum of per-layer ops: {tail/n_steps/1e3:.2f} ms/step")

    csv_out = csv_out or os.environ.get("MQTPU_PROFILE_CSV",
                                        "PROFILE_decode.csv")
    total = sum(d for d, _ in agg.values())
    with open(csv_out, "w") as fh:
        fh.write("op,total_ms,calls,us_per_call,us_per_step,pct\n")
        for n, (d, c) in rows:
            fh.write(f"\"{n.replace(chr(34), '')[:120]}\",{d/1e3:.3f},{c},"
                     f"{d/max(c,1):.2f},{d/n_steps:.2f},"
                     f"{100.0*d/max(total,1e-9):.2f}\n")
    print(f"per-op profile -> {csv_out} ({len(rows)} ops, "
          f"{total/n_steps/1e3:.2f} ms/step device total)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--analyze":
        analyze(sys.argv[2])
    else:
        capture(sys.argv[1] if len(sys.argv) > 1 else "",
                int(sys.argv[2]) if len(sys.argv) > 2 else 8,
                batch=int(sys.argv[3]) if len(sys.argv) > 3 else 1,
                model=sys.argv[4] if len(sys.argv) > 4 else "tinyllama-1.1b",
                head_bits=int(sys.argv[5]) if len(sys.argv) > 5 else 16)
