"""Focused TPU measurement: quantized-lm_head decode configs.

Measures bs=1 marginal decode tok/s for TinyLlama / StableLM-2 / Gemma-2B with
head_bits in {16, 8, 4} (W8A8 relaxed policy; W4A8+Pallas for the 4-bit head).
Usage:  python scripts/bench_head.py [--models tinyllama-1.1b,...]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="tinyllama-1.1b,stablelm-2-1.6b,gemma-2b")
    ap.add_argument("--configs", default="h16,h8,w4h4")
    args = ap.parse_args()

    import jax
    from __graft_entry__ import _build_packed_tinyllama as build
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.quant.policy import relax_16bit
    from mobilequant_tpu.runtime import engine as E
    from bench import time_decode_loop

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    cfgs = {
        "h16": dict(w_bits=8, head_bits=16, use_pallas=False),
        "h8": dict(w_bits=8, head_bits=8, use_pallas=False),
        "h4": dict(w_bits=8, head_bits=4, use_pallas="attnonly_off"),  # W8 + W4 head
        "w4h4": dict(w_bits=4, head_bits=4, use_pallas=True),
    }
    for mname in args.models.split(","):
        mcfg = get_config(mname)
        for tag in args.configs.split(","):
            c = cfgs[tag]
            up = c["use_pallas"]
            if up == "attnonly_off":
                up = "w4"          # engages the Pallas W4-head path only
            packed, _, policy, ecfg = build(max_seq_len=1024, w_bits=c["w_bits"],
                                            model_name=mname,
                                            head_bits=c["head_bits"])
            policy = relax_16bit(policy)

            def make_chunk(n, _c=mcfg, _p=policy, _up=up):
                @jax.jit
                def chunk(packed, token, cache, pos):
                    toks, _, _ = E.decode_loop(packed, token, cache, pos, n,
                                               _c, _p, use_pallas=_up)
                    return toks
                return chunk

            tps = time_decode_loop(make_chunk, packed,
                                   lambda: E.init_kv_cache(ecfg, 1), 1,
                                   mcfg.vocab_size)
            print(f"{mname} {tag}: {tps:.1f} tok/s", flush=True)
            del packed


if __name__ == "__main__":
    main()
