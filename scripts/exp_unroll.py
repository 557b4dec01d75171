"""One-off experiment: does full layer-unroll (no scan => no dynamic-slice
copies feeding the Pallas W4 kernels) recover the Gemma W4A8 projection gap?

Usage: python scripts/exp_unroll.py [model] [w_bits] [head_bits] [unroll...]
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax
    from __graft_entry__ import _build_packed_tinyllama as build
    from mobilequant_tpu.quant.policy import relax_16bit
    from mobilequant_tpu.runtime import engine as E
    from bench import time_decode_loop

    model = sys.argv[1] if len(sys.argv) > 1 else "gemma-2b"
    w_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    head_bits = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    unrolls = [int(u) for u in sys.argv[4:]] or [1, 0]

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    packed, cfg, policy, ecfg = build(w_bits=w_bits, model_name=model,
                                      head_bits=head_bits)
    policy = relax_16bit(policy)

    for u in unrolls:
        uu = cfg.num_layers if u == 0 else u

        def make_chunk(n, _u=uu):
            import jax

            @jax.jit
            def chunk(packed, token, cache, pos):
                toks, _, _ = E.decode_loop(packed, token, cache, pos, n,
                                           cfg, policy, use_pallas=(w_bits == 4),
                                           layer_unroll=_u)
                return toks
            return chunk

        tps = time_decode_loop(make_chunk, packed,
                               lambda: E.init_kv_cache(ecfg, 1), 1,
                               cfg.vocab_size)
        print(f"{model} w{w_bits}h{head_bits} unroll={uu}: {tps:.1f} tok/s",
              flush=True)


if __name__ == "__main__":
    main()
