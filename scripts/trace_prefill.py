"""Capture + aggregate a jax.profiler trace of one W8A8 prefill pass.

Companion of trace_decode.py for the prompt path: locates where the prefill
gap-to-MXU-peak goes (matmul vs fake-quant elementwise traffic vs attention).

Usage (on the TPU):
  PYTHONPATH=. python scripts/trace_prefill.py [use_pallas_mode] [T] [w_bits] [B]
  PYTHONPATH=. python scripts/trace_prefill.py --analyze /tmp/jax-trace-prefill
"""

import sys

sys.path.insert(0, ".")

from scripts.trace_decode import analyze  # noqa: E402

TRACE_DIR = "/tmp/jax-trace-prefill"


def capture(mode: str = "", T: int = 1024, w_bits: int = 8, B: int = 1,
            head_bits: int = 16):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _build_packed_tinyllama
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.quant.policy import relax_16bit

    packed, cfg, policy, ecfg = _build_packed_tinyllama(max_seq_len=T,
                                                        w_bits=w_bits,
                                                        head_bits=head_bits)
    policy = relax_16bit(policy)

    @jax.jit
    def step(p, t):
        logits, _ = E.forward(p, t, cfg, policy,
                              use_pallas=mode if mode else False)
        return jnp.argmax(logits, -1).astype(jnp.int32)

    rng = np.random.default_rng(0)

    def run(salt):
        t = jnp.asarray((rng.integers(0, cfg.vocab_size, (B, T)) + salt)
                        % cfg.vocab_size, jnp.int32)
        np.asarray(step(packed, t))

    run(0)  # compile
    import jax.profiler
    jax.profiler.start_trace(TRACE_DIR)
    run(1)
    jax.profiler.stop_trace()
    print(f"trace written to {TRACE_DIR}")
    analyze(TRACE_DIR, n_steps=1, top=30)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--analyze":
        analyze(sys.argv[2], n_steps=1, top=30)
    else:
        capture(sys.argv[1] if len(sys.argv) > 1 else "",
                int(sys.argv[2]) if len(sys.argv) > 2 else 1024,
                w_bits=int(sys.argv[3]) if len(sys.argv) > 3 else 8,
                B=int(sys.argv[4]) if len(sys.argv) > 4 else 1)
