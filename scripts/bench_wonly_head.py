"""One-off: measure the weight-only W4A16 decode with/without the quantized
head on the real chip (marginal 64/320 — see BENCHMARKS.md methodology)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from __graft_entry__ import _build_packed_tinyllama as _unused  # noqa: F401  (env setup)
from mobilequant_tpu.models import get_config
from mobilequant_tpu.models import model as M
from mobilequant_tpu.runtime import engine as E
from mobilequant_tpu.runtime import wonly as WW

N1, N2 = 64, 320
model_name = sys.argv[1] if len(sys.argv) > 1 else "tinyllama-1.1b"
seq = 1024
cfg = get_config(model_name)
params = M.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
ecfg_w = E.EngineConfig(model=cfg, max_seq_len=seq, act_bits=16,
                        act_dtype=jnp.bfloat16)
run_ctr = [0]


def measure(head_bits):
    packed = WW.pack_weight_only(params, cfg, WW.default_weight_cfg(4, 128),
                                 act_dtype=jnp.bfloat16, head_bits=head_bits)

    def make_chunk(n):
        @jax.jit
        def chunk(packed, token, cache, pos):
            toks, _, _ = WW.decode_loop(packed, token, cache, pos, n, cfg,
                                        None, use_pallas=True)
            return toks
        return chunk

    def run(fn):
        run_ctr[0] += 1
        tok = jnp.full((1, 1), run_ctr[0] % cfg.vocab_size, jnp.int32)
        cache = WW.init_kv_cache(ecfg_w, 1)
        t0 = time.perf_counter()
        np.asarray(fn(packed, tok, cache, jnp.zeros((1,), jnp.int32)))
        return time.perf_counter() - t0

    f1, f2 = make_chunk(N1), make_chunk(N2)
    run(f1); run(f2)
    d1, d2 = run(f1), run(f2)
    tps = (N2 - N1) / max(d2 - d1, 1e-9)
    print(f"{model_name} w4a16 head_bits={head_bits}: {tps:.1f} tok/s",
          flush=True)
    return tps


print("devices:", jax.devices(), flush=True)
t16 = measure(16)
t4 = measure(4)
print(f"h4 vs h16: {t4 / t16:.3f}x", flush=True)
