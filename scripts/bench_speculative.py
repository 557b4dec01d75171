"""On-chip speculative-decoding economics (TinyLlama shapes, synthetic model).

The host-side accept/reject loop makes end-to-end wall-clock through the axon
relay unrepresentative (~25 ms of relay round-trip per dispatch, several
dispatches per round), so this measures the PARTS with the marginal method
and reports the modeled speedup:

  speedup(k, Nd, alpha) = E[tokens/round] / (cost_verify + (k-1)*cost_draft)
  (costs in units of one full decode step; E[tokens/round] from the measured
  acceptance `tokens_per_verify` of an actual generate_speculative run)

Usage: PYTHONPATH=. python scripts/bench_speculative.py [k] [draft_layers]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def marginal(fn, r1=16, r2=48):
    """Marginal per-call cost of a chained jitted step (relay-safe)."""
    def run(reps, salt):
        t = fn(None, salt)
        t0 = time.perf_counter()
        for _ in range(reps):
            t = fn(t, salt)
            np.asarray(t)                         # force the chain
        return time.perf_counter() - t0

    run(r1, 0)                                    # compile + warm
    d1, d2 = run(r1, 1), run(r2, 2)
    return (d2 - d1) / (r2 - r1)


def main(k: int = 4, nd: int = 4):
    from __graft_entry__ import _build_packed_tinyllama
    from mobilequant_tpu.quant.policy import relax_16bit
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.runtime.generate import Generator, SelfDraft

    packed, cfg, policy, ecfg = _build_packed_tinyllama(w_bits=4,
                                                        head_bits=4)
    policy = relax_16bit(policy)
    gen = Generator(packed, cfg, policy, ecfg)
    rng = np.random.default_rng(0)
    V = cfg.vocab_size

    # --- device-side step costs (marginal, chained token feedback) ---
    up = "w4nomodelk"          # the verify/draft T>1 path's kernel set
    cache_full = E.init_kv_cache(ecfg, 1)

    @jax.jit
    def full_step(packed, tok, cache, pos):
        logits, cache = E.forward(packed, tok, cfg, policy,
                                  positions=pos[:, None], kv_cache=cache,
                                  cache_position=pos, kv_valid_len=pos + 1,
                                  use_pallas=True)
        return jnp.argmax(logits[:, 0], -1).astype(jnp.int32), cache

    def mk_chain(step, cache0, T):
        state = {"cache": cache0, "pos": 64}

        def fn(tok, salt):
            if tok is None:
                state["cache"] = jax.tree.map(lambda a: a, cache0)
                state["pos"] = 64
                return jnp.full((1, T), salt % V, jnp.int32)
            out, state["cache"] = step(packed, tok, state["cache"],
                                       jnp.full((1,), state["pos"], jnp.int32))
            state["pos"] += 1
            return (out[:, None] + tok[:, :1] + 1) % V * jnp.ones(
                (1, T), jnp.int32)
        return fn

    c_full = marginal(mk_chain(full_step, cache_full, 1))

    @jax.jit
    def verify_step(packed, toks, cache, pos):
        positions = pos[:, None] + jnp.arange(k)[None, :]
        logits, cache = E.forward(packed, toks, cfg, policy,
                                  positions=positions, kv_cache=cache,
                                  cache_position=pos,
                                  kv_valid_len=pos + k, use_pallas=up)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

    c_verify = marginal(mk_chain(verify_step, E.init_kv_cache(ecfg, 1), k))

    sd = SelfDraft(gen, nd)
    dcache0 = E.init_kv_cache(sd.ecfg, 1)

    @jax.jit
    def draft_step(packed, tok, cache, pos):
        logits, cache = E.forward(sd.packed, tok, sd.cfg, policy,
                                  positions=pos[:, None], kv_cache=cache,
                                  cache_position=pos, kv_valid_len=pos + 1,
                                  use_pallas=up)
        return jnp.argmax(logits[:, 0], -1).astype(jnp.int32), cache

    c_draft = marginal(mk_chain(draft_step, dcache0, 1))

    print(f"full step      : {c_full * 1e3:8.3f} ms")
    print(f"verify (k={k})   : {c_verify * 1e3:8.3f} ms "
          f"({c_verify / c_full:.2f}x step)")
    print(f"draft (Nd={nd})   : {c_draft * 1e3:8.3f} ms "
          f"({c_draft / c_full:.2f}x step)")

    # --- acceptance on an actual run (repetitive + random halves) ---
    for name, prompt in (
            ("repetitive", np.asarray([[7, 3, 9, 4] * 8], np.int32)),
            ("random", rng.integers(0, V, (1, 32)).astype(np.int32))):
        for mode, kw in (("lookup", {}), (f"self{nd}",
                                          {"self_draft_layers": nd})):
            _, st = gen.generate_speculative(prompt, 48, k=k,
                                             return_stats=True, **kw)
            tpv = st["tokens_per_verify"]
            cost = c_verify + (0 if mode == "lookup" else
                               (k - 1) * c_draft)
            model_tps = tpv / max(cost, 1e-9)
            print(f"{name:10s} {mode:8s}: {tpv:.2f} tok/verify -> modeled "
                  f"{model_tps:.0f} tok/s ({model_tps * c_full:.2f}x plain)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4,
         int(sys.argv[2]) if len(sys.argv) > 2 else 4)
