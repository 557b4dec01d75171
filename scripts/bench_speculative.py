"""On-chip speculative-decoding economics (TinyLlama shapes, synthetic model).

The host-side accept/reject loop makes end-to-end wall-clock through the axon
relay unrepresentative (~25 ms of relay round-trip PER DISPATCH — marginal
per-dispatch chaining cancels compiles but not that), so each step kind is
measured as an IN-GRAPH lax.scan loop and differenced over loop LENGTH
(t(n2) − t(n1)) / (n2 − n1) — the same method as bench.py's decode rows.
Modeled speedup:

  speedup(k, Nd, alpha) = tokens_per_verify * c_full / (c_verify + (k-1)*c_draft)
  (tokens_per_verify from an actual generate_speculative run; NOTE the
  synthetic-weight model collapses to repetitive greedy chains, so its
  acceptance is an upper bound, not a text statistic — with real checkpoints
  re-run on real prompts.)

Usage: python scripts/bench_speculative.py [k] [draft_layers]
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def marginal_loop(make, n1=16, n2=48):
    """Device-side per-iteration cost of an in-graph loop: compile both
    lengths, time dispatches with a forced fetch, difference over length."""
    f1, f2 = make(n1), make(n2)

    def run(f, salt):
        out = f(jnp.int32(salt))
        np.asarray(out)
        t0 = time.perf_counter()
        out = f(jnp.int32(salt + 1))
        np.asarray(out)
        return time.perf_counter() - t0

    run(f1, 0), run(f2, 0)                        # compile + warm
    d1 = min(run(f1, 1), run(f1, 3))
    d2 = min(run(f2, 5), run(f2, 7))
    return (d2 - d1) / (n2 - n1)


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

    # --- full decode step: the production in-graph loop ---
    # NB: packed must be a jit ARGUMENT — a closure capture bakes the weights
    # into the HLO as constants and the relay rejects the upload (HTTP 413)
    def mk_full(n):
        @jax.jit
        def loop(p, salt):
            toks, _, _ = E.decode_loop(
                p, jnp.full((1, 1), salt % V, jnp.int32),
                E.init_kv_cache(ecfg, 1), jnp.full((1,), 64, jnp.int32),
                n, cfg, policy, use_pallas=True)
            return toks[:, -1]
        return lambda salt: loop(packed, salt)

    c_full = marginal_loop(mk_full)

    # --- verify step: one T=k forward per iteration, token feedback ---
    up = "w4nomodelk"          # the verify/draft T>1 path's kernel set

    def mk_verify(n):
        @jax.jit
        def loop(p, salt):
            cache0 = E.init_kv_cache(ecfg, 1)

            def step(carry, _):
                toks, cache, pos = carry
                positions = pos[:, None] + jnp.arange(k)[None, :]
                logits, cache = E.forward(p, toks, cfg, policy,
                                          positions=positions, kv_cache=cache,
                                          cache_position=pos,
                                          kv_valid_len=pos + k, use_pallas=up)
                nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                toks = (toks + nxt[:, None] + 1) % V
                return (toks, cache, pos + k), nxt

            (_, _, _), outs = jax.lax.scan(
                step, (jnp.full((1, k), salt % V, jnp.int32), cache0,
                       jnp.full((1,), 8, jnp.int32)), None, length=n)
            return outs[-1]
        return lambda salt: loop(packed, salt)

    c_verify = marginal_loop(mk_verify, 8, 24)    # pos grows k per iter

    # --- draft step: the truncated-layer proposer's T=1 loop ---
    sd = SelfDraft(gen, nd)

    def mk_draft(n):
        @jax.jit
        def loop(p, salt):
            toks, _, _ = E.decode_loop(
                p, jnp.full((1, 1), salt % V, jnp.int32),
                E.init_kv_cache(sd.ecfg, 1), jnp.full((1,), 64, jnp.int32),
                n, sd.cfg, policy, use_pallas=up)
            return toks[:, -1]
        return lambda salt: loop(sd.packed, salt)

    c_draft = marginal_loop(mk_draft)

    print(f"full step      : {c_full * 1e3:8.3f} ms (device-side, in-graph)")
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

    # break-even acceptance for the self-draft: tpv needed to tie plain decode
    be = (c_verify + (k - 1) * c_draft) / c_full
    print(f"break-even tokens/verify: lookup {c_verify / c_full:.2f}, "
          f"self{nd} {be:.2f} (of max {k + 1})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4,
         int(sys.argv[2]) if len(sys.argv) > 2 else 4)
