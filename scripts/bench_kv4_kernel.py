"""Isolate the kv4 attention kernel's per-call cost on chip.

Times three things with in-graph chained scans (marginal n1/n2):
  1. kv4_decode_attention alone (one layer's packed slabs);
  2. the XLA int8 decode-light attention (int_matmul_qk + partwise + pv)
     at the same shapes — the incumbent it must beat;
  3. optionally the same with MQTPU_KV4_STUB=1 (kernel body's dots/exp
     replaced by cheap ops) to separate DMA from compute.

Usage: python scripts/bench_kv4_kernel.py [--batch 32] [--seq 1024]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--n1", type=int, default=50)
    ap.add_argument("--n2", type=int, default=200)
    ap.add_argument("--cs", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mobilequant_tpu.ops import qops
    import mobilequant_tpu.ops.pallas_kv4 as PKV
    from mobilequant_tpu.runtime.engine import (_decode_light_attention,
                                                _kv4_decode_light_attention)
    from mobilequant_tpu.quant.policy import (default_policy, kv_bits_policy,
                                              relax_16bit)
    from mobilequant_tpu.quant.quantizer import QuantConfig
    from mobilequant_tpu.models import get_config

    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    print(f"devices: {jax.devices()}", flush=True)

    cfg = get_config("tinyllama-1.1b")
    B, S, cs = args.batch, args.seq, args.cs
    Hq, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim_
    G = Hq // Hkv
    policy = relax_16bit(kv_bits_policy(
        default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8)),
        4))
    rng = np.random.default_rng(0)
    k4 = (rng.integers(0, 16, (1, B, Hkv, S, hd)).astype(np.int16)
          - 128).astype(np.int8)
    v4 = (rng.integers(0, 16, (1, B, Hkv, S, hd)).astype(np.int16)
          - 128).astype(np.int8)
    kp = qops.pack_kv_s(jnp.asarray(k4))
    vp = qops.pack_kv_s(jnp.asarray(v4))
    k8 = jnp.asarray(rng.integers(-128, 128, (B, Hkv, S, hd)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-128, 128, (B, Hkv, S, hd)), jnp.int8)
    sk = jnp.asarray((rng.integers(0, 16, (1, B, Hkv, cs, hd)).astype(np.int16)
                      - 128).astype(np.int8))
    sv = jnp.asarray(np.asarray(sk))
    kn = jnp.asarray((rng.integers(0, 16, (B, Hkv, 1, hd)).astype(np.int16)
                      - 128).astype(np.int8))
    vn = jnp.asarray(np.asarray(kn))
    pos = jnp.full((B,), S - cs - 2, jnp.int32)
    kcs = qops.kv_colsums_packed(kp)
    kcs8 = jnp.sum(k8.astype(jnp.int32), axis=-1).astype(jnp.float32)
    q0 = jnp.asarray(rng.integers(-128, 128, (B, 1, Hq, hd)), jnp.int8)
    lr = {"self_attn.qk_bmm":
          {"input": {"scale": jnp.float32(0.05), "offset": jnp.float32(128.)},
           "input2": {"scale": jnp.float32(0.2), "offset": jnp.float32(7.0)},
           "output": {"scale": jnp.float32(1.), "offset": jnp.float32(0.)}},
          "self_attn.pv_bmm":
          {"input": {"scale": jnp.float32(1.), "offset": jnp.float32(0.)},
           "input2": {"scale": jnp.float32(0.2), "offset": jnp.float32(8.0)},
           "output": {"scale": jnp.float32(1.), "offset": jnp.float32(0.)}}}
    qk, pv = lr["self_attn.qk_bmm"], lr["self_attn.pv_bmm"]
    from mobilequant_tpu.runtime.engine import _attn_meta
    meta = _attn_meta(lr, policy, cfg)

    def requant(att):
        # att (B,1,Hq*hd) → next step's q8 (chains data; relay can't skip)
        return qops.quantize_act(att.reshape(B, 1, Hq, hd),
                                 jnp.float32(0.05), jnp.float32(128.0))

    def make_loop(body):
        import functools

        @functools.partial(jax.jit, static_argnums=(1,))
        def run(q0, n):
            def step(q, _):
                att = body(q)
                return requant(att), ()
            q, _ = jax.lax.scan(step, q0, None, length=n)
            return q
        return run

    def kern_body(q):
        att = PKV.kv4_decode_attention(
            q.reshape(B, Hq, hd), kp, vp,
            kcs.reshape(1, B, Hkv, 1, S), sk, sv,
            kn.reshape(B, Hkv, hd), vn.reshape(B, Hkv, hd),
            meta, pos, jnp.int32(cs - 1), jnp.int32(0),
            num_q_heads=Hq, num_kv_heads=Hkv, head_dim=hd)
        return att.reshape(B, 1, Hq * hd)

    def xla8_body(q):
        return _decode_light_attention(
            q, kn, vn, k8, v8, qk, pv, policy, pos, cfg, B, Hkv, G, hd,
            ks=sk[0], vs=sv[0], staged_len=jnp.int32(cs - 1), k_colsum=kcs8)

    def xla4_body(q):
        return _kv4_decode_light_attention(
            q, kn, vn, kp[0], vp[0], qk, pv, policy, pos, cfg, B, Hkv, G, hd,
            ks=sk[0], vs=sv[0], staged_len=jnp.int32(cs - 1), k_colsum=kcs[0])

    for name, body in (("kv4_kernel", kern_body), ("xla_int8", xla8_body),
                       ("xla_kv4_unpack", xla4_body)):
        try:
            run = make_loop(body)
            r1 = run(q0, args.n1); np.asarray(r1)
            r2 = run(q0, args.n2); np.asarray(r2)
            t0 = time.perf_counter(); np.asarray(run(q0, args.n1))
            d1 = time.perf_counter() - t0
            t0 = time.perf_counter(); np.asarray(run(q0, args.n2))
            d2 = time.perf_counter() - t0
            us = 1e6 * (d2 - d1) / (args.n2 - args.n1)
            print(f"{name}: {us:.1f} us/call (B={B}, S={S})", flush=True)
        except Exception as e:
            print(f"{name} failed: {e!r}", flush=True)


if __name__ == "__main__":
    main()
