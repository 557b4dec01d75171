"""Block-width sweep for w4a8_matmul_stacked at real layer shapes.

Times a chained fori_loop of kernel dispatches (layer index cycles, activation
chains through the output so the relay cannot memoize or skip). Marginal
method: n=64 vs n=320.

Usage: python scripts/ktune.py [model]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.ops import pallas_matmul as PM

    model = sys.argv[1] if len(sys.argv) > 1 else "tinyllama-1.1b"
    cfg = get_config(model)
    D, F = cfg.hidden_size, cfg.intermediate_size
    qd = cfg.num_heads * cfg.head_dim_
    kvd = cfg.num_kv_heads * cfg.head_dim_
    L = cfg.num_layers

    shapes = {
        "qkv": (D, qd + 2 * kvd),
        "o": (qd, D),
        "w13": (D, 2 * F),
        "w2": (F, D),
    }
    print(f"devices: {jax.devices()}  model={model} L={L}", file=sys.stderr)

    rng = np.random.default_rng(0)
    for name, (K, N) in shapes.items():
        K2 = K // 2
        wq = jnp.asarray(rng.integers(0, 255, (L, K2, N)), jnp.int8)
        scale = jnp.full((L, 1, N), 0.01, jnp.float32)
        offset = jnp.full((L, 1, N), 7.0, jnp.float32)
        colsum = jnp.asarray(rng.normal(size=(L, N)) * 100, jnp.float32)
        bias = jnp.zeros((L, N), jnp.float32)
        sol_us = K2 * N / 640e3  # bytes / (640 GB/s) in us

        cands = [tn for tn in (512, 1024, 2048, 4096, 8192)
                 if N % tn == 0 and K2 * tn <= 16 * 2 ** 20]
        if not cands:
            cands = [max(tn for tn in (128, 256) if N % tn == 0)]
        for tn in cands:
            def chunk_fn(n, _tn=tn):
                @jax.jit
                def chunk(wq, scale, offset, colsum, bias, x0):
                    def body(i, x):
                        li = jnp.mod(i, L)
                        y = PM.w4a8_matmul_stacked(
                            x, wq, scale, offset, colsum, bias,
                            jnp.float32(0.02), jnp.float32(128.0), li,
                            block_n=_tn)
                        # chain: fold the output back into an int8 (1,K) act
                        v = jnp.sum(y.reshape(-1)[:K][None, :] * 1e-6,
                                    keepdims=True)
                        xn = jnp.clip(jnp.round(v + x.astype(jnp.float32)),
                                      0, 255).astype(jnp.int8)
                        return xn
                    return jax.lax.fori_loop(0, n, body, x0)
                return chunk

            def run(n, fn, seed):
                x0 = jnp.asarray(rng.integers(seed, seed + 100, (1, K)), jnp.int8)
                t0 = time.perf_counter()
                out = fn(wq, scale, offset, colsum, bias, x0)
                np.asarray(out)
                return time.perf_counter() - t0

            n1, n2 = 1024, 8192
            f1, f2 = chunk_fn(n1), chunk_fn(n2)
            run(n1, f1, 1); run(n2, f2, 2)
            d1 = run(n1, f1, 3)
            d2 = run(n2, f2, 4)
            us = (d2 - d1) / (n2 - n1) * 1e6
            print(f"{name:4s} K={K:5d} N={N:5d} tn={tn:5d}: {us:7.1f} us/call "
                  f"(SOL {sol_us:5.1f})", flush=True)


if __name__ == "__main__":
    main()
