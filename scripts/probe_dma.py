"""DMA microprobes for the bs=32 chunk-kernel skeleton gap (VERDICT r4 #3).

The all-compute-stubbed chunk kernel holds 1.86 ms vs the 1.39 ms DMA ideal,
invariant under grid size, block sizes, staggering, and tile layout
(BENCHMARKS.md round 4). Hypotheses, killed in order with minimal Pallas
stream kernels (each grid step fetches blocks and consumes ONE row per
operand — the DMA still streams the full block, the VPU cost is nil):

  1. operand-count serialization: same bytes/step as 1/2/4/8/16 operands;
  2. step-size / double-buffer depth: same total bytes as 2/4/8/16 MB steps;
  3. KV-slab striding: the (L,B,Hkv,S,hd) cache layout tiled
     (1,Bblk,Hkv,S,hd) vs the same bytes from a contiguous 2-D array.

Each probe reports effective GB/s from a marginal pair over grid length
(g1/g2), which cancels dispatch overhead; HBM arrays cycle via modular
index maps so allocation stays bounded.

Usage: python scripts/probe_dma.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    print(f"devices: {jax.devices()}", flush=True)

    C = 16                     # cycling depth (distinct HBM blocks per op)

    def stream_probe(seed, n_ops, step_bytes, g):
        """n_ops operands, step_bytes total per grid step, g grid steps.
        seed (1,128) f32 CHANGES PER CALL — the relay memoizes identical
        (program, args) dispatches, so every probe must take a fresh
        operand (BENCHMARKS.md measurement methodology)."""
        per_op = step_bytes // n_ops
        R = per_op // 128
        arrs = [jnp.ones((C, R, 128), jnp.int8) for _ in range(n_ops)]

        def kern(seed_ref, *refs):
            out_ref = refs[-1]
            j = pl.program_id(0)

            @pl.when(j == 0)
            def _():
                out_ref[...] = seed_ref[...]

            acc = out_ref[...]
            for r in refs[:-1]:
                acc = acc + r[0, 0:1, :].astype(jnp.float32)
            out_ref[...] = acc

        in_specs = [pl.BlockSpec((1, 128), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM)]
        in_specs += [pl.BlockSpec((1, R, 128), lambda j: (j % C, 0, 0),
                                  memory_space=pltpu.VMEM)
                     for _ in range(n_ops)]
        return pl.pallas_call(
            kern, grid=(g,), in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 128), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
        )(seed, *arrs)

    def kv_probe(seed, contiguous, g):
        """Stream (1,Bblk,Hkv,S,hd) KV-slab tiles (2 MB) from the real cache
        layout vs the same bytes from a contiguous 2-D array."""
        L, B, Hkv, S, hd = 22, 32, 4, 1024, 64
        Bblk = 8
        nab = B // Bblk
        if contiguous:
            R = (Bblk * Hkv * S * hd) // 128
            arr = jnp.ones((L * nab, R, 128), jnp.int8)

            def kern(s_ref, a_ref, out_ref):
                j = pl.program_id(0)

                @pl.when(j == 0)
                def _():
                    out_ref[...] = s_ref[...]

                out_ref[...] = out_ref[...] \
                    + a_ref[0, 0:1, :].astype(jnp.float32)

            return pl.pallas_call(
                kern, grid=(g,),
                in_specs=[pl.BlockSpec((1, 128), lambda j: (0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((1, R, 128),
                                       lambda j: (j % (L * nab), 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 128), lambda j: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=127 * 1024 * 1024),
            )(seed, arr)
        arr = jnp.ones((L, B, Hkv, S, hd), jnp.int8)

        def kern(s_ref, a_ref, out_ref):
            j = pl.program_id(0)

            @pl.when(j == 0)
            def _():
                out_ref[...] = s_ref[...]

            out_ref[...] = out_ref[...] \
                + a_ref[0, 0, 0, 0:1, :64].astype(jnp.float32).sum(
                    axis=1, keepdims=True)

        return pl.pallas_call(
            kern, grid=(g,),
            in_specs=[pl.BlockSpec((1, 128), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(
                (1, Bblk, Hkv, S, hd),
                lambda j: (j % L, (j // L) % nab, 0, 0, 0),
                memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
        )(seed, arr)

    seeds = iter(range(1, 1000))

    def fresh_seed():
        return jnp.full((1, 128), float(next(seeds)), jnp.float32)

    def marginal(fn, g1, g2, step_bytes):
        f1 = jax.jit(functools.partial(fn, g=g1))
        f2 = jax.jit(functools.partial(fn, g=g2))
        np.asarray(f1(fresh_seed())); np.asarray(f2(fresh_seed()))
        vals = []
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(f1(fresh_seed()))
            d1 = time.perf_counter() - t0
            t0 = time.perf_counter(); np.asarray(f2(fresh_seed()))
            d2 = time.perf_counter() - t0
            if d2 > d1:
                vals.append(1e6 * (d2 - d1) / (g2 - g1))
        if not vals:
            return float("nan"), float("nan")
        us = float(np.median(vals))
        return us, step_bytes / 1e9 / (us / 1e6)

    MB = 1024 * 1024
    print("== operand count (8 MB/step) ==", flush=True)
    for n_ops in (1, 2, 4, 8, 16):
        us, gbs = marginal(lambda s, g, n=n_ops: stream_probe(s, n, 8 * MB, g),
                           2048, 16384, 8 * MB)
        print(f"  {n_ops:2d} ops: {us:7.1f} us/step  {gbs:6.1f} GB/s",
              flush=True)

    print("== step size (4 ops) ==", flush=True)
    for mb in (2, 4, 8, 16):
        us, gbs = marginal(lambda s, g, m=mb: stream_probe(s, 4, m * MB, g),
                           2048, 16384, mb * MB)
        print(f"  {mb:2d} MB/step: {us:7.1f} us/step  {gbs:6.1f} GB/s",
              flush=True)

    print("== KV-slab striding (2 MB tiles) ==", flush=True)
    for contig in (True, False):
        us, gbs = marginal(lambda s, g, c=contig: kv_probe(s, c, g),
                           1760, 14080, 2 * MB)
        tag = "contiguous" if contig else "strided (L,B,Hkv,S,hd)"
        print(f"  {tag}: {us:7.1f} us/step  {gbs:6.1f} GB/s", flush=True)

    # contiguous-chunk-size sweep: a (1, R, w) column block of a (C, R, W)
    # array reads R chunks of w bytes at stride W — the shape of every
    # stacked weight kernel's column block (w13 at TFh=2816 reads 2.8 KB
    # chunks) and of multi-sequence KV tiles (256 KB chunks)
    def stride_probe(seed, w, W, g):
        R = MB // w
        arr = jnp.ones((4, R, W), jnp.int8)
        ncol = W // w

        def kern(s_ref, a_ref, out_ref):
            j = pl.program_id(0)

            @pl.when(j == 0)
            def _():
                out_ref[...] = s_ref[...]

            out_ref[...] = out_ref[...] \
                + a_ref[0, 0:1, :128].astype(jnp.float32)

        return pl.pallas_call(
            kern, grid=(g,),
            in_specs=[pl.BlockSpec((1, 128), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, R, w),
                                   lambda j: (j % 4, 0, (j // 4) % ncol),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
        )(seed, arr)

    print("== strided chunk size (1 MB blocks, 4 KB row stride) ==",
          flush=True)
    for w in (128, 512, 1024, 2048, 4096):
        tag = "full row (contiguous)" if w == 4096 else f"{w} B chunks"
        us, gbs = marginal(lambda s, g, w_=w: stride_probe(s, w_, 4096, g),
                           4096, 32768, MB)
        print(f"  {tag}: {us:7.1f} us/step  {gbs:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
