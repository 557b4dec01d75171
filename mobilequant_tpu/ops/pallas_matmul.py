"""Pallas TPU kernels: fused integer matmul with affine requantization.

Why a kernel at all (and why only here): W8A8 decode is already HBM-bandwidth-
bound and XLA streams int8 weights at speed-of-light, so a Pallas rewrite of the
8-bit matmul buys nothing. The 4-bit path is different: XLA has no fused
nibble-unpack — `unpack_nibbles` materializes the full int8 weight in HBM, making
W4 *slower* than W8. This kernel streams the packed bytes HBM→VMEM (half the W8
traffic), sign-extends nibbles on the VPU, and feeds the MXU int8×int8→int32,
fusing the affine corrections and bias — W4A8 decode at its true 0.5× bandwidth.

Contract matches ops/qops.int_linear exactly (tested in interpret mode against
the fake-quant closed form): out = s_x·s_w·[acc − o'_x·colsum − o_w·rowsum_x
+ K·o'_x·o_w] + bias.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w4a8_kernel(x_ref, wp_ref, scale_ref, offset_ref, colsum_ref, bias_ref,
                 meta_ref, out_ref):
    """Grid: (N // TN,). Blocks: x (M,K) VMEM; wp (K//2, TN) VMEM block-packed;
    scale/offset/colsum/bias (TN,)-ish VMEM; meta (x_scale, x_offset) SMEM."""
    x = x_ref[:]                                     # (M, K) int8
    wp = wp_ref[:]                                   # (K//2, TN) int8 packed
    # UNSIGNED block nibbles (qops.pack_nibbles): low nibbles are rows [0,K/2),
    # high nibbles rows [K/2,K); the 4-bit zero-point absorbs the sign, so
    # unpack is 3 bit ops and the matmul is two MXU dots — no shuffles, no
    # widening, no selects. (Mosaic lacks i8 shl, so shift via i32 only here.)
    lo = wp & 0x0F
    hi = ((wp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
    K2, TN = wp.shape

    acc = jax.lax.dot_general(
        x[:, :K2], lo, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc = acc + jax.lax.dot_general(
        x[:, K2:], hi, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc = acc.astype(jnp.float32)

    x_scale = meta_ref[0]
    ox = meta_ref[1] - 128.0
    K = x.shape[1]
    rowsum = jnp.sum(x.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
    sw = scale_ref[:]                                # (1, TN)
    ow = offset_ref[:]
    acc = acc - ox * colsum_ref[:] - ow * rowsum + K * ox * ow
    out_ref[:] = acc * (x_scale * sw) + bias_ref[:]


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def w4a8_matmul(x_q: jax.Array, wq_packed: jax.Array, w_scale, w_offset,
                colsum, bias, x_scale, x_offset, *, block_n: int = 512,
                interpret: bool = False):
    """x_q (M,K) int8 (shifted-uint8 acts) × nibble-packed W4 (K/2,N) → fp32 (M,N).

    w_scale/w_offset: per-channel (1,N) or per-tensor scalars (broadcast here).
    """
    M, K = x_q.shape
    K2, N = wq_packed.shape
    assert K2 * 2 == K, (K2, K)
    TN = min(block_n, N)
    assert N % TN == 0, (N, TN)

    w_scale = jnp.broadcast_to(jnp.reshape(w_scale, (1, -1)), (1, N)).astype(jnp.float32)
    w_offset = jnp.broadcast_to(jnp.reshape(w_offset, (1, -1)), (1, N)).astype(jnp.float32)
    colsum = jnp.reshape(colsum, (1, N)).astype(jnp.float32)
    bias = jnp.reshape(bias, (1, N)).astype(jnp.float32)
    meta = jnp.stack([jnp.asarray(x_scale, jnp.float32),
                      jnp.asarray(x_offset, jnp.float32)])

    grid = (N // TN,)
    return pl.pallas_call(
        _w4a8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((M, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=M * K + K2 * N + M * N * 4 + 4 * N * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_q, wq_packed, w_scale, w_offset, colsum, bias, meta)


def _w8a8_kernel(x_ref, w_ref, scale_ref, offset_ref, colsum_ref, bias_ref,
                 meta_ref, out_ref):
    """Same contract as _w4a8_kernel without the nibble unpack."""
    x = x_ref[:]
    w = w_ref[:]
    acc = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    x_scale = meta_ref[0]
    ox = meta_ref[1] - 128.0
    K = x.shape[1]
    rowsum = jnp.sum(x.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
    sw = scale_ref[:]
    ow = offset_ref[:]
    acc = acc - ox * colsum_ref[:] - ow * rowsum + K * ox * ow
    out_ref[:] = acc * (x_scale * sw) + bias_ref[:]


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def w8a8_matmul(x_q: jax.Array, wq: jax.Array, w_scale, w_offset,
                colsum, bias, x_scale, x_offset, *, block_n: int = 512,
                interpret: bool = False):
    """x_q (M,K) int8 × W8 (K,N) int8 → fp32 (M,N), fused affine requant."""
    M, K = x_q.shape
    K_, N = wq.shape
    assert K_ == K, (K_, K)
    TN = min(block_n, N)
    assert N % TN == 0, (N, TN)
    w_scale = jnp.broadcast_to(jnp.reshape(w_scale, (1, -1)), (1, N)).astype(jnp.float32)
    w_offset = jnp.broadcast_to(jnp.reshape(w_offset, (1, -1)), (1, N)).astype(jnp.float32)
    colsum = jnp.reshape(colsum, (1, N)).astype(jnp.float32)
    bias = jnp.reshape(bias, (1, N)).astype(jnp.float32)
    meta = jnp.stack([jnp.asarray(x_scale, jnp.float32),
                      jnp.asarray(x_offset, jnp.float32)])
    return pl.pallas_call(
        _w8a8_kernel,
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((M, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=M * K + K * N + M * N * 4 + 4 * N * 4,
            transcendentals=0),
        interpret=interpret,
    )(x_q, wq, w_scale, w_offset, colsum, bias, meta)


def _w4a16_kernel(x_ref, wp_ref, scale_ref, offset_ref, bias_ref, out_ref):
    """Weight-only: fp activations × W4 dequantized in VMEM (no HBM round trip
    for the unpacked weights — the point of the kernel)."""
    x = x_ref[:].astype(jnp.float32)                 # (M, K)
    wp = wp_ref[:]
    K2, TN = wp_ref.shape
    # unsigned block nibbles: dequantize each half, two dots (no shuffles)
    lo = ((wp & 0x0F).astype(jnp.float32) - offset_ref[:]) * scale_ref[:]
    hi = (((wp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.float32)
          - offset_ref[:]) * scale_ref[:]
    acc = jax.lax.dot_general(
        x[:, :K2], lo, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(
        x[:, K2:], hi, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] = acc + bias_ref[:]


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def w4a16_matmul(x: jax.Array, wq_packed: jax.Array, w_scale, w_offset, bias,
                 *, block_n: int = 512, interpret: bool = False):
    """fp (M,K) × nibble-packed W4 (K/2,N) with in-VMEM dequant → fp32 (M,N)."""
    M, K = x.shape
    K2, N = wq_packed.shape
    assert K2 * 2 == K, (K2, K)
    TN = min(block_n, N)
    assert N % TN == 0, (N, TN)
    w_scale = jnp.broadcast_to(jnp.reshape(w_scale, (1, -1)), (1, N)).astype(jnp.float32)
    w_offset = jnp.broadcast_to(jnp.reshape(w_offset, (1, -1)), (1, N)).astype(jnp.float32)
    bias = jnp.reshape(bias, (1, N)).astype(jnp.float32)
    return pl.pallas_call(
        _w4a16_kernel,
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=M * K * x.dtype.itemsize + K2 * N + M * N * 4,
            transcendentals=0),
        interpret=interpret,
    )(x, wq_packed, w_scale, w_offset, bias)


def _w4a8_kernel_stacked(idx_ref, x_ref, wp_ref, scale_ref, offset_ref,
                         colsum_ref, bias_ref, meta_ref, out_ref):
    """Stacked-layer variant: per-layer operands carry a leading L axis and the
    layer is selected by the scalar-prefetch index in the BlockSpec index maps,
    so the DMA streams blocks straight out of the (L, K2, N) stack in HBM.

    Why this exists: inside the engine's layer scan, XLA materializes each
    layer's dynamic-slice before a Pallas custom call (it cannot fuse a slice
    into the call the way it fuses slices into its own ops) — a full HBM→HBM
    copy of the weights per layer per step. Traced on Gemma-2B W4 decode:
    102.6 µs/layer of dynamic-slice_bitcast_fusion vs the kernel's own 49.5 µs
    — the copies cost more than the matmuls (BENCHMARKS.md)."""
    del idx_ref  # consumed by the index maps
    x = x_ref[:]
    wp = wp_ref[0]
    lo = wp & 0x0F
    hi = ((wp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
    K2, TN = wp.shape

    acc = jax.lax.dot_general(
        x[:, :K2], lo, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc = acc + jax.lax.dot_general(
        x[:, K2:], hi, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc = acc.astype(jnp.float32)

    x_scale = meta_ref[0]
    ox = meta_ref[1] - 128.0
    K = x.shape[1]
    rowsum = jnp.sum(x.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
    sw = scale_ref[0]
    ow = offset_ref[0]
    acc = acc - ox * colsum_ref[0] - ow * rowsum + K * ox * ow
    out_ref[:] = acc * (x_scale * sw) + bias_ref[0]


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def w4a8_matmul_stacked(x_q, wq_L, scale_L, offset_L, colsum_L, bias_L,
                        x_scale, x_offset, layer_idx, *, block_n: int = 512,
                        interpret: bool = False):
    """x_q (M,K) int8 × layer `layer_idx` of a stacked nibble-packed W4 stack
    wq_L (L,K2,N) → fp32 (M,N). scale/offset (L,1,N) or (L,); colsum/bias (L,N).
    Same contract as w4a8_matmul on the selected layer."""
    M, K = x_q.shape
    L, K2, N = wq_L.shape
    assert K2 * 2 == K, (K2, K)
    TN = min(block_n, N)
    assert N % TN == 0, (N, TN)

    def chan(v):
        return jnp.broadcast_to(jnp.reshape(v, (L, 1, -1)),
                                (L, 1, N)).astype(jnp.float32)

    meta = jnp.stack([jnp.asarray(x_scale, jnp.float32),
                      jnp.asarray(x_offset, jnp.float32)])
    idx = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j, idx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K2, TN), lambda j, idx: (idx[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN), lambda j, idx: (idx[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN), lambda j, idx: (idx[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN), lambda j, idx: (idx[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN), lambda j, idx: (idx[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((M, TN), lambda j, idx: (0, j),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _w4a8_kernel_stacked,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=M * K + K2 * N + M * N * 4 + 4 * N * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(idx, x_q, wq_L, chan(scale_L), chan(offset_L), chan(colsum_L),
      chan(bias_L), meta)


def int_linear_pallas_stacked(x_q, x_scale, x_offset, spack: dict, layer_idx,
                              *, interpret: bool = False):
    """qops.int_linear on layer `layer_idx` of the engine's stacked per-layer
    pack {wq (L,K2,N), scale, offset, colsum, bias} — no per-layer slice/copy."""
    lead = x_q.shape[:-1]
    K = x_q.shape[-1]
    x2 = x_q.reshape(-1, K)
    L, K2, N = spack["wq"].shape
    out = w4a8_matmul_stacked(x2, spack["wq"], spack["scale"], spack["offset"],
                              spack["colsum"], spack["bias"], x_scale, x_offset,
                              layer_idx, block_n=_pick_block_n(K2, N),
                              interpret=interpret)
    return out.reshape(*lead, N)


def _pick_block_n(K2: int, N: int) -> int:
    """Largest power-of-two-ish block width that divides N, with a weight
    block ≤ 4 MB and at least 2 grid steps. Fitted to a TPU-v5e sweep at M=1
    over all TinyLlama/Gemma projection shapes (scripts/ktune.py, 2026-08-17):
    a single-block grid exposes the whole DMA (o_proj 6.5 vs 3.8 µs), blocks
    over ~4 MB pipeline poorly (Gemma w2 tn=2048 42.4 vs tn=512 30.7 µs), and
    within those bounds wider is mildly better (fixed ~0.1 µs/grid-step).
    Every shape lands within ~1 µs of its measured-best width."""
    cap = max(128, min(4096, (4 * 1024 * 1024) // max(K2, 1), N // 2))
    for tn in (4096, 2048, 1024, 512, 256, 128):
        if tn <= cap and N % tn == 0:
            return tn
    return min(N, 128)


def int_linear_pallas(x_q, x_scale, x_offset, pack: dict, bias, *,
                      interpret: bool = False):
    """Drop-in for qops.int_linear on nibble-packed 4-bit weights.
    Flattens leading dims to one M axis."""
    lead = x_q.shape[:-1]
    K = x_q.shape[-1]
    x2 = x_q.reshape(-1, K)
    K2, N = pack["wq"].shape
    out = w4a8_matmul(x2, pack["wq"], pack["scale"], pack["offset"],
                      pack["colsum"], bias if bias is not None else jnp.zeros((N,)),
                      x_scale, x_offset, block_n=_pick_block_n(K2, N),
                      interpret=interpret)
    return out.reshape(*lead, N)


# ---------------------------------------------------------------------------
# Weight-only (W4A16 / W8A16) stacked-layer kernels
# ---------------------------------------------------------------------------

def _wonly_kernel_stacked(idx_ref, x_ref, wp_ref, scale_ref, offset_ref,
                          bias_ref, out_ref, *, wbits: int):
    """Weight-only stacked-layer matmul: fp activations × layer-selected integer
    weights dequantized in VMEM (per-channel or grouped g128-style scales) —
    the decode path of the reference's auto_gptq real-W4 kernels
    (ref qmodule.py:803-829) without the HBM round trip for either the
    unpacked nibbles or the dequantized fp weights.

    Blocks: x (M,K) fp32; wp (1,K2|K,TN); scale/offset (1,G,TN) — G==1 is
    per-channel (or broadcast per-tensor), G>1 dequantizes per input-axis
    group (rows expand in VMEM via broadcast, never in HBM); bias (1,1,TN)."""
    del idx_ref  # consumed by the index maps
    x = x_ref[:].astype(jnp.float32)                  # (M, K)
    wp = wp_ref[0]                                    # (K2|K, TN)
    sc = scale_ref[0]                                 # (G, TN)
    of = offset_ref[0]
    G = sc.shape[0]
    Kr, TN = wp.shape

    def expand(v):
        """(Gh, TN) per-group rows → (Kr, TN) per-input rows."""
        Gh = v.shape[0]
        gs = Kr // Gh
        return jnp.broadcast_to(v[:, None, :], (Gh, gs, TN)).reshape(Kr, TN)

    if wbits == 4:
        # UNSIGNED block nibbles (qops.pack_nibbles): low nibbles = input rows
        # [0,K2), high nibbles = rows [K2,K). Grouped scales split the same
        # way: groups [0,G/2) dequantize lo, [G/2,G) dequantize hi.
        # Mosaic has no direct uint8->f32 cast — widen through int32
        lo = (wp & 0x0F).astype(jnp.int32).astype(jnp.float32)
        hi = ((wp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.float32)
        if G == 1:
            slo = shi = sc
            olo = ohi = of
        else:
            G2 = G // 2
            slo, shi = expand(sc[:G2]), expand(sc[G2:])
            olo, ohi = expand(of[:G2]), expand(of[G2:])
        acc = jax.lax.dot_general(
            x[:, :Kr], (lo - olo) * slo,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            x[:, Kr:], (hi - ohi) * shi,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        s = sc if G == 1 else expand(sc)
        o = of if G == 1 else expand(of)
        acc = jax.lax.dot_general(
            x, (wp.astype(jnp.int32).astype(jnp.float32) - o) * s,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[:] = acc + bias_ref[0]


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def wonly_matmul_stacked(x, wq_L, scale_L, offset_L, bias_L, layer_idx, *,
                         block_n: int = 512, interpret: bool = False):
    """fp (M,K) × layer `layer_idx` of a stacked weight-only pack → fp32 (M,N).

    wq_L: (L,K/2,N) nibble-packed W4 or (L,K,N) int8 W8 (shape-inferred).
    scale_L/offset_L: (L,), (L,1,N) or grouped (L,G,1,N). bias_L: (L,N).
    Same contract as qops.weight_only_linear on the selected layer; exists for
    the same reason as w4a8_matmul_stacked — inside the decode layer scan the
    weights must stream straight out of the HBM stack (scalar-prefetch layer
    select), not through a materialized per-layer slice."""
    M, K = x.shape
    L, Kr, N = wq_L.shape
    assert Kr == K or Kr * 2 == K, (Kr, K)
    wbits = 4 if Kr * 2 == K else 8
    TN = min(block_n, N)
    assert N % TN == 0, (N, TN)

    def norm_go(v):
        v = jnp.asarray(v, jnp.float32)
        if v.ndim == 1:                    # per-tensor (L,)
            v = v[:, None, None]
        elif v.ndim == 4:                  # grouped (L,G,1,N)
            v = v[:, :, 0, :]
        G_ = v.shape[1]
        return jnp.broadcast_to(v, (L, G_, N))

    scale_L = norm_go(scale_L)
    offset_L = norm_go(offset_L)
    G = scale_L.shape[1]
    assert G == 1 or (wbits == 8) or (G % 2 == 0), \
        "grouped W4 needs an even group count (groups split at the nibble half)"
    assert G == 1 or Kr % max(G // (2 if wbits == 4 else 1), 1) == 0, (Kr, G)
    # (L, 1, N): a (1, TN) block on a 2D (L, N) array violates Mosaic's
    # block-shape rule (second-to-last block dim must be 8-divisible or the
    # full dim); the singleton middle axis makes the trailing block dims
    # (1, TN) match the array's (1, N) — same trick as the w4a8 stacked chan()
    bias_L = jnp.asarray(bias_L, jnp.float32)[:, None, :]

    idx = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // TN,),
        in_specs=[
            pl.BlockSpec((M, K), lambda j, idx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kr, TN), lambda j, idx: (idx[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, TN), lambda j, idx: (idx[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, TN), lambda j, idx: (idx[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TN), lambda j, idx: (idx[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, TN), lambda j, idx: (0, j),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_wonly_kernel_stacked, wbits=wbits),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=M * K * 4 + Kr * N + M * N * 4 + 2 * G * N * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(idx, x.astype(jnp.float32), wq_L, scale_L, offset_L, bias_L)


def wonly_linear_pallas_stacked(x, spack: dict, bias_L, layer_idx, *,
                                interpret: bool = False):
    """qops.weight_only_linear on layer `layer_idx` of a stacked pack
    {wq (L,K2|K,N), scale, offset} + stacked bias (L,N)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    L, Kr, N = spack["wq"].shape
    out = wonly_matmul_stacked(x2, spack["wq"], spack["scale"], spack["offset"],
                               bias_L, layer_idx, block_n=_pick_block_n(Kr, N),
                               interpret=interpret)
    return out.reshape(*lead, N)
