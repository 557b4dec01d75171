"""Fused quantized-MLP megakernel.

The whole gated-MLP block — W1/W3 int8 matmuls with zero-point corrections and
8-bit output fake-quant, the decomposed SiLU (sigmoid fake-quant as input2),
the gate multiply, the W2 input quantization, and the W2 int8 contraction —
runs as ONE Pallas dispatch per layer, streaming w1/w3/w2 tiles HBM→VMEM
exactly once with no HBM round-trips for the (M,F) intermediates.

Motivation (BENCHMARKS.md): at bs=1 decode the engine carries ~1.9 ms/token of
non-streaming time across ~40 XLA fusions/layer; the MLP block is ~60% of the
layer's weights and ops.

Exactness: bit-identical to the engine's XLA path (same fake-quant order as
quant/qmodel.QuantOps) — asserted in tests/test_kernels.py in interpret mode.
The caller applies the final W2 affine correction/scale/bias (per-channel) from
the returned int32 accumulator and g8 row-sums.

meta vector (fp32, SMEM) — every fake-quant entry is a (scale, offset, qmax)
triple where qmax is the clip bound (255 = 8-bit, 65535 = 16-bit) and 0
disables the site (engine._qmax):
  [0] h_scale [1] h_offset                 (MLP-input encoding)
  [2] w1out_s [3] w1out_o [4] w1out_qmax   (mlp.w1 output fq)
  [5] sig_s   [6] sig_o   [7] sig_qmax     (mlp.act_fn input2 fq, silu only)
  [8] actout_s [9] actout_o [10] actout_qmax (mlp.act_fn output fq)
  [11] w3out_s [12] w3out_o [13] w3out_qmax  (mlp.w3 output fq)
  [14] w2in_s [15] w2in_o                  (mlp.w2 input encoding)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

META_LEN = 16


def _fq(x, s, o, qmax):
    """Asymmetric fake-quant with a runtime clip bound; qmax == 0 disables
    (matches quantizer.fake_quant for asymmetric activation configs)."""
    q = jnp.round(x / s) + o
    q = jnp.clip(q, 0.0, qmax)
    return jnp.where(qmax > 0.5, (q - o) * s, x)


def _quant_u8s(x, s, o):
    """fp → shifted-int8 (matches qops.quantize_act)."""
    q = jnp.round(x / s) + o
    return (jnp.clip(q, 0.0, 255.0) - 128.0).astype(jnp.int8)


def _mlp_kernel(meta_ref, h_ref,
                w1_ref, w3_ref, w2_ref,
                s1_ref, o1_ref, c1_ref, b1_ref,
                s3_ref, o3_ref, c3_ref, b3_ref,
                out_ref, rsum_out_ref,
                acc_ref, rsum_ref, *, act_kind: str, has_w3: bool):
    j = pl.program_id(0)
    nj = pl.num_programs(0)
    M, K = h_ref.shape

    h = h_ref[:]
    ox_h = meta_ref[1] - 128.0
    rowsum_h = jnp.sum(h.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)

    def int_mm(w_ref, s_ref, o_ref, c_ref, b_ref):
        acc = jax.lax.dot_general(
            h, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        acc = acc - ox_h * c_ref[:] - o_ref[:] * rowsum_h + K * ox_h * o_ref[:]
        return acc * (meta_ref[0] * s_ref[:]) + b_ref[:]

    g1 = int_mm(w1_ref, s1_ref, o1_ref, c1_ref, b1_ref)      # (M, TF)
    g1 = _fq(g1, meta_ref[2], meta_ref[3], meta_ref[4])

    if act_kind == "silu":
        sig = 1.0 / (1.0 + jnp.exp(-g1))
        sig = _fq(sig, meta_ref[5], meta_ref[6], meta_ref[7])
        act = g1 * sig
    else:  # tanh-approx gelu: 0.5x(1+tanh(√(2/π)(x+0.044715x³)))
        t = 0.7978845608028654 * (g1 + 0.044715 * g1 * g1 * g1)
        act = 0.5 * g1 * (1.0 + jnp.tanh(t))
    act = _fq(act, meta_ref[8], meta_ref[9], meta_ref[10])

    if has_w3:
        g3 = int_mm(w3_ref, s3_ref, o3_ref, c3_ref, b3_ref)
        g3 = _fq(g3, meta_ref[11], meta_ref[12], meta_ref[13])
        act = act * g3

    g8 = _quant_u8s(act, meta_ref[14], meta_ref[15])          # (M, TF) int8

    part = jax.lax.dot_general(
        g8, w2_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                      # (M, N)
    rsum_part = jnp.sum(g8.astype(jnp.int32), axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part
        rsum_ref[:] = rsum_part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part
        rsum_ref[:] = rsum_ref[:] + rsum_part

    @pl.when(j == nj - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(jnp.float32)
        rsum_out_ref[:] = rsum_ref[:].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("act_kind", "block_f", "interpret"))
def fused_mlp(h8: jax.Array, w13: dict, w2: dict, meta: jax.Array,
              act_kind: str = "silu", *, block_f: int = 512,
              interpret: bool = False):
    """h8 (M,K) int8 × fused w13 pack (K, 2F) × w2 pack (F, N).

    Returns (acc (M,N) fp32 = raw Σ g8·w2 int32, g8_rowsum (M,1) fp32); the
    caller applies W2's affine corrections, per-channel scale, and bias.
    """
    M, K = h8.shape
    K2, F2 = w13["wq"].shape
    assert K2 == K, "fused MLP expects 8-bit (unpacked) weights"
    F = F2 // 2
    Fw2, N = w2["wq"].shape
    assert Fw2 == F, (Fw2, F)
    TF = min(block_f, F)
    assert F % TF == 0, (F, TF)

    def seg(arr):
        return jnp.broadcast_to(jnp.reshape(arr, (1, -1)), (1, F2)).astype(jnp.float32)

    s13 = seg(w13["scale"])
    o13 = seg(w13["offset"])
    c13 = jnp.reshape(w13["colsum"], (1, F2)).astype(jnp.float32)
    b13 = jnp.reshape(w13["bias"], (1, F2)).astype(jnp.float32)

    nF = F // TF

    def tile1(j):
        return (0, j)

    def tile3(j):
        return (0, nF + j)

    kernel = functools.partial(_mlp_kernel, act_kind=act_kind, has_w3=True)
    acc, rsum = pl.pallas_call(
        kernel,
        grid=(nF,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                         # meta
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TF), tile1, memory_space=pltpu.VMEM),         # w1
            pl.BlockSpec((K, TF), tile3, memory_space=pltpu.VMEM),         # w3
            pl.BlockSpec((TF, N), lambda j: (j, 0), memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec((1, TF), tile1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), tile1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), tile1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), tile1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), tile3, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((M, N), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, N), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((M, N), jnp.int32),
            pltpu.VMEM((M, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * F2 + 2 * M * F * N,
            bytes_accessed=M * K + K * F2 + F * N + M * N * 4,
            transcendentals=M * F),
        interpret=interpret,
    )(meta, h8, w13["wq"], w13["wq"], w2["wq"],
      s13, o13, c13, b13, s13, o13, c13, b13)
    return acc, rsum


# ---------------------------------------------------------------------------
# Whole-MLP-block kernel: norm + input quantize + MLP + W2 requant + residual
# ---------------------------------------------------------------------------
# extra meta (fp32, SMEM), appended after the base META_LEN entries
# (qmax-encoded fq entries, see module header):
#   [16] ln_in_s [17] ln_in_o [18] ln_in_qmax  (norm input fq16)
#   [19] norm_eps
#   [20] w2out_s [21] w2out_o [22] w2out_qmax  (mlp.w2 output fq16)
#   [23] r2in_s [24] r2in_o [25] r2in_qmax     (resid_add_2 input fq16)
#   [26] r2in2_s [27] r2in2_o [28] r2in2_qmax  (resid_add_2 input2 fq16)
#   [29] r2out_s [30] r2out_o [31] r2out_qmax  (resid_add_2 output fq16)
BLOCK_META_LEN = 32


def _mlp_block_kernel(meta_ref, x_ref, nw_ref, nb_ref,
                      w1_ref, w3_ref, w2_ref,
                      s1_ref, o1_ref, c1_ref, b1_ref,
                      s3_ref, o3_ref, c3_ref, b3_ref,
                      s2_ref, o2_ref, c2_ref, b2_ref,
                      out_ref,
                      acc_ref, rsum_ref, h_ref,
                      *, act_kind: str, norm_kind: str, mm_kind: str = "mxu"):
    j = pl.program_id(0)
    nj = pl.num_programs(0)
    M, K = x_ref.shape

    # norm + input quantization once, at the first grid step (VMEM-resident h)
    @pl.when(j == 0)
    def _():
        x = _fq(x_ref[:], meta_ref[16], meta_ref[17], meta_ref[18])
        if norm_kind == "layernorm":
            mu = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
            y = (x - mu) * jax.lax.rsqrt(var + meta_ref[19])
        else:
            y = x * jax.lax.rsqrt(jnp.mean(x * x, axis=1, keepdims=True)
                                  + meta_ref[19])
        y = y * nw_ref[:] + nb_ref[:]
        h_ref[:] = _quant_u8s(y, meta_ref[0], meta_ref[1])

    h = h_ref[:]
    ox_h = meta_ref[1] - 128.0
    rowsum_h = jnp.sum(h.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)

    def raw_mm(a, w_ref):
        """int8 (M,Kc) × int8 (Kc,Nc) → int32 (M,Nc). mm_kind="vpu" uses the
        broadcast·multiply·reduce formulation (M==1 only): XLA's own lowering
        for M=1 int8 dots, which keeps up with HBM where the 1/8-utilized MXU
        path cannot."""
        if mm_kind == "vpu":
            # i32 BEFORE the (1,K)->(K,1) reshape: Mosaic only supports
            # non-no-op minor-dim insertion for 32-bit types
            acol = a.astype(jnp.int32).reshape(a.shape[1], 1)
            return jnp.sum(acol * w_ref[:].astype(jnp.int32), axis=0,
                           keepdims=True)
        return jax.lax.dot_general(
            a, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def int_mm(w_ref, s_ref, o_ref, c_ref, b_ref):
        acc = raw_mm(h, w_ref).astype(jnp.float32)
        acc = acc - ox_h * c_ref[:] - o_ref[:] * rowsum_h + K * ox_h * o_ref[:]
        return acc * (meta_ref[0] * s_ref[:]) + b_ref[:]

    g1 = int_mm(w1_ref, s1_ref, o1_ref, c1_ref, b1_ref)
    g1 = _fq(g1, meta_ref[2], meta_ref[3], meta_ref[4])
    if act_kind == "silu":
        sig = 1.0 / (1.0 + jnp.exp(-g1))
        sig = _fq(sig, meta_ref[5], meta_ref[6], meta_ref[7])
        act = g1 * sig
    else:
        t = 0.7978845608028654 * (g1 + 0.044715 * g1 * g1 * g1)
        act = 0.5 * g1 * (1.0 + jnp.tanh(t))
    act = _fq(act, meta_ref[8], meta_ref[9], meta_ref[10])
    g3 = int_mm(w3_ref, s3_ref, o3_ref, c3_ref, b3_ref)
    g3 = _fq(g3, meta_ref[11], meta_ref[12], meta_ref[13])
    act = act * g3

    g8 = _quant_u8s(act, meta_ref[14], meta_ref[15])
    part = raw_mm(g8, w2_ref)
    rsum_part = jnp.sum(g8.astype(jnp.int32), axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part
        rsum_ref[:] = rsum_part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part
        rsum_ref[:] = rsum_ref[:] + rsum_part

    @pl.when(j == nj - 1)
    def _():
        F_total = nj * w1_ref.shape[1]
        ox2 = meta_ref[15] - 128.0
        y = acc_ref[:].astype(jnp.float32)
        y = (y - ox2 * c2_ref[:] - o2_ref[:] * rsum_ref[:].astype(jnp.float32)
             + F_total * ox2 * o2_ref[:]) * (meta_ref[14] * s2_ref[:]) + b2_ref[:]
        y = _fq(y, meta_ref[20], meta_ref[21], meta_ref[22])
        # resid_add_2: strict policy quantizes both inputs + the output
        xr = _fq(x_ref[:], meta_ref[23], meta_ref[24], meta_ref[25])
        y = _fq(y, meta_ref[26], meta_ref[27], meta_ref[28])
        out_ref[:] = _fq(xr + y, meta_ref[29], meta_ref[30], meta_ref[31])


@functools.partial(jax.jit, static_argnames=("act_kind", "norm_kind", "block_f",
                                             "interpret", "mm_kind"))
def fused_mlp_block(x: jax.Array, norm_w, norm_b, w13: dict, w2: dict,
                    meta: jax.Array, act_kind: str = "silu",
                    norm_kind: str = "rmsnorm", *, block_f: int = 512,
                    interpret: bool = False, mm_kind: str = "mxu"):
    """Residual-stream x (M,D) fp32 → x + MLP(norm(x)) in ONE dispatch.

    Absorbs the post-attention norm (with 16-bit input fake-quant), the MLP-input
    quantization, the whole gated MLP, the W2 per-channel requantization, the
    16-bit output fake-quant, and the residual add. meta: (BLOCK_META_LEN,).
    """
    M, K = x.shape
    K2, F2 = w13["wq"].shape
    assert K2 == K
    F = F2 // 2
    Fw2, N = w2["wq"].shape
    assert Fw2 == F and N == K
    TF = min(block_f, F)
    assert F % TF == 0

    def seg(arr, n):
        return jnp.broadcast_to(jnp.reshape(arr, (1, -1)), (1, n)).astype(jnp.float32)

    s13, o13 = seg(w13["scale"], F2), seg(w13["offset"], F2)
    c13 = jnp.reshape(w13["colsum"], (1, F2)).astype(jnp.float32)
    b13 = jnp.reshape(w13["bias"], (1, F2)).astype(jnp.float32)
    s2, o2 = seg(w2["scale"], N), seg(w2["offset"], N)
    c2 = jnp.reshape(w2["colsum"], (1, N)).astype(jnp.float32)
    b2 = jnp.reshape(w2["bias"], (1, N)).astype(jnp.float32)
    nw = jnp.reshape(norm_w, (1, K)).astype(jnp.float32)
    nb = jnp.reshape(norm_b, (1, K)).astype(jnp.float32)

    nF = F // TF

    def tile1(j):
        return (0, j)

    def tile3(j):
        return (0, nF + j)

    def whole(j):
        return (0, 0)

    assert mm_kind == "mxu" or M == 1, "vpu matvec formulation requires M == 1"
    kernel = functools.partial(_mlp_block_kernel, act_kind=act_kind,
                               norm_kind=norm_kind, mm_kind=mm_kind)
    return pl.pallas_call(
        kernel,
        grid=(nF,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((M, K), whole, memory_space=pltpu.VMEM),      # x
            pl.BlockSpec((1, K), whole, memory_space=pltpu.VMEM),      # norm w
            pl.BlockSpec((1, K), whole, memory_space=pltpu.VMEM),      # norm b
            pl.BlockSpec((K, TF), tile1, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TF), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((TF, N), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), tile1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), tile1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), tile1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), tile1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), tile3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), whole, memory_space=pltpu.VMEM),      # s2
            pl.BlockSpec((1, N), whole, memory_space=pltpu.VMEM),      # o2
            pl.BlockSpec((1, N), whole, memory_space=pltpu.VMEM),      # c2
            pl.BlockSpec((1, N), whole, memory_space=pltpu.VMEM),      # b2
        ],
        out_specs=pl.BlockSpec((M, N), whole, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((M, N), jnp.int32),
            pltpu.VMEM((M, 1), jnp.int32),
            pltpu.VMEM((M, K), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * F2 + 2 * M * F * N,
            bytes_accessed=M * K * 4 + K * F2 + F * N + M * N * 4,
            transcendentals=M * F),
        interpret=interpret,
    )(meta, x, nw, nb, w13["wq"], w13["wq"], w2["wq"],
      s13, o13, c13, b13, s13, o13, c13, b13, s2, o2, c2, b2)


# ---------------------------------------------------------------------------
# W4 stacked whole-MLP-block kernel (layer scan edition)
# ---------------------------------------------------------------------------
# Same contract as fused_mlp_block but:
#   - weights are nibble-packed W4 AND layer-stacked: the layer is selected by
#     a scalar-prefetch index in the BlockSpec index maps (no scan slice copy,
#     see ops/pallas_matmul.w4a8_matmul_stacked);
#   - w2 is F-packed (rows [0,F/2) low nibbles / [F/2,F) high — the global
#     qops.pack_nibbles layout), so each grid step computes a PAIR of
#     F-segments (j·TFh.. and F/2+j·TFh..): exactly the two g8 row groups the
#     j-th packed-w2 row block contains;
#   - the per-column vectors (scale/offset/colsum/bias) ride as ONE full-width
#     (4, 2F) aux operand with a constant index map — fetched once per layer
#     (≤2% of the weight traffic), sliced per segment in VMEM.


def _w4_mlp_phase(j, nj, m, x_get, out_set, nw_ref, nb_ref,
                  w1lo_ref, w1hi_ref, w3lo_ref, w3hi_ref, aux13_ref,
                  w2p_refs, aux2_ref,
                  acc_ref, rsum_ref, h_ref,
                  *, act_kind: str, norm_kind: str, half_f: int,
                  wbits: int = 4, site_on: tuple = (True,) * 9):
    """Phase body of the stacked W4 whole-MLP-block kernel, parameterised so it
    can ALSO run as the tail phases of the whole-layer kernel
    (ops/pallas_layer.py): j/nj are the phase index/count within the MLP stage,
    m(i) reads meta scalar i (caller applies its own meta offset), x_get()
    returns the (M,K) fp32 residual, out_set(y) writes the final output.

    site_on: STATIC enable flags for the 9 optional fake-quant sites, in order
    (x16, w1out, sig, actout, w3out, w2out, resid_in, resid_in2, resid_out).
    The runtime meta qmax=0 convention also disables a site, but the kernel
    still pays the full fq math for it on the VPU — under the relaxed serving
    policy that is 5 dead full-width elementwise chains per layer. Specializing
    at trace time skips them (same trick as pallas_prefill_attention)."""
    M, K = h_ref.shape
    K2 = K // 2
    TFh = w2p_refs[0].shape[1]
    s_x16, s_w1, s_sig, s_act, s_w3, s_w2o, s_r1, s_r2, s_ro = site_on

    def fq_on(x, i0, on):
        return _fq(x, m(i0), m(i0 + 1), m(i0 + 2)) if on else x

    @pl.when(j == 0)
    def _():
        x = fq_on(x_get(), 16, s_x16)
        if norm_kind == "layernorm":
            mu = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.mean(jnp.square(x - mu), axis=1, keepdims=True)
            y = (x - mu) * jax.lax.rsqrt(var + m(19))
        else:
            y = x * jax.lax.rsqrt(jnp.mean(x * x, axis=1, keepdims=True)
                                  + m(19))
        y = y * nw_ref[0] + nb_ref[0]
        h_ref[:] = _quant_u8s(y, m(0), m(1))

    h = h_ref[:]
    ox_h = m(1) - 128.0
    rowsum_h = jnp.sum(h.astype(jnp.int32), axis=1,
                       keepdims=True).astype(jnp.float32)
    h_lo, h_hi = h[:, :K2], h[:, K2:]

    def w4_mm(wp_ref, col0):
        """Weight block × h → corrected fp32 (M,TFh): K-packed W4 (1,K2,TFh)
        nibble block, or a plain (1,K,TFh) int8 block for wbits=8.
        col0: this segment's column offset into the (4, 2F) aux13 operand."""
        if wbits == 8:
            acc = jax.lax.dot_general(
                h, wp_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            wp = wp_ref[0]
            lo = wp & 0x0F
            hi = ((wp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
            acc = jax.lax.dot_general(
                h_lo, lo, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = acc + jax.lax.dot_general(
                h_hi, hi, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        acc = acc.astype(jnp.float32)
        s = aux13_ref[0, 0:1, pl.ds(col0, TFh)]
        o = aux13_ref[0, 1:2, pl.ds(col0, TFh)]
        cs = aux13_ref[0, 2:3, pl.ds(col0, TFh)]
        b = aux13_ref[0, 3:4, pl.ds(col0, TFh)]
        acc = acc - ox_h * cs - o * rowsum_h + K * ox_h * o
        return acc * (m(0) * s) + b

    def gate(g1, g3):
        g1 = fq_on(g1, 2, s_w1)
        if act_kind == "silu":
            sig = 1.0 / (1.0 + jnp.exp(-g1))
            sig = fq_on(sig, 5, s_sig)
            act = g1 * sig
        else:
            t = 0.7978845608028654 * (g1 + 0.044715 * g1 * g1 * g1)
            act = 0.5 * g1 * (1.0 + jnp.tanh(t))
        act = fq_on(act, 8, s_act)
        g3 = fq_on(g3, 11, s_w3)
        return act * g3

    c_lo = j * TFh                      # w1 seg_lo columns
    c_hi = half_f + j * TFh             # w1 seg_hi
    F = 2 * half_f
    act_lo = gate(w4_mm(w1lo_ref, c_lo), w4_mm(w3lo_ref, F + c_lo))
    act_hi = gate(w4_mm(w1hi_ref, c_hi), w4_mm(w3hi_ref, F + c_hi))
    g8_lo = _quant_u8s(act_lo, m(14), m(15))
    g8_hi = _quant_u8s(act_hi, m(14), m(15))

    if wbits == 8:
        # two plain (TFh, K) int8 row blocks: seg_lo rows and seg_hi rows
        part = jax.lax.dot_general(
            g8_lo, w2p_refs[0][0], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        part = part + jax.lax.dot_general(
            g8_hi, w2p_refs[1][0], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    else:
        w2p = w2p_refs[0][0]            # (TFh, K) packed: lo=seg_lo, hi=seg_hi
        lo2 = w2p & 0x0F
        hi2 = ((w2p.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
        part = jax.lax.dot_general(
            g8_lo, lo2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        part = part + jax.lax.dot_general(
            g8_hi, hi2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    rsum_part = (jnp.sum(g8_lo.astype(jnp.int32), axis=1, keepdims=True)
                 + jnp.sum(g8_hi.astype(jnp.int32), axis=1, keepdims=True))

    @pl.when(j == 0)
    def _():
        acc_ref[:] = part
        rsum_ref[:] = rsum_part

    @pl.when(j > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part
        rsum_ref[:] = rsum_ref[:] + rsum_part

    @pl.when(j == nj - 1)
    def _():
        F_total = 2 * nj * TFh
        ox2 = m(15) - 128.0
        s2 = aux2_ref[0, 0:1, :]
        o2 = aux2_ref[0, 1:2, :]
        c2 = aux2_ref[0, 2:3, :]
        b2 = aux2_ref[0, 3:4, :]
        y = acc_ref[:].astype(jnp.float32)
        y = (y - ox2 * c2 - o2 * rsum_ref[:].astype(jnp.float32)
             + F_total * ox2 * o2) * (m(14) * s2) + b2
        y = fq_on(y, 20, s_w2o)
        # resid_add_2: strict policy quantizes both inputs + the output
        xr = fq_on(x_get(), 23, s_r1)
        y = fq_on(y, 26, s_r2)
        out_set(fq_on(xr + y, 29, s_ro))


def _w4_mlp_block_kernel(idx_ref, meta_ref, x_ref, nw_ref, nb_ref,
                         w1lo_ref, w1hi_ref, w3lo_ref, w3hi_ref, aux13_ref,
                         w2p_ref, w2b_ref, aux2_ref, out_ref,
                         acc_ref, rsum_ref, h_ref,
                         *, act_kind: str, norm_kind: str, half_f: int,
                         wbits: int = 4, site_on: tuple = (True,) * 9):
    del idx_ref
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    def out_set(y):
        out_ref[:] = y

    _w4_mlp_phase(j, nj, lambda i: meta_ref[i], lambda: x_ref[:], out_set,
                  nw_ref, nb_ref, w1lo_ref, w1hi_ref, w3lo_ref, w3hi_ref,
                  aux13_ref,
                  (w2p_ref,) if wbits == 4 else (w2p_ref, w2b_ref),
                  aux2_ref, acc_ref, rsum_ref, h_ref,
                  act_kind=act_kind, norm_kind=norm_kind, half_f=half_f,
                  wbits=wbits, site_on=site_on)


def _pick_block_fh(K: int, half_f: int, wbits: int = 4) -> int:
    """Packed-w2 row-block (= F-segment width). Must divide F/2 and keep the
    per-step weight bytes (4 w13 blocks of K/2·TFh + w2 TFh·K for W4; twice
    that for W8's unpacked blocks) ≤ ~4 MB with ≥2 steps (the pipelining
    rules measured in scripts/ktune.py)."""
    per_tfh = 3 * K if wbits == 4 else 6 * K
    cap = max(128, min(1024, (4 * 1024 * 1024) // per_tfh, half_f // 2))
    for t in (1024, 512, 256, 128):
        if t <= cap and half_f % t == 0:
            return t
    return 0  # no aligned tiling — caller falls back


def w4_mlp_block_supported(K: int, F: int) -> bool:
    return (K % 256 == 0 and F % 256 == 0
            and _pick_block_fh(K, F // 2) != 0)


def w8_mlp_block_supported(K: int, F: int) -> bool:
    return (K % 256 == 0 and F % 256 == 0
            and _pick_block_fh(K, F // 2, wbits=8) != 0)


# ---------------------------------------------------------------------------
# Prefill w13+gate kernel: wide stacked w13 matmul with the gate chain and
# w2-input requant as an in-kernel epilogue (VERDICT r3 item 9's third
# option — untried by the two negative results below: unlike the separate
# gate_quant kernel there is no extra (M,2F) fp32 HBM round-trip, and unlike
# the whole-block kernel the dots stay WIDE (TF-block columns of the full
# matmul) so the MXU work per grid step dwarfs the VPU epilogue).
# ---------------------------------------------------------------------------


def _w13_gate_kernel(idx_ref, meta_ref, h_ref,
                     w1_ref, w3_ref, aux13_ref, out_ref,
                     *, act_kind: str, nf: int, wbits: int,
                     site_on: tuple = (True,) * 4):
    """Grid step j: g8[:, j·TF:(j+1)·TF] = quant(gate(h@w1_blk, h@w3_blk)).
    h (M,K) shifted-int8 (the already-normed/quantized MLP input); w1_ref /
    w3_ref are the j-th and (nf+j)-th column blocks of the stacked w13 pack;
    meta is the engine's _mlp_block_meta vector (indices 0..15 used).
    site_on: static enables for (w1out, sig, actout, w3out)."""
    del idx_ref
    j = pl.program_id(0)
    del j, nf
    M, K = h_ref.shape
    K2 = K // 2
    TF = out_ref.shape[1]
    s_w1, s_sig, s_act, s_w3 = site_on

    def m(i):
        return meta_ref[i]

    def fq_on(x, i0, on):
        return _fq(x, m(i0), m(i0 + 1), m(i0 + 2)) if on else x

    h = h_ref[:]
    ox_h = m(1) - 128.0
    rowsum_h = jnp.sum(h.astype(jnp.int32), axis=1,
                       keepdims=True).astype(jnp.float32)

    def mm(wp_ref, col_ref0):
        if wbits == 8:
            acc = jax.lax.dot_general(
                h, wp_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            wp = wp_ref[0]
            lo = wp & 0x0F
            hi = ((wp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
            acc = jax.lax.dot_general(
                h[:, :K2], lo, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = acc + jax.lax.dot_general(
                h[:, K2:], hi, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        acc = acc.astype(jnp.float32)
        s = aux13_ref[0, 0:1, pl.ds(col_ref0, TF)]
        o = aux13_ref[0, 1:2, pl.ds(col_ref0, TF)]
        cs = aux13_ref[0, 2:3, pl.ds(col_ref0, TF)]
        b = aux13_ref[0, 3:4, pl.ds(col_ref0, TF)]
        acc = acc - ox_h * cs - o * rowsum_h + K * ox_h * o
        return acc * (m(0) * s) + b

    g1 = fq_on(mm(w1_ref, 0), 2, s_w1)
    if act_kind == "silu":
        sig = 1.0 / (1.0 + jnp.exp(-g1))
        sig = fq_on(sig, 5, s_sig)
        act = g1 * sig
    else:
        t = 0.7978845608028654 * (g1 + 0.044715 * g1 * g1 * g1)
        act = 0.5 * g1 * (1.0 + jnp.tanh(t))
    act = fq_on(act, 8, s_act)
    g3 = fq_on(mm(w3_ref, TF), 11, s_w3)
    out_ref[:] = _quant_u8s(act * g3, m(14), m(15))


def _pick_block_tf(K: int, F: int, wbits: int) -> int:
    per_tf = 2 * K if wbits == 4 else 4 * K      # two blocks per step, bytes
    cap = max(128, min(1024, (4 * 1024 * 1024) // per_tf))
    for t in (1024, 512, 256, 128):
        if t <= cap and F % t == 0:
            return t
    return 0


def w13_gate_supported(M: int, K: int, F: int, wbits: int) -> bool:
    return (K % 256 == 0 and M * K <= 4 * 1024 * 1024
            and _pick_block_tf(K, F, wbits) != 0)


@functools.partial(jax.jit, static_argnames=("act_kind", "site_on",
                                             "interpret"))
def w13_gate_stacked(h8: jax.Array, w13sp: dict, meta: jax.Array, layer_idx,
                     act_kind: str = "silu", *,
                     site_on: tuple = (True,) * 4,
                     interpret: bool = False):
    """h8 (M,K) shifted-int8 → g8 (M,F) shifted-int8 ready for the w2 matmul:
    the w13 projection, w1/w3 output fq, activation (+fq), gate multiply
    (+fq) and w2-input quantization in ONE dispatch over stacked packs
    (W4 nibble or W8 by shape). The fp32 (M,2F) intermediate never touches
    HBM; the per-block VPU epilogue pipelines behind the next block's DMA."""
    M, K = h8.shape
    L, K2w, F2 = w13sp["wq"].shape
    wbits = 4 if K2w * 2 == K else 8
    assert K2w * 2 == K or K2w == K, (K2w, K)
    F = F2 // 2
    TF = _pick_block_tf(K, F, wbits)
    assert TF, (K, F)
    nf = F // TF

    def aux(spd, n):
        def row(v):
            return jnp.broadcast_to(jnp.reshape(v, (L, 1, -1)),
                                    (L, 1, n)).astype(jnp.float32)
        return jnp.concatenate([row(spd["scale"]), row(spd["offset"]),
                                row(spd["colsum"]), row(spd["bias"])], axis=1)

    aux13 = aux(w13sp, F2)                       # (L, 4, 2F)
    idx = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    kernel = functools.partial(_w13_gate_kernel, act_kind=act_kind, nf=nf,
                               wbits=wbits, site_on=site_on)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nf,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # meta
            pl.BlockSpec((M, K), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),                 # h8
            pl.BlockSpec((1, K2w, TF), lambda j, i: (i[0], 0, j),
                         memory_space=pltpu.VMEM),                 # w1 block
            pl.BlockSpec((1, K2w, TF), lambda j, i: (i[0], 0, nf + j),
                         memory_space=pltpu.VMEM),                 # w3 block
            pl.BlockSpec((1, 4, 2 * TF),
                         lambda j, i: (i[0], 0, j),
                         memory_space=pltpu.VMEM),                 # aux cols
        ],
        out_specs=pl.BlockSpec((M, TF), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
    )
    # aux columns: the j-th (1,4,2TF) block of a (L,4,2F) array viewed as
    # nf blocks of 2TF columns would interleave w1/w3 wrongly — instead
    # rearrange aux13 so block j holds [w1 cols j·TF.., w3 cols F+j·TF..]
    a = aux13.reshape(L, 4, 2, nf, TF)           # [.., w1/w3, block, col]
    a = jnp.transpose(a, (0, 1, 3, 2, 4)).reshape(L, 4, F2)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, F), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * F2,
            bytes_accessed=M * K + K2w * F2 + M * F,
            transcendentals=M * F),
        interpret=interpret,
    )(idx, meta, h8, w13sp["wq"], w13sp["wq"], a)


# ---------------------------------------------------------------------------
# Attention-tail + MLP-block kernel (batched decode): o-proj -> o output fq ->
# resid_add_1 -> the whole stacked MLP block in ONE dispatch. Removes the
# o-proj custom-call boundary and the resid/fq fusions between it and the MLP
# kernel (per-layer op-boundary gaps were ~15 us/layer of the bs=32 step,
# BENCHMARKS.md round-3 staging section). The o pack rides as one full block
# fetched during kernel startup (~2 MB W4 = ~3 us of stream).
# Meta = engine._mlp_block_meta (0..31) + the OTAIL extension (32..45):
#   [32] a8 scale  [33] a8 offset  (pv_bmm output quant of the attention out)
#   [34-36] o output fq (s, o, qmax)   [37-39] resid_add_1 input
#   [40-42] resid_add_1 input2         [43-45] resid_add_1 output
# ---------------------------------------------------------------------------


def _otail_block_kernel(idx_ref, meta_ref, a8_ref, xin_ref, ow_ref, oaux_ref,
                        nw_ref, nb_ref,
                        w1lo_ref, w1hi_ref, w3lo_ref, w3hi_ref, aux13_ref,
                        w2p_ref, w2b_ref, aux2_ref, out_ref,
                        acc_ref, rsum_ref, h_ref, resid_ref,
                        *, act_kind: str, norm_kind: str, half_f: int,
                        wbits: int, site_on: tuple,
                        osite_on: tuple = (True,) * 4):
    del idx_ref
    j = pl.program_id(0)
    nj = pl.num_programs(0)
    s_oo, s_r1, s_r2, s_ro = osite_on

    def m(i):
        return meta_ref[i]

    def fq_on(x, i0, on):
        return _fq(x, m(i0), m(i0 + 1), m(i0 + 2)) if on else x

    @pl.when(j == 0)
    def _():
        # o-projection of the (M,Ko) shifted-int8 attention output
        a = a8_ref[:]
        M, Ko = a.shape
        Ko2 = Ko // 2
        if wbits == 8:
            acc = jax.lax.dot_general(
                a, ow_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            wp = ow_ref[0]
            lo = wp & 0x0F
            hi = ((wp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
            acc = jax.lax.dot_general(
                a[:, :Ko2], lo, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = acc + jax.lax.dot_general(
                a[:, Ko2:], hi, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        acc = acc.astype(jnp.float32)
        ox_a = m(33) - 128.0
        rs_a = jnp.sum(a.astype(jnp.int32), axis=1,
                       keepdims=True).astype(jnp.float32)
        s_ = oaux_ref[0, 0:1, :]
        o_ = oaux_ref[0, 1:2, :]
        cs = oaux_ref[0, 2:3, :]
        b_ = oaux_ref[0, 3:4, :]
        o = (acc - ox_a * cs - o_ * rs_a + Ko * ox_a * o_) * (m(32) * s_) + b_
        o = fq_on(o, 34, s_oo)
        x = fq_on(xin_ref[:], 37, s_r1)
        o = fq_on(o, 40, s_r2)
        resid_ref[:] = fq_on(x + o, 43, s_ro)

    def out_set(y):
        out_ref[:] = y

    _w4_mlp_phase(j, nj, m, lambda: resid_ref[:], out_set,
                  nw_ref, nb_ref, w1lo_ref, w1hi_ref, w3lo_ref, w3hi_ref,
                  aux13_ref,
                  (w2p_ref,) if wbits == 4 else (w2p_ref, w2b_ref),
                  aux2_ref, acc_ref, rsum_ref, h_ref,
                  act_kind=act_kind, norm_kind=norm_kind, half_f=half_f,
                  wbits=wbits, site_on=site_on)


@functools.partial(jax.jit, static_argnames=("act_kind", "norm_kind",
                                             "site_on", "osite_on",
                                             "interpret"))
def fused_otail_block_stacked(a8: jax.Array, x_in: jax.Array, osp: dict,
                              nw_L, nb_L, w13sp: dict, w2sp: dict,
                              meta: jax.Array, layer_idx,
                              act_kind: str = "silu",
                              norm_kind: str = "rmsnorm", *,
                              site_on: tuple = (True,) * 9,
                              osite_on: tuple = (True,) * 4,
                              interpret: bool = False):
    """a8 (M,Ko) shifted-int8 attention output + x_in (M,K) fp32 layer input
    → x_in ⊕ o-proj(a8) ⊕ MLP(norm(resid)) for layer `layer_idx` of the
    stacked packs, ONE dispatch. osp: the stacked o_proj pack {wq (L,Ko/2,K)
    W4 | (L,Ko,K) W8, scale/offset/colsum/bias}; the rest as
    fused_mlp_block_w4_stacked."""
    M, K = x_in.shape
    Ma, Ko = a8.shape
    assert Ma == M
    L, K2, F2 = w13sp["wq"].shape
    wbits = 4 if K2 * 2 == K else 8
    Lo, Ko2w, Kw = osp["wq"].shape
    assert Kw == K and (Ko2w * 2 == Ko if wbits == 4 else Ko2w == Ko)
    F = F2 // 2
    F2h = w2sp["wq"].shape[1]
    assert (F2h * 2 == F if wbits == 4 else F2h == F), (wbits, F2h, F)
    half_f = F // 2
    TFh = _pick_block_fh(K, half_f, wbits)
    assert TFh, (K, F)
    nh = half_f // TFh

    def aux(spd, n):
        def row(v):
            return jnp.broadcast_to(jnp.reshape(v, (L, 1, -1)),
                                    (L, 1, n)).astype(jnp.float32)
        return jnp.concatenate([row(spd["scale"]), row(spd["offset"]),
                                row(spd["colsum"]), row(spd["bias"])], axis=1)

    aux13 = aux(w13sp, F2)
    aux2 = aux(w2sp, K)
    oaux = aux(osp, K)
    nw3 = jnp.reshape(nw_L, (L, 1, K)).astype(jnp.float32)
    nb3 = jnp.reshape(nb_L, (L, 1, K)).astype(jnp.float32)
    idx = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))

    kernel = functools.partial(_otail_block_kernel, act_kind=act_kind,
                               norm_kind=norm_kind, half_f=half_f,
                               wbits=wbits, site_on=site_on,
                               osite_on=osite_on)
    w2blk = nh if wbits == 8 else 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nh,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # meta
            pl.BlockSpec((M, Ko), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),                 # a8
            pl.BlockSpec((M, K), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),                 # x_in
            pl.BlockSpec((1, Ko2w, K), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                 # o pack
            pl.BlockSpec((1, 4, K), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                 # o aux
            pl.BlockSpec((1, 1, K), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                 # norm w
            pl.BlockSpec((1, 1, K), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                 # norm b
            pl.BlockSpec((1, K2, TFh), lambda j, i: (i[0], 0, j),
                         memory_space=pltpu.VMEM),                 # w1 lo
            pl.BlockSpec((1, K2, TFh), lambda j, i: (i[0], 0, nh + j),
                         memory_space=pltpu.VMEM),                 # w1 hi
            pl.BlockSpec((1, K2, TFh), lambda j, i: (i[0], 0, 2 * nh + j),
                         memory_space=pltpu.VMEM),                 # w3 lo
            pl.BlockSpec((1, K2, TFh), lambda j, i: (i[0], 0, 3 * nh + j),
                         memory_space=pltpu.VMEM),                 # w3 hi
            pl.BlockSpec((1, 4, F2), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                 # aux13
            pl.BlockSpec((1, TFh, K), lambda j, i: (i[0], j, 0),
                         memory_space=pltpu.VMEM),                 # w2 pack
            pl.BlockSpec((1, TFh if wbits == 8 else 32, K),
                         lambda j, i: (i[0], w2blk + j
                                       if wbits == 8 else 0, 0),
                         memory_space=pltpu.VMEM),          # w2 seg_hi (W8)
            pl.BlockSpec((1, 4, K), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                 # aux2
        ],
        out_specs=pl.BlockSpec((M, K), lambda j, i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((M, K), jnp.int32),
            pltpu.VMEM((M, 1), jnp.int32),
            pltpu.VMEM((M, K), jnp.int8),
            pltpu.VMEM((M, K), jnp.float32),          # resid (o + x_in)
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * (Ko * K + K * F2 + F * K),
            bytes_accessed=M * (Ko + 5 * K) + Ko2w * K + K2 * F2 + F2h * K,
            transcendentals=M * F),
        interpret=interpret,
    )(idx, meta, a8, x_in, osp["wq"], oaux, nw3, nb3,
      w13sp["wq"], w13sp["wq"], w13sp["wq"], w13sp["wq"], aux13,
      w2sp["wq"], w2sp["wq"], aux2)


# NOTE on prefill-sized M (two negative results, 2026-08-19):
# 1. Lifting the stacked-block gate to M=1024 measured WORSE than the split
#    path (523 vs 344 us/layer, TinyLlama W4 T=1024, even with static site_on
#    flags): the narrow TFh dots and the gate VPU work serialize with the MXU
#    inside one program, while the split path runs the wide stacked matmuls at
#    88% of int8 peak. The block kernel stays decode-sized (engine B*T<=64).
# 2. A dedicated one-pass "gate_quant" kernel for the split path's
#    inter-matmul elementwise chain measured 163 us/layer vs XLA's 129 us
#    two-fusion split — the chain is VPU-floor-bound, not HBM-bound.
# Details + the arithmetic: BENCHMARKS.md "Prefill, round 2".


@functools.partial(jax.jit, static_argnames=("act_kind", "norm_kind",
                                             "site_on", "interpret"))
def fused_mlp_block_w4_stacked(x: jax.Array, nw_L, nb_L, w13sp: dict,
                               w2sp: dict, meta: jax.Array, layer_idx,
                               act_kind: str = "silu",
                               norm_kind: str = "rmsnorm", *,
                               site_on: tuple = (True,) * 9,
                               interpret: bool = False):
    """Residual x (M,K) fp32 → x + MLP(norm(x)) for layer `layer_idx` of the
    stacked W4 packs, in ONE dispatch. w13sp: {wq (L,K/2,2F), scale/offset
    (L,1,2F), colsum/bias (L,2F)}; w2sp: {wq (L,F/2,K), ...}.

    W8 packs (the batched-decode serving path, VERDICT r2 item 4) are detected
    by shape — w13 wq (L,K,2F), w2 wq (L,F,K) plain int8; the phase body then
    runs the same pipeline with unpacked dots and the w2 seg_lo/seg_hi row
    groups riding as two block operands (like the whole-layer kernel)."""
    M, K = x.shape
    L, K2, F2 = w13sp["wq"].shape
    wbits = 4 if K2 * 2 == K else 8
    assert K2 * 2 == K or K2 == K, (K2, K)
    F = F2 // 2
    Lw, F2h, Kw = w2sp["wq"].shape
    assert Kw == K and (F2h * 2 == F if wbits == 4 else F2h == F), \
        (wbits, F2h, F, Kw, K)
    half_f = F // 2
    TFh = _pick_block_fh(K, half_f, wbits)
    assert TFh, (K, F)
    nh = half_f // TFh

    def aux(spd, n):
        def row(v):
            return jnp.broadcast_to(jnp.reshape(v, (L, 1, -1)),
                                    (L, 1, n)).astype(jnp.float32)
        return jnp.concatenate([row(spd["scale"]), row(spd["offset"]),
                                row(spd["colsum"]), row(spd["bias"])], axis=1)

    aux13 = aux(w13sp, F2)                       # (L, 4, 2F)
    aux2 = aux(w2sp, K)                          # (L, 4, K)
    # (L,1,K): Mosaic requires the 2nd-minor block dim to be 8-divisible or
    # equal to the array dim — a (1,K) block of an (L,K) array is neither
    nw3 = jnp.reshape(nw_L, (L, 1, K)).astype(jnp.float32)
    nb3 = jnp.reshape(nb_L, (L, 1, K)).astype(jnp.float32)
    idx = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))

    kernel = functools.partial(_w4_mlp_block_kernel, act_kind=act_kind,
                               norm_kind=norm_kind, half_f=half_f,
                               wbits=wbits, site_on=site_on)
    # W8: the w2 seg_lo rows ([0,F/2)) ride the first w2 operand, seg_hi rows
    # ([F/2,F), row-block offset nh) the second; W4 packs carry both nibble
    # halves in one block and the second operand is a dummy 32-row slab.
    w2blk = nh if wbits == 8 else 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nh,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                     # meta
            pl.BlockSpec((M, K), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),                     # x
            pl.BlockSpec((1, 1, K), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                     # norm w
            pl.BlockSpec((1, 1, K), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                     # norm b
            pl.BlockSpec((1, K2, TFh), lambda j, i: (i[0], 0, j),
                         memory_space=pltpu.VMEM),                     # w1 lo
            pl.BlockSpec((1, K2, TFh), lambda j, i: (i[0], 0, nh + j),
                         memory_space=pltpu.VMEM),                     # w1 hi
            pl.BlockSpec((1, K2, TFh), lambda j, i: (i[0], 0, 2 * nh + j),
                         memory_space=pltpu.VMEM),                     # w3 lo
            pl.BlockSpec((1, K2, TFh), lambda j, i: (i[0], 0, 3 * nh + j),
                         memory_space=pltpu.VMEM),                     # w3 hi
            pl.BlockSpec((1, 4, F2), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                     # aux13
            pl.BlockSpec((1, TFh, K), lambda j, i: (i[0], j, 0),
                         memory_space=pltpu.VMEM),                     # w2 pack
            pl.BlockSpec((1, TFh if wbits == 8 else 32, K),
                         lambda j, i: (i[0], w2blk + j
                                       if wbits == 8 else 0, 0),
                         memory_space=pltpu.VMEM),             # w2 seg_hi (W8)
            pl.BlockSpec((1, 4, K), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                     # aux2
        ],
        out_specs=pl.BlockSpec((M, K), lambda j, i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((M, K), jnp.int32),
            pltpu.VMEM((M, 1), jnp.int32),
            pltpu.VMEM((M, K), jnp.int8),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * F2 + 2 * M * F * K,
            bytes_accessed=M * K * 4 + K2 * F2 + F2h * K + 8 * (F2 + K),
            transcendentals=M * F),
        interpret=interpret,
    )(idx, meta, x, nw3, nb3,
      w13sp["wq"], w13sp["wq"], w13sp["wq"], w13sp["wq"], aux13,
      w2sp["wq"], w2sp["wq"], aux2)


# ---------------------------------------------------------------------------
# w13 + gate + w2 in one dispatch (prefill whole-MLP, round-4 verdict item 7:
# the separate w2 stacked matmul regressed 79 -> 95 us/layer behind the gate
# kernel's custom-call boundary, and the (M,F) int8 act made an HBM round
# trip — fold w2 into the same grid's tail phases, act8 stays in VMEM)
# ---------------------------------------------------------------------------

def _w13_gate_w2_kernel(idx_ref, meta_ref, h_ref,
                        w1_ref, w3_ref, aux13_ref, w2p_ref, w2b_ref, aux2_ref,
                        out_ref, act_scr, acc_scr, rsum_scr, grs_scr,
                        *, act_kind: str, nf: int, nw2: int, wbits: int,
                        site_on: tuple, F: int):
    """Grid phases [0, nf): gate phases — act8 block -> act_scr (VMEM).
    Phases [nf, nf+nw2): w2 row blocks x act_scr -> int32 acc; the last
    phase applies the w2 affine epilogue (scale/offset/colsum/bias) and
    writes the fp32 (M, K) output."""
    del idx_ref
    j = pl.program_id(0)
    M, K = h_ref.shape
    K2 = K // 2
    TF = w1_ref.shape[2]
    F2h = w2p_ref.shape[1]               # packed w2 row-block height
    s_w1, s_sig, s_act, s_w3 = site_on

    def m(i):
        return meta_ref[i]

    def fq_on(x, i0, on):
        return _fq(x, m(i0), m(i0 + 1), m(i0 + 2)) if on else x

    @pl.when(j == 0)
    def _():
        rsum_scr[:] = jnp.sum(h_ref[:].astype(jnp.int32), axis=1,
                              keepdims=True).astype(jnp.float32)
        grs_scr[:] = jnp.zeros_like(grs_scr)

    @pl.when(j < nf)
    def _():
        h = h_ref[:]
        ox_h = m(1) - 128.0

        def mm(wp_ref, col0):
            if wbits == 8:
                acc = jax.lax.dot_general(
                    h, wp_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            else:
                wp = wp_ref[0]
                lo = wp & 0x0F
                hi = ((wp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    h[:, :K2], lo, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = acc + jax.lax.dot_general(
                    h[:, K2:], hi, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            acc = acc.astype(jnp.float32)
            s = aux13_ref[0, 0:1, pl.ds(col0, TF)]
            o = aux13_ref[0, 1:2, pl.ds(col0, TF)]
            cs = aux13_ref[0, 2:3, pl.ds(col0, TF)]
            b = aux13_ref[0, 3:4, pl.ds(col0, TF)]
            acc = acc - ox_h * cs - o * rsum_scr[:] + K * ox_h * o
            return acc * (m(0) * s) + b

        g1 = fq_on(mm(w1_ref, 0), 2, s_w1)
        if act_kind == "silu":
            sig = 1.0 / (1.0 + jnp.exp(-g1))
            sig = fq_on(sig, 5, s_sig)
            act = g1 * sig
        else:
            t = 0.7978845608028654 * (g1 + 0.044715 * g1 * g1 * g1)
            act = 0.5 * g1 * (1.0 + jnp.tanh(t))
        act = fq_on(act, 8, s_act)
        g3 = fq_on(mm(w3_ref, TF), 11, s_w3)
        a8 = _quant_u8s(act * g3, m(14), m(15))
        act_scr[:, pl.ds(j * TF, TF)] = a8
        grs_scr[:] = grs_scr[:] + jnp.sum(a8.astype(jnp.int32), axis=1,
                                          keepdims=True)

    @pl.when(j >= nf)
    def _():
        t = j - nf
        if wbits == 4:
            # packed row block t covers the F-segment PAIR
            # [t*F2h/nw2... ] — w2p_ref is the t-th (1, TR, K) block of the
            # (F/2, K) nibble pack: lo nibbles = F rows [r], hi = [F/2 + r]
            TR = F2h
            a_lo = act_scr[:, pl.ds(t * TR, TR)].astype(jnp.int8)
            a_hi = act_scr[:, pl.ds(F // 2 + t * TR, TR)].astype(jnp.int8)
            wp = w2p_ref[0]
            lo2 = wp & 0x0F
            hi2 = ((wp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
            part = jax.lax.dot_general(
                a_lo, lo2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            part = part + jax.lax.dot_general(
                a_hi, hi2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            TR = F2h
            a_blk = act_scr[:, pl.ds(t * TR, TR)].astype(jnp.int8)
            part = jax.lax.dot_general(
                a_blk, w2p_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            part = part + jax.lax.dot_general(
                act_scr[:, pl.ds(F // 2 + t * TR, TR)].astype(jnp.int8),
                w2b_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        @pl.when(j == nf)
        def _():
            acc_scr[:] = part

        @pl.when(j > nf)
        def _():
            acc_scr[:] = acc_scr[:] + part

        @pl.when(j == nf + nw2 - 1)
        def _():
            ox2 = m(15) - 128.0
            s2 = aux2_ref[0, 0:1, :]
            o2 = aux2_ref[0, 1:2, :]
            c2 = aux2_ref[0, 2:3, :]
            b2 = aux2_ref[0, 3:4, :]
            y = acc_scr[:].astype(jnp.float32)
            y = (y - ox2 * c2 - o2 * grs_scr[:].astype(jnp.float32)
                 + F * ox2 * o2) * (m(14) * s2) + b2
            out_ref[:] = y


def w13_gate_w2_supported(M: int, K: int, F: int, wbits: int) -> bool:
    half = F // 2
    return (w13_gate_supported(M, K, F, wbits) and F % 4 == 0
            and M * (F + 4 * K) <= 24 * 1024 * 1024    # act8 + int32 acc VMEM
            and any(half % t == 0      # 128-multiples only: the act8 lane
                    for t in (1408, 1024, 512, 256, 128)))   # slices must
                                                             # stay aligned


@functools.partial(jax.jit, static_argnames=("act_kind", "site_on",
                                             "interpret"))
def w13_gate_w2_stacked(h8: jax.Array, w13sp: dict, w2sp: dict,
                        meta: jax.Array, layer_idx, act_kind: str = "silu", *,
                        site_on: tuple = (True,) * 4,
                        interpret: bool = False):
    """h8 (M,K) shifted-int8 -> w2 output (M,K) fp32 (pre-fq16, pre-bias-fq):
    the whole prefill MLP — w13 matmul, gate chain, w2-input quant AND the w2
    matmul + affine epilogue — in ONE dispatch; the (M,F) int8 act lives in
    VMEM scratch (no HBM round trip, no custom-call boundary in front of
    w2). Caller applies the 16-bit w2-output fq + residual (engine)."""
    M, K = h8.shape
    L, K2w, F2 = w13sp["wq"].shape
    wbits = 4 if K2w * 2 == K else 8
    F = F2 // 2
    half = F // 2
    TF = _pick_block_tf(K, F, wbits)
    assert TF, (K, F)
    nf = F // TF
    # w2 row-block height: a divisor of the packed row count (F/2 both for
    # W4's nibble pairs and W8's seg_lo/seg_hi split blocks)
    TR = next(t for t in (1408, 1024, 512, 256, 128) if half % t == 0)
    nw2 = half // TR

    def aux(spd, n):
        def row(v):
            return jnp.broadcast_to(jnp.reshape(v, (L, 1, -1)),
                                    (L, 1, n)).astype(jnp.float32)
        return jnp.concatenate([row(spd["scale"]), row(spd["offset"]),
                                row(spd["colsum"]), row(spd["bias"])], axis=1)

    aux13 = aux(w13sp, F2)
    a = aux13.reshape(L, 4, 2, nf, TF)
    a = jnp.transpose(a, (0, 1, 3, 2, 4)).reshape(L, 4, F2)
    aux2 = aux(w2sp, K)
    idx = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    w2blk = nw2 if wbits == 8 else 0

    def w2row(j, i):
        t = jnp.clip(j - nf, 0, nw2 - 1)
        return (i[0], t, 0)

    def w2brow(j, i):
        t = jnp.clip(j - nf, 0, nw2 - 1)
        return (i[0], (w2blk + t) if wbits == 8 else 0, 0)

    kernel = functools.partial(_w13_gate_w2_kernel, act_kind=act_kind, nf=nf,
                               nw2=nw2, wbits=wbits, site_on=site_on, F=F)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nf + nw2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # meta
            pl.BlockSpec((M, K), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),                 # h8
            pl.BlockSpec((1, K2w, TF),
                         lambda j, i: (i[0], 0, jnp.minimum(j, nf - 1)),
                         memory_space=pltpu.VMEM),                 # w1 block
            pl.BlockSpec((1, K2w, TF),
                         lambda j, i: (i[0], 0, nf + jnp.minimum(j, nf - 1)),
                         memory_space=pltpu.VMEM),                 # w3 block
            pl.BlockSpec((1, 4, 2 * TF),
                         lambda j, i: (i[0], 0, jnp.minimum(j, nf - 1)),
                         memory_space=pltpu.VMEM),                 # aux13 cols
            pl.BlockSpec((1, TR, K), w2row,
                         memory_space=pltpu.VMEM),                 # w2 rows
            pl.BlockSpec((1, TR if wbits == 8 else 32, K), w2brow,
                         memory_space=pltpu.VMEM),                 # w2 seg_hi
            pl.BlockSpec((1, 4, K), lambda j, i: (i[0], 0, 0),
                         memory_space=pltpu.VMEM),                 # aux2
        ],
        out_specs=pl.BlockSpec((M, K), lambda j, i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((M, F), jnp.int8),                          # act8
            pltpu.VMEM((M, K), jnp.int32),                         # w2 acc
            pltpu.VMEM((M, 1), jnp.float32),                       # h rowsums
            pltpu.VMEM((M, 1), jnp.int32),                         # g8 rowsums
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * F2 + 2 * M * F * K,
            bytes_accessed=M * K + K2w * F2 + w2sp["wq"].shape[1] * K
            + M * K * 4,
            transcendentals=M * F),
        interpret=interpret,
    )(idx, meta, h8, w13sp["wq"], w13sp["wq"], a,
      w2sp["wq"], w2sp["wq"], aux2)
