"""Prefill qkv matmul with the full attention-input epilogue in-kernel.

The round-3 prefill trace left ~190 us/layer of fake-quant/RoPE/quantize
elementwise chains outside the matmul kernels (BENCHMARKS.md prefill round 2);
this kernel absorbs the qkv-side share: the stacked qkv projection's output
fake-quant, HF rotate-half RoPE on the q|k segments, and the joint
per-segment int8 quantization (qk_bmm input / input2, pv_bmm input2
encodings) all run as a per-column-block VPU epilogue behind the next weight
block's DMA — the (M, Nq) fp32 intermediate never touches HBM. The MLP twin
is ops/pallas_mlp.w13_gate_stacked; engine._layer_forward dispatches both
under KernelConfig.gate_kernel for prefill-sized segments.

Numerics are branch-exact with the XLA path (engine._layer_forward's
qkv-proj -> fused/per-segment output fq -> apply_rope -> joint segment
quantization): the ofq rows come from engine._qkv_ofq_rows, the final
quantization scale/offset per PACKED column from engine._qkv_outq_rows.
RoPE uses the lane-roll trick of ops/pallas_layer.py generalized to M rows:
partner_d = x[d +- rot/2] via two lane rolls + a d-mod-hd mask, with the
rotate-half sign baked into the sin operand (cos=1 / sin=0 outside the
rotary dims covers partial rotary). Reference: HFAttention's quantizable
qkv + rotary path, /root/reference/mobilellm/model/hf_model.py:423-501.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block_tn(K2w: int, Nq: int, hd: int) -> int:
    """Column-block width: multiple of max(128, hd) dividing Nq, weight block
    K2w*TN <= ~3 MB (the measured pipelining sweet spot)."""
    step = max(128, hd)
    cap = (3 * 1024 * 1024) // max(K2w, 1)
    for t in range(min(cap, Nq) // step * step, step - 1, -step):
        if Nq % t == 0:
            return t
    return 0


def qkv_kernel_supported(c, Nq: int, K2w: int) -> bool:
    hd = c.head_dim_
    return (hd % 2 == 0 and c.rotary_dim % 2 == 0
            and Nq % max(128, hd) == 0
            and _pick_block_tn(K2w, Nq, hd) > 0)


def _qkv_rope_kernel(idx_ref, meta_ref, h_ref, w_ref, aux_ref, ofq_ref,
                     outq_ref, cs_ref, out_ref, rsum_scr,
                     *, hd: int, rot: int, wbits: int):
    """Grid step j: out[:, j*TN:(j+1)*TN] = segquant(rope(ofq(h @ W_blk))).
    aux (4, TN) = [w scale, w offset, colsum, bias]; ofq (4, TN) =
    [scale, offset, clipmax, enabled]; outq (3, TN) = [quant scale, quant
    offset, rope mask]; cs (M, 2*hd) = [cos | sign-baked sin] per row."""
    del idx_ref
    j = pl.program_id(0)
    M, K = h_ref.shape
    K2 = K // 2
    TN = out_ref.shape[1]
    shift = rot // 2
    hs = meta_ref[0]
    ho = meta_ref[1]

    @pl.when(j == 0)
    def _():
        rsum_scr[:] = jnp.sum(h_ref[:].astype(jnp.int32), axis=1,
                              keepdims=True).astype(jnp.float32)

    h = h_ref[:]
    if wbits == 8:
        acc = jax.lax.dot_general(h, w_ref[0], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
    else:
        wp = w_ref[0]
        lo = wp & 0x0F
        hi = ((wp.astype(jnp.int32) >> 4) & 0x0F).astype(jnp.int8)
        acc = jax.lax.dot_general(h[:, :K2], lo, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        acc = acc + jax.lax.dot_general(h[:, K2:], hi, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
    acc = acc.astype(jnp.float32)
    ox = ho - 128.0
    s = aux_ref[0:1, :]
    o = aux_ref[1:2, :]
    csum = aux_ref[2:3, :]
    b = aux_ref[3:4, :]
    y = (acc - ox * csum - o * rsum_scr[:] + K * ox * o) * (hs * s) + b

    # per-column output fake-quant (engine's fused per-channel branch, or the
    # per-segment branch — the ofq rows encode either)
    fs = ofq_ref[0:1, :]
    fo = ofq_ref[1:2, :]
    fc = ofq_ref[2:3, :]
    fe = ofq_ref[3:4, :]
    q = jnp.clip(jnp.round(y / fs) + fo, 0.0, fc)
    y = jnp.where(fe > 0.5, (q - fo) * fs, y)

    # RoPE + joint segment quantization per hd-wide head slice (static lane
    # slices — blocks are head-aligned since TN % hd == 0 for hd >= 128 and
    # TN % 128 == 0 covers whole 64/128-wide heads): partner_d = y[d +- rot/2]
    # via two lane rolls + the d-mask; sin=0 kills d >= rot (partial rotary);
    # the per-column rope mask turns v columns into a pass-through
    cosv = cs_ref[:, :hd]
    sinv = cs_ref[:, hd:]
    d = jax.lax.broadcasted_iota(jnp.int32, (1, hd), 1)
    for g in range(TN // hd):
        c0 = g * hd
        yg = y[:, c0:c0 + hd]
        partner = jnp.where(d < shift,
                            jnp.roll(yg, -shift, 1), jnp.roll(yg, shift, 1))
        roped = yg * cosv + partner * sinv
        yg = jnp.where(outq_ref[2:3, c0:c0 + hd] > 0.5, roped, yg)
        qs = outq_ref[0:1, c0:c0 + hd]
        qo = outq_ref[1:2, c0:c0 + hd]
        out_ref[:, c0:c0 + hd] = (jnp.clip(jnp.round(yg / qs) + qo,
                                           0.0, 255.0)
                                  - 128.0).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("head_dim", "rotary_dim",
                                             "interpret"))
def qkv_rope_stacked(h8: jax.Array, qkvsp: dict, ofq: jax.Array,
                     outq: jax.Array, rope_cs: jax.Array, meta: jax.Array,
                     layer_idx, *, head_dim: int, rotary_dim: int,
                     interpret: bool = False):
    """h8 (M,K) shifted-int8 -> (M, Nq) shifted-int8 q|k|v rows ready for the
    attention kernels and the KV cache, in ONE dispatch over the stacked qkv
    pack (W4 nibble or W8 by shape; layer selected by scalar prefetch).

    ofq (4, Nq): [scale, offset, clipmax, enabled] output-fq rows
    (engine._qkv_ofq_rows). outq (3, Nq): [segment quant scale, offset,
    rope-mask] (engine._qkv_outq_rows). rope_cs (M, 2*hd): [cos | sign-baked
    sin] per row (engine._rope_cs_rows). meta (2,): [h scale, h offset]."""
    M, K = h8.shape
    L, K2w, Nq = qkvsp["wq"].shape
    wbits = 4 if K2w * 2 == K else 8
    assert K2w * 2 == K or K2w == K, (K2w, K)
    hd = head_dim
    TN = _pick_block_tn(K2w, Nq, hd)
    assert TN and Nq % TN == 0, (K2w, Nq, hd)
    nq = Nq // TN

    def aux(spd, n):
        def rowv(v):
            return jnp.broadcast_to(jnp.reshape(v, (L, 1, -1)),
                                    (L, 1, n)).astype(jnp.float32)
        return jnp.concatenate([rowv(spd["scale"]), rowv(spd["offset"]),
                                rowv(spd["colsum"]), rowv(spd["bias"])],
                               axis=1)

    qaux = aux(qkvsp, Nq)                            # (L, 4, Nq)
    idx = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))
    kernel = functools.partial(_qkv_rope_kernel, hd=hd, rot=rotary_dim,
                               wbits=wbits)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nq,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # meta
            pl.BlockSpec((M, K), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),                 # h8
            pl.BlockSpec((1, K2w, TN), lambda j, i: (i[0], 0, j),
                         memory_space=pltpu.VMEM),                 # qkv block
            pl.BlockSpec((1, 4, TN), lambda j, i: (i[0], 0, j),
                         memory_space=pltpu.VMEM),                 # aux
            pl.BlockSpec((4, TN), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),                 # ofq rows
            pl.BlockSpec((3, TN), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),                 # outq rows
            pl.BlockSpec((M, 2 * hd), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),                 # rope cs
        ],
        out_specs=pl.BlockSpec((M, TN), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((M, 1), jnp.float32)],          # h rowsums
    )

    def kernel2(idx_ref, meta_ref, h_ref, w_ref, aux3_ref, ofq_ref, outq_ref,
                cs_ref, out_ref, rsum_scr):
        kernel(idx_ref, meta_ref, h_ref, w_ref, aux3_ref[0], ofq_ref,
               outq_ref, cs_ref, out_ref, rsum_scr)

    return pl.pallas_call(
        kernel2,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, Nq), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * Nq,
            bytes_accessed=M * K + K2w * Nq + M * Nq,
            transcendentals=0),
        interpret=interpret,
    )(idx, meta.astype(jnp.float32), h8, qkvsp["wq"], qaux,
      ofq.astype(jnp.float32), outq.astype(jnp.float32),
      rope_cs.astype(jnp.float32))
