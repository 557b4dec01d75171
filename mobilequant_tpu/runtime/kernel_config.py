"""Typed kernel-dispatch configuration for the integer engine.

The engine's Pallas fast paths used to be selected by substring tests on a
mode string ("w4nomodelk", "mlpblock", …) — a latent-bug machine ("mlp" is a
substring of "nomlpk"). `KernelConfig` is the explicit surface: one boolean
per kernel family, mapped ONCE from the legacy strings here (`coerce`), so
`runtime/engine.py` contains no string matching at all.

Legacy tokens accepted by coerce (bench.py / scripts / old tests):
  False/None/"none" → nothing;  True/"w4" → the default kernel set;
  "all" → + per-matmul W8 kernels;  "pad8" → the M<8 row-padding XLA tweak;
  "attn" → fused decode/prefill attention kernels (disables decode-light);
  "mlp" → fused_mlp partial megakernel;  "mlpblock" (+"vpu") → non-stacked
  whole-MLP-block kernel;  "nomlpk"/"nolayerk"/"nomodelk" → carve-outs of the
  stacked MLP-block / whole-layer / whole-model megakernels.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    """What the engine may dispatch to Pallas. All off = pure-XLA engine."""
    w4_matmul: bool = False        # fused-unpack kernels for nibble-packed W4
                                   # (per-matmul + layer-stacked variants)
    w8_matmul: bool = False        # route decode-sized (M<=32) W8 matmuls
                                   # through the Pallas w8a8 kernel
    pad8: bool = False             # pad M<8 int8 dots to 8 rows (XLA tweak —
                                   # flips the VPU lowering onto the MXU)
    attn_kernel: bool = False      # fused decode/prefill attention kernels;
                                   # mutually exclusive with decode-light and
                                   # the whole-layer/model kernels
    mlp_kernel: bool = False       # fused_mlp partial megakernel (W8 fused
                                   # packs; caller applies the w2 epilogue)
    mlp_block_kernel: bool = False # non-stacked whole-MLP-block kernel
    vpu_matvec: bool = False       # M==1 VPU matvec formulation inside the
                                   # non-stacked MLP-block kernel
    stacked_mlp_kernel: bool = False  # stacked whole-MLP-block kernel (no
                                      # per-layer slice copies)
    gate_kernel: bool = False      # prefill w13+gate epilogue kernel
                                   # (w13 matmul -> act chain -> w2-input
                                   # int8, no (M,2F) fp32 HBM round trip)
                                   # + the qkv epilogue kernel (output fq +
                                   # RoPE + segment quant in-matmul)
    w2fold_kernel: bool = False    # ALSO fold w2 into the gate kernel —
                                   # measured NEGATIVE (555 vs 294 us/layer
                                   # split, 2026-08-20): the in-VMEM (M,F)
                                   # act8 round trip loses to XLA's overlap
                                   # of the split matmuls; kept for re-eval
    otail_kernel: bool = False     # batched-decode o-proj+resid_add_1+MLP
                                   # block in one dispatch (attention-tail
                                   # edition of the stacked MLP kernel)
    stacked_bt_max: int = 64       # max B*T the stacked MLP-block/otail
                                   # kernels accept (decode-sized gate; at
                                   # prefill M the split matmuls win — see
                                   # ops/pallas_mlp.py NOTE). 128 admits
                                   # bs=128 decode (one full MXU tile of rows)
    layer_kernel: bool = False     # whole-decoder-layer megakernel
    model_kernel: bool = False     # whole-model megakernel (decode, B<=8)
    chunk_kernel: bool = False     # batched whole-model kernel for the
                                   # chunked-staging decode path (B=16..128,
                                   # relaxed policy; ops/pallas_chunk.py)
    kv4_attn_kernel: bool = False  # fused decode attention over the nibble-
                                   # packed int4 KV cache (ops/pallas_kv4.py)
                                   # — engages only on kv_bits=4 packs; the
                                   # XLA fallback materializes an unpacked
                                   # slab copy per layer per step
    interpret: bool = False        # run every Pallas kernel in interpret mode
                                   # (CPU tests)

    @property
    def any_kernel(self) -> bool:
        return (self.w4_matmul or self.w8_matmul or self.attn_kernel
                or self.mlp_kernel or self.mlp_block_kernel
                or self.stacked_mlp_kernel or self.layer_kernel
                or self.model_kernel or self.gate_kernel
                or self.otail_kernel or self.chunk_kernel
                or self.kv4_attn_kernel)

    @property
    def use_stacked(self) -> bool:
        """Whether forward() should hand the layer-stacked packs (sp) to the
        layer body (scalar-prefetch weight reads instead of scan slices)."""
        return (self.w4_matmul or self.stacked_mlp_kernel or self.layer_kernel
                or self.model_kernel or self.gate_kernel
                or self.otail_kernel or self.chunk_kernel
                or self.kv4_attn_kernel)

    def replace(self, **kw) -> "KernelConfig":
        return dataclasses.replace(self, **kw)

    @classmethod
    def none(cls) -> "KernelConfig":
        return cls()

    @classmethod
    def default(cls) -> "KernelConfig":
        """The production kernel set (the legacy use_pallas=True/"w4")."""
        return cls(w4_matmul=True, stacked_mlp_kernel=True, layer_kernel=True,
                   model_kernel=True, kv4_attn_kernel=True)

    @classmethod
    def coerce(cls, mode) -> "KernelConfig":
        """Map a legacy use_pallas value (bool / mode string / KernelConfig)
        to a KernelConfig. The ONLY place mode strings are interpreted."""
        if isinstance(mode, cls):
            return mode
        if mode is None or mode is False or mode == "none":
            return cls.none()
        if mode is True:
            return cls.default()
        s = str(mode)
        # "mlp" alone selects fused_mlp; it is also a substring of
        # "mlpblock" and "nomlpk", which mean different things
        mlp_kernel = "mlp" in s and "mlpblock" not in s and "nomlpk" not in s
        mlp_block = "mlpblock" in s
        # a specifically-requested alternate path (attn / mlp / mlpblock)
        # must not be shadowed by the larger megakernels
        alt = "attn" in s or mlp_kernel or mlp_block
        return cls(
            w4_matmul=True,
            w8_matmul="all" in s,
            pad8="pad8" in s,
            attn_kernel="attn" in s,
            mlp_kernel=mlp_kernel,
            mlp_block_kernel=mlp_block,
            gate_kernel="gatek" in s,
            otail_kernel="otail" in s,
            chunk_kernel="chunkk" in s,
            kv4_attn_kernel="nokv4k" not in s,
            w2fold_kernel="w2fold" in s,
            vpu_matvec="vpu" in s,
            stacked_mlp_kernel=("nomlpk" not in s and not mlp_kernel
                                and not mlp_block),
            layer_kernel="nolayerk" not in s and not alt,
            model_kernel="nomodelk" not in s and not alt,
        )
