"""Pallas kernel tests in interpret mode vs the jnp/fake-quant reference
(SURVEY.md §4: Pallas kernels vs jnp reference in interpret mode)."""

import functools
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mobilequant_tpu.ops import qops
from mobilequant_tpu.ops.pallas_matmul import int_linear_pallas, w4a8_matmul
from mobilequant_tpu.quant.quantizer import QuantConfig, scale_offset_from_min_max


@pytest.mark.parametrize("M,K,N", [(1, 256, 512), (8, 512, 1024), (32, 256, 512)])
@pytest.mark.parametrize("symmetric", [True, False])
def test_w4a8_kernel_matches_int_linear(M, K, N, symmetric):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    acfg = QuantConfig(bitwidth=8)
    wcfg = QuantConfig(bitwidth=4, is_per_channel=True, is_symmetric=symmetric)

    s, o = scale_offset_from_min_max(jnp.min(x), jnp.max(x), acfg)
    x8 = qops.quantize_act(x, s, o)
    pack = qops.pack_weight(w, wcfg)
    assert pack["wq"].shape == (K // 2, N)  # nibble-packed

    ref = qops.int_linear(x8, s, o, pack, b)
    out = int_linear_pallas(x8, s, o, pack, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_pack_unpack_nibbles_roundtrip():
    # stored nibbles are UNSIGNED [0,15] (zero-point absorbs the sign)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.integers(0, 16, size=(64, 32)), jnp.int8)
    p = qops.pack_nibbles(q)
    assert p.shape == (32, 32)
    np.testing.assert_array_equal(np.asarray(qops.unpack_nibbles(p)), np.asarray(q))


def test_kernel_handles_leading_batch_dims():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 3, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 256)), jnp.float32)
    wcfg = QuantConfig(bitwidth=4, is_per_channel=True, is_symmetric=True)
    acfg = QuantConfig(bitwidth=8)
    s, o = scale_offset_from_min_max(jnp.min(x), jnp.max(x), acfg)
    x8 = qops.quantize_act(x, s, o)
    pack = qops.pack_weight(w, wcfg)
    ref = qops.int_linear(x8, s, o, pack, None)
    out = int_linear_pallas(x8, s, o, pack, None, interpret=True)
    assert out.shape == (2, 3, 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_w4a16_weight_only_matches_fake_quant():
    """Weight-only path: fp acts × dequantized W4 == fq_weight reference,
    XLA and Pallas implementations both."""
    from mobilequant_tpu.ops.pallas_matmul import w4a16_matmul
    from mobilequant_tpu.quant.quantizer import fake_quant_weight
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 256)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(256,)), jnp.float32)
    for wcfg in [QuantConfig(bitwidth=4, is_per_channel=True, is_symmetric=True),
                 QuantConfig(bitwidth=4, is_per_channel=True)]:
        ref = x @ fake_quant_weight(w, wcfg) + b
        pack = qops.pack_weight(w, wcfg)
        xla = qops.weight_only_linear(x, pack, b)
        np.testing.assert_allclose(np.asarray(xla), np.asarray(ref), rtol=1e-4, atol=1e-4)
        ker = w4a16_matmul(x, pack["wq"], pack["scale"], pack["offset"], b,
                           interpret=True)
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("M", [1, 8])
def test_w8a8_kernel_matches_int_linear(M):
    from mobilequant_tpu.ops.pallas_matmul import w8a8_matmul
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(M, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 512)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(512,)), jnp.float32)
    acfg = QuantConfig(bitwidth=8)
    for wcfg in [QuantConfig(bitwidth=8), QuantConfig(bitwidth=8, is_per_channel=True)]:
        s, o = scale_offset_from_min_max(jnp.min(x), jnp.max(x), acfg)
        x8 = qops.quantize_act(x, s, o)
        pack = qops.pack_weight(w, wcfg)
        ref = qops.int_linear(x8, s, o, pack, b)
        out = w8a8_matmul(x8, pack["wq"], pack["scale"], pack["offset"],
                          pack["colsum"], b, s, o, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_decode_attention_kernel_matches_engine():
    """Fused decode-attention kernel == the XLA attention block, both policies."""
    import jax
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant.policy import default_policy, relax_16bit
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.runtime import engine as E

    cfg = get_config("test-llama")
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    base_policy = default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, base_policy, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, base_policy)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=32)
    packed = E.pack(params, ranges, cfg, base_policy, ecfg)

    for policy in (base_policy, relax_16bit(base_policy)):
        cache = E.init_kv_cache(ecfg, 2)
        # warm the cache with a few positions via the XLA path
        for i in range(4):
            pos = jnp.full((2,), i, jnp.int32)
            _, cache = E.forward(packed, jnp.asarray(tokens[:2, i:i+1]), cfg, policy,
                                 positions=pos[:, None], kv_cache=cache,
                                 cache_position=pos, kv_valid_len=pos + 1)
        pos = jnp.full((2,), 4, jnp.int32)
        args = dict(positions=pos[:, None], kv_cache=cache,
                    cache_position=pos, kv_valid_len=pos + 1)
        ref, _ = E.forward(packed, jnp.asarray(tokens[:2, 4:5]), cfg, policy, **args)
        import mobilequant_tpu.ops.pallas_attention as PA
        orig = PA.decode_attention
        PA.decode_attention = functools.partial(orig, interpret=True)
        try:
            out, _ = E.forward(packed, jnp.asarray(tokens[:2, 4:5]), cfg, policy,
                               use_pallas="attn", **args)
        finally:
            PA.decode_attention = orig
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_fused_mlp_kernel_matches_engine():
    """Fused-MLP megakernel == the engine's XLA MLP block (strict + relaxed)."""
    import jax
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant.policy import default_policy, relax_16bit
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.runtime import engine as E

    cfg = get_config("test-llama")
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    base_policy = default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, base_policy, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, base_policy)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=32)
    packed = E.pack(params, ranges, cfg, base_policy, ecfg)
    assert "w13_proj" in packed["layers"]

    import mobilequant_tpu.ops.pallas_mlp as PM
    orig = PM.fused_mlp
    PM.fused_mlp = functools.partial(orig, interpret=True)
    try:
        for policy in (base_policy, relax_16bit(base_policy)):
            t = jnp.asarray(tokens[:2, :8])
            ref, _ = E.forward(packed, t, cfg, policy)
            out, _ = E.forward(packed, t, cfg, policy, use_pallas="mlp")
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4)
    finally:
        PM.fused_mlp = orig


def test_fused_mlp_block_kernel_matches_engine():
    """Whole-MLP-block megakernel (norm+quant+MLP+requant+residual) == XLA path,
    strict and relaxed, rmsnorm and layernorm."""
    import jax
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant.policy import default_policy, relax_16bit
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.runtime import engine as E
    import mobilequant_tpu.ops.pallas_mlp as PM

    for name in ("test-llama", "test-stablelm"):
        cfg = get_config(name)
        params = M.init_params(cfg, jax.random.PRNGKey(0))
        base_policy = default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8))
        tokens = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16)).astype(np.int32)
        stats = calibrate.run_calibration(params, tokens, cfg, base_policy, batch_size=2)
        ranges = calibrate.stats_to_ranges(stats, base_policy)
        ecfg = E.EngineConfig(model=cfg, max_seq_len=32)
        packed = E.pack(params, ranges, cfg, base_policy, ecfg)

        orig = PM.fused_mlp_block
        PM.fused_mlp_block = functools.partial(orig, interpret=True)
        try:
            for policy in (base_policy, relax_16bit(base_policy)):
                t = jnp.asarray(tokens[:2, :8])
                ref, _ = E.forward(packed, t, cfg, policy)
                out, _ = E.forward(packed, t, cfg, policy, use_pallas="mlpblock")
                np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                           rtol=3e-4, atol=3e-4, err_msg=name)
        finally:
            PM.fused_mlp_block = orig


def test_prefill_attention_kernel_matches_engine():
    """Fused prefill-attention kernel == the XLA prefill attention, strict and
    relaxed policies, with and without a KV cache (GQA shapes)."""
    import jax
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant.policy import default_policy, relax_16bit
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.runtime import engine as E
    import mobilequant_tpu.ops.pallas_prefill_attention as PP

    cfg = get_config("test-llama")
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    base_policy = default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, base_policy, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, base_policy)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=32)
    packed = E.pack(params, ranges, cfg, base_policy, ecfg)

    orig = PP.prefill_attention
    PP.prefill_attention = functools.partial(orig, interpret=True)
    try:
        for policy in (base_policy, relax_16bit(base_policy)):
            t = jnp.asarray(tokens[:2])
            # no-cache prefill (T == S, odd T exercises the padding path)
            ref, _ = E.forward(packed, t[:, :13], cfg, policy)
            out, _ = E.forward(packed, t[:, :13], cfg, policy, use_pallas="attn")
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4)
            # prefill into a cache (S = max_seq_len > T, kv_valid_len mask)
            cache = E.init_kv_cache(ecfg, 2)
            pos = jnp.broadcast_to(jnp.arange(16)[None, :], (2, 16))
            args = dict(positions=pos, kv_cache=cache,
                        cache_position=jnp.zeros((2,), jnp.int32),
                        kv_valid_len=jnp.full((2,), 16, jnp.int32))
            ref, _ = E.forward(packed, t, cfg, policy, **args)
            out, _ = E.forward(packed, t, cfg, policy, use_pallas="attn", **args)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4)
    finally:
        PP.prefill_attention = orig


def test_fused_mlp_block_vpu_matvec_matches_mxu():
    """mm_kind="vpu" (broadcast·multiply·reduce matvec, M=1 decode shape) is
    bit-identical to the MXU formulation."""
    from mobilequant_tpu.ops.pallas_mlp import fused_mlp_block, BLOCK_META_LEN
    rng = np.random.default_rng(7)
    M, K, F = 1, 128, 256
    def pack(k, n):
        return {"wq": jnp.asarray(rng.integers(-128, 128, (k, n)), jnp.int8),
                "scale": jnp.full((n,), 0.01, jnp.float32),
                "offset": jnp.full((n,), 4.0, jnp.float32),
                "colsum": jnp.asarray(rng.normal(size=(n,)), jnp.float32),
                "bias": jnp.asarray(rng.normal(size=(n,)), jnp.float32)}
    w13, w2 = pack(K, 2 * F), pack(F, K)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    meta = jnp.asarray(rng.uniform(0.01, 1.0, BLOCK_META_LEN), jnp.float32)
    meta = meta.at[19].set(1e-5)
    a = fused_mlp_block(x, jnp.ones(K), jnp.zeros(K), w13, w2, meta,
                        interpret=True, block_f=128)
    b = fused_mlp_block(x, jnp.ones(K), jnp.zeros(K), w13, w2, meta,
                        interpret=True, block_f=128, mm_kind="vpu")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_w4a8_stacked_kernel_matches_per_layer():
    """Stacked-layer kernel (scalar-prefetch layer select) == the per-layer
    kernel/closed form on every layer of an (L,K2,N) stack."""
    from mobilequant_tpu.ops.pallas_matmul import int_linear_pallas_stacked

    rng = np.random.default_rng(5)
    L, M, K, N = 3, 2, 256, 512
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    acfg = QuantConfig(bitwidth=8)
    wcfg = QuantConfig(bitwidth=4, is_per_channel=True, is_symmetric=True)
    s, o = scale_offset_from_min_max(jnp.min(x), jnp.max(x), acfg)
    x8 = qops.quantize_act(x, s, o)

    packs = [qops.pack_weight(jnp.asarray(rng.normal(size=(K, N)), jnp.float32),
                              wcfg) for _ in range(L)]
    biases = [jnp.asarray(rng.normal(size=(N,)), jnp.float32) for _ in range(L)]
    spack = {
        "wq": jnp.stack([p["wq"] for p in packs]),
        "scale": jnp.stack([p["scale"] for p in packs]),
        "offset": jnp.stack([p["offset"] for p in packs]),
        "colsum": jnp.stack([p["colsum"] for p in packs]),
        "bias": jnp.stack(biases),
    }
    for li in range(L):
        ref = qops.int_linear(x8, s, o, packs[li], biases[li])
        out = int_linear_pallas_stacked(x8, s, o, spack, jnp.int32(li),
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4, err_msg=f"layer {li}")


def test_engine_stacked_w4_path_matches_unstacked():
    """engine.forward with use_pallas=True routes the scan through the stacked
    kernel; logits must equal the non-pallas engine path exactly."""
    import mobilequant_tpu.ops.pallas_matmul as PM
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.quant.policy import default_policy
    from mobilequant_tpu.runtime import engine as E

    cfg = get_config("test-llama")
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    policy = default_policy(cfg,
                            QuantConfig(bitwidth=4, is_per_channel=True,
                                        is_symmetric=True),
                            QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, policy, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, policy)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=16, weight_bits=4)
    packed = E.pack(params, ranges, cfg, policy, ecfg)
    t = jnp.asarray(tokens)

    ref, _ = E.forward(packed, t, cfg, policy)        # XLA int path
    orig = PM.int_linear_pallas_stacked
    PM.int_linear_pallas_stacked = functools.partial(orig, interpret=True)
    try:
        out, _ = E.forward(packed, t, cfg, policy, use_pallas=True)
    finally:
        PM.int_linear_pallas_stacked = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_w4_mlp_block_stacked_matches_engine():
    """The stacked W4 whole-MLP-block kernel == the XLA engine path exactly
    (same fake-quant ordering), through forward() on an alignment-compatible
    tiny model (D=256, F=512)."""
    import dataclasses
    import mobilequant_tpu.ops.pallas_mlp as PMLP
    import mobilequant_tpu.ops.pallas_matmul as PM
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.quant.policy import default_policy, relax_16bit
    from mobilequant_tpu.runtime import engine as E

    cfg = dataclasses.replace(get_config("test-llama"), hidden_size=256,
                              intermediate_size=512, num_heads=4,
                              num_kv_heads=2, head_dim=64, num_layers=2)
    assert PMLP.w4_mlp_block_supported(cfg.hidden_size, cfg.intermediate_size)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    base = default_policy(cfg,
                          QuantConfig(bitwidth=4, is_per_channel=True,
                                      is_symmetric=True),
                          QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, base, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, base)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=64, weight_bits=4)
    packed = E.pack(params, ranges, cfg, base, ecfg)
    # (2,8): decode-sized M=16; (1,48): a chunked-decode-sized segment past
    # the old M<=32 gate (the block kernel now admits B*T<=64)
    prefill = np.random.default_rng(1).integers(
        0, cfg.vocab_size, (1, 48)).astype(np.int32)

    om, ob = PM.int_linear_pallas_stacked, PMLP.fused_mlp_block_w4_stacked
    PM.int_linear_pallas_stacked = functools.partial(om, interpret=True)
    PMLP.fused_mlp_block_w4_stacked = functools.partial(ob, interpret=True)
    try:
        for toks in (tokens, prefill):
            t = jnp.asarray(toks)
            for policy in (base, relax_16bit(base)):
                ref, _ = E.forward(packed, t, cfg, policy)
                out, _ = E.forward(packed, t, cfg, policy, use_pallas=True)
                np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                           rtol=2e-4, atol=2e-4)
    finally:
        PM.int_linear_pallas_stacked = om
        PMLP.fused_mlp_block_w4_stacked = ob


@pytest.mark.slow
def test_w8_mlp_block_stacked_matches_engine():
    """The W8 edition of the stacked whole-MLP-block kernel (plain int8 packs,
    w2 seg_lo/seg_hi as two row-block operands — the batched-decode serving
    path) == the XLA engine path through forward()."""
    import dataclasses
    import mobilequant_tpu.ops.pallas_mlp as PMLP
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.quant.policy import default_policy, relax_16bit
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.runtime.kernel_config import KernelConfig

    cfg = dataclasses.replace(get_config("test-llama"), hidden_size=256,
                              intermediate_size=512, num_heads=4,
                              num_kv_heads=2, head_dim=64, num_layers=2)
    assert PMLP.w8_mlp_block_supported(cfg.hidden_size, cfg.intermediate_size)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    base = default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, base, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, base)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=64, weight_bits=8)
    packed = E.pack(params, ranges, cfg, base, ecfg)
    # chunked-decode-sized segment (M=48) + decode-sized (M=16)
    prefill = np.random.default_rng(1).integers(
        0, cfg.vocab_size, (1, 48)).astype(np.int32)
    # stacked-MLP-kernel only (no layer/model kernel) — the serving config
    # the batched W8 decode path actually dispatches
    kc = KernelConfig(stacked_mlp_kernel=True)

    ob = PMLP.fused_mlp_block_w4_stacked
    PMLP.fused_mlp_block_w4_stacked = functools.partial(ob, interpret=True)
    try:
        for toks in (tokens, prefill):
            t = jnp.asarray(toks)
            for policy in (base, relax_16bit(base)):
                ref, _ = E.forward(packed, t, cfg, policy)
                out, _ = E.forward(packed, t, cfg, policy, use_pallas=kc)
                np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                           rtol=2e-4, atol=2e-4)

        # batched chunked-staging decode (the bs=32 serving path, B>8 so the
        # whole-model kernel is gated off): staged + W8 stacked-MLP kernel ==
        # staged XLA, logits to fp32 rounding, flushed caches bit-exact
        policy = relax_16bit(base)
        B, Tp, n = 3, 4, 6
        t = jnp.asarray(tokens[:1]).repeat(B, 0)[:, :Tp]
        ca = E.init_kv_cache(ecfg, B)
        pos0 = jnp.zeros((B,), jnp.int32)
        logits, ca = E.forward(packed, t, cfg, policy, kv_cache=ca,
                               cache_position=pos0,
                               kv_valid_len=jnp.full((B,), Tp, jnp.int32))
        first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        cb = E.EngineKVCache(k=ca.k, v=ca.v)
        pos = jnp.full((B,), Tp, jnp.int32)
        _, c_ref, l_ref = E.decode_loop(packed, first, ca, pos, n, cfg,
                                        policy, use_pallas=False,
                                        staging_chunk=4)
        _, c_k, l_k = E.decode_loop(packed, first, cb, pos, n, cfg,
                                    policy, use_pallas=kc, staging_chunk=4)
        np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(c_k.k), np.asarray(c_ref.k))
        np.testing.assert_array_equal(np.asarray(c_k.v), np.asarray(c_ref.v))
    finally:
        PMLP.fused_mlp_block_w4_stacked = ob
    jax.clear_caches()


@pytest.mark.parametrize("wb", [4, 8])
def test_w13_gate_kernel_matches_engine(wb):
    """The prefill w13+gate epilogue kernel (w13 matmul -> w1/w3 fq -> act ->
    gate mul -> w2-input int8, one dispatch over the stacked packs) == the
    XLA split path through forward() at prefill M."""
    import dataclasses
    import mobilequant_tpu.ops.pallas_mlp as PMLP
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.quant.policy import default_policy, relax_16bit
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.runtime.kernel_config import KernelConfig

    cfg = dataclasses.replace(get_config("test-llama"), hidden_size=256,
                              intermediate_size=512, num_heads=4,
                              num_kv_heads=2, head_dim=64, num_layers=2)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    base = default_policy(cfg,
                          QuantConfig(bitwidth=wb, is_per_channel=(wb == 4),
                                      is_symmetric=(wb == 4)),
                          QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, base, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, base)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=128, weight_bits=wb)
    packed = E.pack(params, ranges, cfg, base, ecfg)
    assert PMLP.w13_gate_supported(96, cfg.hidden_size,
                                   cfg.intermediate_size, wb)
    prefill = np.random.default_rng(1).integers(
        0, cfg.vocab_size, (1, 96)).astype(np.int32)
    kc = KernelConfig(gate_kernel=True, w2fold_kernel=True)

    import mobilequant_tpu.ops.pallas_qkv as PQk
    og = PMLP.w13_gate_stacked
    og2 = PMLP.w13_gate_w2_stacked
    ogs = PMLP.w13_gate_w2_supported
    oqk = PQk.qkv_rope_stacked
    PMLP.w13_gate_stacked = functools.partial(og, interpret=True)
    PMLP.w13_gate_w2_stacked = functools.partial(og2, interpret=True)
    PQk.qkv_rope_stacked = functools.partial(oqk, interpret=True)
    try:
        t = jnp.asarray(prefill)
        for policy in (base, relax_16bit(base)):
            ref, _ = E.forward(packed, t, cfg, policy)
            # w2-FOLDED variant (the default dispatch when supported)
            assert PMLP.w13_gate_w2_supported(96, cfg.hidden_size,
                                              cfg.intermediate_size, wb)
            out, _ = E.forward(packed, t, cfg, policy, use_pallas=kc)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4)
            # split variant (TP / unsupported-shape fallback)
            PMLP.w13_gate_w2_supported = lambda *a: False
            try:
                out2, _ = E.forward(packed, t, cfg, policy, use_pallas=kc)
            finally:
                PMLP.w13_gate_w2_supported = ogs
            np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4)
    finally:
        PMLP.w13_gate_stacked = og
        PMLP.w13_gate_w2_stacked = og2
        PMLP.w13_gate_w2_supported = ogs
        PQk.qkv_rope_stacked = oqk
    jax.clear_caches()


@pytest.mark.parametrize("variant", ["llama_gqa64", "stablelm_mha64_partial",
                                     "gemma_mqa128", "llama_gqa64_w8"])
@pytest.mark.slow
def test_whole_layer_w4_kernel_matches_engine_decode(variant):
    """The whole-layer W4 megakernel (norm->qkv->rope->decode-light attention->
    o->residual->MLP, ops/pallas_layer.py) == the XLA engine decode path
    exactly, over a multi-step decode chain through the int8 KV cache."""
    import dataclasses
    import mobilequant_tpu.ops.pallas_layer as PL
    import mobilequant_tpu.ops.pallas_matmul as PM
    import mobilequant_tpu.ops.pallas_mlp as PMLP
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.quant.policy import default_policy, relax_16bit
    from mobilequant_tpu.runtime import engine as E

    if variant.startswith("llama_gqa64"):
        cfg = dataclasses.replace(
            get_config("test-llama"), hidden_size=256, intermediate_size=512,
            num_heads=8, num_kv_heads=4, head_dim=64, num_layers=2)
    elif variant == "stablelm_mha64_partial":
        cfg = dataclasses.replace(
            get_config("test-stablelm"), hidden_size=256, intermediate_size=512,
            num_heads=8, num_kv_heads=8, head_dim=64, num_layers=2)
    else:
        cfg = dataclasses.replace(
            get_config("test-gemma"), hidden_size=256, intermediate_size=512,
            num_heads=4, num_kv_heads=1, head_dim=128, num_layers=2)
    assert PL.layer_kernel_supported(cfg, 128)

    wb = 8 if variant.endswith("_w8") else 4
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    base = default_policy(cfg,
                          QuantConfig(bitwidth=wb, is_per_channel=True,
                                      is_symmetric=(wb == 4)),
                          QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, base, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, base)
    # llama variants also fold the quantized lm_head into the model kernel
    # (W4 body -> h4 head, W8 -> h8); the others keep the bf16 head and cover
    # the logits=None (unfolded) model-kernel path
    hb = wb if variant.startswith("llama") else 16
    ecfg = E.EngineConfig(model=cfg, max_seq_len=128, weight_bits=wb,
                          head_bits=hb)
    packed = E.pack(params, ranges, cfg, base, ecfg)
    assert "qkvp" in packed["layers"] and "op" in packed["layers"]
    if hb != 16:
        import mobilequant_tpu.ops.pallas_layer as _PLs
        assert _PLs.head_kernel_supported(packed["head_q"], cfg.hidden_size)

    orig = (PL.fused_layer_w4_stacked, PL.fused_model_w4_stacked,
            PM.int_linear_pallas_stacked, PMLP.fused_mlp_block_w4_stacked,
            PM.w4a8_matmul)
    PL.fused_layer_w4_stacked = functools.partial(orig[0], interpret=True)
    PL.fused_model_w4_stacked = functools.partial(orig[1], interpret=True)
    PM.int_linear_pallas_stacked = functools.partial(orig[2], interpret=True)
    PMLP.fused_mlp_block_w4_stacked = functools.partial(orig[3], interpret=True)
    PM.w4a8_matmul = functools.partial(orig[4], interpret=True)  # W4 head
    # a third policy with the fused per-channel qkv output fq DISABLED
    # (q/k/v_proj.output -> 32-bit): exercises the per-segment seg-id branch
    # of engine._qkv_ofq_rows
    import dataclasses as _dc
    noofq = dict(base)
    for site in ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"):
        sq = base[site]
        noofq[site] = _dc.replace(sq, output=sq.output.replace(bitwidth=32))
    t = jnp.asarray(tokens[:1])
    try:
        for policy in (base, relax_16bit(base), noofq):
            # prefill all caches identically via the XLA path; then decode:
            # ref = XLA, b = per-LAYER kernel ("w4nomodelk"), m = whole-MODEL
            caches = [E.init_kv_cache(ecfg, 1) for _ in range(3)]
            Tp = 5
            pos0 = jnp.zeros((1,), jnp.int32)
            caches = [E.forward(packed, t[:, :Tp], cfg, policy, kv_cache=cc,
                                cache_position=pos0)[1] for cc in caches]
            for i in range(3):
                pos = jnp.full((1,), Tp + i, jnp.int32)
                outs = []
                for ci, up in enumerate((False, "w4nomodelk", True)):
                    o, caches[ci] = E.forward(
                        packed, t[:, Tp + i:Tp + i + 1], cfg, policy,
                        positions=pos[:, None], kv_cache=caches[ci],
                        cache_position=pos, kv_valid_len=pos + 1,
                        use_pallas=up)
                    outs.append(np.asarray(o))
                np.testing.assert_allclose(outs[1], outs[0],
                                           rtol=2e-4, atol=2e-4)
                np.testing.assert_allclose(outs[2], outs[0],
                                           rtol=2e-4, atol=2e-4)
            # the int8 caches must agree bit-exactly after the chain
            for cc in caches[1:]:
                np.testing.assert_array_equal(np.asarray(cc.k),
                                              np.asarray(caches[0].k))
                np.testing.assert_array_equal(np.asarray(cc.v),
                                              np.asarray(caches[0].v))

            # batched decode (B=4, staggered per-sequence cache positions —
            # exercises the split attention sub-phases): the whole-model
            # kernel must match the XLA path per sequence
            t2 = jnp.asarray(np.tile(tokens[:2], (2, 1)))
            ca2 = E.init_kv_cache(ecfg, 4)
            cb2 = E.init_kv_cache(ecfg, 4)
            pos0 = jnp.zeros((4,), jnp.int32)
            _, ca2 = E.forward(packed, t2[:, :4], cfg, policy, kv_cache=ca2,
                               cache_position=pos0)
            _, cb2 = E.forward(packed, t2[:, :4], cfg, policy, kv_cache=cb2,
                               cache_position=pos0)
            pos = jnp.asarray([4, 3, 2, 4], jnp.int32)
            ref2, ca2 = E.forward(packed, t2[:, 4:5], cfg, policy,
                                  positions=pos[:, None], kv_cache=ca2,
                                  cache_position=pos, kv_valid_len=pos + 1)
            out2, cb2 = E.forward(packed, t2[:, 4:5], cfg, policy,
                                  positions=pos[:, None], kv_cache=cb2,
                                  cache_position=pos, kv_valid_len=pos + 1,
                                  use_pallas=True)
            np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                                       rtol=2e-4, atol=2e-4)
            np.testing.assert_array_equal(np.asarray(cb2.k), np.asarray(ca2.k))
            np.testing.assert_array_equal(np.asarray(cb2.v), np.asarray(ca2.v))

        # serving-sized batch (B=16, above the whole-model kernel's B<=8
        # gate): the stacked per-layer kernels + decode-light + batched
        # cache scatter — one variant/policy to bound interpret time
        if variant == "llama_gqa64":
            B16 = 16
            t16 = jnp.asarray(np.tile(tokens[:2], (8, 1)))
            ca, cb = E.init_kv_cache(ecfg, B16), E.init_kv_cache(ecfg, B16)
            pos0 = jnp.zeros((B16,), jnp.int32)
            _, ca = E.forward(packed, t16[:, :4], cfg, base, kv_cache=ca,
                              cache_position=pos0)
            _, cb = E.forward(packed, t16[:, :4], cfg, base, kv_cache=cb,
                              cache_position=pos0)
            pos = jnp.asarray([4, 3, 2, 4] * 4, jnp.int32)
            ref3, ca = E.forward(packed, t16[:, 4:5], cfg, base,
                                 positions=pos[:, None], kv_cache=ca,
                                 cache_position=pos, kv_valid_len=pos + 1)
            out3, cb = E.forward(packed, t16[:, 4:5], cfg, base,
                                 positions=pos[:, None], kv_cache=cb,
                                 cache_position=pos, kv_valid_len=pos + 1,
                                 use_pallas=True)
            np.testing.assert_allclose(np.asarray(out3), np.asarray(ref3),
                                       rtol=2e-4, atol=2e-4)
            np.testing.assert_array_equal(np.asarray(cb.k), np.asarray(ca.k))
            np.testing.assert_array_equal(np.asarray(cb.v), np.asarray(ca.v))
    finally:
        PL.fused_layer_w4_stacked = orig[0]
        PL.fused_model_w4_stacked = orig[1]
        PM.int_linear_pallas_stacked = orig[2]
        PMLP.fused_mlp_block_w4_stacked = orig[3]
        PM.w4a8_matmul = orig[4]
        # this test compiles ~30 distinct interpret-mode programs per variant;
        # drop them so later tests' XLA:CPU compiles don't hit allocator
        # pressure (observed: segfault in backend_compile_and_load during
        # test_train when the full suite runs in one process)
        jax.clear_caches()


def test_staged_append_matches_dus():
    """The MUST-alias staged-column append kernel == dynamic_update_slice at
    every column, both buffers, window-crossing columns included."""
    from mobilequant_tpu.ops.pallas_scatter import staged_append
    rng = np.random.default_rng(0)
    L, B, Hkv, cs, hd = 3, 2, 2, 16, 64
    sk = jnp.asarray(rng.integers(-128, 127, (L, B, Hkv, cs, hd)), jnp.int8)
    sv = jnp.asarray(rng.integers(-128, 127, (L, B, Hkv, cs, hd)), jnp.int8)
    pk = jnp.asarray(rng.integers(-128, 127, (L, B, Hkv, 1, hd)), jnp.int8)
    pv = jnp.asarray(rng.integers(-128, 127, (L, B, Hkv, 1, hd)), jnp.int8)
    for m in (0, 5, 7, 8, 15):
        rk = jax.lax.dynamic_update_slice(sk, pk, (0, 0, 0, m, 0))
        rv = jax.lax.dynamic_update_slice(sv, pv, (0, 0, 0, m, 0))
        gk, gv = staged_append(sk, sv, pk, pv, jnp.int32(m), interpret=True)
        np.testing.assert_array_equal(np.asarray(gk), np.asarray(rk))
        np.testing.assert_array_equal(np.asarray(gv), np.asarray(rv))
    jax.clear_caches()


@pytest.mark.parametrize("wb", [4, 8])
@pytest.mark.slow
def test_otail_block_kernel_matches_engine(wb):
    """The attention-tail kernel (o-proj -> o fq -> resid_add_1 -> whole MLP
    block, one dispatch) == the XLA engine path through a batched staged
    decode chain — logits to fp32 rounding, flushed caches bit-exact."""
    import dataclasses
    import mobilequant_tpu.ops.pallas_mlp as PMLP
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.quant.policy import default_policy, relax_16bit
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.runtime.kernel_config import KernelConfig

    cfg = dataclasses.replace(get_config("test-llama"), hidden_size=256,
                              intermediate_size=512, num_heads=4,
                              num_kv_heads=2, head_dim=64, num_layers=2)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    base = default_policy(cfg,
                          QuantConfig(bitwidth=wb, is_per_channel=(wb == 4),
                                      is_symmetric=(wb == 4)),
                          QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, base, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, base)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=64, weight_bits=wb)
    packed = E.pack(params, ranges, cfg, base, ecfg)
    kc = KernelConfig(otail_kernel=True)

    ob = PMLP.fused_otail_block_stacked
    PMLP.fused_otail_block_stacked = functools.partial(ob, interpret=True)
    try:
        for policy in (base, relax_16bit(base)):
            # prefill-style forward (M=16 through the kernel)
            t = jnp.asarray(tokens)
            ref, _ = E.forward(packed, t, cfg, policy)
            out, _ = E.forward(packed, t, cfg, policy, use_pallas=kc)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4)

        # staged batched decode chain (the serving shape it targets)
        policy = relax_16bit(base)
        B, Tp, n = 3, 4, 6
        t = jnp.asarray(tokens[:1]).repeat(B, 0)[:, :Tp]
        ca = E.init_kv_cache(ecfg, B)
        pos0 = jnp.zeros((B,), jnp.int32)
        logits, ca = E.forward(packed, t, cfg, policy, kv_cache=ca,
                               cache_position=pos0,
                               kv_valid_len=jnp.full((B,), Tp, jnp.int32))
        first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        cb = E.EngineKVCache(k=ca.k, v=ca.v)
        pos = jnp.full((B,), Tp, jnp.int32)
        _, c_ref, l_ref = E.decode_loop(packed, first, ca, pos, n, cfg,
                                        policy, use_pallas=False,
                                        staging_chunk=4)
        _, c_k, l_k = E.decode_loop(packed, first, cb, pos, n, cfg,
                                    policy, use_pallas=kc, staging_chunk=4)
        np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(c_k.k), np.asarray(c_ref.k))
        np.testing.assert_array_equal(np.asarray(c_k.v), np.asarray(c_ref.v))
    finally:
        PMLP.fused_otail_block_stacked = ob
    jax.clear_caches()


@pytest.mark.slow
def test_stacked_mlp_kernel_bt128_gate():
    """stacked_bt_max=128 admits bs=128 decode (one full MXU tile of rows)
    into the stacked whole-MLP-block kernel: chunked-staging decode at B=128
    matches the XLA engine (logits to fp32 rounding, caches bit-exact)."""
    import dataclasses
    import functools
    import mobilequant_tpu.ops.pallas_mlp as PMLP
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.quant.policy import default_policy, relax_16bit
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.runtime.kernel_config import KernelConfig

    cfg = dataclasses.replace(get_config("test-llama"), hidden_size=256,
                              intermediate_size=512, num_heads=4,
                              num_kv_heads=2, head_dim=64, num_layers=2)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    base = default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, base, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, base)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=32, weight_bits=8)
    packed = E.pack(params, ranges, cfg, base, ecfg)
    policy = relax_16bit(base)
    kc = KernelConfig(stacked_mlp_kernel=True, stacked_bt_max=128)

    ob = PMLP.fused_mlp_block_w4_stacked
    PMLP.fused_mlp_block_w4_stacked = functools.partial(ob, interpret=True)
    try:
        B, Tp, n = 128, 2, 2
        t = jnp.asarray(np.random.default_rng(2).integers(
            0, cfg.vocab_size, (B, Tp)).astype(np.int32))
        ca = E.init_kv_cache(ecfg, B)
        pos0 = jnp.zeros((B,), jnp.int32)
        logits, ca = E.forward(packed, t, cfg, policy, kv_cache=ca,
                               cache_position=pos0,
                               kv_valid_len=jnp.full((B,), Tp, jnp.int32))
        first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        cb = E.EngineKVCache(k=ca.k, v=ca.v)
        pos = jnp.full((B,), Tp, jnp.int32)
        _, c_ref, l_ref = E.decode_loop(packed, first, ca, pos, n, cfg,
                                        policy, use_pallas=False,
                                        staging_chunk=2)
        _, c_k, l_k = E.decode_loop(packed, first, cb, pos, n, cfg,
                                    policy, use_pallas=kc, staging_chunk=2)
        np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(c_k.k), np.asarray(c_ref.k))
        np.testing.assert_array_equal(np.asarray(c_k.v), np.asarray(c_ref.v))
    finally:
        PMLP.fused_mlp_block_w4_stacked = ob
    jax.clear_caches()


@pytest.mark.slow
def test_stacked_mlp_kernel_bt256():
    """B=256 interpret parity for the stacked MLP-block kernel (the envelope
    past the long-standing B<=128 cap): an explicit
    KernelConfig(stacked_bt_max=256) must dispatch the kernel at 256 rows
    (two full MXU tiles of M) and match the XLA engine exactly."""
    import dataclasses
    import mobilequant_tpu.ops.pallas_mlp as PMLP
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.quant.policy import default_policy, relax_16bit
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.runtime.kernel_config import KernelConfig

    cfg = dataclasses.replace(get_config("test-llama"), hidden_size=256,
                              intermediate_size=512, num_heads=4,
                              num_kv_heads=2, head_dim=64, num_layers=2)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    base = default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, base, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, base)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=32, weight_bits=8)
    packed = E.pack(params, ranges, cfg, base, ecfg)
    policy = relax_16bit(base)

    calls = [0]
    ob = PMLP.fused_mlp_block_w4_stacked

    def spy(*a, **kw):
        calls[0] += 1
        kw["interpret"] = True
        return ob(*a, **kw)

    PMLP.fused_mlp_block_w4_stacked = spy
    kc = KernelConfig.default().replace(stacked_bt_max=256)
    try:
        B, Tp, n = 256, 2, 2
        t = jnp.asarray(np.random.default_rng(2).integers(
            0, cfg.vocab_size, (B, Tp)).astype(np.int32))
        ca = E.init_kv_cache(ecfg, B)
        pos0 = jnp.zeros((B,), jnp.int32)
        logits, ca = E.forward(packed, t, cfg, policy, kv_cache=ca,
                               cache_position=pos0,
                               kv_valid_len=jnp.full((B,), Tp, jnp.int32))
        first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        cb = E.EngineKVCache(k=ca.k, v=ca.v)
        pos = jnp.full((B,), Tp, jnp.int32)
        _, c_ref, l_ref = E.decode_loop(packed, first, ca, pos, n, cfg,
                                        policy, use_pallas=False,
                                        staging_chunk=2)
        _, c_k, l_k = E.decode_loop(packed, first, cb, pos, n, cfg,
                                    policy, use_pallas=kc, staging_chunk=2)
        assert calls[0] > 0, "stacked MLP kernel did not dispatch at B=256"
        np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(c_k.k), np.asarray(c_ref.k))
        np.testing.assert_array_equal(np.asarray(c_k.v), np.asarray(c_ref.v))
    finally:
        PMLP.fused_mlp_block_w4_stacked = ob
    jax.clear_caches()


@pytest.mark.slow
def test_decode_loop_auto_raises_bt_gate_at_b128():
    """The shipped entry point — decode_loop(use_pallas=True) — must actually
    dispatch the stacked MLP-block kernel at B=128: the auto-raised
    stacked_bt_max has to reach forward() (round-3 regression: the raise was
    computed on a local and the original bool was passed through, so bs=128
    silently took the XLA fallback). A call-counting interpret-mode spy on
    fused_mlp_block_w4_stacked proves dispatch; logits/caches must match the
    XLA engine."""
    import dataclasses
    import mobilequant_tpu.ops.pallas_mlp as PMLP
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.quant.policy import default_policy, relax_16bit
    from mobilequant_tpu.runtime import engine as E

    cfg = dataclasses.replace(get_config("test-llama"), hidden_size=256,
                              intermediate_size=512, num_heads=4,
                              num_kv_heads=2, head_dim=64, num_layers=2)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    base = default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, base, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, base)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=32, weight_bits=8)
    packed = E.pack(params, ranges, cfg, base, ecfg)
    policy = relax_16bit(base)

    calls = [0]
    ob = PMLP.fused_mlp_block_w4_stacked

    def spy(*a, **kw):
        calls[0] += 1
        kw["interpret"] = True
        return ob(*a, **kw)

    PMLP.fused_mlp_block_w4_stacked = spy
    try:
        B, Tp, n = 128, 2, 2
        t = jnp.asarray(np.random.default_rng(2).integers(
            0, cfg.vocab_size, (B, Tp)).astype(np.int32))
        ca = E.init_kv_cache(ecfg, B)
        pos0 = jnp.zeros((B,), jnp.int32)
        logits, ca = E.forward(packed, t, cfg, policy, kv_cache=ca,
                               cache_position=pos0,
                               kv_valid_len=jnp.full((B,), Tp, jnp.int32))
        first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        cb = E.EngineKVCache(k=ca.k, v=ca.v)
        pos = jnp.full((B,), Tp, jnp.int32)
        _, c_ref, l_ref = E.decode_loop(packed, first, ca, pos, n, cfg,
                                        policy, use_pallas=False,
                                        staging_chunk=2)
        assert calls[0] == 0
        _, c_k, l_k = E.decode_loop(packed, first, cb, pos, n, cfg,
                                    policy, use_pallas=True,
                                    staging_chunk=2)
        assert calls[0] > 0, (
            "decode_loop(use_pallas=True) at B=128 never dispatched the "
            "stacked MLP-block kernel — the auto-raised stacked_bt_max did "
            "not reach forward()")
        np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(c_k.k), np.asarray(c_ref.k))
        np.testing.assert_array_equal(np.asarray(c_k.v), np.asarray(c_ref.v))
    finally:
        PMLP.fused_mlp_block_w4_stacked = ob
    jax.clear_caches()


@pytest.mark.parametrize("variant", ["w4_h4", "w8_h16"])
@pytest.mark.slow
def test_chunk_kernel_matches_staged_engine(variant):
    """The batched whole-model CHUNK kernel (ops/pallas_chunk.py) == the
    staged XLA engine over a chunked decode chain at a serving batch (B=16):
    per-step logits allclose, flushed int8 caches bit-exact. Covers the
    folded quantized head (w4_h4) and the unfolded bf16 head (w8_h16), BOTH
    policies (the 16-bit qk/pv attention fq sites are static trace-time
    flags — the strict policy dispatches the kernel too)."""
    import dataclasses
    import mobilequant_tpu.ops.pallas_chunk as PC
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.quant.policy import default_policy, relax_16bit
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.runtime.kernel_config import KernelConfig

    wb = 4 if variant.startswith("w4") else 8
    hb = 4 if variant.endswith("h4") else 16
    cfg = dataclasses.replace(
        get_config("test-llama"), hidden_size=256, intermediate_size=512,
        num_heads=8, num_kv_heads=4, head_dim=64, num_layers=2)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    base = default_policy(cfg,
                          QuantConfig(bitwidth=wb, is_per_channel=True,
                                      is_symmetric=(wb == 4)),
                          QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, base, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, base)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=128, weight_bits=wb,
                          head_bits=hb)
    packed = E.pack(params, ranges, cfg, base, ecfg)
    assert "qkvp" in packed["layers"]
    assert PC.chunk_kernel_supported(cfg, 128, 16)

    import mobilequant_tpu.ops.pallas_matmul as PM
    oc = PC.fused_model_w4_chunk
    om = PM.w4a8_matmul                 # the W4 quantized head (XLA path)
    PM.w4a8_matmul = functools.partial(om, interpret=True)
    kc = KernelConfig(chunk_kernel=True)
    calls = [0]

    def spy(*a, **kw):
        calls[0] += 1
        return functools.partial(oc, interpret=True)(*a, **kw)

    PC.fused_model_w4_chunk = spy
    try:
        B, Tp, n = 16, 5, 4
        t = jnp.asarray(np.tile(tokens[:2], (8, 1)))[:, :Tp]
        relax = relax_16bit(base)
        for policy, expect_kernel in ((relax, True), (base, True)):
            calls[0] = 0
            ca, cb = E.init_kv_cache(ecfg, B), E.init_kv_cache(ecfg, B)
            pos0 = jnp.zeros((B,), jnp.int32)
            lg, ca = E.forward(packed, t, cfg, policy, kv_cache=ca,
                               cache_position=pos0,
                               kv_valid_len=jnp.full((B,), Tp, jnp.int32))
            _, cb = E.forward(packed, t, cfg, policy, kv_cache=cb,
                              cache_position=pos0,
                              kv_valid_len=jnp.full((B,), Tp, jnp.int32))
            first = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]
            pos = jnp.full((B,), Tp, jnp.int32)
            tk_r, c_ref, l_ref = E.decode_loop(packed, first, ca, pos, n,
                                               cfg, policy, use_pallas=False,
                                               staging_chunk=2)
            tk_k, c_k, l_k = E.decode_loop(packed, first, cb, pos, n,
                                           cfg, policy, use_pallas=kc,
                                           staging_chunk=2)
            assert (calls[0] > 0) == expect_kernel, (calls[0], expect_kernel)
            np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref),
                                       rtol=2e-4, atol=2e-4)
            np.testing.assert_array_equal(np.asarray(c_k.k),
                                          np.asarray(c_ref.k))
            np.testing.assert_array_equal(np.asarray(c_k.v),
                                          np.asarray(c_ref.v))

        if wb == 8:
            # the shipped entry point auto-enables the chunk kernel for W8
            # serving batches (decode_loop 8 < B <= 48 heuristic) — prove
            # use_pallas=True dispatches it; the stacked-MLP kernel the
            # default set also engages needs an interpret patch on CPU
            import mobilequant_tpu.ops.pallas_mlp as PMLPc
            omb = PMLPc.fused_mlp_block_w4_stacked
            PMLPc.fused_mlp_block_w4_stacked = functools.partial(
                omb, interpret=True)
            try:
                calls[0] = 0
                ca2 = E.init_kv_cache(ecfg, B)
                _, ca2 = E.forward(packed, t, cfg, relax, kv_cache=ca2,
                                   cache_position=jnp.zeros((B,), jnp.int32),
                                   kv_valid_len=jnp.full((B,), Tp, jnp.int32))
                E.decode_loop(packed, first, ca2, jnp.full((B,), Tp,
                                                          jnp.int32),
                              2, cfg, relax, use_pallas=True,
                              staging_chunk=2)
                assert calls[0] > 0, "W8 auto-enable did not dispatch"
            finally:
                PMLPc.fused_mlp_block_w4_stacked = omb

        # staggered per-sequence positions (ContinuousBatcher slots): the
        # per-sequence pos/RoPE handling must hold off the uniform case
        calls[0] = 0
        ca, cb = E.init_kv_cache(ecfg, B), E.init_kv_cache(ecfg, B)
        pos0 = jnp.zeros((B,), jnp.int32)
        lg, ca = E.forward(packed, t, cfg, relax, kv_cache=ca,
                           cache_position=pos0,
                           kv_valid_len=jnp.full((B,), Tp, jnp.int32))
        _, cb = E.forward(packed, t, cfg, relax, kv_cache=cb,
                          cache_position=pos0,
                          kv_valid_len=jnp.full((B,), Tp, jnp.int32))
        first = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]
        pos = jnp.asarray([Tp, Tp - 1, Tp - 2, Tp] * 4, jnp.int32)
        _, c_ref, l_ref = E.decode_loop(packed, first, ca, pos, 2, cfg,
                                        relax, use_pallas=False,
                                        staging_chunk=2)
        _, c_k, l_k = E.decode_loop(packed, first, cb, pos, 2, cfg,
                                    relax, use_pallas=kc, staging_chunk=2)
        assert calls[0] > 0
        np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(c_k.k), np.asarray(c_ref.k))
        np.testing.assert_array_equal(np.asarray(c_k.v), np.asarray(c_ref.v))
    finally:
        PC.fused_model_w4_chunk = oc
        PM.w4a8_matmul = om
    jax.clear_caches()


@pytest.mark.parametrize("bblk", ["4", "5"])
@pytest.mark.slow
def test_chunk_kernel_multi_batch_tiles_match_staged_engine(
        bblk, monkeypatch):
    """nab > 1 parity for the chunk kernel's batch-tiled attention phases:
    every other CPU test resolves _pick_attn_bblk to Bblk == B (one attention
    phase), while production shapes (S=1024, B=32 → nab=4) exercise the
    STAGGERED k_map/v_map index maps (negative phase offsets) only on real
    hardware — an off-by-one-phase map would silently corrupt attention.
    MQTPU_CHUNK_BBLK=4 forces nab=4 at B=16 in interpret mode; the "5"
    variant checks a NON-divisor override rounds down to a divisor instead
    of truncating nab (which would skip the trailing sequences' attention
    and consume stale macc_scr scratch). Staggered per-slot positions make
    the per-tile pos indexing observable."""
    import dataclasses
    import mobilequant_tpu.ops.pallas_chunk as PC
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.quant.policy import default_policy, relax_16bit
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.runtime.kernel_config import KernelConfig

    monkeypatch.setenv("MQTPU_CHUNK_BBLK", bblk)
    cfg = dataclasses.replace(
        get_config("test-llama"), hidden_size=256, intermediate_size=512,
        num_heads=8, num_kv_heads=4, head_dim=64, num_layers=2)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    base = default_policy(cfg,
                          QuantConfig(bitwidth=4, is_per_channel=True,
                                      is_symmetric=True),
                          QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, base, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, base)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=128, weight_bits=4,
                          head_bits=4)
    packed = E.pack(params, ranges, cfg, base, ecfg)
    relax = relax_16bit(base)

    import mobilequant_tpu.ops.pallas_matmul as PM
    oc, om = PC.fused_model_w4_chunk, PM.w4a8_matmul
    PM.w4a8_matmul = functools.partial(om, interpret=True)
    calls = [0]

    def spy(*a, **kw):
        calls[0] += 1
        return functools.partial(oc, interpret=True)(*a, **kw)

    PC.fused_model_w4_chunk = spy
    try:
        B, Tp, n = 16, 5, 4
        t = jnp.asarray(np.tile(tokens[:2], (8, 1)))[:, :Tp]
        ca, cb = E.init_kv_cache(ecfg, B), E.init_kv_cache(ecfg, B)
        pos0 = jnp.zeros((B,), jnp.int32)
        lg, ca = E.forward(packed, t, cfg, relax, kv_cache=ca,
                           cache_position=pos0,
                           kv_valid_len=jnp.full((B,), Tp, jnp.int32))
        _, cb = E.forward(packed, t, cfg, relax, kv_cache=cb,
                          cache_position=pos0,
                          kv_valid_len=jnp.full((B,), Tp, jnp.int32))
        first = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]
        # staggered positions: each batch tile must read its own pos rows
        pos = jnp.asarray([Tp, Tp - 1, Tp - 2, Tp] * 4, jnp.int32)
        _, c_ref, l_ref = E.decode_loop(packed, first, ca, pos, n, cfg,
                                        relax, use_pallas=False,
                                        staging_chunk=2)
        _, c_k, l_k = E.decode_loop(packed, first, cb, pos, n, cfg, relax,
                                    use_pallas=KernelConfig(chunk_kernel=True),
                                    staging_chunk=2)
        assert calls[0] > 0
        np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(c_k.k), np.asarray(c_ref.k))
        np.testing.assert_array_equal(np.asarray(c_k.v), np.asarray(c_ref.v))
    finally:
        PC.fused_model_w4_chunk = oc
        PM.w4a8_matmul = om
    jax.clear_caches()


@pytest.mark.parametrize("variant", ["w8_relaxed", "w8_strict", "w4_relaxed"])
@pytest.mark.slow
def test_kv4_attention_kernel_matches_xla_fallback(variant):
    """The fused kv4 decode-attention kernel (ops/pallas_kv4.py — packed-slab
    part-dots, 4-part partwise softmax) == the XLA unpack fallback over a
    staged decode chain: logits allclose, flushed PACKED caches bit-exact.
    Covers both policies (the 16-bit qk/pv fq sites are static flags),
    staggered slot positions (incl. a nibble-boundary straddle), and a B
    that forces multiple batch tiles."""
    import dataclasses
    import mobilequant_tpu.ops.pallas_kv4 as PKV
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.quant.policy import (default_policy, kv_bits_policy,
                                              relax_16bit)
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.runtime.kernel_config import KernelConfig

    wb = 4 if variant.startswith("w4") else 8
    strict = variant.endswith("strict")
    cfg = dataclasses.replace(
        get_config("test-llama"), hidden_size=256, intermediate_size=512,
        num_heads=8, num_kv_heads=4, head_dim=64, num_layers=2)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    base = kv_bits_policy(
        default_policy(cfg, QuantConfig(bitwidth=wb, is_per_channel=(wb == 4),
                                        is_symmetric=(wb == 4)),
                       QuantConfig(bitwidth=8)), 4)
    policy = base if strict else relax_16bit(base)
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, base, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, base)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=64, weight_bits=wb,
                          kv_bits=4)
    packed = E.pack(params, ranges, cfg, base, ecfg)
    assert PKV.kv4_attn_supported(cfg.num_kv_heads, 64, 64, 16)

    ok = PKV.kv4_decode_attention
    calls = [0]

    def spy(*a, **kw):
        calls[0] += 1
        return functools.partial(ok, interpret=True)(*a, **kw)

    PKV.kv4_decode_attention = spy
    # tiny batch-tile target → multiple attention tiles (nab > 1)
    obb = PKV._pick_bblk
    PKV._pick_bblk = lambda B, Hkv, S2, hd, target=0: obb(
        B, Hkv, S2, hd, target=4 * Hkv * S2 * hd)
    kc = KernelConfig(kv4_attn_kernel=True)
    try:
        B, Tp, n = 16, 6, 4
        t = jnp.asarray(np.tile(tokens[:2], (8, 1)))[:, :Tp]
        ca, cb = E.init_kv_cache(ecfg, B), E.init_kv_cache(ecfg, B)
        pos0 = jnp.zeros((B,), jnp.int32)
        lg, ca = E.forward(packed, t, cfg, policy, kv_cache=ca,
                           cache_position=pos0,
                           kv_valid_len=jnp.full((B,), Tp, jnp.int32))
        _, cb = E.forward(packed, t, cfg, policy, kv_cache=cb,
                          cache_position=pos0,
                          kv_valid_len=jnp.full((B,), Tp, jnp.int32))
        first = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]
        # staggered positions; S/2 = 32, slot pattern straddles the boundary
        pos = jnp.asarray([Tp, 31, 30, Tp] * 4, jnp.int32)
        _, c_ref, l_ref = E.decode_loop(packed, first, ca, pos, n, cfg,
                                        policy, use_pallas=False,
                                        staging_chunk=2)
        _, c_k, l_k = E.decode_loop(packed, first, cb, pos, n, cfg,
                                    policy, use_pallas=kc, staging_chunk=2)
        assert calls[0] > 0, "kv4 attention kernel did not dispatch"
        np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(c_k.k), np.asarray(c_ref.k))
        np.testing.assert_array_equal(np.asarray(c_k.v), np.asarray(c_ref.v))
    finally:
        PKV.kv4_decode_attention = ok
        PKV._pick_bblk = obb
    jax.clear_caches()


@pytest.mark.parametrize("variant", ["llama_w4", "llama_w8",
                                     "stablelm_partial", "gemma_hd128"])
def test_qkv_rope_kernel_matches_engine(variant):
    """The prefill qkv epilogue kernel (stacked qkv matmul -> output fq ->
    RoPE -> joint segment int8 quantization, ops/pallas_qkv.py) == the XLA
    path through forward() at prefill M: logits allclose AND the written
    int8 KV cache bit-exact (the cache rows come straight out of the
    kernel). Covers GQA hd=64, W8, partial rotary + qkv bias (stablelm),
    and hd=128 MQA (gemma)."""
    import dataclasses
    import mobilequant_tpu.ops.pallas_qkv as PQ
    import mobilequant_tpu.ops.pallas_mlp as PMLP
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.quant.policy import default_policy, relax_16bit
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.runtime.kernel_config import KernelConfig

    wb = 8 if variant == "llama_w8" else 4
    if variant.startswith("llama"):
        cfg = dataclasses.replace(
            get_config("test-llama"), hidden_size=256, intermediate_size=512,
            num_heads=4, num_kv_heads=2, head_dim=64, num_layers=2)
    elif variant == "stablelm_partial":
        cfg = dataclasses.replace(
            get_config("test-stablelm"), hidden_size=256,
            intermediate_size=512, num_heads=4, num_kv_heads=4, head_dim=64,
            num_layers=2)
    else:
        cfg = dataclasses.replace(
            get_config("test-gemma"), hidden_size=256, intermediate_size=512,
            num_heads=4, num_kv_heads=1, head_dim=128, num_layers=2)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    base = default_policy(cfg,
                          QuantConfig(bitwidth=wb, is_per_channel=(wb == 4),
                                      is_symmetric=(wb == 4)),
                          QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, base, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, base)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=128, weight_bits=wb)
    packed = E.pack(params, ranges, cfg, base, ecfg)
    spq = packed["layers"]["qkv_proj"]
    assert PQ.qkv_kernel_supported(cfg, spq["wq"].shape[2], spq["wq"].shape[1])
    # W8 packs are gated OUT of the engine dispatch (measured slightly
    # negative on chip) — the llama_w8 variant verifies the fallback
    prefill = np.random.default_rng(1).integers(
        0, cfg.vocab_size, (2, 48)).astype(np.int32)
    kc = KernelConfig(gate_kernel=True)

    oq = PQ.qkv_rope_stacked
    og = PMLP.w13_gate_stacked
    og2 = PMLP.w13_gate_w2_stacked
    PQ.qkv_rope_stacked = functools.partial(oq, interpret=True)
    PMLP.w13_gate_stacked = functools.partial(og, interpret=True)
    PMLP.w13_gate_w2_stacked = functools.partial(og2, interpret=True)
    try:
        t = jnp.asarray(prefill)
        for policy in (base, relax_16bit(base)):
            ca, cb = E.init_kv_cache(ecfg, 2), E.init_kv_cache(ecfg, 2)
            pos0 = jnp.zeros((2,), jnp.int32)
            vl = jnp.full((2,), 48, jnp.int32)
            ref, ca = E.forward(packed, t, cfg, policy, kv_cache=ca,
                                cache_position=pos0, kv_valid_len=vl)
            out, cb = E.forward(packed, t, cfg, policy, kv_cache=cb,
                                cache_position=pos0, kv_valid_len=vl,
                                use_pallas=kc)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4)
            np.testing.assert_array_equal(np.asarray(cb.k), np.asarray(ca.k))
            np.testing.assert_array_equal(np.asarray(cb.v), np.asarray(ca.v))
    finally:
        PQ.qkv_rope_stacked = oq
        PMLP.w13_gate_stacked = og
        PMLP.w13_gate_w2_stacked = og2
    jax.clear_caches()
