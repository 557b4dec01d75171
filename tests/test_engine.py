"""Integer engine fidelity ladder: FP ↔ fake-quant sim ↔ packed-int engine.

The engine↔sim rung is the TPU analogue of the reference's HTP-vs-GPU-sim gate
(`np.testing.assert_allclose(qnn_outputs, sim_outputs, rtol=1e-1, atol=1e-3)`,
ref device/export.py:433-437) — ours is far tighter because the integer math is
bit-identical to the sim up to fp32 rounding.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mobilequant_tpu.models import get_config
from mobilequant_tpu.models import model as M
from mobilequant_tpu.ops import qops
from mobilequant_tpu.quant.policy import default_policy
from mobilequant_tpu.quant.quantizer import QuantConfig, fake_quant, fake_quant_weight, scale_offset_from_min_max
from mobilequant_tpu.quant import calibrate, qmodel
from mobilequant_tpu.runtime import engine as E
from mobilequant_tpu.runtime.generate import Generator
from mobilequant_tpu.runtime.sampling import SamplerConfig


def test_int_linear_matches_fake_quant():
    """int8 matmul with affine corrections == fq(x) @ fq(w) exactly."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    acfg = QuantConfig(bitwidth=8)
    for wcfg in [QuantConfig(bitwidth=8), QuantConfig(bitwidth=8, is_per_channel=True),
                 QuantConfig(bitwidth=8, is_symmetric=True),
                 QuantConfig(bitwidth=4, is_per_channel=True, is_symmetric=True),
                 QuantConfig(bitwidth=4, is_per_channel=True)]:
        s, o = scale_offset_from_min_max(jnp.min(x), jnp.max(x), acfg)
        ref = fake_quant(x, s, o, acfg) @ fake_quant_weight(w, wcfg) + b
        pkg = qops.pack_weight(w, wcfg)
        x8 = qops.quantize_act(x, s, o)
        out = qops.int_linear(x8, s, o, pkg, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=str(wcfg))


def _build(name="test-llama", w_bits=8, S=32):
    cfg = get_config(name)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    policy = default_policy(cfg, QuantConfig(bitwidth=w_bits,
                                             is_per_channel=(w_bits == 4),
                                             is_symmetric=(w_bits == 4)),
                            QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 16)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, policy, batch_size=4)
    ranges = calibrate.stats_to_ranges(stats, policy)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=S, weight_bits=w_bits)
    packed = E.pack(params, ranges, cfg, policy, ecfg)
    return cfg, params, policy, ranges, packed, ecfg, tokens


@pytest.mark.parametrize("name,w_bits", [("test-llama", 8), ("test-llama", 4),
                                         ("test-gemma", 8), ("test-stablelm", 8),
                                         ("test-mixtral", 8), ("test-mixtral", 4)],
                         ids=["llama-w8", "llama-w4", "gemma-w8", "stablelm-w8",
                              "mixtral-w8", "mixtral-w4"])
def test_engine_matches_sim(name, w_bits):
    cfg, params, policy, ranges, packed, ecfg, tokens = _build(name, w_bits)
    t = jnp.asarray(tokens[:2])
    sim_logits, _, _ = qmodel.qforward(params, {"ranges": ranges}, t, cfg, policy)
    eng_logits, _ = E.forward(packed, t, cfg, policy)
    sim_np, eng_np = np.asarray(sim_logits), np.asarray(eng_logits)
    # fp32-rounding-level agreement (integer math is exact in real arithmetic)
    rel = np.abs(eng_np - sim_np).max() / (np.abs(sim_np).max() + 1e-9)
    assert rel < 2e-3, rel


def test_expert_nibble_pack_roundtrip():
    """Per-expert block-nibble packing packs each expert's K axis independently."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.integers(0, 16, (3, 8, 16)), jnp.int8)
    p = qops.pack_nibbles(q)
    assert p.shape == (3, 4, 16)
    np.testing.assert_array_equal(np.asarray(qops.unpack_nibbles(p)), np.asarray(q))
    for e in range(3):   # must equal the 2-D packing of each expert slice
        np.testing.assert_array_equal(np.asarray(p[e]),
                                      np.asarray(qops.pack_nibbles(q[e])))


@pytest.mark.parametrize("name", ["test-llama", "test-mixtral"],
                         ids=["llama", "mixtral"])
def test_engine_decode_matches_prefill(name):
    """Token-by-token decode through the int8 KV cache == full prefill logits."""
    cfg, params, policy, ranges, packed, ecfg, tokens = _build(name)
    T = 10
    t = jnp.asarray(tokens[:2, :T])
    full, _ = E.forward(packed, t, cfg, policy)

    cache = E.init_kv_cache(ecfg, 2)
    outs = []
    for i in range(T):
        pos = jnp.full((2,), i, jnp.int32)
        logits, cache = E.forward(packed, t[:, i:i + 1], cfg, policy,
                                  positions=pos[:, None], kv_cache=cache,
                                  cache_position=pos, kv_valid_len=pos + 1)
        outs.append(np.asarray(logits[:, 0]))
    dec = np.stack(outs, axis=1)
    np.testing.assert_allclose(dec, np.asarray(full), rtol=1e-3, atol=1e-3)


def _build_kv4(name="test-llama", w_bits=8, S=32):
    """_build with the int4-KV policy (4-bit qk/pv input2) + packed cache."""
    from mobilequant_tpu.quant.policy import kv_bits_policy
    cfg = get_config(name)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    policy = kv_bits_policy(
        default_policy(cfg, QuantConfig(bitwidth=w_bits,
                                        is_per_channel=(w_bits == 4),
                                        is_symmetric=(w_bits == 4)),
                       QuantConfig(bitwidth=8)), 4)
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (4, 16)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, policy, batch_size=4)
    ranges = calibrate.stats_to_ranges(stats, policy)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=S, weight_bits=w_bits,
                          kv_bits=4)
    packed = E.pack(params, ranges, cfg, policy, ecfg)
    return cfg, params, policy, ranges, packed, ecfg, tokens


@pytest.mark.parametrize("w_bits", [8, 4], ids=["w8", "w4"])
def test_engine_kv4_matches_sim_and_decode_chain(w_bits):
    """int4 KV cache: the engine == the fake-quant sim under the 4-bit KV
    policy (kv_bits_policy), and token-by-token decode through the PACKED
    cache reproduces the full-prefill logits — the nibble pack/unpack and
    the per-step nibble-merge write are exact re-expressions of the 4-bit
    fake quant."""
    cfg, params, policy, ranges, packed, ecfg, tokens = _build_kv4(
        w_bits=w_bits)
    T = 10
    t = jnp.asarray(tokens[:2, :T])
    sim_logits, _, _ = qmodel.qforward(params, {"ranges": ranges}, t, cfg,
                                       policy)
    full, _ = E.forward(packed, t, cfg, policy)
    rel = np.abs(np.asarray(full) - np.asarray(sim_logits)).max() \
        / (np.abs(np.asarray(sim_logits)).max() + 1e-9)
    # W4 weights + 4-bit KV: coarse quantizers turn fp32 ordering deltas into
    # occasional rounding-bucket flips on this tiny random model (3.1e-3
    # observed); the engine-internal exactness gates below are the bit-level
    # check — this rung asserts the sim tracks the engine closely
    assert rel < (6e-3 if w_bits == 4 else 2e-3), rel

    cache = E.init_kv_cache(ecfg, 2)
    # nibble-packed, hd-major (L,B,Hkv,hd,S/2)
    assert cache.k.shape[4] == ecfg.max_seq_len // 2
    assert cache.k.shape[3] == cfg.head_dim_
    outs = []
    for i in range(T):
        pos = jnp.full((2,), i, jnp.int32)
        logits, cache = E.forward(packed, t[:, i:i + 1], cfg, policy,
                                  positions=pos[:, None], kv_cache=cache,
                                  cache_position=pos, kv_valid_len=pos + 1)
        outs.append(np.asarray(logits[:, 0]))
    dec = np.stack(outs, axis=1)
    # W4: prefill and decode are different XLA programs; 4-bit quantizer
    # boundary flips on their fp32 ordering deltas produce rare ~2e-3
    # outliers (max observed 1.8e-3, none above 1e-2)
    tol = 5e-3 if w_bits == 4 else 1e-3
    np.testing.assert_allclose(dec, np.asarray(full), rtol=tol, atol=tol)


def test_kv4_staged_decode_loop_matches_stepwise():
    """decode_loop's chunked-staging path over the packed cache (staged int8
    rows, per-chunk nibble-merge flush, packed-byte K colsums) matches
    per-step forward() decode exactly: logits allclose, final packed caches
    bit-identical. Staggered slot positions exercise flush windows that
    straddle the lo/hi nibble boundary."""
    cfg, params, policy, ranges, packed, ecfg, tokens = _build_kv4()
    B, Tp, n = 2, 6, 4
    t = jnp.asarray(tokens[:B, :Tp])
    ca, cb = E.init_kv_cache(ecfg, B), E.init_kv_cache(ecfg, B)
    pos0 = jnp.zeros((B,), jnp.int32)
    lg, ca = E.forward(packed, t, cfg, policy, kv_cache=ca,
                       cache_position=pos0,
                       kv_valid_len=jnp.full((B,), Tp, jnp.int32))
    _, cb = E.forward(packed, t, cfg, policy, kv_cache=cb,
                      cache_position=pos0,
                      kv_valid_len=jnp.full((B,), Tp, jnp.int32))
    np.testing.assert_array_equal(np.asarray(ca.k), np.asarray(cb.k))
    first = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]
    # staggered positions: one slot's flush window straddles S/2 = 16
    pos = jnp.asarray([Tp, 15], jnp.int32)
    tk_l, c_loop, l_loop = E.decode_loop(packed, first, ca, pos, n, cfg,
                                         policy, staging_chunk=2)
    # stepwise reference: per-token forward with the packed-cache merge
    tok, cache = first, cb
    outs = []
    p = pos
    for i in range(n):
        lg_s, cache = E.forward(packed, tok, cfg, policy,
                                positions=p[:, None], kv_cache=cache,
                                cache_position=p, kv_valid_len=p + 1)
        tok = jnp.argmax(lg_s[:, -1], -1).astype(jnp.int32)[:, None]
        outs.append(tok[:, 0])
        p = p + 1
    np.testing.assert_array_equal(np.asarray(tk_l),
                                  np.stack([np.asarray(o) for o in outs], 1))
    np.testing.assert_allclose(np.asarray(l_loop), np.asarray(lg_s[:, -1]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(c_loop.k), np.asarray(cache.k))
    np.testing.assert_array_equal(np.asarray(c_loop.v), np.asarray(cache.v))


def test_kv4_chunked_prefill_and_batcher_match_generator():
    """int4 KV end to end: chunked prefill through a packed scratch cache
    (forward's T>1 unpack→repack) equals the one-pass prefill bit-exactly on
    the cache, and the ContinuousBatcher (chunk_prefill, packed slot cache)
    reproduces the Generator's greedy stream."""
    from mobilequant_tpu.runtime.serve import ContinuousBatcher
    cfg, params, policy, ranges, packed, ecfg, tokens = _build_kv4()
    B, Tp = 2, 8
    t = jnp.asarray(tokens[:B, :Tp])
    # one-pass vs 2×4-chunk prefill into the packed cache
    ca, cb = E.init_kv_cache(ecfg, B), E.init_kv_cache(ecfg, B)
    pos0 = jnp.zeros((B,), jnp.int32)
    lg_a, ca = E.forward(packed, t, cfg, policy, kv_cache=ca,
                         cache_position=pos0,
                         kv_valid_len=jnp.full((B,), Tp, jnp.int32))
    C = 4
    for ci in range(2):
        lg_b, cb = E.forward(
            packed, t[:, ci * C:(ci + 1) * C], cfg, policy,
            positions=(ci * C + jnp.arange(C))[None, :].repeat(B, 0),
            kv_cache=cb, cache_position=jnp.full((B,), ci * C, jnp.int32),
            kv_valid_len=jnp.full((B,), (ci + 1) * C, jnp.int32))
    np.testing.assert_array_equal(np.asarray(ca.k), np.asarray(cb.k))
    np.testing.assert_array_equal(np.asarray(ca.v), np.asarray(cb.v))
    np.testing.assert_allclose(np.asarray(lg_a[:, -1]),
                               np.asarray(lg_b[:, -1]), rtol=2e-4, atol=2e-4)

    gen = Generator(packed, cfg, policy, ecfg)
    prompts = [np.asarray(tokens[0, :7], np.int32),
               np.asarray(tokens[1, :5], np.int32)]
    want = [gen.generate(p[None, :], max_new_tokens=6)[0].tolist()
            for p in prompts]
    cb2 = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=2,
                            sampler=SamplerConfig(greedy=True),
                            chunk_prefill=8, chunk_decode=2)
    rids = [cb2.submit(p, 6) for p in prompts]
    outs = cb2.run()
    assert [outs[r] for r in rids] == want, (outs, want)


def test_generator_greedy_selfconsistent():
    cfg, params, policy, ranges, packed, ecfg, tokens = _build()
    gen = Generator(packed, cfg, policy, ecfg)
    out, stats = gen.generate(tokens[:2, :8], max_new_tokens=6,
                              sampler=SamplerConfig(greedy=True), return_stats=True)
    assert out.shape == (2, 6)
    assert (out >= 0).all() and (out < cfg.vocab_size).all()
    assert stats["decode_tok_s"] > 0

    # greedy decode must be reproducible
    out2 = gen.generate(tokens[:2, :8], max_new_tokens=6,
                        sampler=SamplerConfig(greedy=True))
    np.testing.assert_array_equal(out, out2)


def test_global_kv_encoding_mode():
    cfg = get_config("test-llama")
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    policy = default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, policy, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, policy)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=32, global_kv_encoding=True)
    packed = E.pack(params, ranges, cfg, policy, ecfg)
    # one global K encoding across layers (ref calibrate.py:275-281)
    ks = np.asarray(packed["ranges"]["self_attn.qk_bmm"]["input2"]["scale"])
    assert np.allclose(ks, ks[0])
    logits, _ = E.forward(packed, jnp.asarray(tokens), cfg, policy)
    assert np.isfinite(np.asarray(logits)).all()


def test_sampling_top_p_top_k():
    from mobilequant_tpu.runtime.sampling import sample
    logits = jnp.asarray([[0.0, 1.0, 2.0, 10.0]])
    key = jax.random.PRNGKey(0)
    # top_k=1 == greedy
    t = sample(logits, key, SamplerConfig(temperature=1.0, top_k=1))
    assert int(t[0]) == 3
    # top_p tiny == greedy
    t = sample(logits, key, SamplerConfig(temperature=1.0, top_p=0.01))
    assert int(t[0]) == 3
    # temperature sampling stays in-range
    t = sample(logits, key, SamplerConfig(temperature=5.0))
    assert 0 <= int(t[0]) < 4


def test_generate_fast_matches_stepwise_greedy():
    """In-graph chunked decode (lax.scan loop) must equal per-step greedy decode."""
    cfg, params, policy, ranges, packed, ecfg, tokens = _build()
    gen = Generator(packed, cfg, policy, ecfg)
    slow = gen.generate(tokens[:2, :8], max_new_tokens=10,
                        sampler=SamplerConfig(greedy=True))
    fast = gen.generate_fast(tokens[:2, :8], max_new_tokens=10, chunk=4)
    np.testing.assert_array_equal(fast, slow)


def test_pad8_mode_matches_default():
    """M-padding mode (MXU routing workaround) is numerically identical."""
    cfg, params, policy, ranges, packed, ecfg, tokens = _build()
    t = jnp.asarray(tokens[:2, :1])
    ref, _ = E.forward(packed, t, cfg, policy,
                       positions=jnp.zeros((2, 1), jnp.int32),
                       kv_cache=E.init_kv_cache(ecfg, 2),
                       cache_position=jnp.zeros((2,), jnp.int32),
                       kv_valid_len=jnp.ones((2,), jnp.int32))
    out, _ = E.forward(packed, t, cfg, policy,
                       positions=jnp.zeros((2, 1), jnp.int32),
                       kv_cache=E.init_kv_cache(ecfg, 2),
                       cache_position=jnp.zeros((2,), jnp.int32),
                       kv_valid_len=jnp.ones((2,), jnp.int32), use_pallas="pad8")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_int_head_linear_matches_closed_form():
    """Dynamic-A8 × per-channel sym W8/W4 head == fq_dyn(x) @ fq(w) exactly."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(5, 32)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(32, 48)), jnp.float32)
    for bits in (8, 4):
        wcfg = QuantConfig(bitwidth=bits, is_symmetric=True, is_per_channel=True)
        # closed-form dynamic per-row symmetric act fq
        s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-8) / 127.0
        xfq = jnp.round(jnp.clip(x / s, -127, 127)) * s
        ref = xfq @ fake_quant_weight(w, wcfg)
        out = qops.int_head_linear(x, qops.pack_weight(w, wcfg))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4, err_msg=f"bits={bits}")


@pytest.mark.parametrize("name,head_bits", [("test-llama", 8), ("test-gemma", 8),
                                            ("test-llama", 4)],
                         ids=["untied-w8", "tied-w8", "untied-w4"])
def test_engine_quantized_head(name, head_bits):
    """head_bits=8/4 (the device graph's SLinear head) stays close to the fp
    head on the same packed model; decode-through-cache stays self-consistent."""
    cfg = get_config(name)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    policy = default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 12)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, policy, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, policy)
    ecfg_fp = E.EngineConfig(model=cfg, max_seq_len=32)
    ecfg_q = E.EngineConfig(model=cfg, max_seq_len=32, head_bits=head_bits)
    packed_fp = E.pack(params, ranges, cfg, policy, ecfg_fp)
    packed_q = E.pack(params, ranges, cfg, policy, ecfg_q)
    assert "head_q" in packed_q and "lm_head" not in packed_q
    t = jnp.asarray(tokens)
    ref, _ = E.forward(packed_fp, t, cfg, policy)
    out, _ = E.forward(packed_q, t, cfg, policy)
    ref_np, out_np = np.asarray(ref), np.asarray(out)
    rel = np.abs(out_np - ref_np).max() / (np.abs(ref_np).max() + 1e-9)
    assert rel < (0.02 if head_bits == 8 else 0.15), rel
    # argmax (greedy token choice) should essentially never flip at W8
    if head_bits == 8:
        agree = (ref_np.argmax(-1) == out_np.argmax(-1)).mean()
        assert agree > 0.95, agree


def test_forward_logits_at_matches_full():
    """logits_at (single-row lm_head at generation prefill) == the same row of
    the full-T logits, for the bf16, W8, and W4 heads, incl. ragged batches."""
    cfg, params, policy, ranges, packed, ecfg, tokens = _build("test-llama", 8)
    t = jnp.asarray(tokens[:2])
    idx = jnp.asarray([t.shape[1] - 1, 7], jnp.int32)   # ragged last positions
    full, _ = E.forward(packed, t, cfg, policy)
    one, _ = E.forward(packed, t, cfg, policy, logits_at=idx)
    assert one.shape == (2, 1, cfg.vocab_size)
    for b in range(2):
        np.testing.assert_allclose(np.asarray(one[b, 0]),
                                   np.asarray(full[b, int(idx[b])]),
                                   rtol=1e-6, atol=1e-6)
    # quantized heads go through the same sliced path
    for hb in (8, 4):
        ecfg_q = E.EngineConfig(model=cfg, max_seq_len=32, head_bits=hb)
        packed_q = E.pack(params, ranges, cfg, policy, ecfg_q)
        full_q, _ = E.forward(packed_q, t, cfg, policy)
        one_q, _ = E.forward(packed_q, t, cfg, policy, logits_at=idx)
        for b in range(2):
            np.testing.assert_allclose(np.asarray(one_q[b, 0]),
                                       np.asarray(full_q[b, int(idx[b])]),
                                       rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("w_bits", [8, 4], ids=["w8", "w4"])
def test_moe_sparse_decode_matches_dense(w_bits):
    """B=1 MoE decode takes the sparse top-k dispatch (only the routed experts
    compute); logits must match the dense-dispatch prefill of the same tokens.
    W4 additionally routes the expert select through the stacked Pallas kernel
    ((L*E)-flat scalar-prefetch index) in interpret mode."""
    import functools
    import mobilequant_tpu.ops.pallas_matmul as PM
    cfg, params, policy, ranges, packed, ecfg, tokens = _build("test-mixtral", w_bits)
    assert cfg.num_experts_per_tok < cfg.num_local_experts
    T = 8
    t = jnp.asarray(tokens[:1, :T])
    full, _ = E.forward(packed, t, cfg, policy)           # dense (T > 1)

    def decode_chain(use_pallas):
        cache = E.init_kv_cache(ecfg, 1)
        outs = []
        for i in range(T):
            pos = jnp.full((1,), i, jnp.int32)
            logits, cache = E.forward(packed, t[:, i:i + 1], cfg, policy,
                                      positions=pos[:, None], kv_cache=cache,
                                      cache_position=pos, kv_valid_len=pos + 1,
                                      use_pallas=use_pallas)
            outs.append(np.asarray(logits[:, 0]))
        return np.stack(outs, axis=1)

    dec = decode_chain(False)
    np.testing.assert_allclose(dec, np.asarray(full), rtol=1e-3, atol=1e-3)
    if w_bits == 4:
        om = PM.int_linear_pallas_stacked
        PM.int_linear_pallas_stacked = functools.partial(om, interpret=True)
        try:
            dec_k = decode_chain("w4nomodelk")
        finally:
            PM.int_linear_pallas_stacked = om
        np.testing.assert_allclose(dec_k, dec, rtol=2e-4, atol=2e-4)


def test_speculative_decode_matches_greedy():
    """Greedy speculative decoding emits exactly the plain greedy chain for
    ANY draft (good prompt-lookup drafts AND adversarial random drafts only
    change speed, never tokens); rejected draft rows never pollute the cache."""
    from mobilequant_tpu.runtime.generate import Generator, prompt_lookup_draft
    cfg, params, policy, ranges, packed, ecfg, tokens = _build("test-llama", 8)
    gen = Generator(packed, cfg, policy, ecfg)
    # repetitive prompt: prompt-lookup drafting has something to copy
    prompt = np.asarray([[7, 3, 9, 4, 7, 3, 9, 4, 7, 3]], np.int32)
    want = np.asarray(gen.generate(prompt, 12))[0].tolist()

    got, stats = gen.generate_speculative(prompt, 12, k=4, return_stats=True)
    assert np.asarray(got)[0].tolist() == want
    assert stats["verify_calls"] <= 12

    rng = np.random.default_rng(0)
    bad_draft = lambda hist, n: [int(x) for x in
                                 rng.integers(0, cfg.vocab_size, n)]
    got_bad = gen.generate_speculative(prompt, 12, k=4, draft_fn=bad_draft)
    assert np.asarray(got_bad)[0].tolist() == want

    # eos handling: truncate at the first eos the chain produces
    eos = want[5]
    got_eos = gen.generate_speculative(prompt, 12, k=4, eos_token_id=eos)
    lst = np.asarray(got_eos)[0].tolist()
    assert lst == want[:want.index(eos) + 1]

    # the default draft helper proposes continuations from history
    assert prompt_lookup_draft([1, 2, 3, 1, 2], 2) == [3, 1]


def test_in_graph_speculative_matches_greedy():
    """The IN-GRAPH speculative loop (generate_speculative_fast: lax.scan
    over draft→verify rounds, device-side prompt-lookup / self-draft) emits
    exactly the plain greedy chain; _ig_lookup_draft twins the host
    prompt_lookup_draft semantics."""
    import jax.numpy as jnp
    from mobilequant_tpu.runtime.generate import (Generator, _ig_lookup_draft,
                                                  prompt_lookup_draft)
    cfg, params, policy, ranges, packed, ecfg, tokens = _build("test-llama", 8)
    gen = Generator(packed, cfg, policy, ecfg)
    prompt = np.asarray([[7, 3, 9, 4, 7, 3, 9, 4, 7, 3]], np.int32)
    want = np.asarray(gen.generate(prompt, 12))[0].tolist()

    got, stats = gen.generate_speculative_fast(prompt, 12, k=4,
                                               rounds_per_chunk=3,
                                               return_stats=True)
    assert np.asarray(got)[0].tolist() == want
    assert stats["verify_calls"] >= 1

    # self-draft edition (catch-up + in-scan T=1 draft steps)
    got_sd = gen.generate_speculative_fast(prompt, 12, k=4,
                                           self_draft_layers=1,
                                           rounds_per_chunk=3)
    assert np.asarray(got_sd)[0].tolist() == want

    # eos truncation
    eos = want[5]
    got_eos = gen.generate_speculative_fast(prompt, 12, k=4, eos_token_id=eos)
    assert np.asarray(got_eos)[0].tolist() == want[:want.index(eos) + 1]

    # the in-graph draft == the host draft on assorted histories
    rng = np.random.default_rng(0)
    for n in (1, 3):
        for hist in ([1, 2, 3, 1, 2], [5, 5, 5, 5], [9, 8], [4, 1, 4, 1, 4],
                     list(rng.integers(0, 6, 17))):
            S = 32
            buf = jnp.zeros((S,), jnp.int32).at[:len(hist)].set(
                jnp.asarray(hist, jnp.int32))
            got_d = np.asarray(_ig_lookup_draft(
                buf, jnp.int32(len(hist)), n)).tolist()
            assert got_d == prompt_lookup_draft(hist, n), (hist, n)


def test_quantized_head_kernel_batched_rows():
    """W4 head through the fused-unpack kernel at B·T > 1: the per-row dynamic
    scales multiply the kernel output (exact — symmetric acts, no bias, the
    affine bracket is row-local). Interpret mode vs int_head_linear."""
    key = jax.random.PRNGKey(3)
    kw_, ky = jax.random.split(key)
    D, V = 64, 4096
    w = jax.random.normal(kw_, (D, V), jnp.float32)
    hq = E.pack_head(w, QuantConfig(bitwidth=4, is_per_channel=True,
                                    is_symmetric=True))
    for B, T in ((1, 1), (3, 1), (8, 2)):
        y = jax.random.normal(ky, (B, T, D), jnp.float32) * (1.0 + jnp.arange(
            B * T, dtype=jnp.float32).reshape(B, T, 1))   # distinct row scales
        ref = qops.int_head_linear(y, hq)[..., :V]
        got = E.quantized_head_logits(y, hq, V, use_kernel=True,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)


def test_int_matmul_qk_precomputed_colsum():
    """int_matmul_qk(k_colsum=Σ_hd k) is bit-identical to the inline reduction
    (the chunk-constant StagedKVCache.kcs path: one K pass per chunk instead
    of a per-step slab re-read)."""
    key = jax.random.PRNGKey(0)
    kq, kk = jax.random.split(key)
    q = jax.random.randint(kq, (2, 3, 4, 64), -128, 128, jnp.int8)
    k = jax.random.randint(kk, (2, 3, 16, 64), -128, 128, jnp.int8)
    args = (0.013, 131.0, 0.021, 119.0)
    ref = qops.int_matmul_qk(q, k, *args)
    kcs = jnp.sum(k.astype(jnp.int32), axis=-1).astype(jnp.float32)
    got = qops.int_matmul_qk(q, k, *args, k_colsum=kcs)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("staging_chunk", [32, 3])
def test_decode_loop_staged_matches_stepwise(staging_chunk):
    """Chunked-staging decode (cache read-only per chunk, staged K/V columns
    in attention, one flush per chunk) == the per-step forward chain: logits
    to fp32-rounding tolerance, flushed int8 caches bit-exactly.

    staging_chunk=3 with n=6 exercises the OUTER chunk scan (two chunks:
    flush + fresh K colsums between them); 32 is the single-chunk path."""
    cfg, params, policy, ranges, packed, ecfg, tokens = _build()
    B, Tp, n = 3, 4, 6
    t = jnp.asarray(tokens[:B, :Tp])

    # shared prefill
    ca = E.init_kv_cache(ecfg, B)
    pos0 = jnp.zeros((B,), jnp.int32)
    logits, ca = E.forward(packed, t, cfg, policy, kv_cache=ca,
                           cache_position=pos0,
                           kv_valid_len=jnp.full((B,), Tp, jnp.int32))
    first = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
    cb = E.EngineKVCache(k=ca.k, v=ca.v)

    # per-step reference chain
    tok = first
    pos = jnp.full((B,), Tp, jnp.int32)
    ref_toks, ref_last = [], None
    for _ in range(n):
        lg, ca = E.forward(packed, tok, cfg, policy, positions=pos[:, None],
                           kv_cache=ca, cache_position=pos,
                           kv_valid_len=pos + 1)
        ref_last = lg[:, -1]
        tok = jnp.argmax(ref_last, -1).astype(jnp.int32)[:, None]
        ref_toks.append(np.asarray(tok[:, 0]))
        pos = pos + 1

    # chunked staging path (use_pallas=False → staging on any B)
    toks, cb, last = E.decode_loop(packed, first, cb,
                                   jnp.full((B,), Tp, jnp.int32), n, cfg,
                                   policy, use_pallas=False,
                                   staging_chunk=staging_chunk)
    got = [np.asarray(toks[:, i]) for i in range(n)]
    # tokens can flip only at near-tie logits; require logits agreement
    np.testing.assert_allclose(np.asarray(last), np.asarray(ref_last),
                               rtol=2e-4, atol=2e-4)
    for i in range(n):
        np.testing.assert_array_equal(got[i], ref_toks[i])
    # flushed caches: rows Tp..Tp+n-1 must be bit-identical to the per-step
    # scatter's (same int8 quantization of the same K/V rows)
    np.testing.assert_array_equal(np.asarray(cb.k), np.asarray(ca.k))
    np.testing.assert_array_equal(np.asarray(cb.v), np.asarray(ca.v))


def test_self_draft_speculative_matches_greedy():
    """Truncated-layer SELF-draft speculative decoding (first N layers + the
    final norm/head as the proposer, own N-deep KV cache) emits exactly the
    plain greedy chain; the draft cache discipline (segment anchored at the
    first unwritten row) keeps proposals deterministic across rounds."""
    from mobilequant_tpu.runtime.generate import Generator, SelfDraft
    cfg, params, policy, ranges, packed, ecfg, tokens = _build("test-llama", 8)
    gen = Generator(packed, cfg, policy, ecfg)
    prompt = np.asarray(tokens[:1, :6], np.int32)
    want = np.asarray(gen.generate(prompt, 14))[0].tolist()

    for nd in (1, cfg.num_layers - 1):
        got, stats = gen.generate_speculative(
            prompt, 14, k=4, self_draft_layers=nd, return_stats=True)
        assert np.asarray(got)[0].tolist() == want, nd
        assert stats["verify_calls"] >= 1

    # a draft as deep as the model accepts (greedily) everything: the
    # early-exit chain IS the greedy chain, so one verify per k-1 tokens
    sd = SelfDraft(gen, cfg.num_layers)
    sd.prefill(prompt)
    logits, _ = E.forward(packed, jnp.asarray(prompt), cfg, policy)
    cur = int(np.asarray(jnp.argmax(logits[0, -1])))
    props = sd.propose([cur], prompt.shape[1], prompt.shape[1], 3)
    full_chain = want[1:4] if want[0] == cur else None
    if full_chain is not None:
        assert props == full_chain


def test_smooth_last_head_fold():
    """smooth_last (the reference's final-norm -> lm_head SmoothQuant fold,
    device/convert_sim.py:114-128): FP-output-preserving by construction, and
    with an injected outlier channel in the head input it must REDUCE the
    quantized-head error vs the un-smoothed pack."""
    import dataclasses
    cfg = get_config("test-llama")
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    # inject an outlier channel into the final-norm weight: channel 3 of the
    # head input blows up 40x — the per-token dynamic A8 scale is then set by
    # that channel and every other channel loses resolution (the SmoothQuant
    # failure mode the fold addresses)
    nw = np.array(params["norm"]["w"])
    nw[3] *= 40.0
    params = dict(params)
    params["norm"] = {"w": jnp.asarray(nw), "b": params["norm"]["b"]}
    policy = default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (4, 12)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, policy, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, policy)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=32, head_bits=4)

    am = calibrate.head_input_absmax(params, tokens, cfg, batch_size=2)
    head_w = (params["embed"]["w"].T if cfg.tie_word_embeddings
              else params["lm_head"]["w"])
    s = calibrate.smooth_last_scales(am, jnp.asarray(head_w), alpha=0.5)
    assert float(s[3]) > float(jnp.median(s)) * 2  # outlier channel shrinks

    packed_fp = E.pack(params, ranges, cfg, policy,
                       E.EngineConfig(model=cfg, max_seq_len=32))
    packed_q = E.pack(params, ranges, cfg, policy, ecfg)
    packed_s = E.pack(params, ranges, cfg, policy, ecfg, smooth_last=s)
    # identity fold == no fold, bit-exact
    packed_1 = E.pack(params, ranges, cfg, policy, ecfg,
                      smooth_last=jnp.ones_like(s))
    np.testing.assert_array_equal(np.asarray(packed_1["head_q"]["wq"]),
                                  np.asarray(packed_q["head_q"]["wq"]))
    np.testing.assert_array_equal(np.asarray(packed_1["norm"]["w"]),
                                  np.asarray(packed_q["norm"]["w"]))

    t = jnp.asarray(tokens)
    ref = np.asarray(E.forward(packed_fp, t, cfg, policy)[0])
    err_q = np.abs(np.asarray(E.forward(packed_q, t, cfg, policy)[0]) - ref).max()
    err_s = np.abs(np.asarray(E.forward(packed_s, t, cfg, policy)[0]) - ref).max()
    assert err_s < err_q, (err_s, err_q)

    # fp-head pack must reject the fold (tied head cannot be rescaled)
    with pytest.raises(ValueError):
        E.pack(params, ranges, cfg, policy,
               E.EngineConfig(model=cfg, max_seq_len=32), smooth_last=s)
