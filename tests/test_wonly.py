"""Weight-only (W4A16/W8A16) serving mode — runtime/wonly.py.

The end-to-end twin of the reference's create_weight_only_qmodel auto_gptq path
(ref qmodule.py:803-829, 868-886; eval/simple_eval.py --mode w4a16). Ladder:
closed-form fake-quant weights (quantizer.fake_quant_weight) ↔ the wonly
forward (XLA dequant path) ↔ the stacked Pallas kernel (interpret mode).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mobilequant_tpu.models import model as M
from mobilequant_tpu.models.registry import MODEL_CONFIGS
from mobilequant_tpu.ops import qops
from mobilequant_tpu.quant.quantizer import QuantConfig, fake_quant_weight
from mobilequant_tpu.runtime import engine as E
from mobilequant_tpu.runtime import wonly as W


def _wcfg(bits, gs):
    return QuantConfig(bitwidth=bits, is_per_channel=True, group_size=gs,
                       is_symmetric=False)


def _fq_params(params, wcfg):
    """FP params with every projection weight fake-quantized — the closed-form
    reference for weight-only numerics."""
    out = jax.tree.map(lambda a: a, params)
    for k in W._PROJ_KEYS:
        if k in out["layers"] and "w" in out["layers"][k]:
            w = out["layers"][k]["w"]
            fq = (jax.vmap(jax.vmap(lambda wi: fake_quant_weight(wi, wcfg)))
                  if w.ndim == 4 else
                  jax.vmap(lambda wi: fake_quant_weight(wi, wcfg)))(w)
            out["layers"][k]["w"] = fq
    return out


def test_wonly_stacked_kernel_matches_weight_only_linear():
    from mobilequant_tpu.ops import pallas_matmul as PM
    rng = np.random.default_rng(0)
    L, K, N = 3, 128, 256
    x = jnp.asarray(rng.normal(size=(2, K)), jnp.float32)
    for bits in (4, 8):
        for gs in (-1, 32):
            qcfg = _wcfg(bits, gs)
            packs = [qops.pack_weight(
                jnp.asarray(rng.normal(size=(K, N)), jnp.float32), qcfg)
                for _ in range(L)]
            spack = {k: jnp.stack([p[k] for p in packs])
                     for k in ("wq", "scale", "offset")}
            b = jnp.asarray(rng.normal(size=(L, N)), jnp.float32)
            for li in (0, L - 1):
                ref = qops.weight_only_linear(x, packs[li], b[li])
                out = PM.wonly_matmul_stacked(
                    x, spack["wq"], spack["scale"], spack["offset"], b, li,
                    block_n=128, interpret=True)
                np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                           rtol=1e-4, atol=1e-4,
                                           err_msg=f"bits={bits} gs={gs}")
    jax.clear_caches()


@pytest.mark.parametrize("name,bits,gs", [
    ("test-llama", 4, 16),
    ("test-stablelm", 8, -1),
    ("test-mixtral", 4, 16),     # weight-only MoE expert stacks
])
def test_wonly_forward_matches_fake_quant_weights(name, bits, gs):
    cfg = MODEL_CONFIGS[name]
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    wcfg = _wcfg(bits, gs)
    toks = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 12)), jnp.int32)
    ref_logits, _ = M.forward(_fq_params(params, wcfg), toks, cfg)
    packed = W.pack_weight_only(params, cfg, wcfg)
    logits, _ = W.forward(packed, toks, cfg)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=1e-5, atol=2e-4)


def test_wonly_decode_chain_matches_prefill_and_pallas_path():
    cfg = MODEL_CONFIGS["test-llama"]
    params = M.init_params(cfg, jax.random.PRNGKey(1))
    wcfg = _wcfg(4, 16)
    packed = W.pack_weight_only(params, cfg, wcfg)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=32, act_bits=16)
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)), jnp.int32)
    T0 = 6

    cache = W.init_kv_cache(ecfg, 2)
    lg, cache = W.forward(
        packed, toks[:, :T0], cfg,
        positions=jnp.broadcast_to(jnp.arange(T0)[None], (2, T0)),
        kv_cache=cache, cache_position=jnp.zeros((2,), jnp.int32),
        kv_valid_len=jnp.full((2,), T0, jnp.int32))
    outs = [lg[:, -1]]
    for t in range(T0, 11):
        pos = jnp.full((2,), t, jnp.int32)
        # alternate XLA and (interpret-mode) Pallas decode steps: both must
        # continue the same chain
        lg, cache = W.forward(packed, toks[:, t:t + 1], cfg,
                              positions=pos[:, None], kv_cache=cache,
                              cache_position=pos, kv_valid_len=pos + 1,
                              use_pallas=(t % 2 == 0), interpret=True)
        outs.append(lg[:, 0])
    chain = jnp.stack(outs, axis=1)
    full, _ = W.forward(packed, toks, cfg)
    np.testing.assert_allclose(np.asarray(chain),
                               np.asarray(full[:, T0 - 1:11]),
                               rtol=1e-4, atol=5e-4)
    jax.clear_caches()


@pytest.mark.parametrize("name,hb", [
    ("test-llama", 8),
    ("test-llama", 4),
    ("test-gemma", 8),     # tied embeddings: head packed off embed.T
])
def test_wonly_quantized_head(name, hb):
    """pack_weight_only(head_bits=8/4): the wonly forward's head must be the
    exact int_head_linear re-expression (dynamic-A8 × per-channel sym W) of
    the same post-norm hidden, and semantically close to the fp head."""
    cfg = MODEL_CONFIGS[name]
    params = M.init_params(cfg, jax.random.PRNGKey(3))
    wcfg = _wcfg(8, -1)
    toks = jnp.asarray(np.random.default_rng(3).integers(
        0, cfg.vocab_size, (2, 8)), jnp.int32)

    packed = W.pack_weight_only(params, cfg, wcfg, head_bits=hb)
    assert "head_q" in packed
    if not cfg.tie_word_embeddings:   # fp head never read again
        assert packed["skeleton"]["lm_head"]["w"].size == 1
    logits, _ = W.forward(packed, toks, cfg)

    # exact: recompute the post-norm hidden through the same ops and apply
    # int_head_linear directly
    ops = W.WeightOnlyOps(packed["packs"])
    extras = {"packs": packed["packs"],
              "li": jnp.arange(cfg.num_layers, dtype=jnp.int32)}
    y, _, _ = M.forward_hidden(packed["skeleton"], toks, cfg, ops,
                               layer_extras=extras)
    want = qops.int_head_linear(y.astype(jnp.float32),
                                packed["head_q"])[..., :cfg.vocab_size]
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(want))

    # semantic: close to the fp-head logits (relative RMSE — a random tiny
    # head has no outlier structure for absolute tolerances to key on)
    fp_logits, _ = W.forward(W.pack_weight_only(params, cfg, wcfg), toks, cfg)
    fp, qh = np.asarray(fp_logits), np.asarray(logits)
    rel = np.sqrt(np.mean((qh - fp) ** 2)) / np.sqrt(np.mean(fp ** 2))
    assert rel < (0.12 if hb == 4 else 0.02), rel


def test_wonly_speculative_matches_greedy():
    """generate_speculative dispatches through the wonly module too (the
    Generator swaps engines on ecfg.act_bits): same greedy chain, fewer
    verify calls — including with a quantized head."""
    from mobilequant_tpu.runtime.generate import Generator
    cfg = MODEL_CONFIGS["test-llama"]
    params = M.init_params(cfg, jax.random.PRNGKey(4))
    packed = W.pack_weight_only(params, cfg, _wcfg(4, 16), head_bits=8)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=32, act_bits=16)
    gen = Generator(packed, cfg, None, ecfg)
    prompt = np.asarray([[7, 3, 9, 4, 7, 3, 9, 4, 7, 3]], np.int32)
    want = np.asarray(gen.generate(prompt, 10))[0].tolist()
    got, stats = gen.generate_speculative(prompt, 10, k=4, return_stats=True)
    assert np.asarray(got)[0].tolist() == want
    assert stats["verify_calls"] <= 10


def test_wonly_generator_and_batcher_agree():
    from mobilequant_tpu.runtime.generate import Generator
    from mobilequant_tpu.runtime.serve import ContinuousBatcher
    cfg = MODEL_CONFIGS["test-llama"]
    params = M.init_params(cfg, jax.random.PRNGKey(2))
    packed = W.pack_weight_only(params, cfg, _wcfg(4, 16))
    ecfg = E.EngineConfig(model=cfg, max_seq_len=32, act_bits=16)
    policy = None   # weight-only mode ignores the activation policy

    gen = Generator(packed, cfg, policy, ecfg)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (5, 9, 3)]
    refs = [gen.generate_fast(p[None], 6)[0] for p in prompts]

    cb = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=2,
                           prefill_buckets=(16,))
    rids = [cb.submit(p, 6) for p in prompts]
    outs = cb.run()
    for rid, ref in zip(rids, refs):
        np.testing.assert_array_equal(np.asarray(outs[rid]), np.asarray(ref))


def test_wonly_w4_head_kernel_decode_interpret():
    """bs=1 decode with use_pallas + head_bits=4 routes the head through the
    fused-unpack Pallas kernel; interpret=True must thread all the way into
    quantized_head_logits (ADVICE r1: previously the real Mosaic kernel was
    dispatched on CPU)."""
    cfg = MODEL_CONFIGS["test-llama"]
    params = M.init_params(cfg, jax.random.PRNGKey(5))
    packed = W.pack_weight_only(params, cfg, _wcfg(4, 16), head_bits=4)
    toks = jnp.asarray(np.random.default_rng(5).integers(
        0, cfg.vocab_size, (1, 6)), jnp.int32)

    from mobilequant_tpu.runtime import engine as E
    ecfg = E.EngineConfig(model=cfg, max_seq_len=16, act_bits=16)
    cache = W.init_kv_cache(ecfg, 1)
    lg_ref, cache_ref = W.forward(packed, toks[:, :5], cfg, kv_cache=cache,
                                  cache_position=jnp.zeros((1,), jnp.int32),
                                  kv_valid_len=jnp.full((1,), 5, jnp.int32))
    pos = jnp.full((1,), 5, jnp.int32)
    # B*T == 1 + use_pallas → w4a8_matmul head path, interpret-mode on CPU
    lg, _ = W.forward(packed, toks[:, 5:6], cfg, positions=pos[:, None],
                      kv_cache=cache_ref, cache_position=pos,
                      kv_valid_len=pos + 1, use_pallas=True, interpret=True)
    lg_x, _ = W.forward(packed, toks[:, 5:6], cfg, positions=pos[:, None],
                        kv_cache=cache_ref, cache_position=pos,
                        kv_valid_len=pos + 1, use_pallas=False)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(lg_x),
                               rtol=1e-4, atol=5e-4)
    jax.clear_caches()


def test_weight_only_policy_records_head_site():
    """weight_only_policy(head_bits=4/8) must record the quantized head the
    pack actually carries (ADVICE r1: placement lives in policy.py only)."""
    from mobilequant_tpu.quant.policy import weight_only_policy
    cfg = MODEL_CONFIGS["test-llama"]
    pol = weight_only_policy(cfg, _wcfg(4, 128), head_bits=4)
    assert pol["lm_head"].weight.bitwidth == 4
    assert pol["lm_head"].weight.is_symmetric and pol["lm_head"].weight.is_per_channel
    assert pol["lm_head"].input.is_dynamic
    assert "lm_head" not in weight_only_policy(cfg, _wcfg(4, 128))
