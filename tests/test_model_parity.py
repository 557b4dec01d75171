"""FP parity: our unified JAX decoder vs HF transformers torch models (tiny, random).

This is the M0 gate from SURVEY.md §7.2: converted-checkpoint logits must match the
original architecture implementations. The reference validated this with WikiText ppl
on real checkpoints (eval/README.md:29-31); with no network access we assert logit
allclose against live torch models instead, which is strictly stronger per-layer.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mobilequant_tpu.models import get_config
from mobilequant_tpu.models import model as M
from mobilequant_tpu.models.convert import convert_hf_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _logits_ours(params, tokens, cfg):
    logits, _ = M.forward(params, jnp.asarray(tokens), cfg)
    return np.asarray(logits, dtype=np.float32)


def _run_torch(model, tokens):
    model.eval()
    with torch.no_grad():
        out = model(torch.tensor(tokens))
    return out.logits.float().numpy()


def make_llama():
    cfg = get_config("test-llama")
    hf_cfg = transformers.LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim_, rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta, max_position_embeddings=cfg.max_position_embeddings,
        attention_bias=False, tie_word_embeddings=False,
    )
    return cfg, transformers.LlamaForCausalLM(hf_cfg), "llama"


def make_gemma():
    cfg = get_config("test-gemma")
    hf_cfg = transformers.GemmaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim_, rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta, max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu_pytorch_tanh", tie_word_embeddings=True,
    )
    return cfg, transformers.GemmaForCausalLM(hf_cfg), "gemma"


def make_stablelm():
    cfg = get_config("test-stablelm")
    hf_cfg = transformers.StableLmConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
        layer_norm_eps=cfg.norm_eps, rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_position_embeddings,
        partial_rotary_factor=cfg.partial_rotary_factor,
        use_qkv_bias=True, use_parallel_residual=False,
        tie_word_embeddings=False,
    )
    return cfg, transformers.StableLmForCausalLM(hf_cfg), "stablelm"


@pytest.mark.parametrize("maker", [make_llama, make_gemma, make_stablelm],
                         ids=["llama", "gemma", "stablelm"])
def test_logit_parity(maker):
    torch.manual_seed(0)
    cfg, hf_model, family = maker()
    hf_model = hf_model.float()
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(2, 17), dtype=np.int64)

    ref = _run_torch(hf_model, tokens)
    params = convert_hf_model(hf_model, cfg, family)
    ours = _logits_ours(params, tokens.astype(np.int32), cfg)

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_kv_cache_decode_matches_full_forward():
    """Token-by-token decode with the KV cache must equal the full-sequence forward
    (the reference's KV protocol twin: SimModel.generate, sim_model.py:160-218)."""
    cfg = get_config("test-llama")
    import jax
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    T = 9
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, T), dtype=np.int64))

    full_logits, _ = M.forward(params, tokens, cfg)

    S = 16
    cache = M.KVCache(
        k=jnp.zeros((cfg.num_layers, 2, S, cfg.num_kv_heads, cfg.head_dim_)),
        v=jnp.zeros((cfg.num_layers, 2, S, cfg.num_kv_heads, cfg.head_dim_)),
    )
    outs = []
    for t in range(T):
        pos = jnp.full((2, 1), t, jnp.int32)
        logits, cache = M.forward(
            params, tokens[:, t:t + 1], cfg,
            positions=pos, kv_cache=cache,
            cache_position=jnp.full((2,), t, jnp.int32),
            kv_valid_len=jnp.full((2,), t + 1, jnp.int32),
        )
        outs.append(np.asarray(logits[:, 0]))
    dec = np.stack(outs, axis=1)
    np.testing.assert_allclose(dec, np.asarray(full_logits), rtol=2e-4, atol=2e-4)


def test_moe_parity_vs_mixtral():
    """MoE block (dense combine-weight formulation) vs HF Mixtral token-gather
    loop — must agree exactly (full capacity, no dropping)."""
    torch.manual_seed(0)
    cfg = get_config("test-mixtral")
    hf_cfg = transformers.MixtralConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim_, rms_norm_eps=cfg.norm_eps,
        num_local_experts=cfg.num_local_experts,
        num_experts_per_tok=cfg.num_experts_per_tok,
        rope_theta=cfg.rope_theta, max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=False, router_aux_loss_coef=0.0,
    )
    hf = transformers.MixtralForCausalLM(hf_cfg).float()
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(2, 13), dtype=np.int64)
    ref = _run_torch(hf, tokens)
    params = convert_hf_model(hf, cfg, "mixtral")
    ours = _logits_ours(params, tokens.astype(np.int32), cfg)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_qwen2_parity():
    torch.manual_seed(0)
    cfg = get_config("test-qwen2")
    hf_cfg = transformers.Qwen2Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim_, rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta, max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=False,
    )
    hf = transformers.Qwen2ForCausalLM(hf_cfg).float()
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(2, 11), dtype=np.int64)
    ref = _run_torch(hf, tokens)
    params = convert_hf_model(hf, cfg, "qwen2")
    ours = _logits_ours(params, tokens.astype(np.int32), cfg)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_phi_parity():
    """Phi exercises the shared-attention-norm + parallel-residual + 2-linear
    MLP + partial-rotary paths (ref phi support, convert_ckpt.py:28)."""
    torch.manual_seed(0)
    cfg = get_config("test-phi")
    hf_cfg = transformers.PhiConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
        layer_norm_eps=cfg.norm_eps, rope_theta=cfg.rope_theta,
        partial_rotary_factor=cfg.partial_rotary_factor,
        hidden_act="gelu_new", max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=False,
    )
    hf = transformers.PhiForCausalLM(hf_cfg).float()
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(2, 11), dtype=np.int64)
    ref = _run_torch(hf, tokens)
    params = convert_hf_model(hf, cfg, "phi")
    ours = _logits_ours(params, tokens.astype(np.int32), cfg)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
