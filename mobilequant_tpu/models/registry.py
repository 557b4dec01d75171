"""Named model configurations.

TPU-native analogue of the reference's per-model config constructors
(/root/reference/mobilellm/model/hf_config.py) and the sim registry
(/root/reference/mobilellm/model/sim_model.py:42-47 `th_configs`).

Shapes verified against the shipped on-device configs in the reference:
  tinyllama-1.1b : n_layer=22 n_head=32 n_kv=4 head_dim=64 d=2048 ffn=5632 vocab=32000
  gemma-2b       : n_layer=18 n_head=8  n_kv=1 head_dim=256 d=2048 ffn=16384 vocab=256000
  stablelm-2-1.6b: n_layer=24 n_head=32 n_kv=32 head_dim=64 d=2048 ffn=5632 vocab=100352
"""

from __future__ import annotations

from mobilequant_tpu.models.config import ModelConfig

MODEL_CONFIGS: dict[str, ModelConfig] = {
    "tinyllama-1.1b": ModelConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_layers=22, num_heads=32, num_kv_heads=4, head_dim=64,
        norm_class="rmsnorm", norm_eps=1e-5, num_linears_per_mlp=3,
        hidden_act="silu", rope_theta=10000.0, max_position_embeddings=2048,
    ),
    "gemma-2b": ModelConfig(
        vocab_size=256000, hidden_size=2048, intermediate_size=16384,
        num_layers=18, num_heads=8, num_kv_heads=1, head_dim=256,
        norm_class="skiprms", norm_eps=1e-6, num_linears_per_mlp=3,
        hidden_act="gelu_tanh", rope_theta=10000.0, max_position_embeddings=8192,
        normalize_embed=True, tie_word_embeddings=True,
    ),
    "stablelm-2-1.6b": ModelConfig(
        vocab_size=100352, hidden_size=2048, intermediate_size=5632,
        num_layers=24, num_heads=32, num_kv_heads=32, head_dim=64,
        norm_class="layernorm", norm_eps=1e-5, num_linears_per_mlp=3,
        hidden_act="silu", rope_theta=10000.0, max_position_embeddings=4096,
        partial_rotary_factor=0.25, use_qkv_bias_only=True,
    ),
    "phi-2": ModelConfig(
        vocab_size=51200, hidden_size=2560, intermediate_size=10240,
        num_layers=32, num_heads=32, num_kv_heads=32, head_dim=80,
        norm_class="layernorm", norm_eps=1e-5, num_linears_per_mlp=2,
        hidden_act="gelu_tanh", rope_theta=10000.0, max_position_embeddings=2048,
        partial_rotary_factor=0.4, shared_attention_norm=True,
        parallel_residual=True, attention_bias=True,
    ),
    "qwen2-1.5b": ModelConfig(
        vocab_size=151936, hidden_size=1536, intermediate_size=8960,
        num_layers=28, num_heads=12, num_kv_heads=2, head_dim=128,
        norm_class="rmsnorm", norm_eps=1e-6, num_linears_per_mlp=3,
        hidden_act="silu", rope_theta=1000000.0, max_position_embeddings=32768,
        use_qkv_bias_only=True, tie_word_embeddings=True,
    ),
    # Production-scale targets beyond the reference's mobile set: a W4 pack
    # of either fits one v5e's 16 GB HBM (7B ≈ 3.4 GB, 8B ≈ 4 GB + bf16
    # embed/head) — single-chip serving at shapes the NPU never could.
    "llama-2-7b": ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_layers=32, num_heads=32, num_kv_heads=32, head_dim=128,
        norm_class="rmsnorm", norm_eps=1e-5, num_linears_per_mlp=3,
        hidden_act="silu", rope_theta=10000.0, max_position_embeddings=4096,
    ),
    "llama-3-8b": ModelConfig(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        norm_class="rmsnorm", norm_eps=1e-5, num_linears_per_mlp=3,
        hidden_act="silu", rope_theta=500000.0,
        max_position_embeddings=8192,
    ),
    # Small configs for tests / CI (same knob coverage, tiny shapes).
    "test-qwen2": ModelConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        norm_class="rmsnorm", num_linears_per_mlp=3, hidden_act="silu",
        use_qkv_bias_only=True, max_position_embeddings=128,
    ),
    "test-phi": ModelConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=16,
        norm_class="layernorm", num_linears_per_mlp=2, hidden_act="gelu_tanh",
        partial_rotary_factor=0.5, shared_attention_norm=True,
        parallel_residual=True, attention_bias=True,
        max_position_embeddings=128,
    ),
    "test-llama": ModelConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=3, num_heads=4, num_kv_heads=2, head_dim=16,
        norm_class="rmsnorm", num_linears_per_mlp=3, hidden_act="silu",
        max_position_embeddings=128,
    ),
    "test-gemma": ModelConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=2, num_kv_heads=1, head_dim=32,
        norm_class="skiprms", norm_eps=1e-6, num_linears_per_mlp=3,
        hidden_act="gelu_tanh", normalize_embed=True, tie_word_embeddings=True,
        max_position_embeddings=128,
    ),
    "test-mixtral": ModelConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        norm_class="rmsnorm", num_linears_per_mlp=3, hidden_act="silu",
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128,
    ),
    "test-stablelm": ModelConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=16,
        norm_class="layernorm", num_linears_per_mlp=3, hidden_act="silu",
        partial_rotary_factor=0.25, use_qkv_bias_only=True,
        max_position_embeddings=128,
    ),
}


def get_config(name: str) -> ModelConfig:
    if name not in MODEL_CONFIGS:
        raise KeyError(f"unknown model {name!r}; known: {sorted(MODEL_CONFIGS)}")
    return MODEL_CONFIGS[name]
