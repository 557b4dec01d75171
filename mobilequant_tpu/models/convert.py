"""HF checkpoint → mobilequant_tpu parameter pytree.

TPU-native analogue of the reference converter (/root/reference/scripts/convert_ckpt.py):
  * the same family rename maps (gate/down/up_proj → w1/w2/w3, phi dense → o_proj,
    ref convert_ckpt.py:24-32);
  * Gemma norm weights get the +1 folded in so the runtime computes plain RMSNorm
    (ref convert_ckpt.py:48-54);
  * additionally transposes every linear weight to (in, out) for `x @ w`, and
    materializes zero biases where the architecture has none (see models/model.py).

Works from any `dict[name, np.ndarray]` state dict — produced by torch (CPU),
safetensors, or transformers — so tests can convert tiny random HF models without
touching the network.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Mapping

import numpy as np
import jax.numpy as jnp

from mobilequant_tpu.models.config import ModelConfig

# family-specific HF name → unified name fragments (ref convert_ckpt.py:24-32)
WEIGHT_RENAME_MAPS = {
    "llama": {"gate_proj": "w1", "down_proj": "w2", "up_proj": "w3"},
    "mistral": {"gate_proj": "w1", "down_proj": "w2", "up_proj": "w3"},
    "gemma": {"gate_proj": "w1", "down_proj": "w2", "up_proj": "w3"},
    "stablelm": {"gate_proj": "w1", "down_proj": "w2", "up_proj": "w3"},
    "qwen2": {"gate_proj": "w1", "down_proj": "w2", "up_proj": "w3"},
    "phi": {"fc1": "w1", "fc2": "w2", "dense": "o_proj", "final_layernorm": "norm"},
    "mixtral": {"block_sparse_moe": "mlp"},
}


def rename_key(name: str, model_type: str) -> str:
    for a, b in WEIGHT_RENAME_MAPS.get(model_type, {}).items():
        if a in name:
            return name.replace(a, b)
    return name


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def convert_state_dict(sd: Mapping[str, "np.ndarray"], config: ModelConfig,
                       model_type: str = "llama", dtype=jnp.float32) -> dict:
    """Convert a (possibly torch) HF state dict into the stacked-params pytree."""
    c = config
    sd = {rename_key(k, model_type): _np(v) for k, v in sd.items()}
    is_gemma = model_type == "gemma" or c.norm_class == "skiprms"
    L, D, F = c.num_layers, c.hidden_size, c.intermediate_size
    qd, kvd = c.q_dim, c.kv_dim

    def get(name, shape_t=None, transpose=False, plus_one=False, required=True):
        if name not in sd:
            if required:
                raise KeyError(f"missing weight {name!r}; have e.g. {sorted(sd)[:8]}")
            return None
        w = sd[name]
        if transpose:
            w = w.T
        if plus_one:
            w = w + 1.0
        return w

    def stack(fmt, transpose=False, plus_one=False, zeros_shape=None):
        out = []
        for i in range(L):
            w = get(fmt.format(i=i), transpose=transpose, plus_one=plus_one,
                    required=zeros_shape is None)
            if w is None:
                w = np.zeros(zeros_shape, np.float32)
            out.append(w)
        return jnp.asarray(np.stack(out), dtype=dtype)

    P = "model.layers.{i}."
    layers = {
        "attn_norm": {
            "w": stack(P + "input_layernorm.weight", plus_one=is_gemma),
            "b": stack(P + "input_layernorm.bias", zeros_shape=(D,)),
        },
        "q_proj": {"w": stack(P + "self_attn.q_proj.weight", transpose=True),
                   "b": stack(P + "self_attn.q_proj.bias", zeros_shape=(qd,))},
        "k_proj": {"w": stack(P + "self_attn.k_proj.weight", transpose=True),
                   "b": stack(P + "self_attn.k_proj.bias", zeros_shape=(kvd,))},
        "v_proj": {"w": stack(P + "self_attn.v_proj.weight", transpose=True),
                   "b": stack(P + "self_attn.v_proj.bias", zeros_shape=(kvd,))},
        "o_proj": {"w": stack(P + "self_attn.o_proj.weight", transpose=True),
                   "b": stack(P + "self_attn.o_proj.bias", zeros_shape=(D,))},
    }
    if c.is_moe:
        E = c.num_local_experts

        def stack_experts(wname):
            # "model.layers.{i}.mlp.experts.{e}.w1.weight" (Mixtral layout after
            # the block_sparse_moe→mlp rename, ref convert_ckpt.py:32)
            out = []
            for i in range(L):
                per = [get(f"model.layers.{i}.mlp.experts.{e}.{wname}.weight",
                           transpose=True) for e in range(E)]
                out.append(np.stack(per))
            return jnp.asarray(np.stack(out), dtype=dtype)

        layers["router"] = {"w": stack(P + "mlp.gate.weight", transpose=True)}
        layers["w1"] = {"w": stack_experts("w1"), "b": jnp.zeros((L, E, F), dtype)}
        layers["w2"] = {"w": stack_experts("w2"), "b": jnp.zeros((L, E, D), dtype)}
        if c.num_linears_per_mlp == 3:
            layers["w3"] = {"w": stack_experts("w3"), "b": jnp.zeros((L, E, F), dtype)}
    else:
        layers["w1"] = {"w": stack(P + "mlp.w1.weight", transpose=True),
                        "b": stack(P + "mlp.w1.bias", zeros_shape=(F,))}
        layers["w2"] = {"w": stack(P + "mlp.w2.weight", transpose=True),
                        "b": stack(P + "mlp.w2.bias", zeros_shape=(D,))}
        if c.num_linears_per_mlp == 3:
            layers["w3"] = {"w": stack(P + "mlp.w3.weight", transpose=True),
                            "b": stack(P + "mlp.w3.bias", zeros_shape=(F,))}
    if not c.shared_attention_norm:
        layers["mlp_norm"] = {
            "w": stack(P + "post_attention_layernorm.weight", plus_one=is_gemma),
            "b": stack(P + "post_attention_layernorm.bias", zeros_shape=(D,)),
        }

    norm_w = get("model.norm.weight", plus_one=is_gemma)
    norm_b = get("model.norm.bias", required=False)
    params = {
        "embed": {"w": jnp.asarray(get("model.embed_tokens.weight"), dtype=dtype)},
        "layers": layers,
        "norm": {"w": jnp.asarray(norm_w, dtype=dtype),
                 "b": jnp.asarray(norm_b if norm_b is not None else np.zeros((D,), np.float32),
                                  dtype=dtype)},
    }
    if not c.tie_word_embeddings:
        params["lm_head"] = {"w": jnp.asarray(get("lm_head.weight", transpose=True), dtype=dtype)}
    return params


def convert_hf_model(hf_model, config: ModelConfig, model_type: str = "llama",
                     dtype=jnp.float32) -> dict:
    """Convert a live transformers model (torch, CPU) — used heavily by tests."""
    return convert_state_dict(hf_model.state_dict(), config, model_type, dtype)


def load_checkpoint(checkpoint_dir: str | Path, config: ModelConfig,
                    model_type: str = "llama", dtype=jnp.float32) -> dict:
    """Load an HF checkpoint directory (safetensors or pytorch .bin shards)."""
    checkpoint_dir = Path(checkpoint_dir)
    sd: dict[str, np.ndarray] = {}
    st_files = sorted(checkpoint_dir.glob("*.safetensors"))
    bin_files = sorted(checkpoint_dir.glob("*.bin"))
    if st_files:
        from safetensors.numpy import load_file
        for f in st_files:
            sd.update(load_file(str(f)))
    elif bin_files:
        import torch
        for f in bin_files:
            sd.update({k: v for k, v in torch.load(f, map_location="cpu").items()})
    else:
        raise FileNotFoundError(f"no .safetensors/.bin files in {checkpoint_dir}")
    return convert_state_dict(sd, config, model_type, dtype)
