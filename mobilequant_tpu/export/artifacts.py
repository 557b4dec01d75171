"""Artifact IO: checkpoints, interchange JSONs, AOT export.

The reference's inter-stage "API" is files (SURVEY.md §1 artifact flow):
act_scales/act_shifts.pth → smoothed ckpt → act_dict.json → default_qcfg.json →
quantized ckpt → sim ckpt → qnn_model.bin. Here the same roles are:

  save/load_quantized    — orbax checkpoint of (params, qstate) + config.json +
                           act_dict.json + default_qcfg.json sidecars (the
                           reference's save_pretrained + JSON sidecars,
                           ptq/mobilequant.py:240-246)
  save/load_packed       — the integer engine artifact (qnn_model.bin analogue)
  export_decode_step     — jax.export serialized StableHLO of the jitted decode
                           step (the portable "compiled graph" artifact)
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from mobilequant_tpu.models.config import ModelConfig
from mobilequant_tpu.quant.policy import QPolicy, policy_from_dict, policy_to_dict
from mobilequant_tpu.utils.io import json_load, json_save


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_model_config(path: Path, config: ModelConfig):
    json_save(path, dataclasses.asdict(config))


def load_model_config(path: Path) -> ModelConfig:
    return ModelConfig(**json_load(path))


def save_quantized(output_dir: str | Path, params: dict, qstate: Optional[dict],
                   config: ModelConfig, policy: QPolicy,
                   act_dict: Optional[dict] = None) -> None:
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    ck = _ckptr()
    ck.save((out / "params.orbax").resolve(), params, force=True)
    if qstate is not None:
        ck.save((out / "qstate.orbax").resolve(), qstate, force=True)
    save_model_config(out / "config.json", config)
    json_save(out / "default_qcfg.json", policy_to_dict(policy))
    if act_dict is not None:
        json_save(out / "act_dict.json", act_dict)


def load_quantized(output_dir: str | Path):
    out = Path(output_dir)
    ck = _ckptr()
    params = ck.restore((out / "params.orbax").resolve())
    qstate = None
    if (out / "qstate.orbax").exists():
        qstate = ck.restore((out / "qstate.orbax").resolve())
    config = load_model_config(out / "config.json")
    policy = policy_from_dict(json_load(out / "default_qcfg.json"))
    act_dict = json_load(out / "act_dict.json") if (out / "act_dict.json").exists() else None
    return params, qstate, config, policy, act_dict


def save_packed(output_dir: str | Path, packed: dict, config: ModelConfig,
                policy: QPolicy, engine_meta: Optional[dict] = None) -> None:
    """The engine artifact — role of the reference's qnn_model.bin + meta.bin."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    _ckptr().save((out / "packed.orbax").resolve(), packed, force=True)
    save_model_config(out / "config.json", config)
    json_save(out / "default_qcfg.json", policy_to_dict(policy))
    if engine_meta is not None:
        json_save(out / "engine.json", engine_meta)


def load_packed(output_dir: str | Path):
    out = Path(output_dir)
    packed = _ckptr().restore((out / "packed.orbax").resolve())
    config = load_model_config(out / "config.json")
    policy = policy_from_dict(json_load(out / "default_qcfg.json"))
    meta = json_load(out / "engine.json") if (out / "engine.json").exists() else {}
    return packed, config, policy, meta


def export_decode_step(packed: dict, config: ModelConfig, policy: QPolicy,
                       max_seq_len: int, path: Optional[str | Path] = None,
                       batch_size: int = 1) -> bytes:
    """Serialize the jitted decode step to portable StableHLO bytes
    (jax.export) — the analogue of the reference's frozen NPU graph, minus the
    vendor lock-in."""
    import jax.numpy as jnp
    from jax import export as jexport
    from mobilequant_tpu.runtime import engine as E

    def step(packed, token, k_cache, v_cache, pos):
        logits, nc = E.forward(packed, token, config, policy,
                               positions=pos[:, None],
                               kv_cache=E.EngineKVCache(k=k_cache, v=v_cache),
                               cache_position=pos, kv_valid_len=pos + 1)
        return logits, nc.k, nc.v

    c = config
    kv = jax.ShapeDtypeStruct(
        (c.num_layers, batch_size, c.num_kv_heads, max_seq_len, c.head_dim_), jnp.int8)
    args = (jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), packed),
            jax.ShapeDtypeStruct((batch_size, 1), jnp.int32), kv, kv,
            jax.ShapeDtypeStruct((batch_size,), jnp.int32))
    exported = jexport.export(jax.jit(step))(*args)
    blob = exported.serialize()
    if path is not None:
        Path(path).write_bytes(blob)
    return blob


def export_decode_step_wonly(packed: dict, config: ModelConfig,
                             max_seq_len: int, path: Optional[str | Path] = None,
                             batch_size: int = 1, act_dtype=None) -> bytes:
    """StableHLO decode step for a weight-only (W4A16/W8A16) pack —
    the runtime/wonly.py twin of export_decode_step."""
    import jax.numpy as jnp
    from jax import export as jexport
    from mobilequant_tpu.runtime import wonly as W
    from mobilequant_tpu.models.model import KVCache

    act_dtype = act_dtype or jnp.float32

    def step(packed, token, k_cache, v_cache, pos):
        logits, nc = W.forward(packed, token, config,
                               positions=pos[:, None],
                               kv_cache=KVCache(k=k_cache, v=v_cache),
                               cache_position=pos, kv_valid_len=pos + 1)
        return logits, nc.k, nc.v

    c = config
    kv = jax.ShapeDtypeStruct(
        (c.num_layers, batch_size, max_seq_len, c.num_kv_heads, c.head_dim_),
        act_dtype)
    args = (jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), packed),
            jax.ShapeDtypeStruct((batch_size, 1), jnp.int32), kv, kv,
            jax.ShapeDtypeStruct((batch_size,), jnp.int32))
    exported = jexport.export(jax.jit(step))(*args)
    blob = exported.serialize()
    if path is not None:
        Path(path).write_bytes(blob)
    return blob
