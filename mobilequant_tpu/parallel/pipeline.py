"""Pipeline parallelism (GPipe-style) over a "pp" mesh axis.

The reference's only parallelism is layer placement for PTQ training: decoder
layers are bin-packed onto GPUs and activations migrate via forward-pre-hooks,
strictly sequentially — one GPU computes at a time (ref
mobilellm/utils/parallel_utils.py:89-200, used by e2equant at
algorithm.py:592-593). This module is the TPU-native upgrade of that role:
layer *stages* live on different devices of a `Mesh("pp")` axis, microbatches
stream through the stages concurrently (the classic GPipe schedule with
npp + n_micro − 1 steps), and the inter-stage "hook" is a compiled ICI
`lax.ppermute` instead of a host-driven `tensor.to()`.

Everything runs under shard_map, so it composes with jit and with grad — the
pipelined backbone is differentiable (ppermute transposes to the reverse
permutation), which is what e2equant needs for joint LET/LWC/LRL training of
models too big for one chip's HBM.

Restrictions (asserted): num_layers % npp == 0; batch % n_micro == 0; all
sequences share the same positions (standard calibration/training prefill —
per-row position pipelining would need per-microbatch rope/mask threading).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mobilequant_tpu.models.config import ModelConfig
from mobilequant_tpu.models import model as M
from mobilequant_tpu.quant.policy import QPolicy


def pipeline_pspecs(params: dict, qstate: Optional[dict] = None):
    """PartitionSpec trees placing stacked layer leaves on the "pp" axis
    (axis 0 = the layer axis) and everything else replicated."""
    layer_spec = jax.tree.map(lambda _: P("pp"), params["layers"])
    pspecs = {k: (layer_spec if k == "layers"
                  else jax.tree.map(lambda _: P(), v))
              for k, v in params.items()}
    qspecs = None
    if qstate is not None:
        qspecs = jax.tree.map(lambda _: P("pp"), qstate)
    return pspecs, qspecs


def pipeline_qforward_hidden(params: dict, qstate: Optional[dict],
                             tokens: jax.Array, config: ModelConfig,
                             policy: Optional[QPolicy], mesh: Mesh,
                             n_micro: int, mode: str = "sim",
                             apply_final_norm: bool = True) -> jax.Array:
    """Pipelined backbone forward → hidden (B,T,D).

    With qstate/policy: the fake-quant sim (qmodel.QuantOps) — the pipelined
    twin of quant/qmodel.qforward_hidden for e2equant training. With
    qstate=None: the FP backbone (the teacher pass).
    """
    c = config
    npp = mesh.shape["pp"]
    L = c.num_layers
    assert L % npp == 0, (L, npp)
    B, T = tokens.shape
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro

    # embedding / rope / mask are stage-0-cheap; compute replicated for one
    # microbatch's row count (identical across rows — see module restrictions)
    x = params["embed"]["w"][tokens]
    if c.normalize_embed:
        import math
        x = x * jnp.asarray(math.sqrt(c.hidden_size), x.dtype)
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (mb, T))
    cos, sin = M.rope_cos_sin(positions, c, x.dtype)
    mask = M.causal_mask(positions, T, c.neg_inf).astype(x.dtype)
    xs_all = x.reshape(n_micro, mb, T, -1)

    extras = {k: v for k, v in (qstate or {}).items() if v is not None}

    def make_ops():
        if policy is None or not extras:
            return M.Ops()
        from mobilequant_tpu.quant.qmodel import QuantOps
        return QuantOps(policy, c, mode)

    def stage_apply(lp_local, ex_local, h):
        """Run this stage's L/npp layers (a local scan) on h (mb,T,D)."""
        def body(h, sl):
            ops = make_ops()
            if hasattr(ops, "begin_layer"):
                ops.begin_layer(sl.get("extras"))
            h, _ = M.decoder_layer(ops, sl["lp"], h, cos, sin, mask, c,
                                   None, None)
            return h, None
        sl = {"lp": lp_local}
        if ex_local:
            sl["extras"] = ex_local
        h, _ = jax.lax.scan(body, h, sl)
        return h

    def pipelined(layers_local, ex_local, xs_all):
        stage = jax.lax.axis_index("pp")
        n_steps = n_micro + npp - 1
        perm = [(j, (j + 1) % npp) for j in range(npp)]

        def step(carry, i):
            state, outputs = carry
            idx = jnp.clip(i, 0, n_micro - 1)
            inp = jnp.where(stage == 0, xs_all[idx], state)
            out = stage_apply(layers_local, ex_local, inp)
            oidx = i - (npp - 1)
            write = (stage == npp - 1) & (oidx >= 0)
            oclip = jnp.clip(oidx, 0, n_micro - 1)
            prev = jax.lax.dynamic_index_in_dim(outputs, oclip, 0,
                                                keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(write, out, prev), oclip, 0)
            state = jax.lax.ppermute(out, "pp", perm)
            return (state, outputs), None

        state0 = jnp.zeros_like(xs_all[0])
        outputs0 = jnp.zeros_like(xs_all)
        (state, outputs), _ = jax.lax.scan(
            step, (state0, outputs0), jnp.arange(n_steps))
        # results live on the last stage; replicate (masked psum over "pp")
        return jax.lax.psum(
            jnp.where(stage == npp - 1, outputs, jnp.zeros_like(outputs)), "pp")

    layer_specs = jax.tree.map(lambda _: P("pp"), params["layers"])
    ex_specs = jax.tree.map(lambda _: P("pp"), extras)
    fn = jax.shard_map(pipelined, mesh=mesh,
                       in_specs=(layer_specs, ex_specs, P()),
                       out_specs=P(), check_vma=False)
    out = fn(params["layers"], extras, xs_all).reshape(B, T, -1)

    if apply_final_norm:
        plain = M.Ops()
        nf = plain.layernorm if c.norm_class == "layernorm" else plain.rmsnorm
        out = nf("norm", out, params["norm"]["w"], params["norm"]["b"],
                 c.norm_eps)
    return out


def pipeline_qforward(params, qstate, tokens, config: ModelConfig,
                      policy: Optional[QPolicy], mesh: Mesh, n_micro: int,
                      mode: str = "sim"):
    """Pipelined CausalLM forward → logits (B,T,V)."""
    x = pipeline_qforward_hidden(params, qstate, tokens, config, policy,
                                 mesh, n_micro, mode)
    head_w = (params["embed"]["w"].T if config.tie_word_embeddings
              else params["lm_head"]["w"])
    return x @ head_w
