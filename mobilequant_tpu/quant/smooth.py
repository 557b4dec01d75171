"""Learnable equivalent transformations (LET) and SmoothQuant initialization.

Functional analogue of reference mobilellm/quantization/algorithm.py:27-234 and
ptq/smoothquant.py. In the reference, smoothing mutates `temp_weight/temp_bias` on
modules every step; here `apply_let` is pure math inside the forward (reparameterized
weights), which is both cleaner and free under jit — XLA fuses the rescales into the
surrounding ops.

Transforms (all exactly output-preserving in FP — tested in tests/test_smooth.py):
  ln → fcs   (scale s, shift t):  ln.w /= s ; ln.b = (ln.b - t)/s ;
              fc.w *= s (per in-channel) ; fc.b += t @ fc.w        (ref :47-68)
  fc1 → fc2  (v_proj→o_proj, w3→w2): fc1.w /= s (per OUT-channel), fc1.b = (b - t)/s;
              fc2.w *= s (per in-channel); fc2.b += t @ fc2.w      (ref :71-87)
              — only when fc1.out == fc2.in (no GQA for v→o, ref :172-173)
  q ↔ k      (scale s): q.w /= s, q.b /= s ; k.w *= s, k.b *= s   (ref :90-96)
              — only when q_dim == kv_dim (ref :178-179)
  Scales pass through a truncation STE keeping |s| ≥ 1e-2 (ref :27-42), which the
  reference applies (with use_shift=False) to scale params only.

Weight layout: ours is (in, out); the reference's (out, in) row/col ops transpose
accordingly (see quantizer.py docstring).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mobilequant_tpu.models.config import ModelConfig

TRUNC_THRESHOLD = 1e-2


@jax.custom_vjp
def truncate_scale(s):
    """|s| < th → sign(s)·th, straight-through gradient (ref TruncateFunction :27-42)."""
    return jnp.where(jnp.abs(s) < TRUNC_THRESHOLD,
                     jnp.sign(s) * TRUNC_THRESHOLD, s)


def _trunc_fwd(s):
    return truncate_scale(s), None


def _trunc_bwd(_, g):
    return (g,)


truncate_scale.defvjp(_trunc_fwd, _trunc_bwd)


# ---------------------------------------------------------------------------
# LET parameter pytree
# ---------------------------------------------------------------------------

def has_vo_smoothing(config: ModelConfig) -> bool:
    # v_proj.out == o_proj.in ⇔ no GQA (ref algorithm.py:172-173)
    return config.kv_dim == config.q_dim


def has_qk_smoothing(config: ModelConfig) -> bool:
    return config.q_dim == config.kv_dim


def has_fc2_smoothing(config: ModelConfig) -> bool:
    # w3→w2 smoothing is MobileQuant's addition over OmniQuant (ref :175-176,215-217)
    return config.num_linears_per_mlp == 3


def let_init(config: ModelConfig, stacked: bool = True) -> dict:
    """LET params, scales=1 shifts=0 (ref algorithm.py:692-709). Leaves are stacked
    (L, dim) when `stacked`, else (dim,) for a single layer."""
    c = config
    L = c.num_layers

    def mk(dim, val):
        shape = (L, dim) if stacked else (dim,)
        return jnp.full(shape, val, jnp.float32)

    let = {
        "qkv_scale": mk(c.hidden_size, 1.0), "qkv_shift": mk(c.hidden_size, 0.0),
    }
    if not c.shared_attention_norm:
        let["fc1_scale"] = mk(c.hidden_size, 1.0)
        let["fc1_shift"] = mk(c.hidden_size, 0.0)
    if has_vo_smoothing(c):
        let["out_scale"] = mk(c.q_dim, 1.0)
        let["out_shift"] = mk(c.q_dim, 0.0)
    if has_fc2_smoothing(c):
        let["fc2_scale"] = mk(c.intermediate_size, 1.0)
        let["fc2_shift"] = mk(c.intermediate_size, 0.0)
    if has_qk_smoothing(c):
        let["qkt_scale"] = mk(c.q_dim, 1.0)
    return let


# ---------------------------------------------------------------------------
# The transforms (single layer, functional)
# ---------------------------------------------------------------------------

def _smooth_ln_fcs(ln: dict, fcs: list[dict], s, t):
    """Returns (ln', [fc'...]). ln = {"w","b"}; fc = {"w" (in,out), "b"}."""
    ln2 = {"w": ln["w"] / s, "b": (ln["b"] - t) / s}
    out = []
    for fc in fcs:
        out.append({"w": fc["w"] * s[:, None], "b": fc["b"] + t @ fc["w"]})
    return ln2, out


def _smooth_fc_fc(fc1: dict, fc2: dict, s, t):
    fc1_2 = {"w": fc1["w"] / s[None, :], "b": (fc1["b"] - t) / s}
    fc2_2 = {"w": fc2["w"] * s[:, None], "b": fc2["b"] + t @ fc2["w"]}
    return fc1_2, fc2_2


def _smooth_q_k(q: dict, k: dict, s):
    return ({"w": q["w"] / s[None, :], "b": q["b"] / s},
            {"w": k["w"] * s[None, :], "b": k["b"] * s})


def apply_let(lp: dict, let: Optional[dict], config: ModelConfig,
              truncate: bool = True) -> dict:
    """Reparameterize one layer's weights with LET params (functional analogue of
    smooth_lm_temporary, ref algorithm.py:187-234). `lp` leaves are unstacked."""
    if let is None:
        return lp
    c = config
    lp = dict(lp)  # shallow copy; replaced entries get fresh dicts

    def sc(name):
        s = let[name]
        return truncate_scale(s) if truncate else s

    # ln → {q,k,v} (+ w1/w3 when the norm is shared)
    fcs = [lp["q_proj"], lp["k_proj"], lp["v_proj"]]
    keys = ["q_proj", "k_proj", "v_proj"]
    if c.shared_attention_norm:
        fcs.append(lp["w1"])
        keys.append("w1")
        if c.num_linears_per_mlp == 3:
            fcs.append(lp["w3"])
            keys.append("w3")
    ln2, fcs2 = _smooth_ln_fcs(lp["attn_norm"], fcs, sc("qkv_scale"), let["qkv_shift"])
    lp["attn_norm"] = ln2
    for k_, fc in zip(keys, fcs2):
        lp[k_] = fc

    # ffn ln → w1 (+w3)
    if not c.shared_attention_norm:
        fcs = [lp["w1"]]
        keys = ["w1"]
        if c.num_linears_per_mlp == 3:
            fcs.append(lp["w3"])
            keys.append("w3")
        ln2, fcs2 = _smooth_ln_fcs(lp["mlp_norm"], fcs, sc("fc1_scale"), let["fc1_shift"])
        lp["mlp_norm"] = ln2
        for k_, fc in zip(keys, fcs2):
            lp[k_] = fc

    # v → o
    if has_vo_smoothing(c):
        v2, o2 = _smooth_fc_fc(lp["v_proj"], lp["o_proj"], sc("out_scale"), let["out_shift"])
        lp["v_proj"], lp["o_proj"] = v2, o2

    # w3 → w2
    if has_fc2_smoothing(c):
        w32, w22 = _smooth_fc_fc(lp["w3"], lp["w2"], sc("fc2_scale"), let["fc2_shift"])
        lp["w3"], lp["w2"] = w32, w22

    # q ↔ k
    if has_qk_smoothing(c):
        q2, k2 = _smooth_q_k(lp["q_proj"], lp["k_proj"], sc("qkt_scale"))
        lp["q_proj"], lp["k_proj"] = q2, k2

    return lp


def fold_let(params: dict, let: Optional[dict], config: ModelConfig) -> dict:
    """Permanently fold LET into the stacked weights (analogue of smooth_lm_inplace,
    ref algorithm.py:148-184). After this, LET params are spent."""
    if let is None:
        return params
    folded_layers = jax.vmap(lambda lp, lt: apply_let(lp, lt, config))(
        params["layers"], let)
    out = dict(params)
    out["layers"] = folded_layers
    return out


# ---------------------------------------------------------------------------
# SmoothQuant-style initialization (ref ptq/smoothquant.py:49-139)
# ---------------------------------------------------------------------------

def smoothquant_scales(act_absmax, weight_absmax, alpha: float = 0.5,
                       eps: float = 1e-5):
    """s = act^α / w^(1-α), clamped away from zero (ref smoothquant.py:60-66)."""
    a = jnp.clip(jnp.asarray(act_absmax, jnp.float32), eps, None)
    w = jnp.clip(jnp.asarray(weight_absmax, jnp.float32), eps, None)
    s = jnp.power(a, alpha) / jnp.power(w, 1.0 - alpha)
    return jnp.clip(s, eps, None)


def smoothquant_let_init(config: ModelConfig, act_scales: dict, act_shifts: dict,
                         params: dict, alpha: float = 0.5,
                         use_shift: bool = False) -> dict:
    """Build initial LET params from calibration stats instead of ones/zeros.

    The reference runs ptq/smoothquant.py to *fold* these into the checkpoint and
    then learns residual LET from identity. Folding vs initializing the learnable
    params is mathematically the same composition; initializing keeps the original
    checkpoint immutable (pure-functional style). act_scales/act_shifts are keyed
    like the stacked LET leaves: per-layer (L, dim) arrays of input absmax / channel
    midpoints for q_proj (→qkv), w1 (→fc1), o_proj (→out), w2 (→fc2).

    use_shift defaults to False — matching the reference, whose act_shifts.pth is
    produced but never folded (shifts are only *learned*, from zero, under
    --use_shift). The fc2 (w3→w2) shift is never initialized even when
    use_shift=True: a shift does not commute through the gate multiply, so a
    nonzero init would change FP outputs (the v→o shift is exact only because
    softmax rows sum to 1).
    """
    c = config
    let = let_init(c)
    layers = params["layers"]

    def w_absmax_in(*ws):
        # per in-channel abs-max across the concatenated fan-out weights
        # (ref smoothquant.py:57-59 cat along dim 0 of (out,in) = our axis 1)
        m = jnp.concatenate([jnp.abs(w) for w in ws], axis=-1)  # (L, in, Σout)
        return jnp.max(m, axis=-1)

    qkv_ws = [layers["q_proj"]["w"], layers["k_proj"]["w"], layers["v_proj"]["w"]]
    let["qkv_scale"] = smoothquant_scales(act_scales["q_proj"], w_absmax_in(*qkv_ws), alpha)
    if use_shift:
        let["qkv_shift"] = jnp.asarray(act_shifts["q_proj"], jnp.float32)

    if "fc1_scale" in let:
        fc1_ws = [layers["w1"]["w"]] + ([layers["w3"]["w"]] if c.num_linears_per_mlp == 3 else [])
        let["fc1_scale"] = smoothquant_scales(act_scales["w1"], w_absmax_in(*fc1_ws), alpha)
        if use_shift:
            let["fc1_shift"] = jnp.asarray(act_shifts["w1"], jnp.float32)

    if "out_scale" in let:
        let["out_scale"] = smoothquant_scales(
            act_scales["o_proj"], w_absmax_in(layers["o_proj"]["w"]), alpha)
        if use_shift:
            let["out_shift"] = jnp.asarray(act_shifts["o_proj"], jnp.float32)

    if "fc2_scale" in let:
        let["fc2_scale"] = smoothquant_scales(
            act_scales["w2"], w_absmax_in(layers["w2"]["w"]), alpha)
        # fc2_shift intentionally stays zero (see docstring)
    return let
