"""Differentiable uniform quantizer (TPU-native analogue of reference qmodule.py Quantizer).

All pure functions over arrays — quantizer state (scale/offset, LWC bound factors)
lives in pytrees owned by the caller, which is what makes LRL (learnable range
learning) trivial here: scale/offset are just leaves handed to optax.

Faithful semantics (checked in tests/test_quantizer.py against closed form):
  * scale = alpha / q_max, clamped to [1e-5, 1e6]        (ref qmodule.py:40-61)
  * offset = -round(beta / scale)  (zero-gradient round, like torch .round())
  * symmetric: alpha = max(|min|,|max|), q in [-2^(b-1), 2^(b-1)-1], offset = 0
  * asymmetric: alpha = max-min, q in [0, 2^b-1]
  * fake quant: deq = (clip(round_ste(x/scale)+offset, qmin, qmax) - offset) * scale
                                                          (ref qmodule.py:286-290)
  * STE: d(round)/dx = 1                                  (ref qmodule.py:17-21)
  * LWC: min/max scaled by sigmoid(bound_factor), init 4.0 (ref qmodule.py:133-151)
  * bitwidth > 16 disables quantization                    (ref qmodule.py:251-252)

Weight layout note: our linear weights are (in_features, out_features) — transposed
from torch — so "per-channel" (per output channel, ref rows) reduces over axis 0,
and group quantization groups along the *input* axis (axis 0).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

CLIPMIN = 1e-5
CLIPMAX = 1e6
LWC_INIT = 4.0


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Schema-compatible with the reference's default_qcfg.json entries
    (ref qmodule.py:81-107)."""
    bitwidth: int = 32
    group_size: int = -1
    is_symmetric: bool = False
    is_per_channel: bool = False
    is_dynamic: bool = False

    @property
    def enabled(self) -> bool:
        return self.bitwidth <= 16

    @property
    def qmin(self) -> int:
        return -(2 ** (self.bitwidth - 1)) if self.is_symmetric else 0

    @property
    def qmax(self) -> int:
        return 2 ** (self.bitwidth - 1) - 1 if self.is_symmetric else 2 ** self.bitwidth - 1

    @classmethod
    def from_dict(cls, d: dict) -> "QuantConfig":
        def b(v):
            return v in (True, "True", "true")
        return cls(bitwidth=int(d["bitwidth"]), group_size=int(d["group_size"]),
                   is_symmetric=b(d["is_symmetric"]), is_per_channel=b(d["is_per_channel"]),
                   is_dynamic=b(d["is_dynamic"]))

    def to_dict(self) -> dict:
        return {"bitwidth": str(self.bitwidth), "group_size": str(self.group_size),
                "is_symmetric": str(self.is_symmetric),
                "is_per_channel": str(self.is_per_channel),
                "is_dynamic": str(self.is_dynamic)}

    def replace(self, **kw) -> "QuantConfig":
        return dataclasses.replace(self, **kw)


@jax.custom_vjp
def round_ste(x):
    return jnp.round(x)


def _round_ste_fwd(x):
    return jnp.round(x), None


def _round_ste_bwd(_, g):
    return (g,)


round_ste.defvjp(_round_ste_fwd, _round_ste_bwd)


def scale_offset_from_min_max(min_val, max_val, qcfg: QuantConfig):
    """-> (scale, offset) arrays broadcastable against the tensor."""
    min_val = jnp.asarray(min_val, jnp.float32)
    max_val = jnp.asarray(max_val, jnp.float32)
    if qcfg.is_symmetric:
        alpha = jnp.maximum(jnp.abs(min_val), jnp.abs(max_val))
        beta = jnp.zeros_like(alpha)
    else:
        alpha = max_val - min_val
        beta = min_val
    scale = jnp.clip(alpha / qcfg.qmax, CLIPMIN, CLIPMAX)
    # jnp.round has zero gradient, matching torch .round() (ref qmodule.py:60)
    offset = -jnp.round(beta / scale)
    return scale, offset


def min_max_from_scale_offset(scale, offset, qcfg: QuantConfig):
    """Inverse map used for act_dict export (ref qmodule.py:66-77)."""
    scale = jnp.clip(scale, CLIPMIN, CLIPMAX)
    alpha = scale * qcfg.qmax
    beta = -offset * scale
    max_val = alpha + beta
    min_val = -max_val if qcfg.is_symmetric else beta
    return min_val, max_val


def fake_quant(x, scale, offset, qcfg: QuantConfig):
    """Static-range quant→clip→dequant with STE (ref qmodule.py:286-290)."""
    if not qcfg.enabled:
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    q = round_ste(xf / scale) + offset
    q = jnp.clip(q, qcfg.qmin, qcfg.qmax)
    return ((q - offset) * scale).astype(dtype)


# ---------------------------------------------------------------------------
# Weight quantization (stats computed on the fly, optional learned clipping)
# ---------------------------------------------------------------------------

def _group_reshape(w, group_size: int):
    """(..., in, out) -> (..., n_groups, gs, out); groups along the input axis."""
    *lead, d_in, d_out = w.shape
    assert d_in % group_size == 0, f"in={d_in} not divisible by group={group_size}"
    return w.reshape(*lead, d_in // group_size, group_size, d_out)


def weight_min_max(w, qcfg: QuantConfig):
    """min/max stats for a (..., in, out) weight (leading axes, e.g. stacked MoE
    experts, are treated as independent linears).

    per-tensor -> scalars; per-channel -> (..., 1, out); per-channel+group ->
    (..., G, 1, out) (the reference's per-row stats on (out, in),
    ref qmodule.py:26-34, transposed).
    """
    if qcfg.is_per_channel:
        if qcfg.group_size != -1:
            wg = _group_reshape(w, qcfg.group_size)
            return (jnp.min(wg, axis=-2, keepdims=True),
                    jnp.max(wg, axis=-2, keepdims=True))
        return (jnp.min(w, axis=-2, keepdims=True),
                jnp.max(w, axis=-2, keepdims=True))
    return jnp.min(w), jnp.max(w)


def lwc_init(w, qcfg: QuantConfig):
    """Initial LWC bound factors matching weight_min_max stat shapes
    (ref qmodule.py:133-151, init 4.0 → sigmoid≈0.982)."""
    if qcfg.is_per_channel:
        if qcfg.group_size != -1:
            g = w.shape[-2] // qcfg.group_size
            shape = w.shape[:-2] + (g, 1, w.shape[-1])
        else:
            shape = w.shape[:-2] + (1, w.shape[-1])
    else:
        shape = ()
    up = jnp.full(shape, LWC_INIT, jnp.float32)
    low = jnp.full(shape, LWC_INIT, jnp.float32)
    return {"up": up, "low": low}


def _lwc_bounds(w, qcfg: QuantConfig, lwc: Optional[dict]):
    mn, mx = weight_min_max(w, qcfg)
    if lwc is not None:
        mx = jax.nn.sigmoid(lwc["up"]) * mx
        mn = jax.nn.sigmoid(lwc["low"]) * mn
    return mn, mx


def fake_quant_weight(w, qcfg: QuantConfig, lwc: Optional[dict] = None):
    """On-the-fly weight fake-quant with optional learned clipping
    (the reference Quantizer.forward dynamic/LWC path, qmodule.py:251-295)."""
    if not qcfg.enabled:
        return w
    dtype = w.dtype
    wf = w.astype(jnp.float32)
    grouped = qcfg.is_per_channel and qcfg.group_size != -1
    x = _group_reshape(wf, qcfg.group_size) if grouped else wf
    mn, mx = _lwc_bounds(wf, qcfg, lwc)  # stat shapes already match the grouped view
    scale, offset = scale_offset_from_min_max(mn, mx, qcfg)
    q = round_ste(x / scale) + offset
    q = jnp.clip(q, qcfg.qmin, qcfg.qmax)
    out = (q - offset) * scale
    if grouped:
        out = out.reshape(wf.shape)
    return out.astype(dtype)


def clip_weight_to_learned_bounds(w, qcfg: QuantConfig, lwc: Optional[dict]):
    """Permanently clamp a weight into its learned LWC bounds — the functional
    analogue of `weight_quantizer.run_lwc(weight)` applied at the end of training
    (ref algorithm.py:186-188 / qmodule.py:159-186)."""
    if lwc is None or not qcfg.enabled:
        return w
    dtype = w.dtype
    wf = w.astype(jnp.float32)
    grouped = qcfg.is_per_channel and qcfg.group_size != -1
    x = _group_reshape(wf, qcfg.group_size) if grouped else wf
    mn, mx = _lwc_bounds(wf, qcfg, lwc)
    out = jnp.clip(x, mn, mx)
    if grouped:
        out = out.reshape(wf.shape)
    return out.astype(dtype)
