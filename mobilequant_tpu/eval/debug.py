"""Quantization debugging: fidelity-ladder comparison and per-site error bisection.

Analogue of reference device/debug.py (sim-vs-quantized-HF side-by-side with
selective quantizer disabling, ref debug.py:133-167,300-308) — rebuilt around the
declarative policy: instead of mutating module quantizer `.enable` flags, we
synthesize one-site-only / one-site-disabled policies and diff outputs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from mobilequant_tpu.models import model as M
from mobilequant_tpu.models.config import ModelConfig
from mobilequant_tpu.quant.policy import QPolicy, SiteQuant
from mobilequant_tpu.quant import qmodel


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def _mask_policy(policy: QPolicy, keep: Optional[tuple] = None,
                 drop: Optional[tuple] = None) -> QPolicy:
    """keep=(site, role): disable every activation quantizer except that one.
    drop=(site, role): disable only that one. Weight quantizers follow the same
    rule when role == "weight"."""
    out = {}
    for site, sq in policy.items():
        kw = {}
        for role, cfg in sq.roles():
            on = True
            if keep is not None:
                on = (site, role) == keep
            if drop is not None and (site, role) == drop:
                on = False
            kw[role] = cfg if on else cfg.replace(bitwidth=32)
        out[site] = SiteQuant(**kw)
    return out


def site_error_attribution(params, qstate, tokens, config: ModelConfig,
                           policy: QPolicy, mode: str = "solo") -> dict:
    """Per-(site, role) output error.

    mode="solo": error with ONLY that quantizer enabled (who hurts most alone);
    mode="ablate": error of the full policy with that quantizer disabled
    (who contributes most in context). Sorted descending.
    """
    t = jnp.asarray(tokens)
    fp, _, _ = M.forward_hidden(params, t, config, apply_final_norm=False)
    results = {}
    pairs = [(s, r) for s, sq in policy.items() for r, _ in sq.roles()]
    for site, role in pairs:
        if mode == "solo":
            pol = _mask_policy(policy, keep=(site, role))
        else:
            pol = _mask_policy(policy, drop=(site, role))
        q, _, _ = qmodel.qforward_hidden(params, qstate, t, config, pol,
                                         apply_final_norm=False)
        results[f"{site}.{role}"] = _rel_err(q, fp)
    if mode == "ablate":
        full, _, _ = qmodel.qforward_hidden(params, qstate, t, config, policy,
                                            apply_final_norm=False)
        base = _rel_err(full, fp)
        results = {k: base - v for k, v in results.items()}  # contribution
    return dict(sorted(results.items(), key=lambda kv: -abs(kv[1])))


def compare_sim_engine(params, qstate, packed, tokens, config: ModelConfig,
                       policy: QPolicy) -> dict:
    """The allclose gate of the fidelity ladder (ref export.py:433-437 /
    debug.py:300-308): logits diff between the fake-quant sim and the packed
    integer engine."""
    from mobilequant_tpu.runtime import engine as E
    t = jnp.asarray(tokens)
    sim, _, _ = qmodel.qforward(params, qstate, t, config, policy)
    eng, _ = E.forward(packed, t, config, policy)
    sim, eng = np.asarray(sim), np.asarray(eng)
    return {
        "rel_err": _rel_err(eng, sim),
        "max_abs": float(np.abs(eng - sim).max()),
        "argmax_agreement": float((eng.argmax(-1) == sim.argmax(-1)).mean()),
    }
