"""LET transforms must be exactly output-preserving in FP (the defining invariant
of equivalent transformations, ref algorithm.py:47-144)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mobilequant_tpu.models import get_config
from mobilequant_tpu.models import model as M
from mobilequant_tpu.quant import smooth


def _rand_let(cfg, key, scale_spread=0.5):
    """Random non-trivial LET params (scales around 1, shifts around 0).

    fc2 (w3→w2) shifts stay zero: a shift does not commute through the gate
    multiply, so only the scale part of that pair is an exact transform (the
    reference likewise never trains shifts by default — use_shift=False,
    ref mobilequant.py:64; the v→o shift IS exact because softmax rows sum to 1).
    """
    let = smooth.let_init(cfg)
    leaves = {}
    for name, v in let.items():
        key, k = jax.random.split(key)
        if name == "qkt_scale":
            # q↔k scaling is only exact through RoPE when the scale is uniform
            # within each head's rotated block (rotation mixes channel pairs);
            # pass-through dims (partial rotary) may scale freely.
            L = v.shape[0]
            hd, rd = cfg.head_dim_, cfg.rotary_dim
            per_head = jnp.exp(jax.random.normal(k, (L, cfg.num_heads, 1)) * scale_spread)
            key, k2 = jax.random.split(key)
            full = jnp.broadcast_to(per_head, (L, cfg.num_heads, hd)).copy()
            if rd < hd:
                free = jnp.exp(jax.random.normal(k2, (L, cfg.num_heads, hd - rd)) * scale_spread)
                full = full.at[:, :, rd:].set(free)
            leaves[name] = full.reshape(L, cfg.num_heads * hd)
        elif name.endswith("scale"):
            leaves[name] = v * jnp.exp(jax.random.normal(k, v.shape) * scale_spread)
        elif name == "fc2_shift":
            leaves[name] = v  # zeros
        else:
            leaves[name] = jax.random.normal(k, v.shape) * 0.1
    return leaves


@pytest.mark.parametrize("name", ["test-llama", "test-gemma", "test-stablelm"])
def test_let_preserves_fp_outputs(name):
    cfg = get_config(name)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 12)))

    base, _ = M.forward(params, tokens, cfg)

    let = _rand_let(cfg, jax.random.PRNGKey(1))
    folded = smooth.fold_let(params, let, cfg)
    out, _ = M.forward(folded, tokens, cfg)

    np.testing.assert_allclose(np.asarray(out), np.asarray(base), rtol=2e-3, atol=2e-3)


def test_fold_equals_online_apply():
    """Folding LET into weights == applying it online inside the forward."""
    cfg = get_config("test-llama")
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    tokens = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (1, 8)))
    let = _rand_let(cfg, jax.random.PRNGKey(2))

    from mobilequant_tpu.quant.qmodel import qforward
    from mobilequant_tpu.quant.policy import default_policy
    from mobilequant_tpu.quant.quantizer import QuantConfig

    # disable all quantization (bitwidth 32) — isolates the LET path
    policy = default_policy(cfg, QuantConfig(bitwidth=32), QuantConfig(bitwidth=32))
    online, _, _ = qforward(params, {"let": let}, tokens, cfg, policy)

    folded_params = smooth.fold_let(params, let, cfg)
    folded, _ = M.forward(folded_params, tokens, cfg)
    np.testing.assert_allclose(np.asarray(online), np.asarray(folded), rtol=1e-4, atol=1e-4)


def test_truncate_scale_floors_small_values():
    s = jnp.asarray([0.5, 1e-4, -1e-4, -0.5, 0.02])
    t = np.asarray(smooth.truncate_scale(s))
    np.testing.assert_allclose(t, [0.5, 1e-2, -1e-2, -0.5, 0.02], atol=1e-8)
    g = jax.grad(lambda x: jnp.sum(smooth.truncate_scale(x) * 3))(s)
    np.testing.assert_allclose(np.asarray(g), np.full(5, 3.0))


def test_smoothquant_scales_formula():
    s = smooth.smoothquant_scales(jnp.asarray([4.0]), jnp.asarray([1.0]), alpha=0.5)
    np.testing.assert_allclose(float(s[0]), 2.0, rtol=1e-6)
