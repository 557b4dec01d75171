"""Quantizer math vs closed form (SURVEY.md §4: unit tests the reference lacks)."""

import numpy as np
import jax
import jax.numpy as jnp

from mobilequant_tpu.quant.quantizer import (
    QuantConfig, fake_quant, fake_quant_weight, scale_offset_from_min_max,
    min_max_from_scale_offset, weight_min_max, round_ste, lwc_init,
    clip_weight_to_learned_bounds,
)


def test_scale_offset_asymmetric_8bit():
    qcfg = QuantConfig(bitwidth=8)
    scale, offset = scale_offset_from_min_max(-1.0, 3.0, qcfg)
    np.testing.assert_allclose(scale, 4.0 / 255.0, rtol=1e-6)
    np.testing.assert_allclose(offset, round(1.0 / (4.0 / 255.0)), rtol=1e-6)


def test_scale_offset_symmetric_8bit():
    qcfg = QuantConfig(bitwidth=8, is_symmetric=True)
    scale, offset = scale_offset_from_min_max(-2.0, 1.0, qcfg)
    np.testing.assert_allclose(scale, 2.0 / 127.0, rtol=1e-6)
    assert float(offset) == 0.0


def test_min_max_roundtrip():
    qcfg = QuantConfig(bitwidth=8)
    s, o = scale_offset_from_min_max(-0.7, 2.1, qcfg)
    mn, mx = min_max_from_scale_offset(s, o, qcfg)
    # min/max recovered up to offset-rounding granularity (= one scale step)
    assert abs(float(mn) - (-0.7)) <= float(s)
    assert abs(float(mx) - 2.1) <= float(s)


def test_fake_quant_exact_grid_points():
    """Values exactly on the quant grid must round-trip exactly."""
    qcfg = QuantConfig(bitwidth=8)
    scale = jnp.float32(0.1)
    offset = jnp.float32(10.0)  # min = -1.0
    levels = (np.arange(0, 256) - 10.0) * 0.1
    out = fake_quant(jnp.asarray(levels, jnp.float32), scale, offset, qcfg)
    np.testing.assert_allclose(np.asarray(out), levels, atol=1e-5)


def test_fake_quant_clips_outliers():
    qcfg = QuantConfig(bitwidth=8)
    scale, offset = jnp.float32(0.1), jnp.float32(128.0)
    out = fake_quant(jnp.asarray([1e6, -1e6], jnp.float32), scale, offset, qcfg)
    np.testing.assert_allclose(np.asarray(out), [(255 - 128) * 0.1, -128 * 0.1], rtol=1e-5)


def test_bitwidth_above_16_is_identity():
    qcfg = QuantConfig(bitwidth=32)
    x = jnp.asarray([1.2345], jnp.float32)
    assert float(fake_quant(x, jnp.float32(1), jnp.float32(0), qcfg)[0]) == float(x[0])


def test_round_ste_gradient_is_identity():
    g = jax.grad(lambda x: jnp.sum(round_ste(x * 3.0)))(jnp.asarray([0.3, -1.7]))
    np.testing.assert_allclose(np.asarray(g), [3.0, 3.0])


def test_fake_quant_grad_flows_to_scale():
    qcfg = QuantConfig(bitwidth=8)
    x = jnp.linspace(-1, 1, 32)

    def loss(s):
        return jnp.sum(jnp.square(fake_quant(x, s, jnp.float32(128.0), qcfg) - x))

    g = jax.grad(loss)(jnp.float32(0.01))
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_weight_min_max_per_channel_layout():
    """Our (in, out) layout: per-channel stats reduce the input axis."""
    w = jnp.asarray(np.random.default_rng(0).normal(size=(16, 4)), jnp.float32)
    qcfg = QuantConfig(bitwidth=8, is_per_channel=True)
    mn, mx = weight_min_max(w, qcfg)
    assert mn.shape == (1, 4)
    np.testing.assert_allclose(np.asarray(mx)[0], np.asarray(w).max(axis=0))


def test_weight_quant_error_bounded_by_half_step():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    for qcfg in [QuantConfig(bitwidth=8), QuantConfig(bitwidth=8, is_per_channel=True),
                 QuantConfig(bitwidth=4, is_per_channel=True, is_symmetric=True),
                 QuantConfig(bitwidth=4, is_per_channel=True, group_size=16)]:
        wq = fake_quant_weight(w, qcfg)
        mn, mx = weight_min_max(w, qcfg)
        scale, _ = scale_offset_from_min_max(mn, mx, qcfg)
        step = float(jnp.max(scale))
        err = float(jnp.max(jnp.abs(wq - w)))
        assert err <= step * 0.501 + 1e-6, (qcfg, err, step)


def test_lwc_tightens_bounds_and_grads_flow():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(32, 8)), jnp.float32)
    qcfg = QuantConfig(bitwidth=8, is_per_channel=True)
    lwc = lwc_init(w, qcfg)
    assert lwc["up"].shape == (1, 8)

    def loss(lwc):
        return jnp.sum(jnp.square(fake_quant_weight(w, qcfg, lwc) - w))

    g = jax.grad(loss)(lwc)
    assert float(jnp.max(jnp.abs(g["up"]))) > 0.0

    # strongly negative factors shrink sigmoid → tight clipping
    tight = {"up": jnp.full((1, 8), -5.0), "low": jnp.full((1, 8), -5.0)}
    w_clipped = clip_weight_to_learned_bounds(w, qcfg, tight)
    assert float(jnp.max(jnp.abs(w_clipped))) < float(jnp.max(jnp.abs(w)))


def test_qcfg_dict_roundtrip_matches_reference_schema():
    qcfg = QuantConfig(bitwidth=4, group_size=32, is_symmetric=True,
                       is_per_channel=True, is_dynamic=False)
    d = qcfg.to_dict()
    assert d["bitwidth"] == "4" and d["is_symmetric"] == "True"
    assert QuantConfig.from_dict(d) == qcfg


def test_weight_only_linear_grouped_matches_fake_quant():
    """Grouped (g128-style) W4A16/W8A16 pack: weight_only_linear ==
    x @ fake_quant_weight(w) for per-channel+group configs (the reference's
    auto_gptq default layout, ref qmodule.py:803-829)."""
    import jax.numpy as jnp
    from mobilequant_tpu.ops import qops
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(3, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 48)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(48,)), jnp.float32)
    for bits in (4, 8):
        for gs in (16, 32):
            qcfg = QuantConfig(bitwidth=bits, is_per_channel=True,
                               group_size=gs, is_symmetric=(bits == 4))
            ref = x @ fake_quant_weight(w, qcfg) + b
            pack = qops.pack_weight(w, qcfg)
            assert pack["scale"].shape == (64 // gs, 1, 48)
            out = qops.weight_only_linear(x, pack, b)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"bits={bits} gs={gs}")


def test_add_random_samples_interleaves():
    """Random-token calibration augmentation (ref generate_act_scale_shift.py
    81-84): one uniform-random sample interleaved per real sample, ids in
    [2, vocab-1)."""
    import numpy as np
    from mobilequant_tpu.data.calib import add_random_samples
    base = np.arange(12, dtype=np.int32).reshape(3, 4)
    out = add_random_samples(base, vocab_size=50, seed=0)
    assert out.shape == (6, 4) and out.dtype == base.dtype
    np.testing.assert_array_equal(out[0::2], base)
    assert out[1::2].min() >= 2 and out[1::2].max() < 49
    # deterministic under the seed
    np.testing.assert_array_equal(out, add_random_samples(base, 50, seed=0))
