"""Pallas kernel tests in interpret mode vs the jnp/fake-quant reference
(SURVEY.md §4: Pallas kernels vs jnp reference in interpret mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mobilequant_tpu.ops import qops
from mobilequant_tpu.ops.pallas_matmul import int_linear_pallas, w4a8_matmul
from mobilequant_tpu.quant.quantizer import QuantConfig, scale_offset_from_min_max


@pytest.mark.parametrize("M,K,N", [(1, 256, 512), (8, 512, 1024), (32, 256, 512)])
@pytest.mark.parametrize("symmetric", [True, False])
def test_w4a8_kernel_matches_int_linear(M, K, N, symmetric):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(N,)), jnp.float32)
    acfg = QuantConfig(bitwidth=8)
    wcfg = QuantConfig(bitwidth=4, is_per_channel=True, is_symmetric=symmetric)

    s, o = scale_offset_from_min_max(jnp.min(x), jnp.max(x), acfg)
    x8 = qops.quantize_act(x, s, o)
    pack = qops.pack_weight(w, wcfg)
    assert pack["wq"].shape == (K // 2, N)  # nibble-packed

    ref = qops.int_linear(x8, s, o, pack, b)
    out = int_linear_pallas(x8, s, o, pack, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_pack_unpack_nibbles_roundtrip():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.integers(-8, 8, size=(64, 32)), jnp.int8)
    p = qops.pack_nibbles(q)
    assert p.shape == (32, 32)
    np.testing.assert_array_equal(np.asarray(qops.unpack_nibbles(p)), np.asarray(q))


def test_kernel_handles_leading_batch_dims():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 3, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 256)), jnp.float32)
    wcfg = QuantConfig(bitwidth=4, is_per_channel=True, is_symmetric=True)
    acfg = QuantConfig(bitwidth=8)
    s, o = scale_offset_from_min_max(jnp.min(x), jnp.max(x), acfg)
    x8 = qops.quantize_act(x, s, o)
    pack = qops.pack_weight(w, wcfg)
    ref = qops.int_linear(x8, s, o, pack, None)
    out = int_linear_pallas(x8, s, o, pack, None, interpret=True)
    assert out.shape == (2, 3, 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_w4a16_weight_only_matches_fake_quant():
    """Weight-only path: fp acts × dequantized W4 == fq_weight reference,
    XLA and Pallas implementations both."""
    from mobilequant_tpu.ops.pallas_matmul import w4a16_matmul
    from mobilequant_tpu.quant.quantizer import fake_quant_weight
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 256)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(256,)), jnp.float32)
    for wcfg in [QuantConfig(bitwidth=4, is_per_channel=True, is_symmetric=True),
                 QuantConfig(bitwidth=4, is_per_channel=True)]:
        ref = x @ fake_quant_weight(w, wcfg) + b
        pack = qops.pack_weight(w, wcfg)
        xla = qops.weight_only_linear(x, pack, b)
        np.testing.assert_allclose(np.asarray(xla), np.asarray(ref), rtol=1e-4, atol=1e-4)
        ker = w4a16_matmul(x, pack["wq"], pack["scale"], pack["offset"], b,
                           interpret=True)
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("M", [1, 8])
def test_w8a8_kernel_matches_int_linear(M):
    from mobilequant_tpu.ops.pallas_matmul import w8a8_matmul
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(M, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 512)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(512,)), jnp.float32)
    acfg = QuantConfig(bitwidth=8)
    for wcfg in [QuantConfig(bitwidth=8), QuantConfig(bitwidth=8, is_per_channel=True)]:
        s, o = scale_offset_from_min_max(jnp.min(x), jnp.max(x), acfg)
        x8 = qops.quantize_act(x, s, o)
        pack = qops.pack_weight(w, wcfg)
        ref = qops.int_linear(x8, s, o, pack, b)
        out = w8a8_matmul(x8, pack["wq"], pack["scale"], pack["offset"],
                          pack["colsum"], b, s, o, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)
