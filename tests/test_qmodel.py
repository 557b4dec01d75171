"""Fake-quant simulation model tests: placement, calibration, range behaviour."""

import numpy as np
import jax
import jax.numpy as jnp

from mobilequant_tpu.models import get_config
from mobilequant_tpu.models import model as M
from mobilequant_tpu.quant.policy import default_policy, policy_to_dict, policy_from_dict
from mobilequant_tpu.quant.quantizer import QuantConfig
from mobilequant_tpu.quant import qmodel, calibrate


def _setup(name="test-llama", w_bits=8, a_bits=8, **pol_kw):
    cfg = get_config(name)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    policy = default_policy(cfg, QuantConfig(bitwidth=w_bits),
                            QuantConfig(bitwidth=a_bits), **pol_kw)
    tokens = np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 16)).astype(np.int32)
    return cfg, params, policy, tokens


def test_collect_mode_is_fp_identical():
    cfg, params, policy, tokens = _setup()
    t = jnp.asarray(tokens)
    fp, _ = M.forward(params, t, cfg)
    q, _, stats = qmodel.qforward(params, None, t, cfg, policy, mode="collect")
    np.testing.assert_allclose(np.asarray(q), np.asarray(fp), rtol=1e-5, atol=1e-6)
    assert stats is not None
    # per-layer stacked stats for the KV-cache encodings
    assert stats["self_attn.qk_bmm"]["input2"]["min"].shape == (cfg.num_layers,)
    # per-channel input stats for SmoothQuant init
    assert stats["self_attn.q_proj"]["input"]["cmin"].shape == (cfg.num_layers, cfg.hidden_size)


def test_calibrated_sim_close_to_fp():
    """W8A8 static fake-quant after one calibration pass must track FP closely on
    the calibration data itself (the reference's SmoothQuant-baseline sanity)."""
    cfg, params, policy, tokens = _setup()
    stats = calibrate.run_calibration(params, tokens, cfg, policy, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, policy)
    t = jnp.asarray(tokens[:2])
    fp, _ = M.forward(params, t, cfg)
    q, _, _ = qmodel.qforward(params, {"ranges": ranges}, t, cfg, policy)
    fp, q = np.asarray(fp), np.asarray(q)
    # correlation-style check: quant error should be small relative to signal
    rel = np.linalg.norm(q - fp) / np.linalg.norm(fp)
    assert rel < 0.15, rel


def test_w4_per_channel_policy_runs():
    cfg, params, policy, tokens = _setup(
        w_bits=4)
    policy = default_policy(cfg, QuantConfig(bitwidth=4, is_per_channel=True, is_symmetric=True),
                            QuantConfig(bitwidth=8))
    stats = calibrate.run_calibration(params, tokens[:2], cfg, policy, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, policy)
    q, _, _ = qmodel.qforward(params, {"ranges": ranges}, jnp.asarray(tokens[:1]), cfg, policy)
    assert np.isfinite(np.asarray(q)).all()


def test_act_dict_roundtrip():
    cfg, params, policy, tokens = _setup()
    stats = calibrate.run_calibration(params, tokens[:2], cfg, policy, batch_size=2)
    act_dict = calibrate.stats_to_act_dict(stats, cfg)
    # reference-style keys present
    assert "model.layers.0.self_attn.qk_bmm" in act_dict
    assert "input2" in act_dict["model.layers.0.self_attn.qk_bmm"]
    back = calibrate.act_dict_to_stats(act_dict, cfg)
    np.testing.assert_allclose(back["self_attn.qk_bmm"]["input2"]["min"],
                               np.asarray(stats["self_attn.qk_bmm"]["input2"]["min"]),
                               rtol=1e-6)


def test_policy_dict_roundtrip():
    cfg, _, policy, _ = _setup()
    d = policy_to_dict(policy)
    assert d["mlp.w2"]["weight"]["is_per_channel"] == "True"   # w2 per-channel rule
    assert d["self_attn.o_proj"]["output"]["bitwidth"] == "16"  # o_proj 16-bit out
    assert d["input_layernorm"]["input"]["bitwidth"] == "16"
    p2 = policy_from_dict(d)
    assert p2["mlp.w2"].weight.is_per_channel
    assert policy_to_dict(p2) == d


def test_lwc_and_lrl_gradients_flow_through_sim():
    cfg, params, policy, tokens = _setup()
    stats = calibrate.run_calibration(params, tokens[:2], cfg, policy, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, policy)
    lwc = qmodel.lwc_init_all(params, policy)
    from mobilequant_tpu.quant import smooth
    let = smooth.let_init(cfg)
    t = jnp.asarray(tokens[:1])
    fp, _ = M.forward(params, t, cfg)

    def loss(qstate):
        q, _, _ = qmodel.qforward(params, qstate, t, cfg, policy)
        return jnp.mean(jnp.square(q - fp))

    g = jax.grad(loss)({"ranges": ranges, "lwc": lwc, "let": let})
    gmax = jax.tree.map(lambda a: float(jnp.max(jnp.abs(a))), g)
    # at least one leaf in each group must receive gradient
    assert any(v > 0 for v in jax.tree.leaves(gmax["let"]))
    assert any(v > 0 for v in jax.tree.leaves(gmax["lwc"]))
    assert any(v > 0 for v in jax.tree.leaves(gmax["ranges"]))


def test_resid_add_sites_strict_vs_relaxed():
    """The strict policy carries 16-bit quantizers on both inputs and the
    output of the skip-connection adds (ref device/utils.py:68-77); relax_16bit
    removes exactly them. The sites must (a) exist, (b) be calibrated, and
    (c) actually bite (strict output != relaxed output)."""
    from mobilequant_tpu.quant.policy import relax_16bit

    cfg, params, policy, tokens = _setup()
    for site in ("resid_add_1", "resid_add_2"):
        sq = policy[site]
        assert sq.input.bitwidth == 16 and sq.input2.bitwidth == 16 \
            and sq.output.bitwidth == 16
        relaxed = relax_16bit(policy)[site]
        assert not relaxed.input.enabled and not relaxed.output.enabled

    stats = calibrate.run_calibration(params, tokens, cfg, policy, batch_size=4)
    assert "input2" in stats["resid_add_1"] and "output" in stats["resid_add_2"]
    ranges = calibrate.stats_to_ranges(stats, policy)
    assert "resid_add_2" in ranges

    t = jnp.asarray(tokens[:2])
    fp, _ = M.forward(params, t, cfg)
    strict, _, _ = qmodel.qforward(params, {"ranges": ranges}, t, cfg, policy)
    rel_pol = relax_16bit(policy)
    relaxed, _, _ = qmodel.qforward(params, {"ranges": ranges}, t, cfg, rel_pol)
    # the 16-bit sites are near-lossless but not identity
    assert not np.allclose(np.asarray(strict), np.asarray(relaxed))
    scale = np.abs(np.asarray(fp)).max()
    assert np.abs(np.asarray(strict) - np.asarray(fp)).max() / scale < 0.15


def test_use_16bit_output_for_mlp_policy():
    """Gemma recipe option (ref generate_qcfg.py:34,93-94): w1/w3 outputs at
    16 bits instead of 8."""
    cfg, params, policy, tokens = _setup("test-gemma",
                                         use_16bit_output_for_mlp=True)
    assert policy["mlp.w1"].output.bitwidth == 16
    if "mlp.w3" in policy:
        assert policy["mlp.w3"].output.bitwidth == 16
    base = default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8))
    assert base["mlp.w1"].output.bitwidth == 8

    # runs through calibration + sim + engine pack unchanged
    stats = calibrate.run_calibration(params, tokens, cfg, policy, batch_size=4)
    ranges = calibrate.stats_to_ranges(stats, policy)
    t = jnp.asarray(tokens[:2])
    sim, _, _ = qmodel.qforward(params, {"ranges": ranges}, t, cfg, policy)
    from mobilequant_tpu.runtime import engine as E
    packed = E.pack(params, ranges, cfg, policy,
                    E.EngineConfig(model=cfg, max_seq_len=32))
    eng, _ = E.forward(packed, t, cfg, policy)
    rel = np.abs(np.asarray(eng) - np.asarray(sim)).max() / \
        (np.abs(np.asarray(sim)).max() + 1e-9)
    assert rel < 2e-3, rel


def test_moe_per_expert_activation_ranges():
    """MoE collect mode records PER-EXPERT activation envelopes over each
    expert's routed tokens (the reference's per-expert QLinear quantizers,
    hf_model.py:1065-1162): experts get distinct ranges, an unrouted expert
    falls back to the per-stack envelope, and the act_dict round-trips them."""
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.quant.policy import default_policy
    from mobilequant_tpu.quant.quantizer import QuantConfig

    cfg = get_config("test-mixtral")
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    policy = default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (4, 16)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, policy, batch_size=2)

    e = stats["mlp.w2"]["input"]
    assert "emin" in e and e["emin"].shape == (cfg.num_layers,
                                              cfg.num_local_experts)
    ranges = calibrate.stats_to_ranges(stats, policy)
    sc = np.asarray(ranges["mlp.w2"]["input"]["scale"])
    assert sc.shape == (cfg.num_layers, cfg.num_local_experts)
    # routed experts must have genuinely distinct envelopes (not one shared
    # per-stack range copied E times)
    finite_rows = np.isfinite(np.asarray(e["emin"]))
    assert finite_rows.any()
    row = sc[0][np.unique(sc[0], return_index=True)[1]]
    assert len(np.unique(sc[0])) > 1, sc[0]
    del row
    # per-stack envelope contains every expert envelope
    assert (np.asarray(e["emin"]) >= np.asarray(e["min"])[:, None] - 1e-6).all()
    assert (np.asarray(e["emax"]) <= np.asarray(e["max"])[:, None] + 1e-6).all()

    # act_dict round trip preserves the per-expert lists
    act_dict = calibrate.stats_to_act_dict(stats, cfg)
    ranges2 = calibrate.ranges_to_act_dict(ranges, policy, cfg)
    key = "model.layers.0.mlp.w2"
    assert isinstance(ranges2[key]["input"][0], list)
    back = calibrate.act_dict_to_stats(ranges2, cfg)
    assert back["mlp.w2"]["input"]["emin"].shape == (
        cfg.num_layers, cfg.num_local_experts)
    del act_dict
