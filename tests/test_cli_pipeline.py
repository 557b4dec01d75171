"""End-to-end CLI pipeline on a tiny model: convert → quantize → pack → demo-ish.
This is the executable spec of the user journey (the reference's experiments/
shell recipes, SURVEY.md §3.1)."""

import subprocess
import sys

import numpy as np
import os
import pytest
import jax

from mobilequant_tpu.models import get_config


@pytest.fixture(scope="module")
def hf_ckpt(tmp_path_factory):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    torch.manual_seed(0)
    cfg = get_config("test-llama")
    hf_cfg = transformers.LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim_, rms_norm_eps=cfg.norm_eps)
    model = transformers.LlamaForCausalLM(hf_cfg).float()
    d = tmp_path_factory.mktemp("hf_ckpt")
    model.save_pretrained(d, safe_serialization=True)
    return d


@pytest.mark.slow
def test_cli_full_pipeline(hf_ckpt, tmp_path):
    from mobilequant_tpu import cli

    work = tmp_path / "work"
    cli.main(["convert", "--hf_path", str(hf_ckpt), "--model", "test-llama",
              "--family", "llama", "--output_dir", str(work)])
    assert (work / "params.orbax").exists()

    cli.main(["quantize", "--model_dir", str(work), "--mode", "e2e",
              "--wbits", "8", "--abits", "8", "--epochs", "2",
              "--nsamples", "8", "--seqlen", "16", "--batch_size", "4",
              "--calib", "synthetic", "--let", "--lwc", "--lrl"])
    assert (work / "qstate.orbax").exists()
    assert (work / "act_dict.json").exists()
    assert (work / "default_qcfg.json").exists()

    engine_dir = tmp_path / "engine"
    cli.main(["pack", "--model_dir", str(work), "--output_dir", str(engine_dir),
              "--max_seq_len", "32", "--verify"])
    assert (engine_dir / "packed.orbax").exists()
    # --verify stored the export parity ritual (engine vs sim + latency)
    import json as _json
    vrec = _json.loads((engine_dir / "engine.json").read_text())["verify"]
    assert vrec["ok"] and vrec["engine_sim_max_rel"] < 5e-2
    assert vrec["decode_ms_per_token"] >= 0

    # quantized-head pack: verify must isolate BODY divergence (the sim's
    # hidden goes through the SAME packed head), not fail on head error
    engine_h4 = tmp_path / "engine_h4"
    cli.main(["pack", "--model_dir", str(work), "--output_dir", str(engine_h4),
              "--max_seq_len", "32", "--head_bits", "4", "--verify"])
    vrec4 = _json.loads((engine_h4 / "engine.json").read_text())["verify"]
    assert vrec4["ok"] and vrec4["engine_sim_max_rel"] < 5e-2

    # int4-KV pack: the learned K/V envelopes convert to 4-bit encodings,
    # the artifact policy records the 4-bit placement, and the verify ritual
    # (engine vs the kv4 sim, incl. the packed-cache decode loop) passes
    engine_kv4 = tmp_path / "engine_kv4"
    cli.main(["pack", "--model_dir", str(work),
              "--output_dir", str(engine_kv4),
              "--max_seq_len", "32", "--kv_bits", "4", "--verify"])
    meta_kv4 = _json.loads((engine_kv4 / "engine.json").read_text())
    assert meta_kv4["kv_bits"] == 4
    assert meta_kv4["verify"]["ok"]
    from mobilequant_tpu.export import artifacts as _art
    from mobilequant_tpu.quant.policy import policy_kv_bits as _pkb
    _, _, pol_kv4, _ = _art.load_packed(engine_kv4)
    assert _pkb(pol_kv4) == 4

    # load back and generate
    from mobilequant_tpu.export import artifacts
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.runtime.generate import Generator
    packed, cfg2, policy2, meta = artifacts.load_packed(engine_dir)
    ecfg = E.EngineConfig(model=cfg2, max_seq_len=meta["max_seq_len"])
    gen = Generator(packed, cfg2, policy2, ecfg)
    out = gen.generate_fast(np.asarray([[1, 5, 7, 9]], np.int32), 8, chunk=4)
    assert out.shape == (1, 8)

    # eval-ppl over the round-tripped artifacts
    stream = np.random.default_rng(0).integers(0, cfg2.vocab_size, (200,))
    np.save(tmp_path / "toks.npy", stream)
    cli.main(["eval-ppl", "--model_dir", str(work),
              "--tokens", str(tmp_path / "toks.npy"), "--seqlen", "32",
              "--max_windows", "2"])

    # eval-lambada: last-word accuracy + latency over a local task file
    # (ref eval/simple_eval.py:18,71-89) across fp / sim / engine rungs
    import json
    rng_l = np.random.default_rng(1)
    task = [{"ids": rng_l.integers(2, cfg2.vocab_size, (12,)).tolist()}
            for _ in range(4)]
    (tmp_path / "lambada.json").write_text(json.dumps(task))
    cli.main(["eval-lambada", "--task", str(tmp_path / "lambada.json"),
              "--model_dir", str(work), "--engine_dir", str(engine_dir),
              "--pad_to", "16",
              "--output", str(tmp_path / "lambada_out.json")])
    res = json.loads((tmp_path / "lambada_out.json").read_text())
    for rung in ("fp", "quant_sim", "engine"):
        assert 0.0 <= res[rung]["accuracy"] <= 1.0
        assert res[rung]["avg_latency_s"] > 0

    # demo command through the native C++ session (libllmod-style loop);
    # ASCII prompts only touch byte-fallback ids < vocab_size
    from mobilequant_tpu.export.tokenizer_bin import write_tokenizer_bin
    pieces = [b"<unk>", b"<s>", b"</s>"]
    pieces += [f"<0x{i:02X}>".encode() for i in range(256)]
    write_tokenizer_bin(tmp_path / "tokenizer.bin", pieces,
                        [0.0] * len(pieces), version=2)
    cli.main(["demo", "--engine_dir", str(engine_dir),
              "--tokenizer", str(tmp_path / "tokenizer.bin"),
              "--prompt", "hi", "--max_new_tokens", "3",
              "--native-session", "--eos", "-1"])

    # serve command: batch inference through the continuous batcher; mixed
    # plain-text and JSONL request lines (per-request sampling + budget)
    import json
    (tmp_path / "prompts.txt").write_text(
        "hi\nok there\n" + json.dumps({
            "prompt": "yo", "max_new_tokens": 2, "temperature": 0.8,
            "top_k": 3}) + "\n")
    cli.main(["serve", "--engine_dir", str(engine_dir),
              "--tokenizer", str(tmp_path / "tokenizer.bin"),
              "--prompts", str(tmp_path / "prompts.txt"),
              "--output", str(tmp_path / "out.jsonl"),
              "--max_new_tokens", "4", "--batch_slots", "2", "--eos", "-1"])
    lines = [json.loads(ln) for ln in open(tmp_path / "out.jsonl")]
    assert len(lines) == 3 and all("completion" in ln for ln in lines)
    assert lines[2]["prompt"] == "yo"

    # speculative demo (greedy; prompt-lookup drafts)
    cli.main(["demo", "--engine_dir", str(engine_dir),
              "--tokenizer", str(tmp_path / "tokenizer.bin"),
              "--prompt", "ababab", "--max_new_tokens", "6",
              "--speculative", "3", "--eos", "-1"])
    # truncated-layer self-draft variant
    cli.main(["demo", "--engine_dir", str(engine_dir),
              "--tokenizer", str(tmp_path / "tokenizer.bin"),
              "--prompt", "ababab", "--max_new_tokens", "6",
              "--speculative", "3", "--draft_layers", "1", "--eos", "-1"])


def test_cli_weight_only_pipeline(hf_ckpt, tmp_path):
    """Weight-only journey: convert → pack --act_bits 16 (no quantize step
    needed — the reference's auto_gptq path likewise packs an FP checkpoint,
    ref qmodule.py:868-886) → demo → serve → eval-ppl --engine_dir."""
    from mobilequant_tpu import cli

    work = tmp_path / "work"
    cli.main(["convert", "--hf_path", str(hf_ckpt), "--model", "test-llama",
              "--family", "llama", "--output_dir", str(work)])

    engine_dir = tmp_path / "engine_w4a16"
    cli.main(["pack", "--model_dir", str(work), "--output_dir", str(engine_dir),
              "--max_seq_len", "32", "--act_bits", "16", "--weight_bits", "4",
              "--group_size", "16", "--warm_cache", "--verify"])
    import json
    meta = json.loads((engine_dir / "engine.json").read_text())
    assert meta["act_bits"] == 16 and meta["weight_bits"] == 4
    assert meta["verify"]["ok"]      # wonly engine vs fake-quant-weight model
    # --warm_cache pre-compiled the decode chunk into the artifact's xla_cache
    assert any((engine_dir / "xla_cache").iterdir())

    from mobilequant_tpu.export.tokenizer_bin import write_tokenizer_bin
    pieces = [b"<unk>", b"<s>", b"</s>"]
    pieces += [f"<0x{i:02X}>".encode() for i in range(256)]
    write_tokenizer_bin(tmp_path / "tokenizer.bin", pieces,
                        [0.0] * len(pieces), version=2)
    cli.main(["demo", "--engine_dir", str(engine_dir),
              "--tokenizer", str(tmp_path / "tokenizer.bin"),
              "--prompt", "hi", "--max_new_tokens", "3", "--eos", "-1"])

    (tmp_path / "prompts.txt").write_text("hi\nok there\n")
    cli.main(["serve", "--engine_dir", str(engine_dir),
              "--tokenizer", str(tmp_path / "tokenizer.bin"),
              "--prompts", str(tmp_path / "prompts.txt"),
              "--output", str(tmp_path / "out_w.jsonl"),
              "--max_new_tokens", "4", "--batch_slots", "2", "--eos", "-1"])
    lines = [json.loads(ln) for ln in open(tmp_path / "out_w.jsonl")]
    assert len(lines) == 2 and all("completion" in ln for ln in lines)

    stream = np.random.default_rng(0).integers(0, 256, (200,))
    np.save(tmp_path / "toks_w.npy", stream)
    cli.main(["eval-ppl", "--model_dir", str(work),
              "--tokens", str(tmp_path / "toks_w.npy"), "--seqlen", "32",
              "--max_windows", "2", "--engine_dir", str(engine_dir)])


def test_export_decode_step_stablehlo(tmp_path):
    from mobilequant_tpu.export import artifacts
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant.policy import default_policy
    from mobilequant_tpu.quant.quantizer import QuantConfig
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.runtime import engine as E

    cfg = get_config("test-llama")
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    policy = default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, policy, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, policy)
    packed = E.pack(params, ranges, cfg, policy)
    blob = artifacts.export_decode_step(packed, cfg, policy, max_seq_len=32,
                                        path=tmp_path / "step.stablehlo")
    assert len(blob) > 1000
    assert (tmp_path / "step.stablehlo").stat().st_size == len(blob)


def test_export_decode_step_wonly_stablehlo(tmp_path):
    from mobilequant_tpu.export import artifacts
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant.quantizer import QuantConfig
    from mobilequant_tpu.runtime import wonly as W

    cfg = get_config("test-llama")
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    wcfg = QuantConfig(bitwidth=4, is_per_channel=True, group_size=16,
                       is_symmetric=False)
    packed = W.pack_weight_only(params, cfg, wcfg)
    blob = artifacts.export_decode_step_wonly(packed, cfg, max_seq_len=32,
                                              path=tmp_path / "wstep.stablehlo")
    assert len(blob) > 1000
    assert (tmp_path / "wstep.stablehlo").stat().st_size == len(blob)


@pytest.mark.slow
def test_reproduce_reference_synthetic():
    """PARITY_RUNBOOK.md CI: recipes/reproduce_reference.sh --synthetic runs
    the exact reference-reproduction command sequence (convert -> FP ppl ->
    e2e quantize -> pack --verify -> engine ppl -> eval-choice) on a tiny
    random model — every flag the checkpoint-equipped run needs."""
    import subprocess
    from pathlib import Path
    script = (Path(__file__).resolve().parent.parent / "recipes"
              / "reproduce_reference.sh")
    env = dict(os.environ, WORK=str(Path(os.environ.get("TMPDIR", "/tmp"))
                                    / "repro_ref_test"))
    out = subprocess.run(["bash", str(script), "--synthetic"],
                         capture_output=True, timeout=900, env=env)
    text = out.stdout.decode(errors="replace")
    assert out.returncode == 0 and "PASSED" in text, \
        (text[-1500:], out.stderr.decode(errors="replace")[-1500:])
