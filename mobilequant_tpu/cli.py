"""Command-line pipeline driver.

One CLI replaces the reference's script zoo (scripts/convert_ckpt.py,
ptq/generate_act_scale_shift.py, ptq/smoothquant.py, ptq/generate_act_range.py,
ptq/generate_qcfg.py, ptq/mobilequant.py, eval/*.py, device/export.py):

  python -m mobilequant_tpu.cli convert    --hf_path ... --model tinyllama-1.1b --family llama --output_dir ...
  python -m mobilequant_tpu.cli calibrate  --model_dir ... [--calib synthetic|pile|wikitext2|file] --nsamples N
  python -m mobilequant_tpu.cli quantize   --model_dir ... --mode e2e --wbits 8 --abits 8 --epochs 60 [--lwc --let --lrl]
  python -m mobilequant_tpu.cli pack       --model_dir ... --output_dir ... [--w4] [--max_seq_len 1024]
  python -m mobilequant_tpu.cli eval-ppl   --model_dir ... [--engine_dir ...] --tokens file.npy
  python -m mobilequant_tpu.cli eval-choice --task file.json [--model_dir ...] [--engine_dir ...]
  python -m mobilequant_tpu.cli demo       --engine_dir ... --tokenizer tokenizer.bin --prompt "..."
  python -m mobilequant_tpu.cli serve      --engine_dir ... --tokenizer ... (--prompts f | --http PORT)

Weight-only mode: pack --act_bits 16 (no quantize step; W4A16/W8A16 g128).

Recipes under recipes/ pin the hyperparameters of the reference's experiments/
shell scripts (60 epochs, 1024 pile samples, LET/LWC/LRL lrs).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def _model_cfg(args):
    from mobilequant_tpu.models import get_config
    return get_config(args.model)


def cmd_convert(args):
    import jax.numpy as jnp
    from mobilequant_tpu.models.convert import load_checkpoint
    from mobilequant_tpu.export import artifacts
    from mobilequant_tpu.quant.policy import default_policy
    from mobilequant_tpu.quant.quantizer import QuantConfig

    cfg = _model_cfg(args)
    params = load_checkpoint(args.hf_path, cfg, args.family)
    policy = default_policy(cfg, QuantConfig(bitwidth=32), QuantConfig(bitwidth=32))
    artifacts.save_quantized(args.output_dir, params, None, cfg, policy)
    print(f"converted {args.hf_path} -> {args.output_dir}")


def _enable_engine_cache(args):
    """--compile_cache auto|off|PATH: persistent XLA executable cache living
    next to the engine artifact (the qnn_model.bin cold-start analogue)."""
    mode = getattr(args, "compile_cache", "off")
    if mode == "off":
        return
    from mobilequant_tpu.utils.io import enable_compilation_cache
    path = Path(args.engine_dir) / "xla_cache" if mode == "auto" else Path(mode)
    enable_compilation_cache(path)


def _load_model_dir(model_dir):
    from mobilequant_tpu.export import artifacts
    return artifacts.load_quantized(model_dir)


def _calib_tokens(args, cfg, tokenizer=None):
    from mobilequant_tpu.data.calib import add_random_samples, get_loaders
    if args.calib.endswith((".txt", ".jsonl", ".zst", ".json")):
        toks = get_loaders("file", tokenizer, args.nsamples, args.seqlen,
                           local_path=args.calib)
    elif args.calib.endswith(".npy"):
        toks = np.load(args.calib)
        toks = toks[:args.nsamples, :args.seqlen].astype(np.int32)
    else:
        toks = get_loaders(args.calib, tokenizer, args.nsamples, args.seqlen,
                           vocab_size=cfg.vocab_size)
    if getattr(args, "use_rand_samples", False):
        toks = add_random_samples(toks, cfg.vocab_size)
    return toks


def cmd_calibrate(args):
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.quant.policy import default_policy
    from mobilequant_tpu.quant.quantizer import QuantConfig
    from mobilequant_tpu.export import artifacts
    from mobilequant_tpu.utils.io import json_save

    params, _, cfg, _, _ = _load_model_dir(args.model_dir)
    policy = default_policy(cfg, QuantConfig(bitwidth=args.wbits,
                                             is_per_channel=args.wbits == 4,
                                             is_symmetric=args.wbits == 4),
                            QuantConfig(bitwidth=args.abits))
    tokens = _calib_tokens(args, cfg)
    t0 = time.time()
    stats = calibrate.run_calibration(params, tokens, cfg, policy,
                                      batch_size=args.batch_size)
    act_dict = calibrate.stats_to_act_dict(stats, cfg)
    json_save(Path(args.model_dir) / "act_dict.json", act_dict)
    print(f"calibration done in {time.time()-t0:.1f}s -> act_dict.json "
          f"({len(act_dict)} ops)")


def cmd_quantize(args):
    import jax
    from mobilequant_tpu.quant import calibrate, smooth, train
    from mobilequant_tpu.quant.policy import default_policy
    from mobilequant_tpu.quant.quantizer import QuantConfig
    from mobilequant_tpu.export import artifacts
    from mobilequant_tpu.utils.io import create_logger

    logger = create_logger("quantize")
    params, _, cfg, _, _ = _load_model_dir(args.model_dir)
    policy = default_policy(
        cfg,
        QuantConfig(bitwidth=args.wbits, is_per_channel=args.wbits == 4,
                    is_symmetric=args.wbits == 4),
        QuantConfig(bitwidth=args.abits),
        use_8bit_softmax_input=args.use_8bit_softmax_input,
        use_8bit_softmax_output=args.use_8bit_softmax_output,
        use_16bit_output_for_mlp=args.use_16bit_output_for_mlp)
    tokens = _calib_tokens(args, cfg)

    tc = train.TrainConfig(
        epochs=args.epochs, batch_size=args.batch_size,
        let_lr=args.let_lr, let_min_lr=args.let_min_lr,
        lwc_lr=args.lwc_lr, lwc_min_lr=args.lwc_min_lr,
        lrl_lr=args.lrl_lr, lrl_min_lr=args.lrl_min_lr,
        use_let=args.let, use_lwc=args.lwc, use_lrl=args.lrl,
        aug_loss=getattr(args, "aug_loss", False))

    # SmoothQuant initialization of LET (ref ptq/smoothquant.py stage)
    logger.info("calibrating statistics...")
    stats = calibrate.run_calibration(params, tokens, cfg, policy,
                                      batch_size=args.batch_size)
    let0 = None
    if args.let and args.smooth_init:
        act_scales, act_shifts = calibrate.smooth_calib_inputs(stats)
        let0 = smooth.smoothquant_let_init(cfg, act_scales, act_shifts, params,
                                           alpha=args.alpha)
        stats = calibrate.run_calibration(params, tokens, cfg, policy, let=let0,
                                          batch_size=args.batch_size)
    ranges = calibrate.stats_to_ranges(stats, policy)

    qstate = train.init_qstate(params, cfg, policy, tc, ranges, let=let0)
    resume_state, resume_layers = None, 0
    if args.resume:
        import numpy as _np
        import orbax.checkpoint as ocp
        restored = ocp.PyTreeCheckpointer().restore(Path(args.resume).resolve())
        if isinstance(restored, dict) and "layers_done" in restored:
            # omniquant per-layer checkpoint (ref quant_parameters.pth +
            # --resume, algorithm.py:498-500,555-556): completed layers skip
            # training, propagation re-runs -> bit-identical final state
            resume_state = restored["qstate"]
            resume_layers = int(_np.asarray(restored["layers_done"]))
            logger.info(f"resuming omniquant from {args.resume} "
                        f"({resume_layers} layers done)")
        else:
            qstate = restored
            logger.info(f"resumed quant state from {args.resume}")

    ckpt_dir = Path(args.output_dir or args.model_dir) / "checkpoints"

    def checkpoint_cb(epoch, qs):
        # per-epoch quant-state checkpoint (ref parameters.pth, algorithm.py:762)
        import orbax.checkpoint as ocp
        ocp.PyTreeCheckpointer().save((ckpt_dir / "qstate_latest.orbax").resolve(),
                                      qs, force=True)

    def checkpoint_cb_layer(li, qs):
        # per-layer quant-state checkpoint for the layerwise loop (ref
        # quant_parameters.pth, algorithm.py:555-556)
        import numpy as _np
        import orbax.checkpoint as ocp
        ocp.PyTreeCheckpointer().save(
            (ckpt_dir / "qstate_latest.orbax").resolve(),
            {"qstate": qs, "layers_done": _np.asarray(li + 1, _np.int32)},
            force=True)

    if args.epochs > 0:
        t0 = time.time()
        if args.mode == "e2e":
            qstate, hist = train.e2equant(params, qstate, tokens, cfg, policy, tc,
                                          logger=logger, checkpoint_cb=checkpoint_cb)
        else:
            qstate, hist = train.omniquant(params, qstate, tokens, cfg, policy, tc,
                                           logger=logger,
                                           checkpoint_cb=checkpoint_cb_layer,
                                           resume_state=resume_state,
                                           resume_layers=resume_layers)
        logger.info(f"optimization took {time.time()-t0:.1f}s")

    params, qstate = train.finalize(params, qstate, cfg, policy)
    act_dict = calibrate.ranges_to_act_dict(qstate["ranges"], policy, cfg)
    out = args.output_dir or args.model_dir
    artifacts.save_quantized(out, params, qstate, cfg, policy, act_dict)
    logger.info(f"saved quantized model -> {out}")


def _warm_engine_cache(output_dir, packed, cfg, policy, ecfg):
    """pack --warm_cache: pre-compile the shape-stable decode-chunk executable
    into the artifact's xla_cache so the first demo/serve cold start skips the
    big compile (ship-the-compiled-graph, like the reference's qnn_model.bin)."""
    from mobilequant_tpu.utils.io import enable_compilation_cache
    from mobilequant_tpu.runtime.generate import Generator
    # explicit warming: cache every executable, however quick its compile
    enable_compilation_cache(Path(output_dir) / "xla_cache",
                             min_compile_time_secs=0.0)
    gen = Generator(packed, cfg, policy, ecfg)
    gen.generate_fast(np.zeros((1, 8), np.int32), 33, chunk=32)
    print(f"warmed xla_cache (decode chunk + prefill) -> {output_dir}/xla_cache")


def _verify_packed(output_dir, packed, cfg, policy, ecfg, sim_logits_fn,
                   eng_logits_fn, decode_loop_fn, init_cache_fn,
                   n_check=12, n_decode=16):
    """pack --verify: the reference's export parity ritual (ref
    device/export.py:395-438 — every export ends with the on-device graph
    allclosed against the simulator plus a measured avg latency). Runs the
    packed engine on the CURRENT backend (the real chip when run under the
    ambient TPU platform), checks prompt logits against the fake-quant sim,
    times an in-graph decode chunk (length-differenced so fixed dispatch
    overhead cancels), and merges the record into engine.json."""
    import time

    import jax
    import jax.numpy as jnp

    from mobilequant_tpu.utils.io import json_load, json_save

    rng = np.random.default_rng(0)
    T = int(min(n_check, ecfg.max_seq_len // 2))
    t = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, T)), jnp.int32)
    sim = np.asarray(sim_logits_fn(t), np.float32)
    eng = np.asarray(eng_logits_fn(t), np.float32)
    max_abs = float(np.abs(eng - sim).max())
    max_rel = float(max_abs / (np.abs(sim).max() + 1e-9))
    # reference gate: rtol=1e-1, atol=1e-3 (HTP vs GPU-sim); the integer
    # engine is an exact re-expression of the sim so fp32 rounding is the
    # only divergence — on TPU the sim's fp32 matmuls run at bf16 precision,
    # hence the looser-than-CPU-test bound
    ok = bool(max_rel < 5e-2 or max_abs < 1e-1)

    def run_chunk(n, salt):
        tok = jnp.full((1, 1), salt % cfg.vocab_size, jnp.int32)
        cache = init_cache_fn(ecfg, 1)
        pos = jnp.zeros((1,), jnp.int32)
        t0 = time.perf_counter()
        toks, _, _ = decode_loop_fn(packed, tok, cache, pos, n)
        np.asarray(toks)
        return time.perf_counter() - t0

    n1, n2 = 8, 8 + n_decode
    run_chunk(n1, 1); run_chunk(n2, 2)          # compile + warm
    d1, d2 = run_chunk(n1, 3), run_chunk(n2, 4)
    if d2 - d1 > 1e-4:
        ms_per_tok = (d2 - d1) / n_decode * 1e3
        method = "marginal"
    else:
        # fixed dispatch overhead swallowed the marginal (tiny model over a
        # remote runtime): report the raw chunk as an upper bound instead
        ms_per_tok = d2 / n2 * 1e3
        method = "raw_upper_bound"

    rec = {"engine_sim_max_abs": max_abs, "engine_sim_max_rel": max_rel,
           "ok": ok, "decode_ms_per_token": round(ms_per_tok, 4),
           "latency_method": method,
           "backend": jax.default_backend(), "n_check_tokens": T,
           "n_decode_tokens": n_decode}
    meta_path = Path(output_dir) / "engine.json"
    meta = json_load(meta_path) if meta_path.exists() else {}
    meta["verify"] = rec
    json_save(meta_path, meta)
    status = "OK" if ok else "MISMATCH"
    print(f"verify [{status}]: engine vs sim max_rel={max_rel:.2e} "
          f"max_abs={max_abs:.2e}; decode {ms_per_tok:.3f} ms/token "
          f"on {rec['backend']} -> engine.json")
    if not ok:
        raise SystemExit(1)
    return rec


def cmd_pack(args):
    from mobilequant_tpu.export import artifacts
    from mobilequant_tpu.runtime import engine as E

    params, qstate, cfg, policy, _ = _load_model_dir(args.model_dir)

    if args.act_bits == 16:
        # weight-only mode (W4A16/W8A16): fp activations, no calibration or
        # learned ranges needed — packs straight off a converted FP checkpoint
        # (the reference's auto_gptq path, ref qmodule.py:868-886)
        from mobilequant_tpu.quant.policy import weight_only_policy
        from mobilequant_tpu.runtime import wonly
        wb = args.weight_bits or 4
        wcfg = wonly.default_weight_cfg(wb, args.group_size)
        packed = wonly.pack_weight_only(params, cfg, wcfg,
                                        head_bits=args.head_bits)
        # the artifact's default_qcfg.json reflects the ACTUAL placement:
        # weight quantizers on the projections, plus the quantized head when
        # --head_bits packs one (policy.py owns quantizer placement —
        # CLAUDE.md invariant)
        policy = weight_only_policy(cfg, wcfg, head_bits=args.head_bits)
        artifacts.save_packed(args.output_dir, packed, cfg, policy,
                              {"max_seq_len": args.max_seq_len, "act_bits": 16,
                               "weight_bits": wb, "group_size": args.group_size,
                               "head_bits": args.head_bits})
        print(f"packed weight-only (W{wb}A16 g{args.group_size} "
              f"h{args.head_bits}) engine -> {args.output_dir}")
        if args.export_hlo:
            artifacts.export_decode_step_wonly(
                packed, cfg, args.max_seq_len,
                Path(args.output_dir) / "decode_step.stablehlo")
        ecfg = E.EngineConfig(model=cfg, max_seq_len=args.max_seq_len,
                              act_bits=16, weight_bits=wb)
        if args.warm_cache:
            _warm_engine_cache(args.output_dir, packed, cfg, policy, ecfg)
        if args.verify:
            from mobilequant_tpu.models import model as M
            from mobilequant_tpu.quant.quantizer import fake_quant_weight
            import jax

            def _fq_params():
                out = jax.tree.map(lambda a: a, params)
                for k in wonly._PROJ_KEYS:
                    if k in out["layers"] and "w" in out["layers"][k]:
                        w = out["layers"][k]["w"]
                        fq = (jax.vmap(jax.vmap(
                                  lambda wi: fake_quant_weight(wi, wcfg)))
                              if w.ndim == 4 else
                              jax.vmap(lambda wi: fake_quant_weight(wi, wcfg)))(w)
                        out["layers"][k]["w"] = fq
                return out

            fqp = _fq_params()

            def _wsim(t):
                logits, _ = M.forward(fqp, t, cfg)
                if "head_q" not in packed:
                    return logits
                # quantized head: run the fq-weight model's hidden through
                # the SAME packed head (see the int-engine branch note)
                h, _, _ = M.forward_hidden(fqp, t, cfg)
                return E.quantized_head_logits(h, packed["head_q"],
                                               cfg.vocab_size,
                                               use_kernel=False)

            _verify_packed(
                args.output_dir, packed, cfg, policy, ecfg,
                sim_logits_fn=_wsim,
                eng_logits_fn=lambda t: wonly.forward(packed, t, cfg)[0],
                decode_loop_fn=lambda p, tok, cache, pos, n: wonly.decode_loop(
                    p, tok, cache, pos, n, cfg, None),
                init_cache_fn=wonly.init_kv_cache)
        return

    assert qstate is not None, "run `quantize` first (needs learned ranges)"
    # default weight_bits follows the quantized policy (W4A8 models pack W4)
    wb = args.weight_bits
    if wb is None:
        wq = policy["mlp.w1"].weight
        wb = 4 if (wq is not None and wq.bitwidth == 4) else 8
    kvb = getattr(args, "kv_bits", 8)
    if kvb != 8:
        # int4-KV serving option: convert the learned K/V envelopes to the
        # 4-bit encodings and record the 4-bit placement in the artifact
        from mobilequant_tpu.quant import calibrate as _cal
        from mobilequant_tpu.quant.policy import (kv_bits_policy,
                                                  policy_kv_bits)
        if policy_kv_bits(policy) != kvb:
            qstate = dict(qstate)
            qstate["ranges"] = _cal.ranges_for_kv_bits(
                qstate["ranges"], kvb, old_bits=policy_kv_bits(policy))
            policy = kv_bits_policy(policy, kvb)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=args.max_seq_len,
                          weight_bits=wb, head_bits=args.head_bits,
                          global_kv_encoding=args.global_kv, kv_bits=kvb)
    s_last = None
    if args.smooth_last is not None:
        # final-norm -> lm_head SmoothQuant fold before head quantization
        # (ref device/convert_sim.py:114-128, --smooth_last)
        import jax.numpy as jnp
        from mobilequant_tpu.quant import calibrate
        toks = _calib_tokens(args, cfg)
        am = calibrate.head_input_absmax(params, toks, cfg)
        head_w = (params["embed"]["w"].T if cfg.tie_word_embeddings
                  else params["lm_head"]["w"])
        s_last = calibrate.smooth_last_scales(am, jnp.asarray(head_w),
                                              alpha=args.smooth_last)
    packed = E.pack(params, qstate["ranges"], cfg, policy, ecfg,
                    smooth_last=s_last)
    artifacts.save_packed(args.output_dir, packed, cfg, policy,
                          {"max_seq_len": args.max_seq_len, "act_bits": 8,
                           "weight_bits": wb, "head_bits": args.head_bits,
                           "kv_bits": kvb,
                           "smooth_last": args.smooth_last})
    if args.export_hlo:
        artifacts.export_decode_step(packed, cfg, policy, args.max_seq_len,
                                     Path(args.output_dir) / "decode_step.stablehlo")
    print(f"packed engine -> {args.output_dir}")
    if args.warm_cache:
        _warm_engine_cache(args.output_dir, packed, cfg, policy, ecfg)
    if args.verify:
        from mobilequant_tpu.quant import qmodel

        qst = {"ranges": qstate["ranges"]}
        if "head_q" in packed:
            # quantized head: the sim's lm_head is FP by policy (the head
            # quantizer is an engine-side feature with its own accuracy
            # characterization) — route the sim's final hidden through the
            # SAME packed head so the parity record isolates BODY divergence
            # instead of measuring head-quantization error
            def sim_fn(t):
                h, _, _ = qmodel.qforward_hidden(params, qst, t, cfg, policy)
                if s_last is not None:
                    # the engine's final norm carries the smooth_last fold;
                    # rescale the sim's head input to match (equivalent in
                    # real arithmetic: (n(x)w+b)/s == n(x)(w/s)+(b/s))
                    h = h / s_last
                return E.quantized_head_logits(h, packed["head_q"],
                                               cfg.vocab_size,
                                               use_kernel=False)
        else:
            def sim_fn(t):
                return qmodel.qforward(params, qst, t, cfg, policy)[0]
        _verify_packed(
            args.output_dir, packed, cfg, policy, ecfg,
            sim_logits_fn=sim_fn,
            eng_logits_fn=lambda t: E.forward(packed, t, cfg, policy)[0],
            decode_loop_fn=lambda p, tok, cache, pos, n: E.decode_loop(
                p, tok, cache, pos, n, cfg, policy),
            init_cache_fn=E.init_kv_cache)


def cmd_eval_ppl(args):
    import jax.numpy as jnp
    from mobilequant_tpu.eval.ppl import perplexity
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import qmodel

    params, qstate, cfg, policy, _ = _load_model_dir(args.model_dir)
    stream = np.load(args.tokens).reshape(-1)

    fwd_fp = lambda tok: M.forward(params, tok, cfg)[0]
    ppl_fp = perplexity(fwd_fp, stream, seqlen=args.seqlen,
                        max_windows=args.max_windows)
    print(f"fp ppl: {ppl_fp:.4f}")
    if qstate is not None:
        fwd_q = lambda tok: qmodel.qforward(params, qstate, tok, cfg, policy)[0]
        ppl_q = perplexity(fwd_q, stream, seqlen=args.seqlen,
                           max_windows=args.max_windows)
        print(f"quant ppl: {ppl_q:.4f} (Δ {ppl_q - ppl_fp:+.4f})")
    if args.engine_dir:
        # packed-engine ppl (int engine or weight-only per the artifact meta) —
        # the executable-artifact rung of the fidelity ladder
        from mobilequant_tpu.export import artifacts
        packed, ecfg_cfg, epolicy, meta = artifacts.load_packed(args.engine_dir)
        if meta.get("act_bits", 8) == 16:
            from mobilequant_tpu.runtime import wonly as _emod
        else:
            from mobilequant_tpu.runtime import engine as _emod
        fwd_e = lambda tok: _emod.forward(packed, tok, ecfg_cfg, epolicy)[0]
        ppl_e = perplexity(fwd_e, stream, seqlen=args.seqlen,
                           max_windows=args.max_windows)
        print(f"engine ppl: {ppl_e:.4f} (Δ {ppl_e - ppl_fp:+.4f})")


def cmd_eval_choice(args):
    """Multiple-choice accuracy (ARC/HellaSwag/MMLU style) on a local task
    file — the harness-free accuracy rung (ref eval/harness_eval.py)."""
    import json as _json
    from mobilequant_tpu.eval.choice import (load_task_file,
                                             multiple_choice_accuracy)
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import qmodel

    tk = None
    if args.tokenizer:
        from mobilequant_tpu.runtime.native import NativeTokenizer
        tk = NativeTokenizer(args.tokenizer)
    examples = load_task_file(args.task, tokenizer=tk, bos_id=args.bos)

    results = {}
    if args.model_dir:
        params, qstate, cfg, policy, _ = _load_model_dir(args.model_dir)
        fwd_fp = lambda tok: M.forward(params, tok, cfg)[0]
        results["fp"] = multiple_choice_accuracy(fwd_fp, examples,
                                                 max_length=args.max_length)
        if qstate is not None:
            fwd_q = lambda tok: qmodel.qforward(params, qstate, tok, cfg,
                                                policy)[0]
            results["quant_sim"] = multiple_choice_accuracy(
                fwd_q, examples, max_length=args.max_length)
    if args.engine_dir:
        from mobilequant_tpu.export import artifacts
        packed, ecfg_cfg, epolicy, meta = artifacts.load_packed(args.engine_dir)
        if meta.get("act_bits", 8) == 16:
            from mobilequant_tpu.runtime import wonly as _emod
        else:
            from mobilequant_tpu.runtime import engine as _emod
        fwd_e = lambda tok: _emod.forward(packed, tok, ecfg_cfg, epolicy)[0]
        results["engine"] = multiple_choice_accuracy(fwd_e, examples,
                                                     max_length=args.max_length)
    for name, r in results.items():
        print(f"{name}: acc {r['acc']:.4f}  acc_norm {r['acc_norm']:.4f}  "
              f"(n={r['n']})")
    if args.output:
        Path(args.output).write_text(_json.dumps(results, indent=2))


def cmd_export_tokenizer(args):
    """tokenizer.bin exporter (ref capp/scripts/tokenizer.py): from a
    sentencepiece .model or an HF tokenizer dir, with special tokens patched
    from tokenizer_config.json when present/given."""
    from mobilequant_tpu.export import tokenizer_bin as TB

    src = Path(args.source)
    cfg_path = args.tokenizer_config
    if src.is_dir():
        import transformers
        tok = transformers.AutoTokenizer.from_pretrained(str(src),
                                                         use_fast=False)
        if cfg_path is None and (src / "tokenizer_config.json").exists():
            cfg_path = src / "tokenizer_config.json"
        TB.export_hf_tokenizer(tok, args.output, version=args.version,
                               tokenizer_config=cfg_path)
    else:
        import sentencepiece as spm
        sp = spm.SentencePieceProcessor(model_file=str(src))
        pieces, scores = TB.pieces_from_sentencepiece(sp)
        if cfg_path is not None:
            import json as _json
            cfg = _json.loads(Path(cfg_path).read_text())
            TB.patch_special_tokens(
                pieces, scores,
                TB.special_tokens_from_config(cfg, sp.bos_id(), sp.eos_id()))
        TB.write_tokenizer_bin(args.output, pieces, scores,
                               version=args.version)
    print(f"exported tokenizer -> {args.output}")


def cmd_eval_lambada(args):
    """LAMBADA-style last-word accuracy with per-call latency — the CLI rung
    of ref eval/simple_eval.py:18,71-89 (which drives utils/bench.Evaluator:
    31-81: tokenize each example, predict the final token from the position
    before it, report accuracy + average latency)."""
    import json as _json
    from mobilequant_tpu.eval.evaluator import last_word_accuracy
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import qmodel

    tk = None
    if args.tokenizer:
        from mobilequant_tpu.runtime.native import NativeTokenizer
        tk = NativeTokenizer(args.tokenizer)
    raw = _json.loads(Path(args.task).read_text())
    examples = []
    for ex in raw[:args.limit] if args.limit else raw:
        if "ids" in ex:
            ids = [int(i) for i in ex["ids"]]
        else:
            assert tk is not None, "text task files need --tokenizer"
            ids = tk.encode(ex["text"],
                            prefix=[args.bos] if args.bos >= 0 else [])
        if len(ids) >= 2:
            examples.append((ids[:-1], ids[-1]))   # ref bench.py:56-76

    results = {}
    if args.model_dir:
        params, qstate, cfg, policy, _ = _load_model_dir(args.model_dir)
        fwd_fp = lambda tok: M.forward(params, tok, cfg)[0]
        results["fp"] = last_word_accuracy(fwd_fp, examples, pad_to=args.pad_to)
        if qstate is not None:
            fwd_q = lambda tok: qmodel.qforward(params, qstate, tok, cfg,
                                                policy)[0]
            results["quant_sim"] = last_word_accuracy(fwd_q, examples,
                                                      pad_to=args.pad_to)
    if args.engine_dir:
        from mobilequant_tpu.export import artifacts
        packed, ecfg_cfg, epolicy, meta = artifacts.load_packed(args.engine_dir)
        if meta.get("act_bits", 8) == 16:
            from mobilequant_tpu.runtime import wonly as _emod
        else:
            from mobilequant_tpu.runtime import engine as _emod
        fwd_e = lambda tok: _emod.forward(packed, tok, ecfg_cfg, epolicy)[0]
        results["engine"] = last_word_accuracy(fwd_e, examples,
                                               pad_to=args.pad_to)
    for name, r in results.items():
        print(f"{name}: acc {r['accuracy']:.4f}  "
              f"avg latency {r['avg_latency_s']*1e3:.2f} ms  "
              f"(n={len(examples)})")
    if args.output:
        Path(args.output).write_text(_json.dumps(results, indent=2))


def cmd_serve(args):
    """Serving: offline (--prompts file → JSONL) or online (--http PORT →
    continuous batching over live requests, stdlib HTTP front-end)."""
    import json as _json
    _enable_engine_cache(args)
    from mobilequant_tpu.export import artifacts
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.runtime.native import NativeTokenizer
    from mobilequant_tpu.runtime.sampling import SamplerConfig
    from mobilequant_tpu.runtime.serve import ContinuousBatcher

    packed, cfg, policy, meta = artifacts.load_packed(args.engine_dir)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=meta.get("max_seq_len", 1024),
                          act_bits=meta.get("act_bits", 8),
                          weight_bits=meta.get("weight_bits", 8),
                          kv_bits=meta.get("kv_bits", 8))
    tk = NativeTokenizer(args.tokenizer)
    sampler = SamplerConfig(greedy=args.temperature <= 0.0,
                            temperature=max(args.temperature, 1e-6))
    cb = ContinuousBatcher(
        packed, cfg, policy, ecfg, batch_slots=args.batch_slots,
        sampler=sampler, eos_token_id=args.eos if args.eos >= 0 else None,
        chunk_prefill=args.chunk_prefill, chunk_decode=args.chunk_decode,
        seed=args.seed, spec_k=getattr(args, "spec_k", 0))

    if args.http is not None:
        from mobilequant_tpu.runtime.server import (InferenceServer,
                                                    make_http_server)
        srv = InferenceServer(cb).start()
        httpd = make_http_server(
            srv, tokenizer=tk, host=args.host, port=args.http,
            bos_id=args.bos, eos_id=args.eos, chat_family=args.chat or None,
            default_max_new_tokens=args.max_new_tokens)
        print(f"serving on http://{args.host}:{httpd.server_address[1]} "
              f"(POST /generate, GET /health, GET /stats)", file=sys.stderr)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.shutdown()
            srv.close()
        return

    assert args.prompts is not None, "offline mode needs --prompts (or use --http)"
    # each line is either plain prompt text, or a JSON object
    # {"prompt": str, "max_new_tokens"?, "temperature"?, "top_p"?, "top_k"?,
    #  "greedy"?} — per-request sampling overrides ride the same batch
    prompts = [ln.rstrip("\n") for ln in open(args.prompts)
               if ln.strip()]
    rids, texts = [], []
    for p in prompts:
        text, mnt, samp = p, args.max_new_tokens, None
        if p.lstrip().startswith("{"):
            try:
                obj = _json.loads(p)
            except ValueError:
                obj = None
            if isinstance(obj, dict) and "prompt" in obj:
                text = obj["prompt"]
                mnt = int(obj.get("max_new_tokens", args.max_new_tokens))
                if any(f in obj for f in ("temperature", "top_p", "top_k",
                                          "greedy")):
                    t = float(obj.get("temperature", 1.0))
                    samp = SamplerConfig(
                        temperature=t, top_p=float(obj.get("top_p", 1.0)),
                        top_k=int(obj.get("top_k", 0)),
                        greedy=bool(obj.get("greedy", t == 0.0)))
        ids = tk.encode(text, prefix=[args.bos] if args.bos >= 0 else [])
        rids.append(cb.submit(np.asarray(ids, np.int32), mnt, sampler=samp))
        texts.append(text)
    t0 = time.perf_counter()
    outs = cb.run()
    dt = time.perf_counter() - t0
    n_tok = sum(len(outs[r]) for r in rids)
    sink = open(args.output, "w") if args.output else sys.stdout
    for p, r in zip(texts, rids):
        sink.write(_json.dumps({"prompt": p,
                                "completion": tk.decode(list(outs[r]))}) + "\n")
    if args.output:
        sink.close()
    print(f"[{len(prompts)} prompts, {n_tok} tokens, "
          f"{n_tok / max(dt, 1e-9):.1f} tok/s total]", file=sys.stderr)


def cmd_demo(args):
    _enable_engine_cache(args)
    from mobilequant_tpu.export import artifacts
    from mobilequant_tpu.runtime.generate import Generator
    from mobilequant_tpu.runtime.native import NativeTokenizer
    from mobilequant_tpu.runtime.chat import apply_chat_template_ids

    packed, cfg, policy, meta = artifacts.load_packed(args.engine_dir)
    from mobilequant_tpu.runtime import engine as E
    ecfg = E.EngineConfig(model=cfg, max_seq_len=meta.get("max_seq_len", 1024),
                          act_bits=meta.get("act_bits", 8),
                          weight_bits=meta.get("weight_bits", 8),
                          kv_bits=meta.get("kv_bits", 8))
    gen = Generator(packed, cfg, policy, ecfg)
    tk = NativeTokenizer(args.tokenizer)
    temperature = args.temperature

    def answer(prompt: str):
        # tokenized template: the prompt is encoded as its own segment and
        # wrapped in exact ids (same path the native session takes — immune
        # to string-level boundary drift, ref llm.cpp:382-392)
        tids = apply_chat_template_ids(tk.encode(prompt), args.chat,
                                       tk.encode, tk.piece_to_id)
        ids = ([args.bos] if args.bos >= 0 else []) + tids
        if args.speculative > 0 and temperature <= 0.0:
            out, stats = gen.generate_speculative(
                np.asarray([ids], np.int32), args.max_new_tokens,
                k=args.speculative, self_draft_layers=args.draft_layers,
                eos_token_id=args.eos if args.eos >= 0
                else None, return_stats=True)
            print(tk.decode(out[0].tolist()))
            print(f"[{stats['decode_tok_s']:.1f} tok/s decode, "
                  f"{stats['tokens_per_verify']:.2f} tok/verify, "
                  f"prefill {stats['prefill_s']*1e3:.0f} ms]", file=sys.stderr)
            return
        out, stats = gen.generate_fast(np.asarray([ids], np.int32),
                                       args.max_new_tokens,
                                       temperature=temperature, return_stats=True)
        print(tk.decode(out[0].tolist()))
        print(f"[{stats['decode_tok_s']:.1f} tok/s decode, "
              f"prefill {stats['prefill_s']*1e3:.0f} ms]", file=sys.stderr)

    if args.native_session:
        # C++-orchestrated loop (libllmod-style): the native session owns the
        # tokenizer/sampler/template and calls back into the jitted decode
        # step per token (runtime/native.NativeSession)
        import jax.numpy as jnp
        from mobilequant_tpu.runtime.native import NativeSession
        state = {}

        def forward(token, position):
            if position == 0 or "cache" not in state:
                state["cache"] = gen._mod.init_kv_cache(ecfg, 1)
            pos = jnp.asarray([position], jnp.int32)
            logits, state["cache"] = gen._decode(
                packed, jnp.asarray([[token]], jnp.int32), state["cache"], pos)
            return np.asarray(logits)[0]

        sess = NativeSession(args.tokenizer, forward, cfg.vocab_size,
                             family=args.chat, temperature=temperature,
                             max_seq_len=ecfg.max_seq_len, bos_id=args.bos,
                             eos_id=args.eos)

        def answer(prompt: str):          # noqa: F811 — native override
            text, last_pos = sess.run(prompt, args.max_new_tokens)
            print(text)
            print(f"[native session, last position {last_pos}]",
                  file=sys.stderr)

    if not args.interactive:
        answer(args.prompt)
        return
    # interactive REPL (analogue of the reference's simple_app, capp/test/
    # simple_app.cpp: !exit / !temp commands)
    print("mobilequant_tpu REPL — !exit to quit, !temp <t> to set temperature",
          file=sys.stderr)
    while True:
        try:
            line = input("> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not line:
            continue
        if line == "!exit":
            break
        if line.startswith("!temp"):
            temperature = float(line.split()[1])
            print(f"temperature={temperature}", file=sys.stderr)
            continue
        answer(line)


def build_parser():
    p = argparse.ArgumentParser("mobilequant_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert")
    c.add_argument("--hf_path", required=True)
    c.add_argument("--model", required=True)
    c.add_argument("--family", default="llama")
    c.add_argument("--output_dir", required=True)
    c.set_defaults(fn=cmd_convert)

    def calib_args(q):
        q.add_argument("--calib", default="synthetic")
        q.add_argument("--nsamples", type=int, default=128)
        q.add_argument("--seqlen", type=int, default=1024)
        q.add_argument("--batch_size", type=int, default=4)
        q.add_argument("--wbits", type=int, default=8)
        q.add_argument("--abits", type=int, default=8)
        q.add_argument("--use_rand_samples", action="store_true",
                       help="interleave uniform-random-id samples with the "
                            "calib set (stats robustness; ref ptq/"
                            "generate_act_scale_shift.py:81-84)")

    q = sub.add_parser("calibrate")
    q.add_argument("--model_dir", required=True)
    calib_args(q)
    q.set_defaults(fn=cmd_calibrate)

    q = sub.add_parser("quantize")
    q.add_argument("--model_dir", required=True)
    q.add_argument("--output_dir", default=None)
    calib_args(q)
    q.add_argument("--mode", choices=["e2e", "layerwise"], default="e2e")
    q.add_argument("--resume", default=None,
                   help="path to a qstate_latest.orbax checkpoint to resume from")
    q.add_argument("--epochs", type=int, default=60)
    q.add_argument("--let", action="store_true")
    q.add_argument("--lwc", action="store_true")
    q.add_argument("--lrl", action="store_true")
    q.add_argument("--smooth_init", action="store_true", default=True)
    q.add_argument("--no_smooth_init", dest="smooth_init",
                   action="store_false",
                   help="skip the SmoothQuant LET initialization (the "
                        "reference omniquant/lrl baselines init LET at 1)")
    q.add_argument("--aug_loss", action="store_true",
                   help="auxiliary MSE vs the FP teacher on the QUANTIZED "
                        "inputs (ref --aug_loss, algorithm.py:449,478)")
    q.add_argument("--alpha", type=float, default=0.5)
    q.add_argument("--let_lr", type=float, default=1e-3)
    q.add_argument("--let_min_lr", type=float, default=1e-4)
    q.add_argument("--lwc_lr", type=float, default=1e-2)
    q.add_argument("--lwc_min_lr", type=float, default=1e-3)
    q.add_argument("--lrl_lr", type=float, default=1e-6)
    q.add_argument("--lrl_min_lr", type=float, default=1e-7)
    q.add_argument("--use_8bit_softmax_input", action="store_true")
    q.add_argument("--use_8bit_softmax_output", action="store_true")
    q.add_argument("--use_16bit_output_for_mlp", action="store_true",
                   help="run mlp.w1/w3 outputs at 16 bits (the reference's "
                        "Gemma recipe option, ref generate_qcfg.py:93-94)")
    q.set_defaults(fn=cmd_quantize)

    q = sub.add_parser("pack")
    q.add_argument("--model_dir", required=True)
    q.add_argument("--output_dir", required=True)
    q.add_argument("--max_seq_len", type=int, default=1024)
    q.add_argument("--weight_bits", type=int, choices=(4, 8), default=None,
                   help="engine weight packing; default follows the policy")
    q.add_argument("--head_bits", type=int, choices=(4, 8, 16), default=16,
                   help="lm_head: 16=fp, 8/4=per-channel sym int (SLinear)")
    q.add_argument("--act_bits", type=int, choices=(8, 16), default=8,
                   help="8=int engine (needs learned ranges); 16=weight-only "
                        "W4A16/W8A16 (no calibration, fp activations)")
    q.add_argument("--group_size", type=int, default=128,
                   help="weight-only input-axis group size (-1=per-channel)")
    q.add_argument("--global_kv", action="store_true")
    q.add_argument("--kv_bits", type=int, choices=(4, 8), default=8,
                   help="KV-cache bitwidth: 4 = nibble-packed int4 cache "
                        "(halves the KV traffic that dominates batched "
                        "decode; learned K/V envelopes are converted)")
    q.add_argument("--smooth_last", type=float, default=None, metavar="ALPHA",
                   help="SmoothQuant-fold the final norm into the quantized "
                        "lm_head before packing (needs --head_bits 4/8; "
                        "alpha as in the reference's --smooth_alpha)")
    q.add_argument("--calib", default="synthetic",
                   help="calibration source for --smooth_last act stats")
    q.add_argument("--nsamples", type=int, default=32)
    q.add_argument("--seqlen", type=int, default=512)
    q.add_argument("--export_hlo", action="store_true")
    q.add_argument("--warm_cache", action="store_true",
                   help="pre-compile the decode executable into "
                        "<output_dir>/xla_cache (instant cold start)")
    q.add_argument("--verify", action="store_true",
                   help="after packing, run the engine vs the fake-quant sim "
                        "on the current backend (logits allclose) + time an "
                        "in-graph decode chunk; store both in engine.json "
                        "(the reference export's parity ritual, ref "
                        "device/export.py:395-438)")
    q.set_defaults(fn=cmd_pack)

    q = sub.add_parser("eval-ppl")
    q.add_argument("--model_dir", required=True)
    q.add_argument("--tokens", required=True, help=".npy token stream")
    q.add_argument("--seqlen", type=int, default=1024)
    q.add_argument("--max_windows", type=int, default=None)
    q.add_argument("--engine_dir", default=None,
                   help="also eval a packed engine artifact (int or "
                        "weight-only per its engine.json)")
    q.set_defaults(fn=cmd_eval_ppl)

    q = sub.add_parser("eval-choice")
    q.add_argument("--task", required=True,
                   help="local JSON task file (ctx/choices/label; ids or text)")
    q.add_argument("--model_dir", default=None)
    q.add_argument("--engine_dir", default=None)
    q.add_argument("--tokenizer", default=None,
                   help="tokenizer.bin for raw-text task files")
    q.add_argument("--bos", type=int, default=-1)
    q.add_argument("--max_length", type=int, default=2048)
    q.add_argument("--output", default=None, help="write results JSON here")
    q.set_defaults(fn=cmd_eval_choice)

    q = sub.add_parser("export-tokenizer")
    q.add_argument("--source", required=True,
                   help="sentencepiece .model file or HF tokenizer dir")
    q.add_argument("--output", required=True, help="tokenizer.bin path")
    q.add_argument("--tokenizer_config", default=None,
                   help="tokenizer_config.json to patch special tokens from "
                        "(auto-detected inside an HF dir)")
    q.add_argument("--version", type=int, choices=(1, 2), default=2,
                   help="1 = reference-compatible layout, 2 = self-describing")
    q.set_defaults(fn=cmd_export_tokenizer)

    q = sub.add_parser("eval-lambada")
    q.add_argument("--task", required=True,
                   help="local JSON task file: [{'text': str} | {'ids': "
                        "[int...]}, ...] — predict each example's final token")
    q.add_argument("--model_dir", default=None)
    q.add_argument("--engine_dir", default=None)
    q.add_argument("--tokenizer", default=None,
                   help="tokenizer.bin for text task files")
    q.add_argument("--bos", type=int, default=-1)
    q.add_argument("--pad_to", type=int, default=128,
                   help="fixed forward length (one executable; ref Evaluator "
                        "pads to max_length)")
    q.add_argument("--limit", type=int, default=None)
    q.add_argument("--output", default=None, help="write results JSON here")
    q.set_defaults(fn=cmd_eval_lambada)

    q = sub.add_parser("serve")
    q.add_argument("--engine_dir", required=True)
    q.add_argument("--tokenizer", required=True)
    q.add_argument("--prompts", default=None,
                   help="text file, one prompt per line (offline mode)")
    q.add_argument("--compile_cache", default="auto",
                   help="auto = <engine_dir>/xla_cache, off, or a path")
    q.add_argument("--http", type=int, default=None,
                   help="serve online on this port (0 = ephemeral): "
                        "continuous batching over live POST /generate requests")
    q.add_argument("--host", default="127.0.0.1")
    q.add_argument("--chat", default="",
                   help="chat template family for online text requests")
    q.add_argument("--output", default=None, help="JSONL out (default stdout)")
    q.add_argument("--max_new_tokens", type=int, default=128)
    q.add_argument("--batch_slots", type=int, default=8)
    q.add_argument("--chunk_prefill", type=int, default=None)
    q.add_argument("--chunk_decode", type=int, default=1,
                   help="advance active slots N tokens per in-graph tick "
                        "(N x fewer host dispatches; greedy/temperature only)")
    q.add_argument("--spec_k", type=int, default=0,
                   help=">=2 enables speculative tail ticks: in-graph "
                        "prompt-lookup draft+verify rounds when exactly one "
                        "greedy request is active (latency-bound phases)")
    q.add_argument("--temperature", type=float, default=0.0)
    q.add_argument("--seed", type=int, default=0)
    q.add_argument("--bos", type=int, default=1)
    q.add_argument("--eos", type=int, default=-1,
                   help="stop at this token id (-1 = run to max_new_tokens)")
    q.set_defaults(fn=cmd_serve)

    q = sub.add_parser("demo")
    q.add_argument("--engine_dir", required=True)
    q.add_argument("--tokenizer", required=True)
    q.add_argument("--prompt", default="Once upon a time")
    q.add_argument("--max_new_tokens", type=int, default=128)
    q.add_argument("--temperature", type=float, default=0.0)
    q.add_argument("--bos", type=int, default=1)
    q.add_argument("--chat", default="none",
                   help="chat template family: llama|gemma|stablelm|none")
    q.add_argument("--interactive", action="store_true")
    q.add_argument("--eos", type=int, default=2)
    q.add_argument("--native-session", action="store_true",
                   help="drive the loop from the C++ session (libllmod-style)")
    q.add_argument("--speculative", type=int, default=0, metavar="K",
                   help="greedy speculative decoding with K-token verify "
                        "(prompt-lookup drafts; greedy only)")
    q.add_argument("--draft_layers", type=int, default=0, metavar="N",
                   help="with --speculative: truncated-layer SELF-draft "
                        "(first N decoder layers + head propose; 0 = "
                        "prompt-lookup drafts)")
    q.add_argument("--compile_cache", default="auto",
                   help="auto = <engine_dir>/xla_cache, off, or a path")
    q.set_defaults(fn=cmd_demo)
    return p


def main(argv=None):
    import os
    if os.environ.get("MQTPU_DEVICE"):
        # force a backend BEFORE first use — the ambient axon sitecustomize
        # imports jax and wins platform selection, so a plain JAX_PLATFORMS
        # env var is too late (CLAUDE.md); jax.config still works here
        import jax
        jax.config.update("jax_platforms", os.environ["MQTPU_DEVICE"])
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
