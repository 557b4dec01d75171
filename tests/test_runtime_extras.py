"""Native tokenizer/sampler, continuous batching, ppl and evaluator tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mobilequant_tpu.export.tokenizer_bin import write_tokenizer_bin
from mobilequant_tpu.runtime.native import NativeTokenizer, NativeSampler


def _toy_vocab():
    """llama-style vocab: specials, byte-fallback block at 3..258, then merges."""
    pieces = [b"<unk>", b"<s>", b"</s>"]
    pieces += [f"<0x{i:02X}>".encode() for i in range(256)]
    scores = [0.0] * len(pieces)
    merges = [(b" ", -1.0), (b"h", -2.0), (b"e", -2.1), (b"l", -2.2), (b"o", -2.3),
              (b"he", -3.0), (b"ll", -3.5), (b"hell", -4.0), (b"hello", -5.0),
              (b" hello", -5.5), (b"w", -2.4), (b"r", -2.5), (b"d", -2.6),
              (b"wo", -3.1), (b"ld", -3.6), (b"rld", -4.1), (b"world", -5.1),
              (b" world", -5.6)]
    for p, s in merges:
        pieces.append(p)
        scores.append(s)
    return pieces, scores


@pytest.mark.parametrize("version", [1, 2])
def test_native_tokenizer_roundtrip(tmp_path, version):
    pieces, scores = _toy_vocab()
    path = tmp_path / "tokenizer.bin"
    write_tokenizer_bin(path, pieces, scores, version=version)
    tk = NativeTokenizer(path)
    assert tk.vocab_size == len(pieces)

    ids = tk.encode("hello world")
    # greedy BPE should reach the full merged tokens
    assert ids == [tk.encode("hello")[0], pieces.index(b" world")]
    assert tk.decode(ids) == "hello world"

    # byte fallback for unseen codepoints (emoji → 4 byte tokens)
    ids = tk.encode("🙂")
    assert len(ids) == 4
    assert tk.decode(ids) == "🙂"


def test_native_sampler_argmax_and_bounds():
    s = NativeSampler(seed=7, temperature=0.0)
    logits = np.asarray([0.1, 5.0, -1.0], np.float32)
    assert s.sample(logits) == 1

    s2 = NativeSampler(seed=7, temperature=1.0, top_p=0.9, top_k=2)
    counts = {}
    for _ in range(200):
        t = s2.sample(logits)
        counts[t] = counts.get(t, 0) + 1
    assert set(counts) <= {0, 1}          # top_k=2 excludes index 2
    assert counts.get(1, 0) > counts.get(0, 0)


def _engine_setup():
    from mobilequant_tpu.models import get_config
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
    ecfg = E.EngineConfig(model=cfg, max_seq_len=64)
    packed = E.pack(params, ranges, cfg, policy, ecfg)
    return cfg, policy, ecfg, packed


def test_batched_refill_matches_per_request_and_dispatches():
    """Refill waves batch into ONE prefill dispatch sequence (_prefill_many):
    token streams are bit-identical to the per-request refill path (greedy),
    and the batched jits actually engage — for both the bucketed and the
    chunked-prefill modes, including a non-power-of-two group (padded rows
    duplicate a real request; their adopt is a no-op write)."""
    from mobilequant_tpu.runtime.serve import ContinuousBatcher
    from mobilequant_tpu.runtime.sampling import SamplerConfig

    cfg, policy, ecfg, packed = _engine_setup()
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (5, 9, 7, 12, 4, 6)]

    def run(mode, batched):
        kw = {"chunk_prefill": 8} if mode == "chunked" else \
             {"prefill_buckets": (16, 32)}
        cb = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=3,
                               sampler=SamplerConfig(greedy=True), **kw)
        calls = [0]
        if batched:
            fn_name = ("_prefill_chunk_b" if mode == "chunked"
                       else "_prefill_slots_b")
            orig = getattr(cb, fn_name)

            def spy(*a, **k):
                calls[0] += 1
                return orig(*a, **k)

            setattr(cb, fn_name, spy)
        else:
            # force the per-request path
            cb._prefill_many = lambda pairs: [
                (slot, req, cb._prefill_into(req, slot))
                for slot, req in pairs]
        rids = [cb.submit(p, 5) for p in prompts]
        outs = cb.run()
        return [outs[r] for r in rids], calls[0]

    for mode in ("bucketed", "chunked"):
        want, _ = run(mode, batched=False)
        got, ncalls = run(mode, batched=True)
        assert ncalls > 0, f"{mode}: batched refill jit did not dispatch"
        assert got == want, (mode, got, want)


def test_speculative_tail_ticks_match_plain():
    """spec_k: the lone-active-greedy-request tail runs in-graph
    prompt-lookup draft→verify rounds (one sync per ≤64 rounds) and emits
    exactly the plain batcher's greedy token stream; EOS truncates."""
    from mobilequant_tpu.runtime.serve import ContinuousBatcher
    from mobilequant_tpu.runtime.sampling import SamplerConfig

    cfg, policy, ecfg, packed = _engine_setup()
    # repetitive prompt so the n-gram draft has something to copy
    prompt = np.asarray([7, 3, 9, 4, 7, 3, 9, 4, 7, 3], np.int32)

    def run(spec_k, n_new=14, eos=None):
        cb = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=2,
                               prefill_buckets=(16,),
                               sampler=SamplerConfig(greedy=True),
                               eos_token_id=eos, spec_k=spec_k)
        calls = [0]
        if spec_k:
            orig = cb._spec_rounds

            def spy(*a, **k):
                calls[0] += 1
                return orig(*a, **k)

            cb._spec_rounds = spy
        rid = cb.submit(prompt, n_new)
        outs = cb.run()
        return outs[rid], calls[0]

    want, _ = run(0)
    got, ncalls = run(4)
    assert ncalls > 0, "speculative tail did not engage"
    assert got == want, (got, want)

    eos = want[5]
    got_eos, _ = run(4, eos=eos)
    assert got_eos == want[:want.index(eos) + 1], (got_eos, want)

    # two active slots: the speculative path must stay out of the way
    cb2 = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=2,
                            prefill_buckets=(16,),
                            sampler=SamplerConfig(greedy=True), spec_k=4)
    r1 = cb2.submit(prompt, 6)
    r2 = cb2.submit(prompt[:7], 6)
    outs = cb2.run()
    assert len(outs[r1]) == 6 and len(outs[r2]) == 6


def test_continuous_batching_matches_sequential():
    from mobilequant_tpu.runtime.serve import ContinuousBatcher
    from mobilequant_tpu.runtime.generate import Generator
    from mobilequant_tpu.runtime.sampling import SamplerConfig

    cfg, policy, ecfg, packed = _engine_setup()
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (5, 9, 7, 12, 4)]

    # sequential ground truth (greedy)
    gen = Generator(packed, cfg, policy, ecfg)
    seq_out = [gen.generate(p[None, :], max_new_tokens=6)[0].tolist()
               for p in prompts]

    cb = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=2,
                           prefill_buckets=(16, 32),
                           sampler=SamplerConfig(greedy=True))
    rids = [cb.submit(p, 6) for p in prompts]
    outs = cb.run()
    for rid, want in zip(rids, seq_out):
        assert outs[rid] == want, (rid, outs[rid], want)

    # chunked prefill (fixed 8-token chunks through a per-slot scratch cache,
    # one compiled shape for any prompt length) must match exactly
    cbc = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=2,
                            sampler=SamplerConfig(greedy=True),
                            chunk_prefill=8)
    rids = [cbc.submit(p, 6) for p in prompts]
    outs = cbc.run()
    for rid, want in zip(rids, seq_out):
        assert outs[rid] == want, ("chunked", rid, outs[rid], want)


def test_perplexity_on_tiny_model():
    from mobilequant_tpu.eval.ppl import perplexity
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M

    cfg = get_config("test-llama")
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    stream = np.random.default_rng(0).integers(0, cfg.vocab_size, (400,))
    fwd = lambda tok: M.forward(params, tok, cfg)[0]
    ppl = perplexity(fwd, stream, seqlen=64, batch_size=2)
    assert np.isfinite(ppl)
    # random model on random tokens ≈ uniform ⇒ ppl near vocab size
    assert 0.3 * cfg.vocab_size < ppl < 3 * cfg.vocab_size


def test_last_word_evaluator():
    from mobilequant_tpu.eval.evaluator import last_word_accuracy, model_size_bytes
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M

    cfg = get_config("test-llama")
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    fwd = lambda tok: M.forward(params, tok, cfg)[0]
    rng = np.random.default_rng(0)
    examples = [(rng.integers(0, cfg.vocab_size, (10,)).tolist(),
                 int(rng.integers(0, cfg.vocab_size))) for _ in range(5)]
    res = last_word_accuracy(fwd, examples, pad_to=16)
    assert 0.0 <= res["accuracy"] <= 1.0 and res["avg_latency_s"] > 0

    sz = model_size_bytes(params)
    assert sz["params"] > 0 and sz["bytes"] > 0


def test_synthetic_calib_loader():
    from mobilequant_tpu.data.calib import get_loaders, synthetic_tokens
    toks = get_loaders("synthetic", nsamples=4, seqlen=32, vocab_size=100)
    assert toks.shape == (4, 32) and toks.max() < 100
    # deterministic
    np.testing.assert_array_equal(toks, synthetic_tokens(100, 4, 32))


def test_debug_tools():
    from mobilequant_tpu.eval.debug import site_error_attribution, compare_sim_engine
    cfg, policy, ecfg, packed = _engine_setup()
    import jax
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import calibrate
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    tokens = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, policy, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, policy)
    qstate = {"ranges": ranges}

    attr = site_error_attribution(params, qstate, tokens[:1], cfg, policy, mode="solo")
    assert len(attr) > 10 and all(np.isfinite(v) for v in attr.values())

    rep = compare_sim_engine(params, qstate, packed, tokens[:1], cfg, policy)
    assert rep["rel_err"] < 5e-3 and rep["argmax_agreement"] > 0.99


def test_sol_accounting():
    from mobilequant_tpu.utils.profiling import decode_step_sol, matmul_sol
    from mobilequant_tpu.models import get_config
    cfg = get_config("tinyllama-1.1b")
    sol8 = decode_step_sol(cfg, weight_bits=8)
    sol4 = decode_step_sol(cfg, weight_bits=4)
    assert sol4["bytes_per_token"] < sol8["bytes_per_token"]
    r = matmul_sol(1, 2048, 2048, weight_bytes=1)
    assert r["bound"] == "bandwidth"   # M=1 decode is BW-bound


def test_chat_templates():
    from mobilequant_tpu.runtime.chat import apply_chat_template
    s = apply_chat_template("hi", "llama")
    assert "<|user|>" in s and s.endswith("<|assistant|>\n")
    assert apply_chat_template("hi", "none") == "hi"
    with pytest.raises(KeyError):
        apply_chat_template("hi", "mistralx")


def test_tokenized_chat_template_golden_ids(tmp_path):
    """Token-ID chat templates (ref capp/src/llm.cpp:382-392 hardcodes ids
    because string-level templating can shift ids at segment boundaries):
    golden id lists for the toy vocab, Python spec == C++ spec, and the
    pre-tokenized NativeSession entry point consumes them id-for-id."""
    from mobilequant_tpu.runtime.chat import apply_chat_template_ids
    from mobilequant_tpu.runtime.native import NativeSession

    pieces, scores = _toy_vocab()
    specials = [b"<|system|>", b"<|user|>", b"<|assistant|>", b"<|endoftext|>",
                b"<start_of_turn>", b"<end_of_turn>"]
    for sp in specials:
        pieces.append(sp)
        scores.append(0.0)
    path = tmp_path / "tok_chat.bin"
    write_tokenizer_bin(path, pieces, scores, version=2)
    tk = NativeTokenizer(path)
    assert tk.piece_to_id("<|user|>") == 278
    assert tk.piece_to_id("<nope>") == -1

    prompt_ids = tk.encode("hello world")
    assert prompt_ids == [267, 276]              # "hello", " world" merges

    # golden ids (hand-checked against the segment spec + toy-vocab merges:
    # specials atomic, '\n'=13, 'u'=120 's'=118 'e'=261 'r'=270, 'm'=112
    # 'o'=263 'd'=271 'l'=262)
    golden = {
        "gemma": [281, 120, 118, 261, 270, 13, 267, 276,
                  282, 13, 281, 112, 263, 271, 261, 262, 13],
        "stablelm": [278, 13, 267, 276, 280, 13, 279, 13],
        "none": [267, 276],
    }
    for fam, want in golden.items():
        got = apply_chat_template_ids(prompt_ids, fam, tk.encode,
                                      tk.piece_to_id)
        assert got == want, fam
    # every family: the Python spec and the C++ spec produce identical ids
    for fam in ("llama", "gemma", "stablelm", "none"):
        py = apply_chat_template_ids(prompt_ids, fam, tk.encode,
                                     tk.piece_to_id)
        assert tk.template_ids(fam, prompt_ids) == py, fam
    # llama structure: specials atomic at the pinned positions
    lids = apply_chat_template_ids(prompt_ids, "llama", tk.encode,
                                   tk.piece_to_id)
    assert lids[0] == 277 and lids[-2] == 279 and lids[-1] == 13
    k = lids.index(278)                          # <|user|> marker
    assert lids[k:k + 4] == [278, 13, 267, 276]  # prompt ids verbatim after it
    assert lids[k + 4:] == [2, 13, 279, 13]      # </s> \n <|assistant|> \n

    # the pre-tokenized session path consumes these ids exactly: the forward
    # callback must see len(ids)+1 (bos) prompt positions before sampling
    seen = []

    def forward(token, position):
        seen.append((token, position))
        lg = np.zeros(len(pieces), np.float32)
        lg[263] = 1.0                            # always "o"
        return lg

    sess = NativeSession(path, forward, len(pieces), family="stablelm",
                         max_seq_len=64, bos_id=1, eos_id=2)
    text, pos = sess.run_ids(prompt_ids, max_new_tokens=3)
    want_prompt = [1] + golden["stablelm"]
    assert [t for t, _ in seen[:len(want_prompt)]] == want_prompt
    assert [p for _, p in seen[:len(want_prompt)]] == list(range(len(want_prompt)))
    assert text == "ooo"
    # and the string entry point goes through the SAME tokenized-template
    # path (prompt encoded as its own segment, then exact ids)
    seen.clear()
    text2, _ = sess.run("hello world", max_new_tokens=3)
    assert [t for t, _ in seen[:len(want_prompt)]] == want_prompt
    assert text2 == "ooo"
    sess.release()


def test_collect_mmlu():
    from mobilequant_tpu.eval.collect import collect_mmlu, results_table
    res = {"mmlu_abstract_algebra": {"acc,none": 0.3},
           "mmlu_anatomy": {"acc,none": 0.5},
           "wikitext": {"word_perplexity,none": 15.0}}
    assert abs(collect_mmlu(res) - 0.4) < 1e-9
    tbl = results_table({"w8a8": {"wikitext_ppl": 15.5, "arc_c": 31.9,
                                  "hellaswag": 59.2, "mmlu": 25.0}})
    assert "15.50" in tbl


def test_continuous_batching_sharded_mesh():
    """Batcher with a (dp=2, tp=2) mesh must produce identical greedy outputs."""
    from mobilequant_tpu.runtime.serve import ContinuousBatcher
    from mobilequant_tpu.runtime.sampling import SamplerConfig
    from mobilequant_tpu.parallel import sharding as S

    cfg, policy, ecfg, packed = _engine_setup()
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (5, 9, 7)]

    ref = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=2,
                            prefill_buckets=(16, 32),
                            sampler=SamplerConfig(greedy=True))
    rids = [ref.submit(p, 5) for p in prompts]
    want = ref.run()

    mesh = S.make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        cb = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=2,
                               prefill_buckets=(16, 32),
                               sampler=SamplerConfig(greedy=True), mesh=mesh)
        rids2 = [cb.submit(p, 5) for p in prompts]
        got = cb.run()
    for r1, r2 in zip(rids, rids2):
        assert want[r1] == got[r2]


def test_native_session_orchestrates_decode(tmp_path):
    """The C++ session (libllmod analogue) drives tokenize -> teacher-forced
    prompt -> sample loop -> detokenize through a forward callback, with
    ref-counting and a per-code error table."""
    from mobilequant_tpu.runtime.native import NativeSession

    pieces, scores = _toy_vocab()
    path = tmp_path / "tokenizer.bin"
    write_tokenizer_bin(path, pieces, scores, version=2)
    V = len(pieces)
    hello = pieces.index(b"hello")
    world = pieces.index(b" world")
    eos = 2
    seen = []

    def forward(token, position):
        seen.append((token, position))
        logits = np.full((V,), -10.0, np.float32)
        # after the prompt: emit " world", then "hello", then EOS
        gen_steps = position - (len(prompt_ids) - 1)
        nxt = [world, hello, eos][min(max(gen_steps, 0), 2)]
        logits[nxt] = 10.0
        return logits

    sess = NativeSession(path, forward, V, family="none", max_seq_len=64,
                         bos_id=1, eos_id=eos)
    prompt_ids = [1] + NativeTokenizer(path).encode("hello")
    text, last_pos = sess.run("hello", max_new_tokens=8)
    assert text == " worldhello"            # EOS stops the loop, not emitted
    # prompt (bos + "hello") teacher-forced, then 3 sampled steps
    assert seen[0] == (1, 0)
    assert last_pos == len(prompt_ids) - 1 + 3
    sess.ref()
    sess.release()    # still one ref held by sess.ref()
    sess._h = None    # avoid double release in __del__ after manual release

    # error table: a failing forward surfaces MQTPU_FORWARD_ERROR=3
    def bad_forward(token, position):
        raise ValueError("boom")

    sess2 = NativeSession(path, bad_forward, V, max_seq_len=64)
    with pytest.raises(RuntimeError, match="forward callback failed"):
        sess2.run("hello", max_new_tokens=2)

    # sequence overflow guard
    sess3 = NativeSession(path, forward, V, max_seq_len=4)
    with pytest.raises(RuntimeError, match="exceeds max_seq_len"):
        sess3.run("hello", max_new_tokens=8)


def test_native_session_end_to_end_engine(tmp_path):
    """NativeSession driving the real packed engine decode step (the full
    user stack: C++ loop -> XLA integer engine -> C++ sampler)."""
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.quant.policy import default_policy
    from mobilequant_tpu.quant.quantizer import QuantConfig
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.runtime.native import NativeSession

    cfg = get_config("test-llama")
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    policy = default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 16)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, policy, batch_size=2)
    ranges = calibrate.stats_to_ranges(stats, policy)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=64)
    packed = E.pack(params, ranges, cfg, policy, ecfg)

    # toy vocab is smaller than the model vocab — pad pieces to vocab_size
    pieces, scores = _toy_vocab()
    pieces += [f"<extra{i}>".encode() for i in range(cfg.vocab_size - len(pieces))]
    scores += [0.0] * (cfg.vocab_size - len(scores))
    path = tmp_path / "tokenizer.bin"
    write_tokenizer_bin(path, pieces, scores, version=2)

    cache = E.init_kv_cache(ecfg, 1)
    state = {"cache": cache}

    def forward(token, position):
        pos = jnp.full((1,), position, jnp.int32)
        logits, state["cache"] = E.forward(
            packed, jnp.full((1, 1), token, jnp.int32), cfg, policy,
            positions=pos[:, None], kv_cache=state["cache"],
            cache_position=pos, kv_valid_len=pos + 1)
        return np.asarray(logits).ravel()

    sess = NativeSession(path, forward, cfg.vocab_size, max_seq_len=64,
                         bos_id=1, eos_id=-1)
    text, last_pos = sess.run("hello world", max_new_tokens=4)
    assert last_pos >= 4
    assert isinstance(text, str)


def test_online_http_server_matches_generator():
    """Online serving (runtime/server.py): live requests from multiple client
    threads through the HTTP front-end produce exactly the sequential greedy
    outputs — continuous batching is correctness-transparent under concurrency."""
    import json
    import threading
    import urllib.request

    from mobilequant_tpu.runtime.generate import Generator
    from mobilequant_tpu.runtime.serve import ContinuousBatcher
    from mobilequant_tpu.runtime.server import InferenceServer, make_http_server

    cfg, policy, ecfg, packed = _engine_setup()
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (5, 9, 3)]

    gen = Generator(packed, cfg, policy, ecfg)
    refs = [gen.generate_fast(p[None], 6)[0] for p in prompts]

    cb = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=2,
                           prefill_buckets=(16,))
    srv = InferenceServer(cb).start()
    httpd = make_http_server(srv, port=0)          # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        results = [None] * len(prompts)

        def post(i):
            body = json.dumps({"prompt_ids": [int(x) for x in prompts[i]],
                               "max_new_tokens": 6}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                results[i] = json.loads(r.read())["completion_ids"]

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(len(prompts))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=180)

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=10) as r:
            assert json.loads(r.read())["ok"] is True

        for got, ref in zip(results, refs):
            assert got is not None, "request did not complete"
            np.testing.assert_array_equal(np.asarray(got, np.int32),
                                          np.asarray(ref))
    finally:
        httpd.shutdown()
        srv.close()


def test_continuous_batching_wonly_sharded_mesh():
    """Weight-only batcher over a (dp=2, tp=2) mesh: TP packs + dp-sharded fp
    cache must reproduce the unsharded greedy outputs."""
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant.quantizer import QuantConfig
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.runtime import wonly as W
    from mobilequant_tpu.runtime.serve import ContinuousBatcher
    from mobilequant_tpu.runtime.sampling import SamplerConfig
    from mobilequant_tpu.parallel import sharding as S

    cfg = get_config("test-llama")
    params = M.init_params(cfg, jax.random.PRNGKey(5))
    wcfg = QuantConfig(bitwidth=4, is_per_channel=True, group_size=16,
                       is_symmetric=False)
    packed = W.pack_weight_only(params, cfg, wcfg)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=64, act_bits=16)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (5, 9, 7)]

    ref = ContinuousBatcher(packed, cfg, None, ecfg, batch_slots=2,
                            prefill_buckets=(16, 32),
                            sampler=SamplerConfig(greedy=True))
    rids = [ref.submit(p, 5) for p in prompts]
    want = ref.run()

    mesh = S.make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        cb = ContinuousBatcher(packed, cfg, None, ecfg, batch_slots=2,
                               prefill_buckets=(16, 32),
                               sampler=SamplerConfig(greedy=True), mesh=mesh)
        rids2 = [cb.submit(p, 5) for p in prompts]
        got = cb.run()
    for r1, r2 in zip(rids, rids2):
        assert want[r1] == got[r2]


def test_continuous_batching_chunked_decode_matches_single_step():
    """chunk_decode=4 in-graph ticks must reproduce the per-token scheduler's
    greedy outputs (retire/refill between chunks, EOS trimmed host-side)."""
    from mobilequant_tpu.runtime.serve import ContinuousBatcher
    from mobilequant_tpu.runtime.sampling import SamplerConfig

    cfg, policy, ecfg, packed = _engine_setup()
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (5, 9, 7, 4)]

    ref = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=2,
                            prefill_buckets=(16,),
                            sampler=SamplerConfig(greedy=True))
    rids = [ref.submit(p, 7) for p in prompts]          # 7 % 4 != 0: ragged tail
    want = ref.run()

    cb = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=2,
                           prefill_buckets=(16,),
                           sampler=SamplerConfig(greedy=True), chunk_decode=4)
    rids2 = [cb.submit(p, 7) for p in prompts]
    got = cb.run()
    for r1, r2 in zip(rids, rids2):
        assert want[r1] == got[r2]
    assert cb.stats["ticks"] < ref.stats["ticks"]


def test_continuous_batching_pipelined_ticks_match():
    """pipeline_ticks=3 (chained chunk dispatches, one host sync per 3
    chunks) must reproduce pipeline_ticks=1 greedy outputs exactly —
    including requests whose EOS lands mid-pipeline (tail rows wasted,
    output truncated at EOS)."""
    from mobilequant_tpu.runtime.serve import ContinuousBatcher
    from mobilequant_tpu.runtime.sampling import SamplerConfig

    cfg, policy, ecfg, packed = _engine_setup()
    rng = np.random.default_rng(12)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (5, 9, 7, 4)]

    outs = {}
    for p_ticks in (1, 3):
        cb = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=2,
                               prefill_buckets=(16,),
                               sampler=SamplerConfig(greedy=True),
                               chunk_decode=2, pipeline_ticks=p_ticks)
        rids = [cb.submit(p, 12) for p in prompts]
        got = cb.run()
        outs[p_ticks] = [got[r] for r in rids]
    assert outs[1] == outs[3]

    # an eos the greedy chains actually produce: rerun with it set — outputs
    # must truncate identically in both modes
    flat = [t for seq in outs[1] for t in seq[2:]]
    if flat:
        eos = flat[0]
        trunc = {}
        for p_ticks in (1, 3):
            cb = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=2,
                                   prefill_buckets=(16,),
                                   sampler=SamplerConfig(greedy=True),
                                   eos_token_id=eos,
                                   chunk_decode=2, pipeline_ticks=p_ticks)
            rids = [cb.submit(p, 12) for p in prompts]
            got = cb.run()
            trunc[p_ticks] = [got[r] for r in rids]
        assert trunc[1] == trunc[3]


def test_online_server_rejects_oversized_prompt_and_survives():
    """A prompt the batcher cannot prefill must fail ITS request (ValueError /
    HTTP 400), not kill the worker loop — later requests still complete."""
    from mobilequant_tpu.runtime.generate import Generator
    from mobilequant_tpu.runtime.serve import ContinuousBatcher
    from mobilequant_tpu.runtime.server import InferenceServer
    import pytest as _pytest

    cfg, policy, ecfg, packed = _engine_setup()
    cb = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=2,
                           prefill_buckets=(16,))
    srv = InferenceServer(cb).start()
    try:
        rng = np.random.default_rng(9)
        too_long = rng.integers(0, cfg.vocab_size, (40,)).astype(np.int32)
        with _pytest.raises(ValueError, match="exceeds the serving limit"):
            srv.generate(too_long, 4, timeout=60)

        ok = rng.integers(0, cfg.vocab_size, (6,)).astype(np.int32)
        out = srv.generate(ok, 4, timeout=120)
        gen = Generator(packed, cfg, policy, ecfg)
        ref = gen.generate_fast(ok[None], 4)[0]
        np.testing.assert_array_equal(np.asarray(out, np.int32), ref)
    finally:
        srv.close()


def test_sample_batched_matches_per_config():
    """sample_batched with homogeneous per-row params must reproduce
    sample(cfg) bit-exactly (same key, same math); greedy rows in a mixed
    batch must be the argmax regardless of neighbours."""
    from mobilequant_tpu.runtime.sampling import (SamplerConfig, sample,
                                                  sample_batched,
                                                  sampler_arrays)
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 50)).astype(np.float32))
    key = jax.random.PRNGKey(42)

    for cfg in (SamplerConfig(greedy=True),
                SamplerConfig(temperature=0.0),
                SamplerConfig(temperature=0.7),
                SamplerConfig(temperature=1.3, top_k=5),
                SamplerConfig(temperature=0.9, top_p=0.8),
                SamplerConfig(temperature=1.0, top_k=7, top_p=0.95)):
        want = np.asarray(sample(logits, key, cfg))
        t, p, k, g = sampler_arrays([cfg] * 4)
        got = np.asarray(sample_batched(logits, key, t, p, k, g))
        np.testing.assert_array_equal(got, want, err_msg=repr(cfg))

    # mixed batch: rows 0/2 greedy, rows 1/3 hot — greedy rows are argmax
    mixed = [SamplerConfig(greedy=True), SamplerConfig(temperature=1.5),
             SamplerConfig(temperature=0.0), SamplerConfig(top_p=0.5)]
    t, p, k, g = sampler_arrays(mixed)
    got = np.asarray(sample_batched(logits, key, t, p, k, g))
    arg = np.asarray(jnp.argmax(logits, -1))
    assert got[0] == arg[0] and got[2] == arg[2]
    # top_p=0.5 row must land inside the nucleus of its own distribution
    row = np.asarray(logits[3])
    order = np.argsort(row)[::-1]
    probs = np.exp(row[order] - row[order].max())
    probs /= probs.sum()
    nucleus = order[:int(np.searchsorted(np.cumsum(probs), 0.5)) + 1]
    assert got[3] in nucleus


def test_continuous_batching_per_request_samplers():
    """Requests with per-request SamplerConfig overrides batch together:
    greedy-override requests must match the sequential greedy ground truth
    even while a hot-temperature neighbour shares the batch, and a mixed
    batch under chunk_decode falls back to per-token ticks (still exact)."""
    from mobilequant_tpu.runtime.serve import ContinuousBatcher
    from mobilequant_tpu.runtime.generate import Generator
    from mobilequant_tpu.runtime.sampling import SamplerConfig

    cfg, policy, ecfg, packed = _engine_setup()
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)).astype(np.int32)
               for n in (5, 9, 7, 6)]

    gen = Generator(packed, cfg, policy, ecfg)
    seq_out = [gen.generate(p[None, :], max_new_tokens=6)[0].tolist()
               for p in prompts]

    greedy = SamplerConfig(greedy=True)
    ticks = {}
    for chunk_decode in (1, 3):
        # batcher default is HOT (temperature 1.5) — only the per-request
        # override makes requests 0..2 greedy; request 3 rides the default
        cb = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=2,
                               prefill_buckets=(16, 32),
                               sampler=SamplerConfig(temperature=1.5),
                               chunk_decode=chunk_decode, seed=5)
        rids = [cb.submit(p, 6, sampler=greedy) for p in prompts[:3]]
        rid_hot = cb.submit(prompts[3], 6)
        outs = cb.run()
        for rid, want in zip(rids, seq_out[:3]):
            assert outs[rid] == want, (chunk_decode, rid, outs[rid], want)
        assert len(outs[rid_hot]) == 6
        ticks[chunk_decode] = cb.stats["ticks"]
    # the mixed greedy+hot batch must RIDE the chunked per-slot-temps path
    # (fewer scheduler ticks), not silently fall back to per-token
    assert ticks[3] < ticks[1], ticks

    # greedy overrides under a hot default + chunk_decode: a mixed
    # plain-temperature batch rides the chunked per-slot-temps path
    # (greedy rows take the in-graph argmax) — outputs still match exactly
    cb = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=2,
                           prefill_buckets=(16, 32),
                           sampler=SamplerConfig(temperature=1.5),
                           chunk_decode=4)
    rids = [cb.submit(p, 6, sampler=greedy) for p in prompts]
    outs = cb.run()
    for rid, want in zip(rids, seq_out):
        assert outs[rid] == want


def test_inference_server_per_request_sampler_passthrough():
    from mobilequant_tpu.runtime.generate import Generator
    from mobilequant_tpu.runtime.serve import ContinuousBatcher
    from mobilequant_tpu.runtime.server import InferenceServer
    from mobilequant_tpu.runtime.sampling import SamplerConfig

    cfg, policy, ecfg, packed = _engine_setup()
    cb = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=2,
                           prefill_buckets=(16,),
                           sampler=SamplerConfig(temperature=1.5))
    srv = InferenceServer(cb).start()
    try:
        rng = np.random.default_rng(13)
        p = rng.integers(0, cfg.vocab_size, (6,)).astype(np.int32)
        out = srv.generate(p, 4, timeout=120,
                           sampler=SamplerConfig(greedy=True))
        gen = Generator(packed, cfg, policy, ecfg)
        ref = gen.generate(p[None], 4)[0]
        np.testing.assert_array_equal(np.asarray(out, np.int32), ref)
    finally:
        srv.close()


def test_tokenizer_bin_special_token_patching(tmp_path):
    """Special tokens (bos/eos + added_tokens_decoder chat markers) are
    patched into the exported vocab from tokenizer_config.json (ref
    capp/scripts/tokenizer.py:58-103), and a chat-templated prompt
    round-trips encode->decode intact through the native tokenizer."""
    from mobilequant_tpu.export.tokenizer_bin import (
        patch_special_tokens, special_tokens_from_config, write_tokenizer_bin)
    from mobilequant_tpu.runtime.chat import apply_chat_template
    from mobilequant_tpu.runtime.native import NativeTokenizer

    pieces, scores = _toy_vocab()
    # raw sp-proto export leaves placeholder pieces in the special slots and
    # appends added chat-marker tokens with unknown content
    pieces += [b"<placeholder>", b"<placeholder2>"]
    scores += [-1000.0, -1000.0]
    uid, aid = len(pieces) - 2, len(pieces) - 1
    cfg = {"bos_token": "<s>", "eos_token": "</s>",
           "added_tokens_decoder": {
               str(uid): {"content": "<|user|>"},
               str(aid): {"content": "<|assistant|>"}}}
    special = special_tokens_from_config(cfg, bos_id=1, eos_id=2)
    assert special == {1: "<s>", 2: "</s>", uid: "<|user|>",
                       aid: "<|assistant|>"}
    patch_special_tokens(pieces, scores, special)
    assert pieces[uid] == b"<|user|>" and scores[uid] == 0.0

    path = tmp_path / "tok_special.bin"
    write_tokenizer_bin(path, pieces, scores, version=2)
    tk = NativeTokenizer(path)
    # the patched specials decode to their chat-marker content
    assert tk.decode([uid]) == "<|user|>"
    assert tk.decode([aid]) == "<|assistant|>"
    # full chat-templated prompt round-trips byte-exactly
    for family in ("llama", "gemma", "stablelm"):
        text = apply_chat_template("hello world", family)
        ids = tk.encode(text)
        assert tk.decode(ids) == text, family
