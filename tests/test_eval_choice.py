"""Harness-free multiple-choice eval (eval/choice.py + cli eval-choice) —
the local-file rung of the reference's ARC/HellaSwag/MMLU evaluation
(ref eval/harness_eval.py)."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from mobilequant_tpu.eval.choice import (multiple_choice_accuracy,
                                         score_continuations)
from mobilequant_tpu.models import model as M
from mobilequant_tpu.models.registry import MODEL_CONFIGS


def _fwd(params, cfg):
    return jax.jit(lambda tok: M.forward(params, tok, cfg)[0])


def test_score_continuations_matches_per_pair_loop():
    cfg = MODEL_CONFIGS["test-llama"]
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    fwd = _fwd(params, cfg)
    rng = np.random.default_rng(0)
    ctx = rng.integers(0, cfg.vocab_size, (7,)).tolist()
    choices = [rng.integers(0, cfg.vocab_size, (n,)).tolist()
               for n in (3, 1, 5)]

    lls = score_continuations(fwd, ctx, choices, buckets=(16, 32))

    # reference: unbatched, unpadded scoring per (ctx, choice) pair
    for cont, ll in zip(choices, lls):
        full = np.asarray([ctx + cont], np.int32)
        logp = np.asarray(jax.nn.log_softmax(
            jnp.asarray(fwd(jnp.asarray(full)), jnp.float32), axis=-1))[0]
        ref = sum(float(logp[len(ctx) + j - 1, t]) for j, t in enumerate(cont))
        np.testing.assert_allclose(ll, ref, rtol=1e-5, atol=1e-4)


def test_multiple_choice_accuracy_greedy_is_perfect():
    """1-token choices where the label is the model's argmax token: acc must
    be 1.0 (sum-logprob ranking reduces to the argmax)."""
    cfg = MODEL_CONFIGS["test-llama"]
    params = M.init_params(cfg, jax.random.PRNGKey(1))
    fwd = _fwd(params, cfg)
    rng = np.random.default_rng(1)
    examples = []
    for _ in range(6):
        ctx = rng.integers(0, cfg.vocab_size, (5,)).tolist()
        logits = np.asarray(fwd(jnp.asarray([ctx], jnp.int32)))[0, -1]
        best = int(np.argmax(logits))
        worst = int(np.argmin(logits))
        other = int(np.argsort(logits)[len(logits) // 2])
        choices = [[worst], [best], [other]]
        examples.append({"ctx": ctx, "choices": choices, "label": 1})
    r = multiple_choice_accuracy(fwd, examples)
    assert r["n"] == 6
    assert r["acc"] == 1.0 and r["acc_norm"] == 1.0


def test_cli_eval_choice(tmp_path):
    from mobilequant_tpu import cli
    from mobilequant_tpu.export import artifacts
    from mobilequant_tpu.quant.policy import default_policy
    from mobilequant_tpu.quant.quantizer import QuantConfig

    cfg = MODEL_CONFIGS["test-llama"]
    params = M.init_params(cfg, jax.random.PRNGKey(2))
    policy = default_policy(cfg, QuantConfig(bitwidth=32),
                            QuantConfig(bitwidth=32))
    artifacts.save_quantized(tmp_path / "model", params, None, cfg, policy)

    rng = np.random.default_rng(2)
    task = [{"ctx": rng.integers(0, cfg.vocab_size, (6,)).tolist(),
             "choices": [rng.integers(0, cfg.vocab_size, (2,)).tolist()
                         for _ in range(3)],
             "label": 0} for _ in range(4)]
    (tmp_path / "task.json").write_text(json.dumps(task))

    cli.main(["eval-choice", "--task", str(tmp_path / "task.json"),
              "--model_dir", str(tmp_path / "model"),
              "--output", str(tmp_path / "res.json")])
    res = json.loads((tmp_path / "res.json").read_text())
    assert "fp" in res and 0.0 <= res["fp"]["acc"] <= 1.0
    assert res["fp"]["n"] == 4
