"""MobileQuant optimization loops: e2equant (joint end-to-end) and omniquant (layerwise).

TPU-native re-design of reference algorithm.py:381-787. Differences by construction:
  * The reference pipelines layers across GPUs with forward-pre-hook tensor moves
    (parallel_utils.py) because a single GPU can't hold the whole fp32 graph; here
    the entire training step is ONE jitted function — shard it over a Mesh with
    pjit instead (mobilequant_tpu/parallel) when it outgrows a chip.
  * LET reparameterization is pure math in the forward (quant/smooth.apply_let);
    no temp_weight mutation, no parameter surgery between epochs.
  * AMP machinery (NativeScalerWithGradNormCount, optim.py) is unnecessary: the
    reference trains 8-bit in fp32 with AMP off anyway (mobilequant.py --deactive_amp,
    see SURVEY.md §7.4), and TPUs run fp32/bf16 natively.

Faithful pieces:
  * three param groups with independent cosine-decayed LRs + linear warmup
    (ref get_lr, algorithm.py:296-307; defaults from experiments/w8a8/main:
    LET 1e-3→1e-4, LWC 1e-2→1e-3, LRL 1e-6→1e-7);
  * objective: MSE between FP-teacher and fake-quant final hidden states, computed
    *before* the (unquantized) final norm (ref LayerList.forward :313-322, loss
    :745);
  * teacher activations computed once and cached (ref fp_inps, :673-688);
  * per-epoch checkpointing of the quant state (ref parameters.pth, :762-763);
  * non-finite loss circuit breaker (ref :748-750 drops into pdb; we raise).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mobilequant_tpu.models.config import ModelConfig
from mobilequant_tpu.models import model as M
from mobilequant_tpu.quant.policy import QPolicy
from mobilequant_tpu.quant import qmodel, smooth
from mobilequant_tpu.quant.quantizer import clip_weight_to_learned_bounds


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs: int = 60
    batch_size: int = 1
    let_lr: float = 1e-3
    let_min_lr: float = 1e-4
    lwc_lr: float = 1e-2
    lwc_min_lr: float = 1e-3
    lrl_lr: float = 1e-6
    lrl_min_lr: float = 1e-7
    warmup_frac: float = 0.0
    use_let: bool = True
    use_lwc: bool = True
    use_lrl: bool = True
    aug_loss: bool = False         # auxiliary MSE against the FP teacher
                                   # evaluated on the QUANTIZED model's
                                   # inputs (ref --aug_loss,
                                   # algorithm.py:449,478,534 layerwise and
                                   # :652,683,746 e2e). Meaningful in the
                                   # layerwise loop, where quant inputs
                                   # diverge from FP inputs as layers
                                   # propagate; in the e2e loop the two
                                   # coincide at layer 0, so (faithfully to
                                   # the reference) the term degenerates to
                                   # doubling the loss. No shipped
                                   # reference recipe enables it.
    grad_clip: Optional[float] = None
    log_every: int = 50
    remat: bool = False            # rematerialize layers on backward — lets
                                   # recipe-scale batches (B·T ≫ 1k tokens)
                                   # train within one chip's HBM
    infer_batch: Optional[int] = None  # batch size for the non-training
                                   # passes (teacher / activation propagation);
                                   # default max(batch_size, 16) — the recipe's
                                   # optimizer batch (B=1 upstream) must not
                                   # force per-sample device dispatches
    teacher_cache_bytes: int = 4 << 30  # keep teacher hiddens device-resident
                                   # up to this many bytes (no host↔device
                                   # round-trip per step); larger spills to np


def _cosine_lr(max_lr, min_lr, warmup_iters, max_iters):
    """Reference get_lr (algorithm.py:296-307) as an optax schedule."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.where(warmup_iters > 0, max_lr * step / jnp.maximum(warmup_iters, 1), max_lr)
        decay_ratio = (step - warmup_iters) / jnp.maximum(max_iters - warmup_iters, 1)
        decay_ratio = jnp.clip(decay_ratio, 0.0, 1.0)
        coeff = 0.5 * (1.0 + jnp.cos(jnp.pi * decay_ratio))
        cos = min_lr + coeff * (max_lr - min_lr)
        return jnp.where(step < warmup_iters, warm, cos)
    return schedule


def _make_optimizer(tc: TrainConfig, total_steps: int):
    warmup = int(tc.warmup_frac * total_steps)

    def group(max_lr, min_lr):
        tx = optax.adamw(_cosine_lr(max_lr, min_lr, warmup, total_steps),
                         weight_decay=0.0)
        if tc.grad_clip is not None:
            tx = optax.chain(optax.clip_by_global_norm(tc.grad_clip), tx)
        return tx

    return optax.multi_transform(
        {"let": group(tc.let_lr, tc.let_min_lr),
         "lwc": group(tc.lwc_lr, tc.lwc_min_lr),
         "ranges": group(tc.lrl_lr, tc.lrl_min_lr)},
        param_labels=lambda tree: {k: jax.tree.map(lambda _: k, v)
                                   for k, v in tree.items()},
    )


def init_qstate(params, config: ModelConfig, policy: QPolicy, tc: TrainConfig,
                ranges: dict, let: Optional[dict] = None) -> dict:
    """Assemble the trainable quant state. `ranges` comes from calibration
    (quant/calibrate.stats_to_ranges); `let` optionally from SmoothQuant init."""
    qstate = {}
    if tc.use_let:
        qstate["let"] = let if let is not None else smooth.let_init(config)
    if tc.use_lwc:
        qstate["lwc"] = qmodel.lwc_init_all(params, policy)
    # ranges are always needed for static activation quant; LRL decides whether
    # they are *trained* (ref --lrl flag sets them as Parameters, mobilequant.py:205-211)
    qstate["ranges"] = ranges
    return qstate


def e2equant(params, qstate, tokens: np.ndarray, config: ModelConfig,
             policy: QPolicy, tc: TrainConfig = TrainConfig(),
             logger=None, checkpoint_cb: Optional[Callable[[int, dict], None]] = None,
             pp_mesh=None, pp_microbatches: int = 2):
    """Joint end-to-end optimization of LET+LWC+LRL against FP teacher hiddens
    (ref e2equant, algorithm.py:587-787). Returns (qstate, loss_history).

    tokens: (N, T) calibration sequences.

    pp_mesh: optional Mesh with a "pp" axis — the student forward runs the
    GPipe-pipelined backbone (parallel/pipeline.py), the TPU-native analogue
    of the reference pipelining decoder layers across GPUs for this exact
    loop (map_layers_to_multi_gpus, ref algorithm.py:592-593). The batch must
    be divisible by pp_microbatches.
    """
    n = tokens.shape[0]
    steps_per_epoch = max(n // tc.batch_size, 1)
    total_steps = tc.epochs * steps_per_epoch
    opt = _make_optimizer(tc, total_steps)

    trainable_keys = [k for k in ("let", "lwc", "ranges") if k in qstate
                      and (k != "ranges" or tc.use_lrl)]
    static_state = {k: v for k, v in qstate.items() if k not in trainable_keys}
    trainable = {k: qstate[k] for k in trainable_keys}
    opt_state = opt.init(trainable)

    # params ride the jits as ARGUMENTS: a closure capture bakes the full
    # teacher (4.1 GB at TinyLlama fp32) into the HLO as constants, which the
    # tunneled TPU's remote_compile rejects/uploads per-program (the bench
    # gotcha in .claude/skills/verify — it applies to training too; found
    # when the first on-chip e2equant stalled in lowering)
    @jax.jit
    def teacher(params, tok):
        h, _, _ = M.forward_hidden(params, tok, config, apply_final_norm=False)
        return h

    @jax.jit
    def train_step(params, trainable, opt_state, tok, fp_h):
        def loss_fn(tr):
            qs = {**static_state, **tr}
            if pp_mesh is not None:
                from mobilequant_tpu.parallel.pipeline import (
                    pipeline_qforward_hidden)
                qh = pipeline_qforward_hidden(
                    params, qs, tok, config, policy, pp_mesh,
                    n_micro=pp_microbatches, apply_final_norm=False)
            else:
                qh, _, _ = qmodel.qforward_hidden(params, qs, tok, config,
                                                  policy,
                                                  apply_final_norm=False,
                                                  remat=tc.remat)
            loss = jnp.mean(jnp.square(qh - fp_h))
            if tc.aug_loss:
                # ref :746: loss += MSE(fp_inps_2, quant_out). In the e2e
                # loop quant_inps never diverges from inps (both are the
                # captured layer-0 activations, ref :650-652), so the aug
                # teacher coincides with fp_h and the term doubles the loss
                # — reproduced faithfully.
                loss = loss + jnp.mean(jnp.square(qh - fp_h))
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        gnorm = optax.global_norm(grads)   # reported like the reference's
        updates, opt_state = opt.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss, gnorm

    # token batches transferred ONCE (not per epoch); teacher activations
    # cached once (ref fp_inps, algorithm.py:673-688) and kept DEVICE-resident
    # when they fit (teacher_cache_bytes) — 60 epochs of per-step host↔device
    # hidden-state round-trips was the r1 scaling bottleneck
    tok_batches = [jnp.asarray(tokens[i:i + tc.batch_size], jnp.int32)
                   for i in range(0, n, tc.batch_size)]
    cache_on_device = (n * tokens.shape[1] * config.hidden_size * 4
                       <= tc.teacher_cache_bytes)
    fp_hidden = []
    for tok in tok_batches:
        h = teacher(params, tok)
        fp_hidden.append(h if cache_on_device else jax.device_get(h))

    history = []
    for epoch in range(tc.epochs):
        epoch_losses = []
        last_gnorm = 0.0
        for bi, tok in enumerate(tok_batches):
            fp_h = fp_hidden[bi] if cache_on_device \
                else jnp.asarray(fp_hidden[bi])
            trainable, opt_state, loss, gnorm = train_step(params, trainable,
                                                           opt_state, tok,
                                                           fp_h)
            loss = float(loss)
            if not math.isfinite(loss):
                raise FloatingPointError(
                    f"non-finite loss at epoch {epoch} step {bi} (ref algorithm.py:748)")
            epoch_losses.append(loss)
            last_gnorm = float(gnorm)
        mean_loss = float(np.mean(epoch_losses))
        history.append(mean_loss)
        if logger is not None:
            # per-epoch loss + grad-norm line (ref algorithm.py:757-759)
            logger.info(f"[e2equant] epoch {epoch + 1}/{tc.epochs} "
                        f"loss {mean_loss:.6e} grad_norm {last_gnorm:.3e}")
        if checkpoint_cb is not None:
            checkpoint_cb(epoch, {**static_state, **trainable})

    return {**static_state, **trainable}, history


def finalize(params, qstate, config: ModelConfig, policy: QPolicy) -> tuple[dict, dict]:
    """Fold LET into the weights and clamp them into the learned LWC bounds — the
    analogue of smooth_lm_inplace + run_lwc at end of training (ref algorithm.py:
    148-188). Returns (params', qstate') where qstate' has let/lwc removed (spent)
    and keeps the learned ranges."""
    let = qstate.get("let")
    if let is not None:
        # truncate scales exactly as the reference does before folding (ref :150-153)
        let = {k: (smooth.truncate_scale(v) if k.endswith("scale") else v)
               for k, v in let.items()}
        params = smooth.fold_let(params, let, config)
    lwc = qstate.get("lwc")
    if lwc is not None:
        layers = dict(params["layers"])
        for site, bounds in lwc.items():
            pkey = qmodel.SITE_TO_PARAM[site]
            wq = policy[site].weight
            clip = jax.vmap(lambda w, up, low: clip_weight_to_learned_bounds(
                w, wq, {"up": up, "low": low}))
            entry = dict(layers[pkey])
            entry["w"] = clip(layers[pkey]["w"], bounds["up"], bounds["low"])
            layers[pkey] = entry
        params = {**params, "layers": layers}
    out_state = {"ranges": qstate["ranges"]}
    return params, out_state


# ---------------------------------------------------------------------------
# Layerwise mode (OmniQuant-style, ref algorithm.py:381-584)
# ---------------------------------------------------------------------------

def omniquant(params, qstate, tokens: np.ndarray, config: ModelConfig,
              policy: QPolicy, tc: TrainConfig = TrainConfig(), logger=None,
              checkpoint_cb: Optional[Callable[[int, dict], None]] = None,
              resume_state: Optional[dict] = None, resume_layers: int = 0):
    """Layer-by-layer optimization: each layer's quant params are trained against
    that layer's FP outputs, then the quantized activations propagate to the next
    layer (ref Catcher + per-layer loop, algorithm.py:413-584).

    Functionally we never materialize a Catcher: layer-0 inputs are just the
    embedding outputs (+ rope/mask recomputed per layer call).

    checkpoint_cb(layer_idx, full_qstate): called after each layer finishes
    training (the reference's per-layer quant_parameters.pth,
    algorithm.py:555-556). resume_state/resume_layers: restart a killed run —
    the first `resume_layers` layers take their trained state from
    resume_state and skip training; activation propagation re-runs for them
    (deterministic given the trained state), so the final qstate is
    bit-identical to an uninterrupted run (ref --resume, algorithm.py:498-500).
    """
    c = config
    n = tokens.shape[0]
    T = tokens.shape[1]
    steps_per_epoch = max(n // tc.batch_size, 1)
    total_steps = tc.epochs * steps_per_epoch

    tok_all = jnp.asarray(tokens, jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T)[None, :], tokens.shape)

    @jax.jit
    def embed(emb_w, tok):
        # embedding as an ARG (a closure capture bakes the 260 MB table into
        # the HLO — see the e2equant note above)
        x = emb_w[tok]
        if c.normalize_embed:
            x = x * jnp.asarray(math.sqrt(c.hidden_size), x.dtype)
        return x

    def layer_apply(lp, extras, x, quantized: bool):
        B = x.shape[0]
        p = pos[:B]
        cos, sin = M.rope_cos_sin(p, c, x.dtype)
        mask = M.causal_mask(p, T, c.neg_inf).astype(x.dtype)
        ops = qmodel.QuantOps(policy, c, "sim") if quantized else M.Ops()
        if hasattr(ops, "begin_layer"):
            ops.begin_layer(extras)
        out, _ = M.decoder_layer(ops, lp, x, cos, sin, mask, c)
        return out

    fp_apply = jax.jit(lambda lp, x: layer_apply(lp, None, x, False))
    q_apply = jax.jit(lambda lp, extras, x: layer_apply(lp, extras, x, True))

    # inference passes (teacher outputs / activation propagation) run at
    # infer_batch regardless of the recipe's optimizer batch — the reference
    # dispatches these per-sample (algorithm.py:569-573), which is the r1
    # scaling bottleneck at nsamples=1024. Buffers stay device-resident when
    # the three (n,T,D) arrays fit in teacher_cache_bytes.
    ib = tc.infer_batch or max(tc.batch_size, 16)
    cache_dev = 3 * n * T * c.hidden_size * 4 <= tc.teacher_cache_bytes
    xp = jnp if cache_dev else np

    def batched(fn, x):
        return xp.concatenate([fn(jnp.asarray(x[i:i + ib]))
                               for i in range(0, n, ib)], axis=0)

    fp_inps = batched(lambda t: embed(params["embed"]["w"], t), tok_all)
    quant_inps = fp_inps if cache_dev else fp_inps.copy()

    trainable_keys = [k for k in ("let", "lwc", "ranges") if k in qstate
                      and (k != "ranges" or tc.use_lrl)]
    if resume_state is None:
        resume_layers = 0
    resume_layers = min(resume_layers, c.num_layers)
    final_state = jax.tree.map(
        lambda a: a, resume_state if resume_layers > 0 else qstate)

    opt = _make_optimizer(tc, total_steps)

    # one jitted step reused across layers (identical shapes → single compile)
    @jax.jit
    def step(lp, static_state, trainable, opt_state, x, y, y2):
        def loss_fn(tr):
            out = layer_apply(lp, {**static_state, **tr}, x, True)
            loss = jnp.mean(jnp.square(out - y))
            if tc.aug_loss:
                # auxiliary target: the FP layer applied to the QUANT
                # inputs (ref fp_inps_2, algorithm.py:449,478,534) — the
                # propagated quant activations diverge from the FP stream,
                # so this is a second, different teacher in the layer loop
                loss = loss + jnp.mean(jnp.square(out - y2))
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = opt.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    for li in range(c.num_layers):
        lp = jax.tree.map(lambda a: a[li], params["layers"])
        # completed layers (resume) read their TRAINED state from final_state
        src = final_state if li < resume_layers else qstate
        layer_state = {k: jax.tree.map(lambda a: a[li], src[k]) for k in src}
        trainable = {k: layer_state[k] for k in trainable_keys}
        static_state = {k: v for k, v in layer_state.items() if k not in trainable_keys}

        # FP teacher outputs for this layer (batched)
        fp_out = batched(lambda x: fp_apply(lp, x), fp_inps)
        # aug teacher: the FP layer on the QUANTIZED input stream (ref
        # fp_inps_2 propagation, algorithm.py:449,478)
        fp_out2 = batched(lambda x: fp_apply(lp, x), quant_inps) \
            if tc.aug_loss else fp_out

        if li < resume_layers:
            merged = layer_state
            if logger is not None:
                logger.info(f"[omniquant] layer {li} resumed (training skipped)")
        else:
            opt_state = opt.init(trainable)
            last = None
            for epoch in range(tc.epochs):
                for i in range(0, n, tc.batch_size):
                    x = jnp.asarray(quant_inps[i:i + tc.batch_size])
                    y = jnp.asarray(fp_out[i:i + tc.batch_size])
                    y2 = jnp.asarray(fp_out2[i:i + tc.batch_size])
                    trainable, opt_state, loss = step(lp, static_state,
                                                      trainable,
                                                      opt_state, x, y, y2)
                    last = float(loss)
                    if not math.isfinite(last):
                        raise FloatingPointError(f"non-finite loss, layer {li}")
            if logger is not None:
                logger.info(f"[omniquant] layer {li} final loss {last:.6e}")

            # write the layer's trained state back into the stacked tree
            merged = {**static_state, **trainable}
            for k in merged:
                final_state[k] = jax.tree.map(
                    lambda full, one: full.at[li].set(one),
                    final_state[k], merged[k])
            if checkpoint_cb is not None:
                checkpoint_cb(li, final_state)

        # propagate quantized activations (ref algorithm.py:569-573, batched)
        extras = merged
        quant_inps = batched(lambda x: q_apply(lp, extras, x), quant_inps)
        fp_inps = fp_out

    return final_state, None
