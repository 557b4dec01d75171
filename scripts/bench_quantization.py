"""Quantization wall-time on real shapes (VERDICT r1 item 3).

Measures, on the current backend (run plain for the TPU):
  * e2equant step time at TinyLlama-1.1B shapes (B x T per step) with the
    device-resident teacher cache, with/without remat;
  * omniquant per-layer wall time (batched teacher + propagation passes);
then projects the reference's full recipe (nsamples=1024, 60 epochs,
ref experiments/w8a8/main/e2e_llama-s1024-ep60.sh).

Usage:
  PYTHONPATH=.:$PYTHONPATH python scripts/bench_quantization.py \
      [--nsamples 128] [--seqlen 1024] [--batch 2] [--epochs 2] [--remat]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tinyllama-1.1b")
    ap.add_argument("--nsamples", type=int, default=128)
    ap.add_argument("--seqlen", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--layers", type=int, default=None,
                    help="truncate the model for quick runs")
    ap.add_argument("--mode", choices=("e2e", "layerwise", "both"),
                    default="e2e")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.quant.policy import default_policy
    from mobilequant_tpu.quant.quantizer import QuantConfig
    from mobilequant_tpu.quant import calibrate, train

    print("devices:", jax.devices())
    cfg = get_config(args.model)
    if args.layers:
        cfg = cfg.replace(num_layers=args.layers)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    policy = default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8))
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size,
                          (args.nsamples, args.seqlen)).astype(np.int32)

    # calibration (collect pass) timing
    t0 = time.perf_counter()
    stats = calibrate.run_calibration(params, tokens[:32], cfg, policy,
                                      batch_size=4)
    t_cal = time.perf_counter() - t0
    print(f"calibration: 32 samples in {t_cal:.1f}s "
          f"({32 / t_cal:.2f} samples/s)")
    ranges = calibrate.stats_to_ranges(stats, policy)

    tc = train.TrainConfig(epochs=args.epochs, batch_size=args.batch,
                           remat=args.remat)
    qstate = train.init_qstate(params, cfg, policy, tc, ranges)

    if args.mode in ("e2e", "both"):
        # MARGINAL step time: run 1 epoch (compile + teacher) then
        # 1+epochs epochs and difference — the relay's compiles and the
        # teacher pass cancel, so per_step is the honest optimizer step
        steps_per_epoch = args.nsamples // args.batch

        def run(ep):
            tce = train.TrainConfig(epochs=ep, batch_size=args.batch,
                                    remat=args.remat)
            t0 = time.perf_counter()
            train.e2equant(params, qstate, tokens, cfg, policy, tce)
            return time.perf_counter() - t0

        t1 = run(1)
        t2 = run(1 + args.epochs)
        per_step = (t2 - t1) / (args.epochs * steps_per_epoch)
        toks = args.batch * args.seqlen
        full_steps = 60 * 1024 / args.batch
        print(f"e2equant: B={args.batch}, T={args.seqlen}, "
              f"remat={args.remat}: {per_step*1e3:.0f} ms/step marginal "
              f"({toks/per_step:.0f} tok/s; warm epoch {t1:.1f}s)")
        print(f"  -> full reference recipe (1024 samples x 60 epochs) "
              f"projected: {full_steps * per_step / 3600:.2f} h")
        print(f'{{"metric": "e2equant_step_ms_b{args.batch}", '
              f'"value": {per_step*1e3:.1f}, "unit": "ms"}}')

    if args.mode in ("layerwise", "both"):
        t0 = time.perf_counter()
        train.omniquant(params, qstate, tokens, cfg, policy, tc)
        dt = time.perf_counter() - t0
        print(f"omniquant: {cfg.num_layers} layers x {args.epochs} epochs x "
              f"{args.nsamples} samples in {dt:.1f}s "
              f"({dt / cfg.num_layers:.1f} s/layer)")


if __name__ == "__main__":
    main()
