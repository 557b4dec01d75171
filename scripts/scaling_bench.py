"""Serving-throughput scaling harness across mesh sizes.

North-star metric: tokens/s efficiency at 1 chip → 1 host → N hosts (≥85%
scaling 1→2 hosts). Only one physical chip exists in this environment, so on
real hardware run this under `jax.distributed` (parallel/launch.py); here it
validates the harness itself on the virtual CPU mesh (tests force 8 devices).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      PYTHONPATH=. python scripts/scaling_bench.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from mobilequant_tpu.models import get_config
    from mobilequant_tpu.models import model as M
    from mobilequant_tpu.parallel import sharding as S
    from mobilequant_tpu.quant.policy import default_policy, relax_16bit
    from mobilequant_tpu.quant.quantizer import QuantConfig
    from mobilequant_tpu.quant import calibrate
    from mobilequant_tpu.runtime import engine as E
    from mobilequant_tpu.runtime.serve import ContinuousBatcher
    from mobilequant_tpu.runtime.sampling import SamplerConfig

    cfg = get_config("test-llama")
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    policy = default_policy(cfg, QuantConfig(bitwidth=8), QuantConfig(bitwidth=8))
    tokens = np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 16)).astype(np.int32)
    stats = calibrate.run_calibration(params, tokens, cfg, policy, batch_size=4)
    ranges = calibrate.stats_to_ranges(stats, policy)
    ecfg = E.EngineConfig(model=cfg, max_seq_len=128, fuse_projections=False)
    packed = E.pack(params, ranges, cfg, policy, ecfg)
    policy = relax_16bit(policy)

    rng = np.random.default_rng(1)
    n_dev = len(jax.devices())
    results = {}
    for dp in [1, 2, 4]:
        if dp * 2 > n_dev:
            break
        mesh = S.make_mesh(dp=dp, tp=2, devices=jax.devices()[:dp * 2])
        slots = 4 * dp
        prompts = [rng.integers(0, cfg.vocab_size, (8,)).astype(np.int32)
                   for _ in range(slots * 3)]
        with jax.set_mesh(mesh):
            cb = ContinuousBatcher(packed, cfg, policy, ecfg, batch_slots=slots,
                                   prefill_buckets=(16,), mesh=mesh,
                                   sampler=SamplerConfig(greedy=True))
            for p in prompts:
                cb.submit(p, 24)
            cb.run()
        results[dp] = cb.stats
        print(f"dp={dp} tp=2 slots={slots}: {cb.stats['tok_s']:.1f} tok/s, "
              f"occupancy {cb.stats['avg_slot_occupancy']:.2f}/{slots}", flush=True)

    if 1 in results and 2 in results:
        eff = results[2]["tok_s"] / (2 * results[1]["tok_s"])
        print(f"1→2 'hosts' scaling efficiency: {eff:.2%} "
              f"(CPU-mesh harness check; real number needs real chips)")


if __name__ == "__main__":
    main()
