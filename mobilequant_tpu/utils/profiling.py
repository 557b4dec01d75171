"""Profiling & speed-of-light accounting.

TPU analogue of the reference's profiling surface (SURVEY.md §5): QNN profiler
parse → jax.profiler traces; CUDA-event latency → chained-dispatch timers;
per-layer times → per-op SOL table.

IMPORTANT measurement rule on relayed/tunneled TPU runtimes: chain data between
timed iterations (outputs → next inputs). Execution layers may lazily skip
computations whose results are never consumed and memoize identical dispatches;
unchained loops report impossible throughput. `chained_timeit` enforces this.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Perfetto-compatible profiler trace (view with ui.perfetto.dev)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def chained_timeit(step_fn: Callable, init_state, n_iters: int = 8,
                   warmup: int = 2) -> float:
    """Time `state = step_fn(state)` chains; returns seconds per iteration.
    step_fn must thread its output into the next input (see module docstring)."""
    state = init_state
    for _ in range(warmup):
        state = step_fn(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state = step_fn(state)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / n_iters


# --- speed-of-light accounting ---------------------------------------------

# per-chip peaks; extend as new generations appear
CHIP_SPECS = {
    "v5e": {"hbm_gbps": 819.0, "bf16_tflops": 197.0, "int8_tops": 394.0},
    "v5p": {"hbm_gbps": 2765.0, "bf16_tflops": 459.0, "int8_tops": 918.0},
    "v6e": {"hbm_gbps": 1640.0, "bf16_tflops": 918.0, "int8_tops": 1836.0},
}


def matmul_sol(m: int, k: int, n: int, weight_bytes: float = 1.0,
               act_bytes: float = 1.0, out_bytes: float = 4.0,
               chip: str = "v5e") -> dict:
    """Roofline estimate for one (m,k)@(k,n) matmul: compute-bound vs
    bandwidth-bound time and the arithmetic intensity."""
    spec = CHIP_SPECS[chip]
    flops = 2.0 * m * k * n
    bytes_moved = k * n * weight_bytes + m * k * act_bytes + m * n * out_bytes
    t_compute = flops / (spec["int8_tops"] * 1e12 if weight_bytes <= 1
                         else spec["bf16_tflops"] * 1e12)
    t_bw = bytes_moved / (spec["hbm_gbps"] * 1e9)
    return {"flops": flops, "bytes": bytes_moved,
            "intensity": flops / bytes_moved,
            "t_compute_us": t_compute * 1e6, "t_bw_us": t_bw * 1e6,
            "bound": "compute" if t_compute > t_bw else "bandwidth",
            "sol_us": max(t_compute, t_bw) * 1e6}


def decode_step_sol(config, weight_bits: int = 8, seq_len: int = 1024,
                    batch: int = 1, chip: str = "v5e",
                    lm_head_bytes: float = 4.0) -> dict:
    """Whole-model decode-step speed-of-light: bytes of weights+KV that must
    stream from HBM per token."""
    c = config
    wb = weight_bits / 8.0
    per_layer = (c.hidden_size * c.q_dim + 2 * c.hidden_size * c.kv_dim +
                 c.q_dim * c.hidden_size +
                 c.num_linears_per_mlp * c.hidden_size * c.intermediate_size)
    weight_bytes = per_layer * c.num_layers * wb
    head_bytes = c.hidden_size * c.vocab_size * lm_head_bytes
    kv_bytes = 2 * c.num_layers * batch * seq_len * c.kv_dim  # int8
    total = weight_bytes + head_bytes + kv_bytes
    spec = CHIP_SPECS[chip]
    t = total / (spec["hbm_gbps"] * 1e9)
    return {"bytes_per_token": total, "sol_ms": t * 1e3,
            "sol_tok_s": batch / t}
