"""Multi-host initialization and deployment notes.

The reference has no distributed backend at all (SURVEY.md §2.3); the TPU-native
equivalent of "NCCL init" is one call per host process:

    from mobilequant_tpu.parallel.launch import init_distributed
    init_distributed()                      # jax.distributed.initialize()
    mesh = make_mesh(dp=jax.process_count(), tp=jax.local_device_count())

After that, the same NamedSharding-annotated programs used single-host run
across the slice: GSPMD places tp collectives on ICI and dp gradient/batch
traffic on ICI-or-DCN according to the mesh's device order (keep "tp" innermost
= intra-host, so the heavy all-reduces never cross DCN — the scaling-book rule).

Serving: run one ContinuousBatcher per process with the slot axis dp-sharded
(`ContinuousBatcher(mesh=...)`); each host feeds its local queue, the decode
tick is a single pjit'ed program across the slice.
"""

from __future__ import annotations

import jax


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> dict:
    """jax.distributed.initialize with TPU auto-detection (no-op if single
    process or already initialized). Returns topology info."""
    try:
        if num_processes is None or num_processes > 1:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }
