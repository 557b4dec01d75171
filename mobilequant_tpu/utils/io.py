"""IO and logging helpers (TPU-native analogue of reference mobilellm/utils/io.py)."""

from __future__ import annotations

import json
import logging
import pickle
import sys
from pathlib import Path
from typing import Any


def json_load(path: str | Path) -> Any:
    with open(path, "r") as f:
        return json.load(f)


def json_save(path: str | Path, obj: Any, indent: int = 2) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=indent)


def pickle_load(path: str | Path) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def pickle_save(path: str | Path, obj: Any) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)


_LOGGERS: dict[str, logging.Logger] = {}


def create_logger(name: str = "mobilequant_tpu", log_file: str | None = None,
                  level: int = logging.INFO) -> logging.Logger:
    """Console (+ optional file) logger; idempotent per name.

    Mirrors the behaviour of reference mobilellm/utils/io.py:45-69 (create_logger)
    without the torch.distributed rank handling — under JAX, per-process log files
    should key on jax.process_index() at call sites.
    """
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    fmt = logging.Formatter("[%(asctime)s %(name)s %(levelname)s] %(message)s",
                            datefmt="%H:%M:%S")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None:
        Path(log_file).parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _LOGGERS[name] = logger
    return logger


def enable_compilation_cache(cache_dir, min_compile_time_secs: float = 0.5):
    """Persistent XLA compilation cache — the TPU-native analogue of the
    reference shipping a prebuilt NPU graph (`qnn_model.bin`,
    ref device/export.py:352-365): the first process pays the 20-40 s trace+
    compile, every later cold start loads the serialized executable from disk.
    Keyed by program HLO + compiler version + topology, so a cache written at
    pack time on the serving machine is hit by demo/serve/eval."""
    import jax
    p = Path(cache_dir)
    p.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(p))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    try:
        # jax memoizes the cache backend at first use; re-point it when the
        # directory changes mid-process (e.g. pack --warm_cache after another
        # engine already enabled its own cache)
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()
    except Exception:
        pass
    return p
