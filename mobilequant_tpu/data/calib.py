"""Calibration corpora (analogue of reference mobilellm/data/datautils.py:7-69).

The reference tokenizes pile-val / wikitext2 and samples random seqlen windows.
This environment has no network access, so sources are, in order:
  1. a local text/jsonl(.zst) file (same formats the reference reads),
  2. an HF datasets cache if one exists,
  3. a deterministic synthetic stream (clearly labeled) so the full pipeline
     stays runnable end-to-end anywhere.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np


def _windows_from_ids(ids: np.ndarray, nsamples: int, seqlen: int,
                      seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = len(ids) - seqlen - 1
    if n <= 0:
        reps = int(np.ceil((seqlen + 1) / max(len(ids), 1))) + 1
        ids = np.tile(ids, reps)
        n = len(ids) - seqlen - 1
    starts = rng.integers(0, n, size=nsamples)
    return np.stack([ids[s:s + seqlen] for s in starts]).astype(np.int32)


def load_text_file(path: str | Path, tokenizer, nsamples: int = 128,
                   seqlen: int = 2048, seed: int = 1337,
                   text_key: str = "text") -> np.ndarray:
    """Local .txt / .jsonl / .jsonl.zst corpus → (nsamples, seqlen) token windows."""
    path = Path(path)
    if path.suffix == ".zst":
        import zstandard
        raw = zstandard.ZstdDecompressor().decompress(path.read_bytes(),
                                                      max_output_size=1 << 31)
        lines = raw.decode("utf-8", errors="ignore").splitlines()
        texts = [json.loads(l)[text_key] for l in lines if l.strip()]
    elif path.suffix in (".jsonl", ".json"):
        texts = [json.loads(l)[text_key] for l in path.read_text().splitlines()
                 if l.strip()]
    else:
        texts = [path.read_text()]
    ids = np.asarray(tokenizer("\n\n".join(texts), return_tensors="np")
                     .input_ids[0])
    return _windows_from_ids(ids, nsamples, seqlen, seed)


def synthetic_tokens(vocab_size: int, nsamples: int = 128, seqlen: int = 2048,
                     seed: int = 1337) -> np.ndarray:
    """Deterministic Zipf-ish synthetic token stream — NOT a real corpus; for
    pipeline tests and perf work only."""
    rng = np.random.default_rng(seed)
    # Zipf-like marginal so ranges look like natural-text activations
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    p = 1.0 / ranks
    p /= p.sum()
    return rng.choice(vocab_size, size=(nsamples, seqlen), p=p).astype(np.int32)


def add_random_samples(samples: np.ndarray, vocab_size: int,
                       seed: int = 1337, lo: int = 2) -> np.ndarray:
    """Random-token calibration augmentation (ref ptq/
    generate_act_scale_shift.py:81-84 `--use_rand_samples`, after Qualcomm's
    stable-diffusion demo): interleave one uniform-random-id sample per real
    sample so collected ranges also cover activation extremes that natural
    text never reaches. Ids drawn from [lo, vocab_size-1) — past bos, short
    of the last special, exactly like the reference."""
    rng = np.random.default_rng(seed)
    n, seqlen = samples.shape
    rand = rng.integers(lo, vocab_size - 1, (n, seqlen)).astype(samples.dtype)
    out = np.empty((2 * n, seqlen), samples.dtype)
    out[0::2], out[1::2] = samples, rand
    return out


def get_loaders(name: str, tokenizer=None, nsamples: int = 128,
                seqlen: int = 2048, seed: int = 1337,
                local_path: Optional[str] = None,
                vocab_size: Optional[int] = None) -> np.ndarray:
    """Reference-compatible entry (datautils.get_loaders): name in
    {pile, wikitext2, synthetic} (+ local file via local_path)."""
    if local_path is not None:
        return load_text_file(local_path, tokenizer, nsamples, seqlen, seed)
    if name == "synthetic":
        assert vocab_size is not None
        return synthetic_tokens(vocab_size, nsamples, seqlen, seed)
    try:
        import datasets  # requires a pre-populated cache in this environment
        if name == "pile":
            ds = datasets.load_dataset("mit-han-lab/pile-val-backup", split="validation")
            text = "\n\n".join(ds["text"][:2000])
        elif name == "wikitext2":
            ds = datasets.load_dataset("wikitext", "wikitext-2-raw-v1", split="train")
            text = "\n\n".join(ds["text"])
        else:
            raise KeyError(name)
        ids = np.asarray(tokenizer(text, return_tensors="np").input_ids[0])
        return _windows_from_ids(ids, nsamples, seqlen, seed)
    except Exception as e:  # no cache/network: fall back loudly
        if vocab_size is None and tokenizer is not None:
            vocab_size = len(tokenizer)
        if vocab_size is None:
            raise RuntimeError(f"no data source for {name!r}: {e}") from e
        import warnings
        warnings.warn(f"dataset {name!r} unavailable ({e}); using synthetic tokens")
        return synthetic_tokens(vocab_size, nsamples, seqlen, seed)
