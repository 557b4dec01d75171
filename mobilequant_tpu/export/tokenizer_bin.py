"""tokenizer.bin writer (analogue of reference capp/scripts/tokenizer.py:58-103).

Two layouts:
  v1 (llama2.c / reference-compatible): u32 max_token_len, then per token
     {f32 score, u32 len, bytes}. Readable by the reference's C runtime.
  v2 (default): "MQTK" magic, u32 vocab_size, u32 max_token_len, then the same
     records — self-describing (the reference's C code needs vocab_size passed
     out-of-band, llm.cpp:32).

Sources: a sentencepiece model, an HF tokenizer (slow, sentencepiece-backed), or
raw (pieces, scores) lists (used by tests — no network needed).
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Sequence


def write_tokenizer_bin(path: str | Path, pieces: Sequence[bytes],
                        scores: Sequence[float], version: int = 2) -> None:
    assert len(pieces) == len(scores)
    max_len = max((len(p) for p in pieces), default=0)
    with open(path, "wb") as f:
        if version == 2:
            f.write(b"MQTK")
            f.write(struct.pack("<II", len(pieces), max_len))
        else:
            f.write(struct.pack("<I", max_len))
        for piece, score in zip(pieces, scores):
            f.write(struct.pack("<fI", float(score), len(piece)))
            f.write(piece)


def special_tokens_from_config(config: dict,
                               bos_id: int | None = None,
                               eos_id: int | None = None) -> dict[int, str]:
    """Special-token pieces from a tokenizer_config.json dict (the reference
    patches bos/eos/unk and every `added_tokens_decoder` entry into the
    exported vocab, capp/scripts/tokenizer.py:37-39,79-83).

    bos_id/eos_id: ids from the sp model (patched to "<s>"/"</s>" defaults
    like the reference) — added_tokens_decoder entries override them."""
    special: dict[int, str] = {}
    if bos_id is not None and bos_id >= 0:
        special[bos_id] = str(config.get("bos_token", "<s>")
                              if isinstance(config.get("bos_token"), str)
                              else "<s>")
    if eos_id is not None and eos_id >= 0:
        special[eos_id] = str(config.get("eos_token", "</s>")
                              if isinstance(config.get("eos_token"), str)
                              else "</s>")
    for ind, info in (config.get("added_tokens_decoder") or {}).items():
        content = info["content"] if isinstance(info, dict) else str(info)
        special[int(ind)] = content
    return special


def patch_special_tokens(pieces: list[bytes], scores: list[float],
                         special: dict[int, str]) -> None:
    """In-place: replace the listed vocab slots with their special-token
    content at score 0.0 (ref capp/scripts/tokenizer.py:79-83 — without this,
    llama-family chat markers round-trip wrong through the native session)."""
    for ind, content in special.items():
        if 0 <= ind < len(pieces):
            pieces[ind] = content.replace("▁", " ").encode("utf-8")
            scores[ind] = 0.0


def pieces_from_sentencepiece(sp_model) -> tuple[list[bytes], list[float]]:
    """sp_model: a loaded sentencepiece.SentencePieceProcessor."""
    pieces, scores = [], []
    for i in range(sp_model.get_piece_size()):
        t = sp_model.id_to_piece(i).replace("▁", " ")
        pieces.append(t.encode("utf-8"))
        scores.append(float(sp_model.get_score(i)))
    return pieces, scores


def export_hf_tokenizer(tokenizer, path: str | Path, version: int = 2,
                        tokenizer_config: dict | str | Path | None = None) -> None:
    """Export a (sentencepiece-backed) HF tokenizer to tokenizer.bin.

    tokenizer_config: optional tokenizer_config.json (dict or path) whose
    special tokens (bos/eos + added_tokens_decoder) are patched into the
    exported vocab (ref capp/scripts/tokenizer.py:58-103)."""
    if hasattr(tokenizer, "sp_model"):
        pieces, scores = pieces_from_sentencepiece(tokenizer.sp_model)
        bos_id, eos_id = tokenizer.sp_model.bos_id(), tokenizer.sp_model.eos_id()
    else:
        # fast tokenizer: reconstruct pieces from the vocab; scores by -rank
        vocab = tokenizer.get_vocab()
        inv = sorted(vocab.items(), key=lambda kv: kv[1])
        pieces = [k.replace("▁", " ").encode("utf-8") for k, _ in inv]
        scores = [-float(i) for i in range(len(inv))]
        bos_id = getattr(tokenizer, "bos_token_id", None)
        eos_id = getattr(tokenizer, "eos_token_id", None)
    if tokenizer_config is not None:
        if not isinstance(tokenizer_config, dict):
            import json
            tokenizer_config = json.loads(Path(tokenizer_config).read_text())
        patch_special_tokens(pieces, scores,
                             special_tokens_from_config(tokenizer_config,
                                                        bos_id, eos_id))
    write_tokenizer_bin(path, pieces, scores, version)
