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


def pieces_from_sentencepiece(sp_model) -> tuple[list[bytes], list[float]]:
    """sp_model: a loaded sentencepiece.SentencePieceProcessor."""
    pieces, scores = [], []
    for i in range(sp_model.get_piece_size()):
        t = sp_model.id_to_piece(i).replace("▁", " ")
        pieces.append(t.encode("utf-8"))
        scores.append(float(sp_model.get_score(i)))
    return pieces, scores


def export_hf_tokenizer(tokenizer, path: str | Path, version: int = 2) -> None:
    """Export a (sentencepiece-backed) HF tokenizer to tokenizer.bin."""
    if hasattr(tokenizer, "sp_model"):
        pieces, scores = pieces_from_sentencepiece(tokenizer.sp_model)
    else:
        # fast tokenizer: reconstruct pieces from the vocab; scores by -rank
        vocab = tokenizer.get_vocab()
        inv = sorted(vocab.items(), key=lambda kv: kv[1])
        pieces = [k.replace("▁", " ").encode("utf-8") for k, _ in inv]
        scores = [-float(i) for i in range(len(inv))]
    write_tokenizer_bin(path, pieces, scores, version)
