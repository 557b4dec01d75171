"""ctypes bindings for the C++ native runtime (csrc/mqtpu_runtime.cpp).

Builds libmqtpu.so on first use with g++ (cached by source mtime). pybind11 is
not available in this image, so the library exposes a plain C ABI.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "libmqtpu.so"
_lib: Optional[ctypes.CDLL] = None


def _build_if_needed() -> Path:
    src = _CSRC / "mqtpu_runtime.cpp"
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(["make", "-C", str(_CSRC)], check=True,
                       capture_output=True, text=True)
    return _LIB_PATH


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(_build_if_needed()))
    lib.mqtpu_tokenizer_load.restype = ctypes.c_void_p
    lib.mqtpu_tokenizer_load.argtypes = [ctypes.c_char_p]
    lib.mqtpu_tokenizer_vocab_size.restype = ctypes.c_int
    lib.mqtpu_tokenizer_vocab_size.argtypes = [ctypes.c_void_p]
    lib.mqtpu_tokenizer_encode.restype = ctypes.c_int
    lib.mqtpu_tokenizer_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    lib.mqtpu_tokenizer_decode.restype = ctypes.c_char_p
    lib.mqtpu_tokenizer_decode.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.mqtpu_tokenizer_piece_to_id.restype = ctypes.c_int32
    lib.mqtpu_tokenizer_piece_to_id.argtypes = [ctypes.c_void_p,
                                                ctypes.c_char_p]
    lib.mqtpu_template_ids.restype = ctypes.c_int32
    lib.mqtpu_template_ids.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.mqtpu_tokenizer_free.argtypes = [ctypes.c_void_p]
    lib.mqtpu_sampler_new.restype = ctypes.c_void_p
    lib.mqtpu_sampler_new.argtypes = [ctypes.c_uint64, ctypes.c_float,
                                      ctypes.c_float, ctypes.c_int]
    lib.mqtpu_sampler_sample.restype = ctypes.c_int
    lib.mqtpu_sampler_sample.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.mqtpu_sampler_free.argtypes = [ctypes.c_void_p]
    lib.mqtpu_last_error.restype = ctypes.c_char_p
    _lib = lib
    return lib


class NativeTokenizer:
    """SentencePiece-style BPE over a tokenizer.bin (v1 llama2.c layout or our
    self-describing v2; see export/tokenizer_bin.py)."""

    def __init__(self, path: str | Path):
        self._lib = load_library()
        self._h = self._lib.mqtpu_tokenizer_load(str(path).encode())
        if not self._h:
            raise RuntimeError(
                f"tokenizer load failed: {self._lib.mqtpu_last_error().decode()}")

    @property
    def vocab_size(self) -> int:
        return self._lib.mqtpu_tokenizer_vocab_size(self._h)

    def encode(self, text: str, prefix=(), suffix=()) -> list[int]:
        data = text.encode("utf-8")
        max_out = len(data) + 16
        buf = (ctypes.c_int32 * max_out)()
        n = self._lib.mqtpu_tokenizer_encode(self._h, data, buf, max_out)
        return list(prefix) + list(buf[:min(n, max_out)]) + list(suffix)

    def decode(self, tokens) -> str:
        parts = []
        for t in tokens:
            parts.append(self._lib.mqtpu_tokenizer_decode(self._h, int(t)))
        return b"".join(parts).decode("utf-8", errors="replace")

    def piece_to_id(self, piece: str) -> int:
        """Exact-piece (atomic) id lookup, -1 if absent — for special tokens
        that must never be split or merged by the encoder."""
        return self._lib.mqtpu_tokenizer_piece_to_id(self._h, piece.encode())

    def template_ids(self, family: str, prompt_ids) -> list[int]:
        """C++-side tokenized chat template around pre-tokenized prompt ids
        (csrc template_spec — the exact ids mqtpu_session_run_ids consumes)."""
        arr = (ctypes.c_int32 * max(len(prompt_ids), 1))(*[int(t) for t in prompt_ids])
        n_total = self._lib.mqtpu_template_ids(self._h, family.encode(), arr,
                                               len(prompt_ids), None, 0)
        if n_total < 0:
            raise RuntimeError("mqtpu_template_ids failed: "
                               f"{self._lib.mqtpu_last_error().decode()}")
        out = (ctypes.c_int32 * n_total)()
        self._lib.mqtpu_template_ids(self._h, family.encode(), arr,
                                     len(prompt_ids), out, n_total)
        return list(out)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.mqtpu_tokenizer_free(self._h)
            self._h = None


class NativeSampler:
    """argmax / temperature / top-k / top-p over a logits vector (C++ hot loop)."""

    def __init__(self, seed: int = 0, temperature: float = 0.0,
                 top_p: float = 1.0, top_k: int = 0):
        self._lib = load_library()
        self._h = self._lib.mqtpu_sampler_new(seed, temperature, top_p, top_k)

    def sample(self, logits) -> int:
        import numpy as np
        arr = np.ascontiguousarray(np.asarray(logits, dtype=np.float32))
        ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        return self._lib.mqtpu_sampler_sample(self._h, ptr, arr.size)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.mqtpu_sampler_free(self._h)
            self._h = None


_FORWARD_FN = ctypes.CFUNCTYPE(ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32,
                               ctypes.c_int32, ctypes.POINTER(ctypes.c_float))


def _load_session_api(lib: ctypes.CDLL) -> ctypes.CDLL:
    if getattr(lib, "_session_api_loaded", False):
        return lib
    lib.mqtpu_session_create.restype = ctypes.c_int32
    lib.mqtpu_session_create.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, _FORWARD_FN, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_void_p)]
    lib.mqtpu_session_ref.restype = ctypes.c_int32
    lib.mqtpu_session_ref.argtypes = [ctypes.c_void_p]
    lib.mqtpu_session_release.restype = ctypes.c_int32
    lib.mqtpu_session_release.argtypes = [ctypes.c_void_p]
    lib.mqtpu_session_run.restype = ctypes.c_int32
    lib.mqtpu_session_run.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
    lib.mqtpu_session_run_ids.restype = ctypes.c_int32
    lib.mqtpu_session_run_ids.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32)]
    lib.mqtpu_session_error.restype = ctypes.c_char_p
    lib.mqtpu_session_error.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.mqtpu_free_text.argtypes = [ctypes.c_char_p]
    lib.mqtpu_set_log_level.argtypes = [ctypes.c_int]
    lib._session_api_loaded = True
    return lib


class NativeSession:
    """C++-orchestrated chat session — the analogue of the reference's
    `libllmod` context (capp/api/libllmod.h setup/run/ref/release): the C++
    runtime owns the tokenizer, sampler, chat template, and the autoregressive
    loop; the per-token forward is a callback into the compiled XLA decode
    step (the role the QNN graph execute plays on the reference's NPU).

    forward(token:int, position:int) -> np.ndarray logits (vocab,). Raise or
    return None to signal failure (surfaced as MQTPU_FORWARD_ERROR=3)."""

    def __init__(self, tokenizer_path: str | Path, forward, vocab_size: int,
                 *, family: str = "none", temperature: float = 0.0,
                 top_p: float = 1.0, top_k: int = 0, seed: int = 0,
                 max_seq_len: int = 1024, bos_id: int = 1, eos_id: int = 2):
        import numpy as np
        self._lib = _load_session_api(load_library())
        self._vocab = vocab_size

        def _bridge(_user, token, position, logits_out):
            try:
                logits = forward(int(token), int(position))
                if logits is None:
                    return 1
                arr = np.ascontiguousarray(
                    np.asarray(logits, dtype=np.float32)).ravel()
                ctypes.memmove(logits_out, arr.ctypes.data,
                               min(arr.size, vocab_size) * 4)
                return 0
            except Exception:   # noqa: BLE001 — must not unwind into C
                return 1

        self._cb = _FORWARD_FN(_bridge)           # keep alive
        handle = ctypes.c_void_p()
        rc = self._lib.mqtpu_session_create(
            str(tokenizer_path).encode(), family.encode(), temperature, top_p,
            top_k, seed, max_seq_len, vocab_size, bos_id, eos_id, self._cb,
            None, ctypes.byref(handle))
        if rc != 0:
            raise RuntimeError(
                f"mqtpu_session_create failed ({rc}): "
                f"{self._lib.mqtpu_last_error().decode()}")
        self._h = handle

    def run(self, prompt: str, max_new_tokens: int = 64) -> tuple[str, int]:
        """-> (generated_text, last_position)."""
        out = ctypes.c_char_p()
        pos = ctypes.c_int32()
        rc = self._lib.mqtpu_session_run(self._h, prompt.encode(),
                                         ctypes.byref(out), max_new_tokens,
                                         ctypes.byref(pos))
        if rc != 0:
            msg = self._lib.mqtpu_session_error(self._h, rc).decode()
            raise RuntimeError(f"mqtpu_session_run failed ({rc}): {msg}")
        try:
            text = out.value.decode("utf-8", errors="replace")
        finally:
            self._lib.mqtpu_free_text(out)
        return text, pos.value

    def run_ids(self, prompt_ids, max_new_tokens: int = 64) -> tuple[str, int]:
        """Pre-tokenized entry point: exact prompt ids, immune to string-level
        template drift (the tokenized template wraps them id-for-id)."""
        arr = (ctypes.c_int32 * len(prompt_ids))(*[int(t) for t in prompt_ids])
        out = ctypes.c_char_p()
        pos = ctypes.c_int32()
        rc = self._lib.mqtpu_session_run_ids(self._h, arr, len(prompt_ids),
                                             ctypes.byref(out), max_new_tokens,
                                             ctypes.byref(pos))
        if rc != 0:
            msg = self._lib.mqtpu_session_error(self._h, rc).decode()
            raise RuntimeError(f"mqtpu_session_run_ids failed ({rc}): {msg}")
        try:
            text = out.value.decode("utf-8", errors="replace")
        finally:
            self._lib.mqtpu_free_text(out)
        return text, pos.value

    def ref(self):
        self._lib.mqtpu_session_ref(self._h)

    def release(self):
        if getattr(self, "_h", None):
            self._lib.mqtpu_session_release(self._h)
            self._h = None

    def __del__(self):
        self.release()
