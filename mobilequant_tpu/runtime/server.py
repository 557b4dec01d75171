"""Online serving: continuous batching over live requests + HTTP front-end.

The reference's serving surface is a single-stream C API driven by a REPL
(capp/api/libllmod.h:42-133, capp/test/simple_app.cpp) — one prompt at a
time, one token per NPU graph execute. Here the serving layer is the
slot-based continuous batcher (runtime/serve.ContinuousBatcher) made ONLINE:
requests arrive at any time from any thread, join the running batch at the
next scheduler tick, and complete independently.

Threading model: ALL JAX work happens on one worker thread (the batcher is
not thread-safe and per-thread dispatch would serialize on the device
anyway). Producers enqueue (prompt, opts, future) into a locked inbox; the
worker drains the inbox before each tick, runs `ContinuousBatcher.step()`,
and resolves futures for retired requests. Idle = the worker parks on a
condition variable; a submit wakes it.

The HTTP front-end is stdlib-only (ThreadingHTTPServer):
  POST /generate  {"prompt": str, "max_new_tokens": int} -> {"completion": ...}
  POST /generate  {"prompt_ids": [int, ...]}             -> {"completion_ids": ...}
  optional per-request sampling fields on /generate: "temperature", "top_p",
  "top_k", "greedy" (temperature 0 implies greedy); requests with different
  settings batch together — the scheduler samples all live slots in one
  batched call (runtime/sampling.sample_batched).
  GET  /health                                           -> {"ok": true}
  GET  /stats                                            -> scheduler counters
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class _Pending:
    __slots__ = ("prompt", "max_new_tokens", "sampler", "event", "result",
                 "error")

    def __init__(self, prompt, max_new_tokens, sampler=None):
        self.prompt = prompt
        self.max_new_tokens = max_new_tokens
        self.sampler = sampler       # Optional[SamplerConfig] per-request
        self.event = threading.Event()
        self.result: Optional[list[int]] = None
        self.error: Optional[str] = None


class InferenceServer:
    """Owns a ContinuousBatcher and a worker thread; thread-safe submit()."""

    def __init__(self, batcher):
        self.cb = batcher
        self._inbox: list[_Pending] = []
        self._by_rid: dict[int, _Pending] = {}
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._stop = False
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._started = False

    def start(self):
        if not self._started:
            self._started = True
            self._worker.start()
        return self

    def close(self):
        with self._wake:
            self._stop = True
            self._wake.notify()
        if self._started:
            self._worker.join(timeout=30)

    def submit(self, prompt_ids, max_new_tokens: int = 128,
               sampler=None) -> _Pending:
        """Thread-safe; returns a handle whose .event fires when .result is
        set. sampler: optional per-request SamplerConfig override (mixed
        settings across concurrent requests are fine — the batcher samples
        them in one batched call)."""
        p = _Pending(np.asarray(prompt_ids, np.int32), max_new_tokens,
                     sampler)
        with self._wake:
            self._inbox.append(p)
            self._wake.notify()
        return p

    def generate(self, prompt_ids, max_new_tokens: int = 128,
                 timeout: Optional[float] = None, sampler=None) -> list[int]:
        p = self.submit(prompt_ids, max_new_tokens, sampler=sampler)
        if not p.event.wait(timeout):
            raise TimeoutError("generation did not complete in time")
        if p.error is not None:
            raise ValueError(p.error)
        return p.result

    def _max_prompt_len(self) -> int:
        # longest prompt the batcher can prefill: its largest bucket, or
        # max_seq_len - 1 under chunked prefill
        if getattr(self.cb, "chunk", None) is not None:
            return self.cb.ecfg.max_seq_len - 1
        return max(self.cb.buckets) if self.cb.buckets else 0

    # ------------------------------------------------------------------
    def _loop(self):
        while True:
            with self._wake:
                while not (self._inbox or self.cb.queue or self.cb.active
                           or self._stop):
                    self._wake.wait()
                if self._stop and not (self._inbox or self.cb.queue
                                       or self.cb.active):
                    return
                inbox, self._inbox = self._inbox, []
            for p in inbox:
                # validate before entering the scheduler: a prompt the
                # batcher cannot prefill must fail ITS request, not the loop
                if len(p.prompt) > self._max_prompt_len():
                    p.error = (f"prompt length {len(p.prompt)} exceeds the "
                               f"serving limit {self._max_prompt_len()}")
                    p.event.set()
                    continue
                rid = self.cb.submit(p.prompt, p.max_new_tokens,
                                     sampler=p.sampler)
                self._by_rid[rid] = p
            try:
                self.cb.step()
            except Exception as e:                       # noqa: BLE001
                # never let one bad tick kill the serving loop: fail every
                # in-flight request loudly and keep accepting new ones
                # (re-init the cache — a failed donated call may have
                # consumed the old buffers)
                self.cb.cache = self.cb._mod.init_kv_cache(self.cb.ecfg,
                                                           self.cb.B)
                for slot in list(self.cb.active):
                    self.cb._retire(slot)
                for rid in list(self.cb.done):
                    req = self.cb.done.pop(rid)
                    p = self._by_rid.pop(rid, None)
                    if p is not None and p.result is None:
                        p.error = f"scheduler tick failed: {e!r}"
                        p.event.set()
                while self.cb.queue:
                    req = self.cb.queue.popleft()
                    p = self._by_rid.pop(req.rid, None)
                    if p is not None:
                        p.error = f"scheduler tick failed: {e!r}"
                        p.event.set()
                continue
            if self.cb.done:
                for rid in list(self.cb.done):
                    req = self.cb.done.pop(rid)
                    p = self._by_rid.pop(rid, None)
                    if p is not None:
                        p.result = list(req.out)
                        p.event.set()


def make_http_server(server: InferenceServer, tokenizer=None, host="127.0.0.1",
                     port: int = 8000, bos_id: int = -1, eos_id: int = -1,
                     chat_family: Optional[str] = None,
                     default_max_new_tokens: int = 128) -> ThreadingHTTPServer:
    """stdlib HTTP front-end over an InferenceServer. tokenizer: optional
    runtime/native.NativeTokenizer for text I/O; without one only
    `prompt_ids` requests are accepted."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):       # quiet by default
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                return self._send(200, {"ok": True})
            if self.path == "/stats":
                return self._send(200, getattr(server.cb, "stats", {}) | {
                    "active": len(server.cb.active),
                    "queued": len(server.cb.queue)})
            return self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                return self._send(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                mnt = int(req.get("max_new_tokens", default_max_new_tokens))
                sampler = None
                if any(f in req for f in ("temperature", "top_p", "top_k",
                                          "greedy")):
                    from mobilequant_tpu.runtime.sampling import SamplerConfig
                    temp = float(req.get("temperature", 1.0))
                    sampler = SamplerConfig(
                        temperature=temp,
                        top_p=float(req.get("top_p", 1.0)),
                        top_k=int(req.get("top_k", 0)),
                        greedy=bool(req.get("greedy", temp == 0.0)))
                if "prompt_ids" in req:
                    ids = [int(t) for t in req["prompt_ids"]]
                elif "prompt" not in req:
                    return self._send(400, {"error": "need prompt or "
                                                     "prompt_ids"})
                elif tokenizer is None:
                    return self._send(400, {"error": "no tokenizer loaded; "
                                                     "send prompt_ids"})
                else:
                    text = req["prompt"]
                    if chat_family:
                        # tokenized template (exact ids, no string-boundary
                        # drift — runtime/chat.TEMPLATE_SEGMENTS)
                        from mobilequant_tpu.runtime.chat import (
                            apply_chat_template_ids)
                        ids = apply_chat_template_ids(
                            tokenizer.encode(text), chat_family,
                            tokenizer.encode,
                            getattr(tokenizer, "piece_to_id", lambda _: -1))
                        ids = ([bos_id] if bos_id >= 0 else []) + ids
                    else:
                        ids = tokenizer.encode(
                            text, prefix=[bos_id] if bos_id >= 0 else [])
            except (ValueError, TypeError, KeyError) as e:  # malformed input
                return self._send(400, {"error": f"bad request: {e!r}"})
            try:
                out = server.generate(ids, mnt, sampler=sampler)
                if "prompt_ids" in req:
                    return self._send(200, {"completion_ids": out})
                if eos_id >= 0 and eos_id in out:
                    out = out[:out.index(eos_id)]
                return self._send(200, {"completion": tokenizer.decode(out)})
            except ValueError as e:                      # rejected request
                return self._send(400, {"error": str(e)})
            except Exception as e:                       # noqa: BLE001
                return self._send(500, {"error": repr(e)})

    httpd = ThreadingHTTPServer((host, port), Handler)
    return httpd
