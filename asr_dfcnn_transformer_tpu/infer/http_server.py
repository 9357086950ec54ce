"""HTTP serving front-end: recognition over the network.

The reference's only "serving" surface is a local loop — record 16 s from
the microphone, run the Keras model, print (``lm_and_am/read_wav.py:14-57``).
This module is the production network counterpart: a small, dependency-free
HTTP server (stdlib ``http.server``) that accepts PCM WAV request bodies
and returns recognition JSON, backed by either

- a **live** :class:`~.pipeline.Pipeline` — wrapped in
  :class:`~.serving.BatchingServer`, so concurrent requests are coalesced
  into length-bucketed device batches (one compiled program per bucket),
  or
- an **AOT serving artifact** (:func:`~.export_serving.load_artifact`) —
  the deployment story where no model code or checkpoints exist on the
  serving host; artifact entry points already pad/chunk internally.

Endpoints
---------
- ``POST /v1/recognize`` — body = a PCM WAV file (any Content-Type), or
  raw little-endian float32 mono samples with
  ``Content-Type: application/octet-stream`` (assumed 16 kHz). Response:
  ``{"pinyin": [...], "hanzi": "...", "seconds": ...}`` (e2e artifacts
  have no pinyin stage and return hanzi only).
- ``GET /healthz`` — liveness + backend kind.
- ``GET /v1/stats`` — request/batch/occupancy counters.

Threading: handler threads block on the batching future; JAX dispatch
stays on the BatchingServer's single dispatcher thread (live) or under a
lock (artifact — jax.export calls are functional but serialized here to
keep single-request latency predictable on one chip).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Sequence, Tuple

import numpy as np

from asr_dfcnn_transformer_tpu.audio.wav import read_wav_bytes

__all__ = ["HTTPRecognitionServer"]

_MAX_BODY = 64 * 1024 * 1024  # 64 MiB ≈ 35 min of 16 kHz int16 — plenty


class _LiveBackend:
    """Micro-batching over a live Pipeline."""

    kind = "live"

    def __init__(self, pipeline, max_batch: int, max_wait_ms: float,
                 bucket_bounds: Sequence[int]):
        from asr_dfcnn_transformer_tpu.infer.serving import BatchingServer
        self._srv = BatchingServer(pipeline, max_batch=max_batch,
                                   max_wait_ms=max_wait_ms,
                                   bucket_bounds=bucket_bounds)

    def recognize(self, signal: np.ndarray) -> Tuple[Optional[List[str]],
                                                     str]:
        return self._srv.submit(signal).result()

    def stats(self) -> dict:
        s = self._srv.stats
        return {"requests": s.requests, "batches": s.batches,
                "rows_run": s.rows_run,
                "mean_occupancy": round(s.mean_occupancy, 4),
                "per_bucket": {str(k): v for k, v in s.per_bucket.items()}}

    def close(self):
        self._srv.close()


class _ArtifactBackend:
    """Single-request path over an AOT serving artifact."""

    def __init__(self, served):
        from asr_dfcnn_transformer_tpu.infer.export_serving import E2EServing
        self._served = served
        self._e2e = isinstance(served, E2EServing)
        self.kind = "artifact-e2e" if self._e2e else "artifact"
        self._lock = threading.Lock()
        self._requests = 0

    def recognize(self, signal: np.ndarray) -> Tuple[Optional[List[str]],
                                                     str]:
        with self._lock:
            self._requests += 1
            if self._e2e:
                return None, self._served.recognize_signal(signal)
            pinyin, hanzi = self._served.recognize_signal(signal)
            return list(pinyin), hanzi

    def stats(self) -> dict:
        return {"requests": self._requests}

    def close(self):
        pass


class HTTPRecognitionServer:
    """Serve recognition over HTTP (see module docstring).

    Args:
      backend: a live ``Pipeline``, or any artifact returned by
        ``load_artifact`` (``ServingPipeline`` / ``E2EServing``).
      host/port: bind address; ``port=0`` picks a free port (see
        :attr:`port` after construction).
      max_batch / max_wait_ms / bucket_bounds: live-backend batching
        knobs, forwarded to :class:`BatchingServer`.
      sample_rate: expected input rate; wav bodies with a different rate
        are rejected 400 (the fbank front-end is rate-specific,
        wav_util.py:22-31 assumes 16 kHz).
    """

    def __init__(self, backend, host: str = "127.0.0.1", port: int = 0,
                 max_batch: int = 16, max_wait_ms: float = 5.0,
                 bucket_bounds: Sequence[int] = (400, 800, 1200, 1600),
                 sample_rate: int = 16000):
        from asr_dfcnn_transformer_tpu.infer.pipeline import Pipeline
        if isinstance(backend, Pipeline):
            self._backend = _LiveBackend(backend, max_batch, max_wait_ms,
                                         bucket_bounds)
        else:
            self._backend = _ArtifactBackend(backend)
        self.sample_rate = sample_rate
        self._requests_served = 0
        self._requests_lock = threading.Lock()

        server = self

        class Handler(BaseHTTPRequestHandler):
            # quiet per-request stderr lines; errors still surface as
            # HTTP statuses
            def log_message(self, fmt, *a):
                pass

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload, ensure_ascii=False).encode()
                self.send_response(code)
                self.send_header("Content-Type",
                                 "application/json; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(200, {"status": "ok",
                                      "backend": server._backend.kind})
                elif self.path == "/v1/stats":
                    self._reply(200, server._backend.stats())
                else:
                    self._reply(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                if self.path != "/v1/recognize":
                    self._reply(404, {"error": f"no route {self.path}"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                except ValueError:
                    length = 0
                if length <= 0 or length > _MAX_BODY:
                    self._reply(400, {"error": "missing or oversized body"})
                    return
                body = self.rfile.read(length)
                ctype = (self.headers.get("Content-Type") or "").lower()
                try:
                    if ctype.startswith("application/octet-stream"):
                        sig = np.frombuffer(body, dtype="<f4").astype(
                            np.float32)
                        rate = server.sample_rate
                    else:
                        sig, rate = read_wav_bytes(body)
                except Exception:
                    self._reply(400, {"error": "body is neither a PCM wav "
                                               "nor float32 samples"})
                    return
                if rate != server.sample_rate:
                    self._reply(400, {"error": f"sample rate {rate} != "
                                               f"{server.sample_rate}"})
                    return
                if sig.size == 0:
                    self._reply(400, {"error": "empty signal"})
                    return
                try:
                    pinyin, hanzi = server._backend.recognize(sig)
                except Exception as e:
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})
                    return
                with server._requests_lock:
                    server._requests_served += 1
                out = {"hanzi": hanzi,
                       "seconds": round(sig.size / rate, 3)}
                if pinyin is not None:
                    out["pinyin"] = pinyin
                self._reply(200, out)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._httpd.daemon_threads = True
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    @property
    def requests_served(self) -> int:
        return self._requests_served

    def start(self):
        """Serve in a background thread (returns immediately)."""
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._httpd.serve_forever,
                name="asr-http-server", daemon=True)
            self._thread.start()
        return self

    def serve_forever(self):
        """Serve on the calling thread until :meth:`close` (CLI path)."""
        self._httpd.serve_forever()

    def close(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        self._backend.close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.close()
