"""Streaming / live-capture recognition API.

The reference's live demo (``lm_and_am/read_wav.py``) records 16 s from a
pyaudio microphone into a wav, then runs file inference — its imports are
stale/broken (read_wav.py:5-11) but the capability intent is a push-audio
recognition API. This module provides it without a hard pyaudio
dependency: feed chunks from any source (mic callback, socket, file
reader); the recognizer buffers to a ring capped at ``max_seconds`` (the
reference records a fixed 16 s, read_wav.py:14-43) and decodes on demand.

An actual microphone source is gated behind an optional import so the
framework stays dependency-free on servers.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import numpy as np

from asr_dfcnn_transformer_tpu.infer.pipeline import Pipeline


class StreamingRecognizer:
    def __init__(self, pipeline: Pipeline, sample_rate: int = 16000,
                 max_seconds: float = 16.0):
        self.pipeline = pipeline
        self.sample_rate = sample_rate
        self.max_samples = int(sample_rate * max_seconds)
        self._buf = np.zeros((0,), np.float32)

    def reset(self):
        self._buf = np.zeros((0,), np.float32)

    def push(self, chunk: np.ndarray):
        """Append a float32 [-1, 1] audio chunk; keeps the last
        ``max_seconds`` of audio."""
        chunk = np.asarray(chunk, np.float32).reshape(-1)
        self._buf = np.concatenate([self._buf, chunk])[-self.max_samples:]

    @property
    def buffered_seconds(self) -> float:
        return len(self._buf) / self.sample_rate

    def result(self) -> Tuple[List[str], str]:
        """Decode everything buffered -> (pinyin syllables, hanzi)."""
        if len(self._buf) < 400:
            return [], ""
        return self.pipeline.recognize_signal(self._buf)

    def run_stream(self, chunks: Iterator[np.ndarray],
                   decode_every: Optional[float] = None):
        """Consume a chunk iterator, yielding (pinyin, hanzi) partials every
        ``decode_every`` seconds of new audio (None = only final)."""
        acc = 0.0
        for chunk in chunks:
            self.push(chunk)
            acc += len(np.asarray(chunk).reshape(-1)) / self.sample_rate
            if decode_every is not None and acc >= decode_every:
                acc = 0.0
                yield self.result()
        yield self.result()


def microphone_chunks(seconds: float = 16.0, sample_rate: int = 16000,
                      chunk_size: int = 1024):
    """Optional pyaudio microphone source (read_wav.py:14-43 capability).
    Raises ImportError with guidance when pyaudio is absent."""
    try:
        import pyaudio  # type: ignore
    except ImportError as e:
        raise ImportError(
            "pyaudio is not installed; feed StreamingRecognizer.push() from "
            "your own audio source instead") from e
    pa = pyaudio.PyAudio()
    stream = pa.open(format=pyaudio.paInt16, channels=1, rate=sample_rate,
                     input=True, frames_per_buffer=chunk_size)
    try:
        n_chunks = int(seconds * sample_rate / chunk_size)
        for _ in range(n_chunks):
            raw = stream.read(chunk_size)
            yield np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    finally:
        stream.stop_stream()
        stream.close()
        pa.terminate()
