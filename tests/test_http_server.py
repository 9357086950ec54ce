"""HTTP serving front-end tests: recognition parity with the direct
pipeline path, both body encodings, error statuses, health/stats, request
coalescing, and the artifact-backend dispatch."""

import http.client
import io
import json
import threading
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_dfcnn_transformer_tpu.core import vocab
from asr_dfcnn_transformer_tpu.data import (
    DataLoader,
    load_manifests,
    make_synthetic_corpus,
)
from asr_dfcnn_transformer_tpu.infer import HTTPRecognitionServer, Pipeline
from asr_dfcnn_transformer_tpu.models import SEDFCNN, TransformerLM


def _wav_bytes(signal: np.ndarray, rate: int = 16000) -> bytes:
    buf = io.BytesIO()
    pcm = (np.clip(signal, -1, 1) * 32767.0).astype(np.int16)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _post(port: int, path: str, body: bytes, ctype: str = "audio/wav"):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    conn.request("POST", path, body=body, headers={"Content-Type": ctype})
    r = conn.getresponse()
    out = r.status, json.loads(r.read().decode())
    conn.close()
    return out


def _get(port: int, path: str):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", path)
    r = conn.getresponse()
    out = r.status, json.loads(r.read().decode())
    conn.close()
    return out


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("httpcorpus")
    data_dir, wav_root, _, _ = make_synthetic_corpus(
        str(root), num_utts=8, num_classes=4, syllables_per_utt=(2, 3),
        tone_ms=200, seed=3)
    av, lv = vocab.acoustic_vocab(), vocab.language_vocab()
    m = load_manifests(data_dir, "test", corpora=("thchs",))
    dl = DataLoader(m, av, lv, speech_root=wav_root, bucket_bounds=(128,))

    am = SEDFCNN(vocab_size=av.size, stage_features=(4, 4, 8, 8, 8),
                 se_ratio=(1, 2, 2, 2, 2), head_features=8,
                 dropout_rate=0.0, dtype=jnp.float32)
    batch = next(dl.am_batches(4, shuffle=False))
    from asr_dfcnn_transformer_tpu.audio import batched_fbank
    feats, _ = batched_fbank(batch.signals[:1], batch.signal_lengths[:1],
                             out_frames=128)
    am_vars = am.init(jax.random.PRNGKey(0), feats[..., None], train=False)
    lm = TransformerLM(input_vocab_size=av.size, output_vocab_size=lv.size,
                       d_model=32, num_heads=4, num_blocks=1,
                       dropout_rate=0.0, dtype=jnp.float32)
    lm_vars = lm.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, 8), jnp.int32), train=False)
    pipe = Pipeline(am, am_vars, lm, lm_vars, acoustic_vocab=av,
                    language_vocab=lv)
    batch = next(dl.am_batches(8, shuffle=False))
    signals = [np.asarray(batch.signals[i][: batch.signal_lengths[i]])
               for i in range(8) if batch.weights[i] > 0]
    srv = HTTPRecognitionServer(pipe, port=0, max_batch=4,
                                max_wait_ms=30.0, bucket_bounds=(128,))
    srv.start()
    yield pipe, signals, srv
    srv.close()


def test_http_recognize_matches_direct(setup):
    pipe, signals, srv = setup
    for sig in signals[:3]:
        status, out = _post(srv.port, "/v1/recognize", _wav_bytes(sig))
        assert status == 200
        want_p, want_h = pipe.recognize_signal(sig, bucket_frames=128)
        # int16 wav round-trip quantizes the signal; features are CMVN'd
        # so the decode must be identical
        assert out["hanzi"] == want_h
        assert out["pinyin"] == want_p
        assert out["seconds"] == pytest.approx(len(sig) / 16000, abs=1e-3)


def test_http_raw_f32_body(setup):
    pipe, signals, srv = setup
    sig = signals[0].astype("<f4")
    status, out = _post(srv.port, "/v1/recognize", sig.tobytes(),
                        ctype="application/octet-stream")
    assert status == 200
    want_p, want_h = pipe.recognize_signal(sig, bucket_frames=128)
    assert (out["pinyin"], out["hanzi"]) == (want_p, want_h)


def test_http_concurrent_requests_coalesce(setup):
    pipe, signals, srv = setup
    before = srv._backend.stats()
    results = [None] * len(signals)

    def worker(i):
        results[i] = _post(srv.port, "/v1/recognize",
                           _wav_bytes(signals[i]))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(signals))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    for i, sig in enumerate(signals):
        status, out = results[i]
        assert status == 200
        want_p, want_h = pipe.recognize_signal(sig, bucket_frames=128)
        assert (out["pinyin"], out["hanzi"]) == (want_p, want_h)
    after = srv._backend.stats()
    n = len(signals)
    assert after["requests"] - before["requests"] == n
    # max_batch=4 with a 30 ms window: concurrent submits must coalesce
    # into fewer launches than requests
    assert after["batches"] - before["batches"] < n


def test_http_health_and_stats(setup):
    _, _, srv = setup
    status, out = _get(srv.port, "/healthz")
    assert status == 200 and out == {"status": "ok", "backend": "live",
                                     "streaming": False}
    status, out = _get(srv.port, "/v1/stats")
    assert status == 200 and out["requests"] >= 1
    assert 0 < out["mean_occupancy"] <= 1


def test_http_error_statuses(setup):
    _, signals, srv = setup
    status, out = _post(srv.port, "/v1/recognize", b"not a wav at all")
    assert status == 400 and "error" in out
    status, out = _post(srv.port, "/v1/recognize",
                        _wav_bytes(signals[0], rate=8000))
    assert status == 400 and "8000" in out["error"]
    status, out = _post(srv.port, "/v1/recognize", b"")
    assert status == 400
    status, out = _post(srv.port, "/nope", _wav_bytes(signals[0]))
    assert status == 404
    status, out = _get(srv.port, "/nope")
    assert status == 404


def test_http_artifact_backend_dispatch(tmp_path):
    """The artifact path is exercised end-to-end in test_export_serving;
    here a stub artifact pins the HTTP-level dispatch contract (no
    BatchingServer, pinyin+hanzi JSON, request counting)."""

    class StubServed:
        def recognize_signal(self, sig):
            return ["ni3", "hao3"], "你好"

    srv = HTTPRecognitionServer(StubServed(), port=0)
    with srv:
        assert srv._backend.kind == "artifact"
        sig = np.zeros(1600, np.float32)
        status, out = _post(srv.port, "/v1/recognize", _wav_bytes(sig))
        assert status == 200
        assert out["pinyin"] == ["ni3", "hao3"] and out["hanzi"] == "你好"
        status, out = _get(srv.port, "/healthz")
        assert out["backend"] == "artifact"
        status, out = _get(srv.port, "/v1/stats")
        assert out == {"requests": 1}


def test_cli_serve_requires_workdir_or_artifact():
    from asr_dfcnn_transformer_tpu.train import cli
    with pytest.raises(SystemExit):
        cli.main(["serve", "--max-requests", "1"])


def _delete(port: int, path: str):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("DELETE", path)
    r = conn.getresponse()
    out = r.status, json.loads(r.read().decode())
    conn.close()
    return out


def test_http_streaming_roundtrip(setup):
    """Open a stream, push raw-f32 chunks over HTTP, finish — the final
    hypothesis must equal the single-stream incremental engine's."""
    from asr_dfcnn_transformer_tpu.infer.streaming import (
        IncrementalRecognizer,
    )
    pipe, signals, _ = setup
    sig = signals[0]
    cut = len(sig) // 2
    chunks = [sig[:cut], sig[cut:]]
    rec = IncrementalRecognizer(pipe, cmvn="running")
    for c in chunks:
        rec.push(c)
    want = rec.finalize()

    srv = HTTPRecognitionServer(pipe, port=0, streams=2)
    with srv:
        status, out = _post(srv.port, "/v1/stream", b"",
                            ctype="application/octet-stream")
        assert status == 200 and "stream" in out
        tok = out["stream"]
        status, out = _post(srv.port, f"/v1/stream/{tok}?partial=0",
                            chunks[0].astype("<f4").tobytes(),
                            ctype="application/octet-stream")
        assert status == 200 and out == {"ok": True}
        status, out = _post(srv.port, f"/v1/stream/{tok}",
                            chunks[1].astype("<f4").tobytes(),
                            ctype="application/octet-stream")
        assert status == 200 and out["final"] is False
        assert isinstance(out["pinyin"], list)
        status, out = _post(srv.port, f"/v1/stream/{tok}/finish", b"",
                            ctype="application/octet-stream")
        assert status == 200 and out["final"] is True
        assert (out["pinyin"], out["hanzi"]) == want
        # token is gone after finish
        status, out = _post(srv.port, f"/v1/stream/{tok}",
                            chunks[0].astype("<f4").tobytes(),
                            ctype="application/octet-stream")
        assert status == 404
        status, out = _get(srv.port, "/v1/stats")
        assert out["streams"]["finished"] == 1
        status, out = _get(srv.port, "/healthz")
        assert out["streaming"] is True


def test_http_streaming_finish_with_tail_and_abort(setup):
    pipe, signals, _ = setup
    sig = signals[1]
    cut = len(sig) * 2 // 3
    srv = HTTPRecognitionServer(pipe, port=0, streams=2)
    with srv:
        # finish with a trailing chunk in the finish body
        _, out = _post(srv.port, "/v1/stream", b"")
        tok = out["stream"]
        _post(srv.port, f"/v1/stream/{tok}?partial=0",
              sig[:cut].astype("<f4").tobytes(),
              ctype="application/octet-stream")
        status, via_tail = _post(srv.port, f"/v1/stream/{tok}/finish",
                                 sig[cut:].astype("<f4").tobytes(),
                                 ctype="application/octet-stream")
        assert status == 200 and via_tail["final"] is True

        _, out = _post(srv.port, "/v1/stream", b"")
        tok2 = out["stream"]
        _post(srv.port, f"/v1/stream/{tok2}?partial=0",
              sig[:cut].astype("<f4").tobytes(),
              ctype="application/octet-stream")
        _post(srv.port, f"/v1/stream/{tok2}?partial=0",
              sig[cut:].astype("<f4").tobytes(),
              ctype="application/octet-stream")
        status, via_push = _post(srv.port, f"/v1/stream/{tok2}/finish",
                                 b"")
        assert status == 200
        assert (via_push["pinyin"], via_push["hanzi"]) == \
            (via_tail["pinyin"], via_tail["hanzi"])

        # abort frees the slot and invalidates the token
        _, out = _post(srv.port, "/v1/stream", b"")
        tok3 = out["stream"]
        status, out = _delete(srv.port, f"/v1/stream/{tok3}")
        assert status == 200 and out == {"ok": True}
        status, out = _delete(srv.port, f"/v1/stream/{tok3}")
        assert status == 404


def test_http_streaming_errors(setup):
    pipe, signals, srv0 = setup
    # the module fixture server has streaming disabled
    status, out = _post(srv0.port, "/v1/stream", b"")
    assert status == 404 and "disabled" in out["error"]

    srv = HTTPRecognitionServer(pipe, port=0, streams=1)
    with srv:
        status, out = _post(srv.port, "/v1/stream/unknowntoken",
                            np.zeros(100, "<f4").tobytes(),
                            ctype="application/octet-stream")
        assert status == 404
        # misaligned body is not float32 samples
        _, out = _post(srv.port, "/v1/stream", b"")
        tok = out["stream"]
        status, out = _post(srv.port, f"/v1/stream/{tok}", b"abc",
                            ctype="application/octet-stream")
        assert status == 400
        # slot exhaustion -> 503
        status, out = _post(srv.port, "/v1/stream", b"")
        assert status == 503
        # open with a body is a client error
        status, out = _post(srv.port, "/v1/stream", b"\x00" * 8)
        assert status == 400


def test_http_streaming_requires_live_backend():
    class StubServed:
        def recognize_signal(self, sig):
            return ["a1"], "a"

    with pytest.raises(ValueError, match="live Pipeline"):
        HTTPRecognitionServer(StubServed(), port=0, streams=2)
