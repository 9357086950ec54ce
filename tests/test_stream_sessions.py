"""StreamSessionManager: token-addressed concurrent streaming sessions
must match independent single-stream recognizers exactly, coalesce
concurrent pushes into shared batched rounds, and enforce the session
lifecycle (expiry, abort, slot exhaustion, stream-length cap)."""

import threading
import time

import numpy as np
import pytest

from asr_dfcnn_transformer_tpu.infer.stream_sessions import (
    StreamSessionManager,
)

from tests.test_stream_pool import _chunks, _run_single
from tests.test_streaming import _make_pipeline, _signal


@pytest.fixture(scope="module")
def pipeline():
    return _make_pipeline(with_lm=True, nfilt=40)


def test_concurrent_sessions_match_single_stream(pipeline):
    """N client threads streaming concurrently must each get exactly the
    hypothesis an independent IncrementalRecognizer produces."""
    sigs = [_signal(1.9, seed=11), _signal(2.7, seed=12),
            _signal(3.3, seed=13)]
    chunk_lists = [_chunks(s, sizes_seed=i) for i, s in enumerate(sigs)]
    want = [_run_single(pipeline, s, cs)
            for s, cs in zip(sigs, chunk_lists)]

    got = [None] * len(sigs)
    errors = []
    with StreamSessionManager(pipeline, n_slots=4,
                              max_wait_ms=20.0) as mgr:
        def client(k):
            try:
                tok = mgr.open()
                for c in chunk_lists[k]:
                    mgr.push(tok, c, want_partial=False)
                got[k] = mgr.finish(tok)
            except Exception as e:  # pragma: no cover - surfaced below
                errors.append(e)

        threads = [threading.Thread(target=client, args=(k,))
                   for k in range(len(sigs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors
        st = mgr.stats()
    assert got == want
    assert st["finished"] == len(sigs) and st["active"] == 0
    # coalescing: concurrent pushes must share rounds
    assert st["rounds"] < st["pushes"]


def test_partial_progresses_and_want_partial_none(pipeline):
    sig = _signal(2.2, seed=21)
    half = len(sig) // 2
    with StreamSessionManager(pipeline, n_slots=2) as mgr:
        tok = mgr.open()
        assert mgr.push(tok, sig[:half], want_partial=False) is None
        hyp = mgr.push(tok, sig[half:])
        assert isinstance(hyp, tuple) and isinstance(hyp[0], list) \
            and isinstance(hyp[1], str)
        final = mgr.finish(tok)
        # the partial is a prefix-consistent hypothesis; the final one
        # must equal the single-stream engine's
        want = _run_single(pipeline, sig, [sig[:half], sig[half:]])
        assert final == want


def test_finish_with_tail_equals_push_then_finish(pipeline):
    sig = _signal(1.7, seed=31)
    cut = len(sig) * 2 // 3
    with StreamSessionManager(pipeline, n_slots=2) as mgr:
        a = mgr.open()
        mgr.push(a, sig[:cut], want_partial=False)
        mgr.push(a, sig[cut:], want_partial=False)
        via_push = mgr.finish(a)
        b = mgr.open()
        mgr.push(b, sig[:cut], want_partial=False)
        via_tail = mgr.finish(b, tail=sig[cut:])
    assert via_push == via_tail


def test_unknown_and_finished_tokens_raise(pipeline):
    with StreamSessionManager(pipeline, n_slots=1) as mgr:
        with pytest.raises(KeyError):
            mgr.push("nope", np.zeros(100, np.float32))
        tok = mgr.open()
        mgr.finish(tok)
        with pytest.raises(KeyError):
            mgr.push(tok, np.zeros(100, np.float32))


def test_slot_exhaustion_and_reuse(pipeline):
    with StreamSessionManager(pipeline, n_slots=1) as mgr:
        tok = mgr.open()
        with pytest.raises(RuntimeError):
            mgr.open()
        mgr.finish(tok)
        tok2 = mgr.open()   # slot freed by finish
        mgr.abort(tok2)
        assert mgr.stats()["aborted"] == 1
        tok3 = mgr.open()   # slot freed by abort
        mgr.abort(tok3)


def test_idle_expiry_reclaims_slot(pipeline):
    with StreamSessionManager(pipeline, n_slots=1,
                              idle_timeout_s=0.3) as mgr:
        tok = mgr.open()
        mgr.push(tok, _signal(0.5, seed=41), want_partial=False)
        deadline = time.monotonic() + 10.0
        while mgr.stats()["expired"] == 0:
            assert time.monotonic() < deadline, "session never expired"
            time.sleep(0.1)
        with pytest.raises(KeyError):
            mgr.push(tok, np.zeros(100, np.float32))
        tok2 = mgr.open()   # the expired slot is reusable
        mgr.abort(tok2)


def test_max_stream_seconds_rejects(pipeline):
    with StreamSessionManager(pipeline, n_slots=1,
                              max_stream_seconds=0.05) as mgr:
        tok = mgr.open()
        with pytest.raises(ValueError, match="max_stream_seconds"):
            mgr.push(tok, np.zeros(1600, np.float32))
        # the stream survives a rejected push and can still finish
        mgr.push(tok, np.zeros(400, np.float32), want_partial=False)
        # the finish tail counts against the same cap as pushes...
        with pytest.raises(ValueError, match="max_stream_seconds"):
            mgr.finish(tok, tail=np.zeros(1600, np.float32))
        # ...and a rejected tail leaves the stream open for a plain finish
        mgr.finish(tok)


def test_abort_discards_and_frees(pipeline):
    sig = _signal(1.5, seed=51)
    with StreamSessionManager(pipeline, n_slots=1) as mgr:
        tok = mgr.open()
        mgr.push(tok, sig, want_partial=False)
        mgr.abort(tok)
        with pytest.raises(KeyError):
            mgr.finish(tok)
        st = mgr.stats()
        assert st["aborted"] == 1 and st["active"] == 0


def test_beam_decode_sessions_match_single_stream():
    pipeline = _make_pipeline(with_lm=False, nfilt=40, decode="beam")
    sig = _signal(2.4, seed=61)
    chunks = _chunks(sig, sizes_seed=7)
    want = _run_single(pipeline, sig, chunks)
    with StreamSessionManager(pipeline, n_slots=2) as mgr:
        tok = mgr.open()
        for c in chunks:
            mgr.push(tok, c, want_partial=False)
        got = mgr.finish(tok)
    assert got == want


def test_closed_manager_rejects(pipeline):
    mgr = StreamSessionManager(pipeline, n_slots=1)
    tok = mgr.open()
    mgr.close()
    with pytest.raises(RuntimeError):
        mgr.open()
    with pytest.raises(RuntimeError):
        mgr.push(tok, np.zeros(10, np.float32))
