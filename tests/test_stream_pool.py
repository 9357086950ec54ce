"""StreamPool: batched multi-stream decode must equal N independent
IncrementalRecognizers token for token (greedy and beam), plus slot
lifecycle semantics."""

import numpy as np
import pytest

from asr_dfcnn_transformer_tpu.infer.stream_pool import StreamPool
from asr_dfcnn_transformer_tpu.infer.streaming import IncrementalRecognizer

from tests.test_streaming import _make_pipeline, _signal


def _chunks(sig, sizes_seed=0, lo=600, hi=5000):
    rng = np.random.default_rng(sizes_seed)
    out, i = [], 0
    while i < len(sig):
        n = int(rng.integers(lo, hi))
        out.append(sig[i: i + n])
        i += n
    return out


def _run_single(pipeline, sig, chunks, **kw):
    rec = IncrementalRecognizer(pipeline, cmvn="running", **kw)
    for c in chunks:
        rec.push(c)
    return rec.finalize()


class TestGreedyAgreement:
    def test_pool_matches_independent_recognizers(self):
        pipeline = _make_pipeline(with_lm=False, nfilt=40)
        sigs = [_signal(1.9, seed=1), _signal(2.7, seed=2),
                _signal(3.4, seed=3), _signal(1.2, seed=4)]
        chunk_lists = [_chunks(s, sizes_seed=i) for i, s in enumerate(sigs)]
        want = [_run_single(pipeline, s, cs)
                for s, cs in zip(sigs, chunk_lists)]

        pool = StreamPool(pipeline, n_slots=4, cmvn="running")
        slots = [pool.open() for _ in sigs]
        # interleave pushes round-robin, batching steps
        iters = [iter(cs) for cs in chunk_lists]
        pending = set(range(len(sigs)))
        while pending:
            for k in list(pending):
                c = next(iters[k], None)
                if c is None:
                    pending.discard(k)
                else:
                    pool.push(slots[k], c, step=False)
            pool.step()
        got = [pool.finalize(slots[k]) for k in range(len(sigs))]
        for w, g in zip(want, got):
            assert w == g

    def test_pool_short_utterance_small_bucket(self):
        """Finalize path where the offline bucket is smaller than the
        streaming window (exercises the size-grouped program path)."""
        pipeline = _make_pipeline(with_lm=False, nfilt=40)
        sig = _signal(0.9, seed=7)  # ~89 frames -> bucket 128 < window 256
        want = _run_single(pipeline, sig, _chunks(sig, 5))
        pool = StreamPool(pipeline, n_slots=2, cmvn="running")
        s = pool.open()
        for c in _chunks(sig, 5):
            pool.push(s, c)
        assert pool.finalize(s) == want

    def test_mixed_finalize_does_not_disturb_others(self):
        pipeline = _make_pipeline(with_lm=False, nfilt=40)
        a_sig, b_sig = _signal(2.2, seed=11), _signal(2.9, seed=12)
        want_a = _run_single(pipeline, a_sig, _chunks(a_sig, 1))
        want_b = _run_single(pipeline, b_sig, _chunks(b_sig, 2))

        pool = StreamPool(pipeline, n_slots=3, cmvn="running")
        a, b = pool.open(), pool.open()
        ca, cb = _chunks(a_sig, 1), _chunks(b_sig, 2)
        # push a fully, b halfway; finalize a while b still streams
        for c in ca:
            pool.push(a, c, step=False)
        for c in cb[: len(cb) // 2]:
            pool.push(b, c, step=False)
        pool.step()
        assert pool.finalize(a) == want_a
        for c in cb[len(cb) // 2:]:
            pool.push(b, c)
        assert pool.finalize(b) == want_b


class TestBeamAgreement:
    def test_pool_beam_matches_independent(self):
        pipeline = _make_pipeline(with_lm=False, nfilt=40, decode="beam")
        sigs = [_signal(1.6, seed=21), _signal(2.4, seed=22),
                _signal(1.1, seed=23)]
        chunk_lists = [_chunks(s, sizes_seed=30 + i)
                       for i, s in enumerate(sigs)]
        want = [_run_single(pipeline, s, cs, decode="beam", beam_width=4)
                for s, cs in zip(sigs, chunk_lists)]

        pool = StreamPool(pipeline, n_slots=3, cmvn="running",
                          decode="beam", beam_width=4)
        slots = [pool.open() for _ in sigs]
        iters = [iter(cs) for cs in chunk_lists]
        pending = set(range(len(sigs)))
        while pending:
            for k in list(pending):
                c = next(iters[k], None)
                if c is None:
                    pending.discard(k)
                else:
                    pool.push(slots[k], c, step=False)
            pool.step()
        got = [pool.finalize(slots[k]) for k in range(len(sigs))]
        for w, g in zip(want, got):
            assert w == g

    def test_beam_finalize_tail_longer_than_chunk(self):
        """Regression: the end-aligned finalize tail can hold more rows
        than chunk_logits (short bucket + small chunk_logits). The pool's
        batched beam buffer is statically [n_slots, chunk_logits, V], so
        _plan_chunk must cap n_new at chunk_logits and drain the tail
        over several plans — this used to crash the pool with a numpy
        broadcast error and silently worked single-stream only."""
        pipeline = _make_pipeline(with_lm=False, nfilt=40, decode="beam")
        # ~1.26 s -> ~126 frames: bucket 128 < window 2*64+8*8 = 192,
        # finalize tail = 16 rows > chunk_logits = 8
        sig = _signal(1.26, seed=91)
        kw = dict(decode="beam", beam_width=4, chunk_logits=8)
        want = _run_single(pipeline, sig, _chunks(sig, 92), **kw)
        pool = StreamPool(pipeline, n_slots=2, cmvn="running", **kw)
        s = pool.open()
        for c in _chunks(sig, 92):
            pool.push(s, c)
        assert pool.finalize(s) == want

    def test_beam_slot_reuse_after_close(self):
        pipeline = _make_pipeline(with_lm=False, nfilt=40, decode="beam")
        sig = _signal(1.3, seed=41)
        want = _run_single(pipeline, sig, [sig], decode="beam",
                           beam_width=4)
        pool = StreamPool(pipeline, n_slots=1, cmvn="running",
                          decode="beam", beam_width=4)
        s0 = pool.open()
        pool.push(s0, _signal(1.0, seed=42))
        pool.finalize(s0)
        pool.close(s0)
        # the reused slot's beam row must start fresh
        s1 = pool.open()
        assert s1 == s0
        pool.push(s1, sig)
        assert pool.finalize(s1) == want


class TestLMAndPartials:
    def test_partials_match_single_stream(self):
        pipeline = _make_pipeline(with_lm=True, nfilt=40)
        sig = _signal(2.0, seed=51)
        chunks = _chunks(sig, 52)
        rec = IncrementalRecognizer(pipeline, cmvn="running")
        pool = StreamPool(pipeline, n_slots=2, cmvn="running")
        s = pool.open()
        for c in chunks:
            rec.push(c)
            pool.push(s, c)
            assert pool.partial(s) == rec.partial()
        assert pool.finalize(s) == rec.finalize()
        # finalized result is cached
        assert pool.partial(s) == pool.partial(s)

    def test_partials_covers_all_active(self):
        pipeline = _make_pipeline(with_lm=True, nfilt=40)
        pool = StreamPool(pipeline, n_slots=3, cmvn="running")
        a, b = pool.open(), pool.open()
        pool.push(a, _signal(1.7, seed=61), step=False)
        pool.push(b, _signal(1.4, seed=62), step=False)
        pool.step()
        out = pool.partials()
        assert set(out) == {a, b}
        for p, h in out.values():
            assert isinstance(p, list) and isinstance(h, str)


class TestLifecycle:
    def test_capacity_and_reuse(self):
        pipeline = _make_pipeline(with_lm=False, nfilt=40)
        pool = StreamPool(pipeline, n_slots=2, cmvn="running")
        a, b = pool.open(), pool.open()
        with pytest.raises(RuntimeError):
            pool.open()
        pool.close(a)
        c = pool.open()
        assert c == a
        pool.close(b), pool.close(c)
        assert pool.active_slots == []

    def test_push_after_finalize_raises(self):
        pipeline = _make_pipeline(with_lm=False, nfilt=40)
        pool = StreamPool(pipeline, n_slots=1, cmvn="running")
        s = pool.open()
        pool.push(s, _signal(1.0, seed=71))
        pool.finalize(s)
        with pytest.raises(ValueError):
            pool.push(s, _signal(0.5, seed=72))
        with pytest.raises(KeyError):
            pool.push(s + 1, _signal(0.5, seed=73))

    def test_single_stream_engine_unchanged(self):
        """The refactored IncrementalRecognizer still passes its own
        exactness contract (sanity duplicate of test_streaming.py)."""
        pipeline = _make_pipeline(with_lm=False, nfilt=40)
        sig = _signal(2.1, seed=81)
        one = _run_single(pipeline, sig, [sig])
        many = _run_single(pipeline, sig, _chunks(sig, 82))
        assert one == many
