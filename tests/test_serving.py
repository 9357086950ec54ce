"""Micro-batching server tests: correctness vs the direct single-utterance
path, actual coalescing, bucketing, error and shutdown behavior."""

import threading

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
from asr_dfcnn_transformer_tpu.infer import BatchingServer, Pipeline
from asr_dfcnn_transformer_tpu.models import SEDFCNN, TransformerLM


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("servecorpus")
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
    return pipe, signals


def test_server_matches_direct_path(setup):
    pipe, signals = setup
    with BatchingServer(pipe, max_batch=4, max_wait_ms=30.0,
                        bucket_bounds=(128,)) as srv:
        futures = [srv.submit(s) for s in signals]
        got = [f.result(timeout=300) for f in futures]
    for sig, (pinyin, hanzi) in zip(signals, got):
        # the direct path pads to the same 128-frame bucket
        want_p, want_h = pipe.recognize_signal(sig, bucket_frames=128)
        assert pinyin == want_p
        assert hanzi == want_h
    # coalescing actually happened: 4-8 requests per compiled launch
    assert srv.stats.batches < len(signals)
    assert srv.stats.requests == len(signals)


def test_server_concurrent_callers(setup):
    pipe, signals = setup
    results = {}
    with BatchingServer(pipe, max_batch=4, max_wait_ms=20.0,
                        bucket_bounds=(128,)) as srv:
        def worker(i):
            results[i] = srv.recognize(signals[i % len(signals)],
                                       timeout=300)
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert len(results) == 6
    for i, (pinyin, hanzi) in results.items():
        assert isinstance(pinyin, list) and isinstance(hanzi, str)


def test_server_bucket_selection(setup):
    pipe, _ = setup
    srv = BatchingServer(pipe, bucket_bounds=(128, 256))
    try:
        assert srv._bucket_of(400) == 128          # 1 frame
        assert srv._bucket_of(128 * 160 + 240) == 128   # exactly 128 frames
        assert srv._bucket_of(130 * 160) == 256
        assert srv._bucket_of(10 ** 9) == 256      # clamps to largest
    finally:
        srv.close()


def test_server_rejects_after_close(setup):
    pipe, signals = setup
    srv = BatchingServer(pipe, bucket_bounds=(128,))
    srv.close()
    with pytest.raises(RuntimeError):
        srv.submit(signals[0])
