import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_dfcnn_transformer_tpu.core import vocab
from asr_dfcnn_transformer_tpu.data import DataLoader, load_manifests, make_synthetic_corpus
from asr_dfcnn_transformer_tpu.infer import Pipeline, StreamingRecognizer
from asr_dfcnn_transformer_tpu.models import SEDFCNN, TransformerLM


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipecorpus")
    data_dir, wav_root, syls, hanzi = make_synthetic_corpus(
        str(root), num_utts=8, num_classes=4, syllables_per_utt=(2, 3),
        tone_ms=200, seed=2)
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
    return dl, am, am_vars, lm, lm_vars, av, lv


def test_pipeline_recognize_batch(setup):
    dl, am, am_vars, lm, lm_vars, av, lv = setup
    pipe = Pipeline(am, am_vars, lm, lm_vars, acoustic_vocab=av,
                    language_vocab=lv)
    batch = next(dl.am_batches(4, shuffle=False))
    pny_ids, pny_len, han_ids = pipe.recognize_batch(
        batch.signals, batch.signal_lengths, batch.bucket_frames)
    assert pny_ids.shape[0] == 4
    assert han_ids is not None and han_ids.shape == pny_ids.shape
    assert (np.asarray(pny_len) >= 0).all()


def test_pipeline_beam_mode(setup):
    dl, am, am_vars, _, _, av, _ = setup
    pipe = Pipeline(am, am_vars, acoustic_vocab=av, decode="beam",
                    beam_width=3)
    batch = next(dl.am_batches(4, shuffle=False))
    pny_ids, pny_len, han_ids = pipe.recognize_batch(
        batch.signals, batch.signal_lengths, batch.bucket_frames)
    assert han_ids is None
    assert pny_ids.shape[1] == 64


def test_pipeline_evaluate_protocol(setup, tmp_path):
    dl, am, am_vars, lm, lm_vars, av, lv = setup
    pipe = Pipeline(am, am_vars, lm, lm_vars, acoustic_vocab=av,
                    language_vocab=lv)
    log = tmp_path / "pred_log"
    res = pipe.evaluate(dl.am_batches(4, shuffle=False),
                        pred_log_path=str(log))
    assert res.num_utterances == 8
    assert 0.0 <= res.pinyin_accuracy <= 1.0
    assert 0.0 <= res.hanzi_accuracy <= 1.0
    text = log.read_text(encoding="utf-8")
    assert "原文拼音结果" in text and "word accuracy ratio" in text


def test_pipeline_single_file(setup):
    dl, am, am_vars, lm, lm_vars, av, lv = setup
    pipe = Pipeline(am, am_vars, lm, lm_vars, acoustic_vocab=av,
                    language_vocab=lv)
    sig, _, _ = dl.load_utterance(0)
    pinyin, hanzi = pipe.recognize_signal(sig)
    assert isinstance(pinyin, list)
    assert isinstance(hanzi, str)


def test_streaming_recognizer(setup):
    dl, am, am_vars, lm, lm_vars, av, lv = setup
    pipe = Pipeline(am, am_vars, lm, lm_vars, acoustic_vocab=av,
                    language_vocab=lv)
    rec = StreamingRecognizer(pipe, max_seconds=4.0)
    sig, _, _ = dl.load_utterance(1)
    chunks = [sig[i:i + 1024] for i in range(0, len(sig), 1024)]
    outs = list(rec.run_stream(iter(chunks)))
    assert outs
    pinyin, hanzi = outs[-1]
    assert isinstance(pinyin, list)
    assert rec.buffered_seconds > 0
    rec.reset()
    assert rec.buffered_seconds == 0


def test_pipeline_from_checkpoints(tmp_path):
    """Round-trip: train a step, save, rebuild the pipeline from disk."""
    import jax
    from asr_dfcnn_transformer_tpu.data import (DataLoader, load_manifests,
                                                make_synthetic_corpus)
    from asr_dfcnn_transformer_tpu.models import SEDFCNN, TransformerLM
    from asr_dfcnn_transformer_tpu.parallel import make_mesh
    from asr_dfcnn_transformer_tpu.train import AMTrainer, LMTrainer

    data_dir, wav_root, _, _ = make_synthetic_corpus(
        str(tmp_path / "c"), num_utts=4, num_classes=2, tone_ms=200, seed=6)
    av, lv = vocab.acoustic_vocab(), vocab.language_vocab()
    dl = DataLoader(load_manifests(data_dir, "train", corpora=("thchs",)),
                    av, lv, speech_root=wav_root, bucket_bounds=(128,))
    mesh = make_mesh(4, 1, jax.devices()[:4])
    am = SEDFCNN(vocab_size=av.size, stage_features=(4, 4, 8, 8, 8),
                 head_features=8, dropout_rate=0.0, dtype=jnp.float32)
    lm = TransformerLM(av.size, lv.size, d_model=32, num_heads=4,
                       num_blocks=1, dropout_rate=0.0, dtype=jnp.float32)
    workdir = str(tmp_path / "w")
    amt = AMTrainer(am, workdir, mesh=mesh)
    batch = next(dl.am_batches(4, shuffle=False))
    amt.restore_or_init(lambda: amt.init_state(jax.random.PRNGKey(0), batch))
    amt.train_step(batch, jax.random.PRNGKey(1))
    amt.save(0)
    lmt = LMTrainer(lm, workdir, mesh=mesh)
    lm_batch = next(dl.lm_batches(4, shuffle=False))
    lmt.restore_or_init(lambda: lmt.init_state(jax.random.PRNGKey(0),
                                               lm_batch))
    lmt.save(0)

    pipe = Pipeline.from_checkpoints(workdir, am, lm, acoustic_vocab=av,
                                     language_vocab=lv)
    sig, _, _ = dl.load_utterance(0)
    pinyin, hanzi = pipe.recognize_signal(sig)
    assert isinstance(pinyin, list) and isinstance(hanzi, str)


def test_pipeline_sharded_over_mesh(setup):
    """One Pipeline drives a (data,) mesh: batch sharded over chips,
    params replicated, identical outputs to the single-device path."""
    from asr_dfcnn_transformer_tpu.parallel import make_mesh
    dl, am, am_vars, lm, lm_vars, av, lv = setup
    batch = next(dl.am_batches(8, shuffle=False))
    plain = Pipeline(am, am_vars, lm, lm_vars, acoustic_vocab=av,
                     language_vocab=lv)
    sharded = Pipeline(am, am_vars, lm, lm_vars, acoustic_vocab=av,
                       language_vocab=lv, mesh=make_mesh(8, 1))
    p0, l0, h0 = plain.recognize_batch(batch.signals, batch.signal_lengths,
                                       bucket_frames=batch.bucket_frames)
    p1, l1, h1 = sharded.recognize_batch(batch.signals,
                                         batch.signal_lengths,
                                         bucket_frames=batch.bucket_frames)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))


def test_pipeline_single_utterance_on_mesh(setup):
    """recognize_signal builds a batch of 1, which must shard on any mesh
    (padded to the data-axis size internally) and match the unmeshed
    result — previously this crashed on every mesh-configured Pipeline."""
    from asr_dfcnn_transformer_tpu.parallel import make_mesh
    dl, am, am_vars, lm, lm_vars, av, lv = setup
    plain = Pipeline(am, am_vars, lm, lm_vars, acoustic_vocab=av,
                     language_vocab=lv)
    sharded = Pipeline(am, am_vars, lm, lm_vars, acoustic_vocab=av,
                       language_vocab=lv, mesh=make_mesh(8, 1))
    sig, _, _ = dl.load_utterance(0)
    p0, h0 = plain.recognize_signal(sig)
    p1, h1 = sharded.recognize_signal(sig)
    assert p0 == p1 and h0 == h1

    # non-divisible multi-row batches shard too (pad rows sliced away)
    batch = next(dl.am_batches(8, shuffle=False))
    a0 = plain.recognize_batch(batch.signals[:3], batch.signal_lengths[:3],
                               bucket_frames=batch.bucket_frames)
    a1 = sharded.recognize_batch(batch.signals[:3],
                                 batch.signal_lengths[:3],
                                 bucket_frames=batch.bucket_frames)
    for x0, x1 in zip(a0, a1):
        if x0 is None:
            assert x1 is None
            continue
        assert np.asarray(x1).shape[0] == 3
        np.testing.assert_array_equal(np.asarray(x0), np.asarray(x1))
