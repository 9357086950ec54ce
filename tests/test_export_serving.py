"""AOT serving artifact: export -> load -> exact agreement with the live
Pipeline, plus the loader's padding/chunking/bucket-selection rules."""

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
from asr_dfcnn_transformer_tpu.infer import Pipeline
from asr_dfcnn_transformer_tpu.infer.export_serving import (
    ServingPipeline,
    export_pipeline,
)
from asr_dfcnn_transformer_tpu.models import SEDFCNN, TransformerLM


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("servcorpus")
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
    return dl, pipe


@pytest.fixture(scope="module")
def artifact(setup, tmp_path_factory):
    dl, pipe = setup
    path = str(tmp_path_factory.mktemp("artifact") / "pipeline.asrx")
    meta = export_pipeline(pipe, path, batch_sizes=(2, 4), buckets=(128,))
    return path, meta


def test_export_meta_and_roundtrip_exact(setup, artifact):
    dl, pipe = setup
    path, meta = artifact
    assert meta["version"] == 1 and meta["has_lm"]
    assert len(meta["programs"]) == 2          # 2 batch sizes x 1 bucket
    assert meta["acoustic_vocab"][-1] == "_"   # blank-last convention

    served = ServingPipeline.load(path)
    batch = next(dl.am_batches(4, shuffle=False))
    want = pipe.recognize_batch(batch.signals, batch.signal_lengths,
                                batch.bucket_frames)
    got = served.recognize_batch(batch.signals, batch.signal_lengths)
    np.testing.assert_array_equal(np.asarray(want[0]), got[0])
    np.testing.assert_array_equal(np.asarray(want[1]), got[1])
    np.testing.assert_array_equal(np.asarray(want[2]), got[2])


def test_serving_pads_small_batches(setup, artifact):
    dl, pipe = setup
    path, _ = artifact
    served = ServingPipeline.load(path)
    batch = next(dl.am_batches(4, shuffle=False))
    # batch of 3 -> padded to the exported size 4; rows must match the
    # full-batch result (padding rows cannot bleed into real ones)
    full = served.recognize_batch(batch.signals, batch.signal_lengths)
    part = served.recognize_batch(batch.signals[:3],
                                  batch.signal_lengths[:3])
    assert part[0].shape[0] == 3
    np.testing.assert_array_equal(full[0][:3], part[0])
    np.testing.assert_array_equal(full[1][:3], part[1])


def test_serving_chunks_large_batches(setup, artifact):
    dl, pipe = setup
    path, _ = artifact
    served = ServingPipeline.load(path)
    batch = next(dl.am_batches(4, shuffle=False))
    sig = np.concatenate([batch.signals, batch.signals])      # B=8 > max 4
    lens = np.concatenate([batch.signal_lengths, batch.signal_lengths])
    got = served.recognize_batch(sig, lens)
    assert got[0].shape[0] == 8
    np.testing.assert_array_equal(got[0][:4], got[0][4:])
    np.testing.assert_array_equal(got[1][:4], got[1][4:])


def test_serving_single_signal_decodes_strings(setup, artifact):
    dl, pipe = setup
    path, _ = artifact
    served = ServingPipeline.load(path)
    batch = next(dl.am_batches(4, shuffle=False))
    n = int(batch.signal_lengths[0])
    pinyin, hanzi = served.recognize_signal(batch.signals[0][:n])
    want_p, want_h = pipe.recognize_signal(batch.signals[0][:n],
                                           bucket_frames=128)
    assert pinyin == want_p and hanzi == want_h


def test_export_cross_platform_lowering(setup, tmp_path):
    """platforms=('cpu','tpu') lowers one artifact for both backends from
    a CPU host (useful when the TPU is unreachable at export time); the
    current (cpu) lowering must still execute."""
    dl, pipe = setup
    path = str(tmp_path / "xplat.asrx")
    meta = export_pipeline(pipe, path, batch_sizes=(2,), buckets=(128,),
                           platforms=("cpu", "tpu"))
    assert meta["platforms"] == ["cpu", "tpu"]
    served = ServingPipeline.load(path)
    batch = next(dl.am_batches(4, shuffle=False))
    got = served.recognize_batch(batch.signals[:2],
                                 batch.signal_lengths[:2])
    want = pipe.recognize_batch(batch.signals[:2],
                                batch.signal_lengths[:2], 128)
    np.testing.assert_array_equal(np.asarray(want[0]), got[0])


def test_e2e_export_roundtrip_exact(setup, tmp_path):
    """export_e2e -> E2EServing agrees exactly with the live KV-cached
    greedy decode; load_artifact dispatches on the artifact kind."""
    from asr_dfcnn_transformer_tpu.audio import batched_fbank
    from asr_dfcnn_transformer_tpu.audio.lfr import batched_lfr
    from asr_dfcnn_transformer_tpu.core import vocab as V
    from asr_dfcnn_transformer_tpu.infer.export_serving import (
        E2EServing,
        export_e2e,
        load_artifact,
    )
    from asr_dfcnn_transformer_tpu.models import (
        SpeechTransformer,
        greedy_decode_cached,
    )

    dl, _ = setup
    ev = V.e2e_language_vocab()
    model = SpeechTransformer(ev.size, d_model=32, num_heads=4,
                              num_enc_blocks=1, num_dec_blocks=1,
                              prenet_channels=8, dropout_rate=0.0,
                              dtype=jnp.float32)
    batch = next(dl.am_batches(4, shuffle=False))
    feats, valid = batched_fbank(jnp.asarray(batch.signals[:1]),
                                 jnp.asarray(batch.signal_lengths[:1]),
                                 out_frames=128)
    lfr, lfr_valid = batched_lfr(feats, valid)
    variables = model.init(jax.random.PRNGKey(0), lfr[..., None],
                           lfr_valid, jnp.zeros((1, 8), jnp.int32),
                           train=False)

    path = str(tmp_path / "e2e.asrx")
    meta = export_e2e(model, variables, path, vocab=ev, feature_dim=200,
                      max_len=8, batch_sizes=(4,), buckets=(128,))
    assert meta["kind"] == "e2e"

    served = load_artifact(path)
    assert isinstance(served, E2EServing)
    got_ids, got_lens = served.recognize_batch(batch.signals,
                                               batch.signal_lengths)

    feats, valid = batched_fbank(jnp.asarray(batch.signals),
                                 jnp.asarray(batch.signal_lengths),
                                 out_frames=128)
    lfr, lfr_valid = batched_lfr(feats, valid)
    want_ids, want_lens = greedy_decode_cached(model, variables,
                                               lfr[..., None], lfr_valid,
                                               max_len=8)
    np.testing.assert_array_equal(np.asarray(want_ids), got_ids)
    np.testing.assert_array_equal(np.asarray(want_lens), got_lens)

    hanzi = served.recognize_signal(
        batch.signals[0][:int(batch.signal_lengths[0])])
    assert isinstance(hanzi, str)


def test_e2e_export_beam_decode(setup, tmp_path):
    """export_e2e(decode='beam') matches the live KV-cached beam."""
    from asr_dfcnn_transformer_tpu.audio import batched_fbank
    from asr_dfcnn_transformer_tpu.audio.lfr import batched_lfr
    from asr_dfcnn_transformer_tpu.core import vocab as V
    from asr_dfcnn_transformer_tpu.infer.export_serving import (
        E2EServing,
        export_e2e,
    )
    from asr_dfcnn_transformer_tpu.models import (
        SpeechTransformer,
        beam_decode_cached,
    )

    dl, _ = setup
    ev = V.e2e_language_vocab()
    model = SpeechTransformer(ev.size, d_model=32, num_heads=4,
                              num_enc_blocks=1, num_dec_blocks=1,
                              prenet_channels=8, dropout_rate=0.0,
                              dtype=jnp.float32)
    batch = next(dl.am_batches(4, shuffle=False))
    feats, valid = batched_fbank(jnp.asarray(batch.signals[:2]),
                                 jnp.asarray(batch.signal_lengths[:2]),
                                 out_frames=128)
    lfr, lfr_valid = batched_lfr(feats, valid)
    variables = model.init(jax.random.PRNGKey(0), lfr[:1][..., None],
                           lfr_valid[:1], jnp.zeros((1, 8), jnp.int32),
                           train=False)
    path = str(tmp_path / "e2e_beam.asrx")
    export_e2e(model, variables, path, vocab=ev, feature_dim=200,
               decode="beam", beam_width=2, max_len=8,
               batch_sizes=(2,), buckets=(128,))
    served = E2EServing.load(path)
    got_ids, got_lens = served.recognize_batch(batch.signals[:2],
                                               batch.signal_lengths[:2])
    want_ids, want_lens, _ = beam_decode_cached(
        model, variables, lfr[..., None], lfr_valid, beam_size=2,
        max_len=8)
    np.testing.assert_array_equal(np.asarray(want_ids), got_ids)
    np.testing.assert_array_equal(np.asarray(want_lens), got_lens)


def test_serving_without_lm(setup, tmp_path):
    dl, pipe = setup
    am_only = Pipeline(pipe.am_model, pipe.am_variables,
                       acoustic_vocab=pipe.av)
    path = str(tmp_path / "am_only.asrx")
    meta = export_pipeline(am_only, path, batch_sizes=(2,), buckets=(128,))
    assert not meta["has_lm"] and meta["language_vocab"] is None
    served = ServingPipeline.load(path)
    batch = next(dl.am_batches(4, shuffle=False))
    got = served.recognize_batch(batch.signals[:2], batch.signal_lengths[:2])
    want = am_only.recognize_batch(batch.signals[:2],
                                   batch.signal_lengths[:2], 128)
    np.testing.assert_array_equal(np.asarray(want[0]), got[0])
    assert got[2] is None
