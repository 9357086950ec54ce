import numpy as np
import pytest

from asr_dfcnn_transformer_tpu.audio import fbank as jfbank
from asr_dfcnn_transformer_tpu.audio import lfr as jlfr
from tests import golden


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1337 * t)
           + 0.05 * rng.standard_normal(t.shape))
    return sig.astype(np.float32)


def test_num_frames():
    assert jfbank.num_frames(400) == 1
    assert jfbank.num_frames(300) == 1
    assert jfbank.num_frames(401) == 2
    assert jfbank.num_frames(16000) == 1 + int(np.ceil((16000 - 400) / 160))


def test_mel_filterbank_matches_golden():
    cfg = jfbank.FbankConfig()
    ours = jfbank.mel_filterbank(cfg)
    theirs = golden.get_filterbanks(200, 512, 16000).T
    np.testing.assert_allclose(ours, theirs.astype(np.float32), atol=1e-6)


def test_logfbank_matches_psf_golden(signal):
    ours = np.asarray(jfbank.logfbank(signal))
    theirs = golden.logfbank_np(signal)
    assert ours.shape == theirs.shape == (jfbank.num_frames(len(signal)), 200)
    # float32 vs float64; empty mel filters hit the eps clamp identically
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=5e-3)


def test_full_frontend_matches_golden(signal):
    ours = np.asarray(jfbank.compute_fbank_from_signal(signal))
    theirs = golden.compute_fbank_from_api_np(signal)
    # near-constant (empty mel filter) bins are pure rounding noise amplified
    # by a ~0 std in both implementations — compare only informative bins
    lf = golden.logfbank_np(signal)
    informative = lf.std(axis=0) > 1e-6
    np.testing.assert_allclose(ours[:, informative], theirs[:, informative],
                               rtol=1e-2, atol=5e-3)
    # standardized: per-bin mean ~0
    assert np.abs(ours.mean(axis=0)).max() < 1e-3


def test_batched_fbank_matches_single(signal):
    sig2 = signal[:9000]
    max_len = len(signal)
    batch = np.zeros((2, max_len), np.float32)
    batch[0] = signal
    batch[1, : len(sig2)] = sig2
    lengths = np.array([len(signal), len(sig2)])
    feats, valid = jfbank.batched_fbank(batch, lengths)
    f0 = np.asarray(jfbank.compute_fbank_from_signal(signal))
    f1 = np.asarray(jfbank.compute_fbank_from_signal(sig2))
    assert int(valid[0]) == f0.shape[0]
    assert int(valid[1]) == f1.shape[0]
    np.testing.assert_allclose(np.asarray(feats[0])[: f0.shape[0]], f0,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(feats[1])[: f1.shape[0]], f1,
                               rtol=1e-4, atol=1e-4)
    # padded region zeroed
    assert np.all(np.asarray(feats[1])[f1.shape[0]:] == 0)


def test_batched_fbank_out_frames(signal):
    batch = signal[None, :]
    feats, valid = jfbank.batched_fbank(batch, np.array([len(signal)]),
                                        out_frames=1600)
    assert feats.shape == (1, 1600, 200)
    assert np.all(np.asarray(feats[0])[int(valid[0]):] == 0)


def test_log_spectrogram_shape(signal):
    out = np.asarray(jfbank.log_spectrogram(signal))
    n = (len(signal) * 1000 // 16000 - 25) // 10 + 1
    assert out.shape == (n, 200)
    assert np.abs(out.mean(axis=0)).max() < 1e-3


def test_lfr_matches_golden():
    rng = np.random.default_rng(1)
    for t in [5, 6, 7, 12, 100]:
        x = rng.standard_normal((t, 8)).astype(np.float32)
        ours = np.asarray(jlfr.build_lfr_features(x, 4, 3))
        theirs = golden.build_lfr_np(x, 4, 3)
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_batched_lfr_matches_single():
    rng = np.random.default_rng(2)
    t_pad = 30
    x = np.zeros((2, t_pad, 8), np.float32)
    a = rng.standard_normal((30, 8)).astype(np.float32)
    b = rng.standard_normal((17, 8)).astype(np.float32)
    x[0] = a
    x[1, :17] = b
    out, valid = jlfr.batched_lfr(x, np.array([30, 17]))
    ga = golden.build_lfr_np(a, 4, 3)
    assert int(valid[0]) == ga.shape[0]
    np.testing.assert_allclose(np.asarray(out[0]), ga, atol=1e-6)
    # item 1: EVERY valid row must match single-utterance LFR on the
    # unpadded input — including rows whose stack window crosses the
    # utterance end (the reference repeats the last REAL frame there,
    # utils.py:26-30; gathering the batch's zero padding instead broke
    # parity for the final LFR row of nearly every utterance)
    gb = golden.build_lfr_np(b, 4, 3)
    assert int(valid[1]) == gb.shape[0]
    np.testing.assert_allclose(np.asarray(out[1])[: gb.shape[0]], gb,
                               atol=1e-6)
    # rows past the valid count stay zero
    assert np.all(np.asarray(out[1])[gb.shape[0]:] == 0.0)


def test_log_spectrogram_short_signal_one_frame():
    """Signals under one 25 ms window must produce one padded frame, not
    an empty [0, D] matrix (matches log_spectrogram_asrt's guard)."""
    import numpy as np

    from asr_dfcnn_transformer_tpu.audio.fbank import (log_spectrogram,
                                                       log_spectrogram_asrt)
    sig = np.random.RandomState(0).randn(320).astype(np.float32)
    out = log_spectrogram(sig)
    assert out.shape == (1, 200) and np.isfinite(np.asarray(out)).all()
    out2 = log_spectrogram_asrt(sig)
    assert out2.shape == (1, 200)
