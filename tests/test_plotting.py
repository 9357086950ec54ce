"""Plot helpers (utils/plotting.py) — parity with wav_util.py:115-148."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

from asr_dfcnn_transformer_tpu.utils import plotting


@pytest.fixture
def sine():
    t = np.arange(1600) / 16000.0
    return (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)


def test_wav_show_axes(sine):
    ax = plotting.wav_show(sine, 16000)
    (line,) = ax.get_lines()
    x, y = line.get_data()
    # time axis in seconds, amplitude passthrough (wav_util.py:116)
    assert x[0] == 0.0 and np.isclose(x[-1], (len(sine) - 1) / 16000.0)
    np.testing.assert_allclose(y, sine, rtol=1e-6)
    matplotlib.pyplot.close(ax.figure)


def test_plot_time_and_freq(sine, tmp_path):
    fig = plotting.plot_time(sine, 16000)
    assert fig.axes[0].get_xlabel() == "Time(s)"
    plotting.save_figure(fig, str(tmp_path / "time.png"))

    fig = plotting.plot_freq(sine, 16000, fft_size=512)
    ax = fig.axes[0]
    x, y = ax.get_lines()[0].get_data()
    assert len(x) == 257 and x[-1] == 8000.0          # rfft bins to Nyquist
    # a 440 Hz tone peaks in the bin nearest 440 Hz (wav_util.py:131-133)
    assert abs(x[np.argmax(y)] - 440.0) < 16000.0 / 512
    out = plotting.save_figure(fig, str(tmp_path / "freq.png"))
    assert (tmp_path / "freq.png").stat().st_size > 0 and out.endswith(".png")


def test_plot_spectrogram_accepts_jax_features(sine, tmp_path):
    jnp = pytest.importorskip("jax.numpy")
    from asr_dfcnn_transformer_tpu.audio import fbank as fb

    feats = fb.logfbank(jnp.asarray(np.tile(sine, 20)))   # [T, 200]
    fig = plotting.plot_spectrogram(feats, note="Filterbank")
    assert fig.axes[0].get_ylabel() == "Filterbank"
    plotting.save_figure(fig, str(tmp_path / "spec.png"))

    with pytest.raises(ValueError):
        plotting.plot_spectrogram(np.zeros((3, 4, 5)))
