import jax
import numpy as np

from asr_dfcnn_transformer_tpu.audio import noise


def test_color_noise_stats():
    key = jax.random.PRNGKey(0)
    for alpha in [-1.0, 0.0, 1.0]:
        n = np.asarray(noise.color_noise(key, 4096, alpha))
        assert n.shape == (4096,)
        assert abs(n.mean()) < 1e-4        # de-meaned
        assert abs(n.max() - 1.0) < 1e-4   # max-normalized


def test_color_noise_spectrum_tilt():
    """alpha<0 concentrates energy at low freq, alpha>0 at high freq."""
    key = jax.random.PRNGKey(1)
    def hf_ratio(alpha):
        n = np.asarray(noise.color_noise(key, 8192, alpha))
        spec = np.abs(np.fft.rfft(n)) ** 2
        half = len(spec) // 2
        return spec[half:].sum() / spec.sum()
    # analytic: power ~ k^(2*alpha); for alpha=1 the top-half energy share is
    # 1 - (1/2)^3 = 0.875
    assert hf_ratio(-1.0) < 0.1
    assert hf_ratio(1.0) > 0.8


def test_snr_gain():
    rng = np.random.default_rng(0)
    sig = rng.standard_normal(1000).astype(np.float32)
    nse = rng.standard_normal(1000).astype(np.float32)
    k = float(noise.snr_to_gain(sig, nse, 10.0))
    es = np.mean(sig ** 2)
    en = np.mean((k * nse) ** 2)
    snr_db = 10 * np.log10(es / en)
    assert abs(snr_db - 10.0) < 0.1


def test_add_noise_batch_snr_in_range():
    key = jax.random.PRNGKey(2)
    rng = np.random.default_rng(3)
    sig = rng.standard_normal((4, 2048)).astype(np.float32) * 0.1
    lengths = np.array([2048, 2048, 1500, 1000])
    mixed = np.asarray(noise.add_noise_batch(key, sig, lengths))
    assert mixed.shape == sig.shape
    # mixture differs from clean, padding stays zero
    assert np.abs(mixed - sig).max() > 0
    assert np.all(mixed[3, 1000:] == 0)
    # realized SNR within the drawn range (5..10 dB) up to tolerance
    for i in range(2):
        noise_part = mixed[i] - sig[i]
        snr = 10 * np.log10(np.mean(sig[i] ** 2) / np.mean(noise_part ** 2))
        assert 4.0 < snr < 11.0
