"""Device-side colored-noise augmentation.

The reference synthesizes 1/f^alpha colored noise on the host with numpy FFTs
and writes an entire augmented corpus to disk offline
(``util/noise.py:17-128``, ``util/noise_util.py:23-49``). Here the same
transform is a jittable per-batch JAX function, so augmentation runs on-TPU
inside the input pipeline — no offline corpus, no disk round-trip.

Semantics mirrored:
- ``color_noise`` (noise.py:17-34): shape white Gaussian noise in the
  frequency domain by ``k^alpha`` (alpha in [-1, 1]; 0=white, <0 red, >0
  blue), hermitian-symmetrize, inverse FFT, de-mean, normalize by max.
- ``SNR2K`` (noise.py:48-52): gain ``sqrt(Es/En) * 10^(-dB/20)``, with the
  SNR drawn uniformly from {5..10} dB and alpha from {-1.0,-0.9,...,1.0}
  when randomized (noise.py:96-100 uses randint granularity 0.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _use_matfft() -> bool:
    return jax.default_backend() == "tpu"


def color_noise(key: jax.Array, length: int, alpha: jnp.ndarray) -> jnp.ndarray:
    """One colored-noise realization of ``length`` samples.

    alpha may be a traced scalar. Normalization matches noise.py:30-31:
    subtract mean, divide by max (signed max, as in the reference).

    The FFT runs at the next power of two >= length and the result is
    truncated: XLA's TPU FFT falls back to a dense [N, N] DFT matmul for
    large prime factors — at typical utterance lengths (e.g. 256240 =
    2^4*5*3203) that is a >100 TB allocation. Power-of-two lengths keep it
    a real FFT; the spectral shape is unchanged.

    On TPU the inverse transform itself runs as MXU matmuls
    (``ops/matfft.py:irfft_matmul``): XLA's own TPU FFT executes at
    ~280 GFLOP/s and was 10.9 of the 13.3 ms noise-stage cost at batch
    128 (DESIGN.md §9, round 4); the two-stage Cooley-Tukey matmul form
    agrees with ``numpy.fft.irfft`` to ~1e-6 relative and runs on the
    systolic array instead.
    """
    n_fft = 1 << max(int(np.ceil(np.log2(max(length, 2)))), 1)
    nbins = n_fft // 2 + 1
    # Sample the white spectrum directly: rfft of real white Gaussian noise
    # is complex Gaussian (hermitian half-spectrum), so drawing re/im parts
    # skips the forward FFT entirely — one irfft instead of rfft+irfft,
    # ~2x cheaper on the TPU FFT path, statistically identical.
    kr, ki = jax.random.split(key)
    re = jax.random.normal(kr, (nbins,), jnp.float32)
    im = jax.random.normal(ki, (nbins,), jnp.float32)
    # Reference shapes bin i (0-based) by (i+1)**alpha over the half spectrum.
    k = jnp.arange(1, nbins + 1, dtype=jnp.float32)
    shape_k = k ** alpha
    if _use_matfft() and n_fft >= 8:   # matfft's two-stage split needs n>=8
        from asr_dfcnn_transformer_tpu.ops.matfft import irfft_matmul
        # bf16 operands: half the HBM traffic, native MXU rate; the
        # spectral error (~1e-2 relative) is invisible under the random
        # draw + 5-10 dB SNR mix (see matfft docstring)
        noise = irfft_matmul(re * shape_k, im * shape_k, n_fft,
                             compute_dtype=jnp.bfloat16)[:length]
    else:
        shaped = jax.lax.complex(re * shape_k, im * shape_k)
        noise = jnp.fft.irfft(shaped, n=n_fft)[:length]
    noise = noise - jnp.mean(noise)
    noise = noise / jnp.max(noise)
    return noise.astype(jnp.float32)


def snr_to_gain(signal: jnp.ndarray, noise: jnp.ndarray, snr_db: jnp.ndarray,
                signal_len: jnp.ndarray | None = None) -> jnp.ndarray:
    """Noise gain K st. mixing signal + K*noise hits ``snr_db`` (noise.py:48-52).

    With ``signal_len`` given, signal energy is averaged over the valid
    prefix only (padded batches).
    """
    if signal_len is None:
        es = jnp.mean(signal * signal)
    else:
        n = signal.shape[-1]
        mask = (jnp.arange(n) < signal_len).astype(signal.dtype)
        es = jnp.sum(signal * signal * mask) / jnp.maximum(signal_len, 1)
    en = jnp.mean(noise * noise)
    return jnp.sqrt(es / jnp.maximum(en, 1e-12)) * (10.0 ** (-snr_db / 20.0))


def add_noise_batch(key: jax.Array, signals: jnp.ndarray,
                    lengths: jnp.ndarray | None = None,
                    snr_db_range: tuple = (5, 10),
                    alpha_range: tuple = (-1.0, 1.0)) -> jnp.ndarray:
    """Mix every signal in a [B, S] batch with an independent colored-noise
    realization at a random SNR — the on-device equivalent of
    ``add_noise`` (noise.py:70-128) + the offline corpus pass
    (noise_util.py:23-49).

    SNR is drawn from the integers snr_db_range[0]..snr_db_range[1]
    (noise.py:96) and alpha from the 0.1 grid over alpha_range (noise.py:100).
    """
    b, s = signals.shape
    keys = jax.random.split(key, 3)
    snr = jax.random.randint(keys[0], (b,), snr_db_range[0], snr_db_range[1] + 1)
    n_alpha = int(round((alpha_range[1] - alpha_range[0]) / 0.1)) + 1
    alpha = alpha_range[0] + 0.1 * jax.random.randint(keys[1], (b,), 0, n_alpha)

    def one(k, sig, snr_i, alpha_i, len_i):
        noise = color_noise(k, s, alpha_i.astype(jnp.float32))
        gain = snr_to_gain(sig, noise, snr_i.astype(jnp.float32), len_i)
        mixed = sig + gain * noise
        if len_i is not None:
            mixed = mixed * (jnp.arange(s) < len_i).astype(mixed.dtype)
        return mixed.astype(jnp.float32)

    noise_keys = jax.random.split(keys[2], b)
    if lengths is None:
        return jax.vmap(lambda k, x, si, ai: one(k, x, si, ai, None))(
            noise_keys, signals, snr, alpha)
    return jax.vmap(one)(noise_keys, signals, snr, alpha, lengths)
