"""JAX log-filterbank front-end.

Reimplements, as a jit/vmap-friendly XLA program, the feature extractor the
reference training/eval loaders actually use
(``util/wav_util.py:22-31``): ``python_speech_features.logfbank(signal, sr,
nfilt=200)`` followed by per-utterance ``sklearn.preprocessing.scale``
(per-bin mean/std normalization over time). Algorithmic parity notes:

- pre-emphasis 0.97 applied as ``[x0, x1-0.97*x0, ...]``,
- framing 25 ms window (400 samples @16 kHz) / 10 ms hop (160 samples),
  rectangular window (python_speech_features' default ``winfunc=ones``),
  zero-padding the tail so ``numframes = 1 + ceil((S-400)/160)``,
- power spectrum ``|rfft(frame, 512)|^2 / 512``,
- triangular mel filterbank with integer FFT-bin breakpoints
  (``floor((nfft+1) * hz / sr)``), nfilt=200 over 257 bins — with 200 filters
  some are empty; empty outputs are clamped to eps before the log, exactly as
  python_speech_features does,
- ``log`` then per-utterance, per-bin standardization (ddof=0, std==0 -> 1).

Also provides the reference's hand-rolled raw log-spectrogram path
(``util/wav_util.py:49-79``): Hamming 400-pt window, |FFT|[0:200],
``log(x+1)``, same standardization.

Everything below is static-shape: batched entry points take a padded signal
array plus true sample lengths and mask the normalization statistics, which
reproduces the reference's per-utterance behavior without dynamic shapes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16000
    win_len: int = 400      # 25 ms @ 16 kHz
    hop: int = 160          # 10 ms @ 16 kHz
    nfft: int = 512
    nfilt: int = 200
    preemph: float = 0.97
    low_freq: float = 0.0
    high_freq: float | None = None  # None -> sample_rate / 2
    # Compute |rfft|^2 as two real matmuls against precomputed DFT bases
    # instead of an FFT op: mathematically identical, but the matmuls ride
    # the MXU — ~7x faster than XLA's TPU FFT at these sizes (512-pt over
    # 51k frames). Set False to use jnp.fft.rfft.
    use_dft_matmul: bool = True
    # "pallas": run framing+DFT+mel+log as one fused VMEM kernel
    # (ops/pallas/fbank_kernel.py) — no frame-expansion HBM traffic.
    # "xla": plain jnp pipeline. Pallas path requires win 400 / hop 160.
    # "auto" (default): pick the faster backend per batch/platform — the
    # kernel below batch 64 on TPU, XLA elsewhere (measured crossover,
    # see batched_fbank and DESIGN.md §3).
    backend: str = "auto"


def num_frames(num_samples: int, cfg: FbankConfig = FbankConfig()) -> int:
    """python_speech_features framing count: 1 + ceil((S - win) / hop)."""
    if num_samples <= cfg.win_len:
        return 1
    return 1 + int(np.ceil((num_samples - cfg.win_len) / cfg.hop))


def _hz2mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz) / 700.0)


def _mel2hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def _mel_filterbank_np(sample_rate: int, nfft: int, nfilt: int,
                       low_freq: float, high_freq: float) -> np.ndarray:
    """Triangular mel bank with integer-bin breakpoints, shape [nfft//2+1, nfilt].

    Matches python_speech_features.get_filterbanks (transposed for a
    bins-first matmul: ``pspec @ bank``).
    """
    low_mel, high_mel = _hz2mel(low_freq), _hz2mel(high_freq)
    mel_points = np.linspace(low_mel, high_mel, nfilt + 2)
    bins = np.floor((nfft + 1) * _mel2hz(mel_points) / sample_rate).astype(np.int64)
    bank = np.zeros((nfilt, nfft // 2 + 1), dtype=np.float64)
    for j in range(nfilt):
        for i in range(bins[j], bins[j + 1]):
            bank[j, i] = (i - bins[j]) / (bins[j + 1] - bins[j])
        for i in range(bins[j + 1], bins[j + 2]):
            bank[j, i] = (bins[j + 2] - i) / (bins[j + 2] - bins[j + 1])
    return bank.T.astype(np.float32)


def mel_filterbank(cfg: FbankConfig = FbankConfig()) -> np.ndarray:
    high = cfg.high_freq if cfg.high_freq is not None else cfg.sample_rate / 2
    return _mel_filterbank_np(cfg.sample_rate, cfg.nfft, cfg.nfilt, cfg.low_freq, high)


def _preemphasis(signal: jnp.ndarray, coeff: float) -> jnp.ndarray:
    return jnp.concatenate([signal[:1], signal[1:] - coeff * signal[:-1]])


def _frame(signal: jnp.ndarray, n_frames: int, cfg: FbankConfig) -> jnp.ndarray:
    """[S] -> [n_frames, win_len] with zero tail padding (static shapes)."""
    pad_len = (n_frames - 1) * cfg.hop + cfg.win_len
    sig = jnp.zeros((pad_len,), signal.dtype).at[: signal.shape[0]].set(signal)
    idx = (np.arange(cfg.win_len)[None, :]
           + cfg.hop * np.arange(n_frames)[:, None])  # static index matrix
    return sig[idx]


@functools.lru_cache(maxsize=8)
def _dft_bases_np(win_len: int, nfft: int):
    """Real/imag DFT bases [win_len, nfft//2+1] such that
    frames @ C + i * frames @ S == rfft(frames, nfft) for frames of
    length win_len (the implicit zero padding costs nothing here)."""
    n = np.arange(win_len)[:, None]
    k = np.arange(nfft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * n * k / nfft
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def _power_spectrum(frames: jnp.ndarray, cfg: FbankConfig) -> jnp.ndarray:
    if cfg.use_dft_matmul:
        cos_b, sin_b = _dft_bases_np(cfg.win_len, cfg.nfft)
        re = frames @ jnp.asarray(cos_b)
        im = frames @ jnp.asarray(sin_b)
        return (re * re + im * im) / cfg.nfft
    spec = jnp.fft.rfft(frames, n=cfg.nfft, axis=-1)
    return (spec.real ** 2 + spec.imag ** 2) / cfg.nfft


def logfbank(signal: jnp.ndarray, cfg: FbankConfig = FbankConfig()) -> jnp.ndarray:
    """[S] float signal -> [T, nfilt] log mel-filterbank energies.

    Parity with ``python_speech_features.logfbank`` (wav_util.py:29).
    """
    n = num_frames(signal.shape[0], cfg)
    sig = _preemphasis(signal.astype(jnp.float32), cfg.preemph)
    frames = _frame(sig, n, cfg)
    pspec = _power_spectrum(frames, cfg)
    feat = pspec @ jnp.asarray(mel_filterbank(cfg))
    eps = np.finfo(np.float64).eps
    return jnp.log(jnp.maximum(feat, eps))


def cmvn(feat: jnp.ndarray, valid_frames: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-utterance, per-bin standardization (sklearn.preprocessing.scale,
    wav_util.py:30): zero mean, unit std (ddof=0), std==0 -> 1.

    ``valid_frames``: optional scalar count; statistics are computed over
    ``feat[:valid_frames]`` only and padded rows are zeroed, so a padded batch
    reproduces the reference's per-utterance normalization exactly.
    """
    t = feat.shape[0]
    if valid_frames is None:
        mask = jnp.ones((t, 1), feat.dtype)
        count = jnp.asarray(t, feat.dtype)
    else:
        mask = (jnp.arange(t)[:, None] < valid_frames).astype(feat.dtype)
        count = jnp.maximum(valid_frames.astype(feat.dtype), 1.0)
    mean = jnp.sum(feat * mask, axis=0, keepdims=True) / count
    var = jnp.sum(((feat - mean) ** 2) * mask, axis=0, keepdims=True) / count
    std = jnp.sqrt(var)
    std = jnp.where(std == 0.0, 1.0, std)
    out = (feat - mean) / std
    # sklearn.scale re-centers after scaling so near-constant columns (empty
    # mel filters) don't end up with a large spurious mean from float
    # round-off amplified by a ~0 std.
    mean2 = jnp.sum(out * mask, axis=0, keepdims=True) / count
    return (out - mean2) * mask


def compute_fbank_from_signal(signal: jnp.ndarray,
                              cfg: FbankConfig = FbankConfig()) -> jnp.ndarray:
    """Single-utterance feature: logfbank + scale (wav_util.py:22-31)."""
    return cmvn(logfbank(signal, cfg))


@functools.partial(jax.jit, static_argnames=("cfg", "out_frames"))
def batched_fbank(signals: jnp.ndarray, lengths: jnp.ndarray,
                  cfg: FbankConfig = FbankConfig(),
                  out_frames: int | None = None):
    """Batched front-end: [B, S] padded signals + [B] sample lengths ->
    ([B, T, nfilt] normalized features, [B] valid frame counts).

    T = num_frames(S) (or ``out_frames`` if given, >= num_frames(S)); rows
    beyond an utterance's valid frame count are zero — identical to the
    reference's zero-padded batch assembly (data_loader.py:146).
    """
    n = num_frames(signals.shape[1], cfg)
    t_out = out_frames if out_frames is not None else n

    # valid frames per utterance, replicating num_frames() elementwise
    valid = jnp.where(
        lengths <= cfg.win_len, 1,
        1 + jnp.ceil((lengths - cfg.win_len) / cfg.hop).astype(jnp.int32))

    backend = cfg.backend
    if backend == "auto":
        # Both paths are f32-FLOP-bound at large batch where they measure
        # within ~25% of each other (b128: XLA 4.2 vs Pallas 5.6 ms); at
        # small batch the kernel's fused DMA pipeline wins big (b32: 0.64
        # vs 2.1 ms; b1 dominates single-utterance latency). Slope-timed
        # on v5e — see DESIGN.md §3/§9.
        backend = ("pallas" if (cfg.win_len, cfg.hop) == (400, 160)
                   and signals.shape[0] < 64
                   and jax.devices()[0].platform == "tpu" else "xla")
    if backend == "pallas":
        from asr_dfcnn_transformer_tpu.ops.pallas.fbank_kernel import (
            pallas_cmvn,
            pallas_log_mel,
        )

        interpret = jax.devices()[0].platform != "tpu"
        # compute over ALL valid frames so the CMVN statistics match the
        # per-utterance path even when t_out truncates, then slice/pad
        # (pre-emphasis + the boundary mask run inside the kernel)
        feat = pallas_log_mel(signals.astype(jnp.float32), lengths,
                              max(t_out, n), cfg=cfg, interpret=interpret)
        feats = pallas_cmvn(feat, valid, interpret=interpret)
        if t_out <= feat.shape[1]:
            feats = feats[:, :t_out]
        valid_c = jnp.minimum(valid, t_out)
        # re-zero rows past the clamp (cmvn already zeroed rows past valid)
        feats = feats * (jnp.arange(t_out)[None, :, None]
                         < valid_c[:, None, None])
        return feats, valid_c

    def one(sig, slen, nvalid):
        # mask AFTER pre-emphasis: kills the -coeff*x[len-1] spike that the
        # padded batch would otherwise place just past the signal end,
        # preserving exact parity with per-utterance extraction
        pre = _preemphasis(sig.astype(jnp.float32), cfg.preemph)
        pre = pre * (jnp.arange(sig.shape[0]) < slen).astype(pre.dtype)
        frames = _frame(pre, n, cfg)
        pspec = _power_spectrum(frames, cfg)
        feat = pspec @ jnp.asarray(mel_filterbank(cfg))
        feat = jnp.log(jnp.maximum(feat, np.finfo(np.float64).eps))
        feat = cmvn(feat, nvalid)
        if t_out > n:
            feat = jnp.zeros((t_out, cfg.nfilt), feat.dtype).at[:n].set(feat)
        else:
            feat = feat[:t_out]
        return feat

    feats = jax.vmap(one)(signals, lengths, valid)
    return feats, jnp.minimum(valid, t_out)


def log_spectrogram(signal: jnp.ndarray, feature_dim: int = 200) -> jnp.ndarray:
    """Reference's hand-rolled spectrogram path (wav_util.py:49-79):
    pre-emphasis, 400-pt Hamming window, hop 160, |FFT(400)|[:feature_dim],
    log(x+1), standardize. Note: the reference computes the frame count from
    the *pre-emphasized* length but windows the RAW signal — reproduced here.
    """
    x = np.arange(400)
    ham = jnp.asarray(0.54 - 0.46 * np.cos(2 * np.pi * x / 399), jnp.float32)
    # max(1, .): signals under ~25 ms would otherwise produce an EMPTY
    # [0, D] feature matrix (the reference's formula does the same
    # degenerate thing; the guard matches log_spectrogram_asrt below and
    # every other framing helper — PARITY.md)
    n = max(1, (signal.shape[0] * 1000 // 16000 - 25) // 10 + 1)
    raw = signal.astype(jnp.float32)
    pad_len = (n - 1) * 160 + 400
    sig = jnp.zeros((max(pad_len, raw.shape[0]),), jnp.float32).at[: raw.shape[0]].set(raw)
    idx = np.arange(400)[None, :] + 160 * np.arange(n)[:, None]
    frames = sig[idx] * ham
    spec = jnp.abs(jnp.fft.fft(frames, axis=-1))[:, :feature_dim]
    return cmvn(jnp.log(spec + 1.0))


def log_spectrogram_asrt(signal: jnp.ndarray,
                         feature_dim: int = 200) -> jnp.ndarray:
    """The reference's third extractor variant (wav_util.py:82-112):
    same Hamming spectrogram but |FFT| divided by the signal length and NO
    per-utterance standardization; frame count uses floor (no +1)."""
    x = np.arange(400)
    ham = jnp.asarray(0.54 - 0.46 * np.cos(2 * np.pi * x / 399), jnp.float32)
    n = max(1, (signal.shape[0] * 1000 // 16000 - 25) // 10)
    raw = signal.astype(jnp.float32)
    pad_len = (n - 1) * 160 + 400
    sig = jnp.zeros((max(pad_len, raw.shape[0]),), jnp.float32
                    ).at[: raw.shape[0]].set(raw)
    idx = np.arange(400)[None, :] + 160 * np.arange(n)[:, None]
    frames = sig[idx] * ham
    spec = jnp.abs(jnp.fft.fft(frames, axis=-1))[:, :feature_dim]
    return jnp.log(spec / signal.shape[0] + 1.0)
