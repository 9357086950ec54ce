"""Pure-numpy golden reference implementations used only by tests.

``python_speech_features`` / ``sklearn.preprocessing.scale`` semantics
(the reference's feature path, wav_util.py:22-31) re-derived in float64
numpy, following the published algorithm definitions. The JAX front-end is
validated against these.
"""

from __future__ import annotations

import math

import numpy as np


def hz2mel(hz):
    return 2595 * np.log10(1 + np.asarray(hz, dtype=np.float64) / 700.0)


def mel2hz(mel):
    return 700 * (10 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1)


def get_filterbanks(nfilt, nfft, samplerate, lowfreq=0, highfreq=None):
    highfreq = highfreq or samplerate / 2
    melpoints = np.linspace(hz2mel(lowfreq), hz2mel(highfreq), nfilt + 2)
    bins = np.floor((nfft + 1) * mel2hz(melpoints) / samplerate).astype(int)
    fbank = np.zeros([nfilt, nfft // 2 + 1])
    for j in range(nfilt):
        for i in range(bins[j], bins[j + 1]):
            fbank[j, i] = (i - bins[j]) / (bins[j + 1] - bins[j])
        for i in range(bins[j + 1], bins[j + 2]):
            fbank[j, i] = (bins[j + 2] - i) / (bins[j + 2] - bins[j + 1])
    return fbank


def framesig(sig, frame_len, frame_step):
    slen = len(sig)
    if slen <= frame_len:
        numframes = 1
    else:
        numframes = 1 + int(math.ceil((1.0 * slen - frame_len) / frame_step))
    padlen = int((numframes - 1) * frame_step + frame_len)
    padded = np.concatenate([sig, np.zeros(padlen - slen)])
    indices = (np.tile(np.arange(0, frame_len), (numframes, 1))
               + np.tile(np.arange(0, numframes * frame_step, frame_step),
                         (frame_len, 1)).T)
    return padded[indices.astype(np.int32)]


def logfbank_np(signal, samplerate=16000, winlen=0.025, winstep=0.01,
                nfilt=200, nfft=512, preemph=0.97):
    signal = np.asarray(signal, dtype=np.float64)
    signal = np.append(signal[0], signal[1:] - preemph * signal[:-1])
    frames = framesig(signal, int(winlen * samplerate), int(winstep * samplerate))
    pspec = 1.0 / nfft * np.square(np.abs(np.fft.rfft(frames, nfft)))
    fb = get_filterbanks(nfilt, nfft, samplerate)
    feat = np.dot(pspec, fb.T)
    feat = np.where(feat == 0, np.finfo(np.float64).eps, feat)
    return np.log(feat)


def scale_np(x):
    """sklearn.preprocessing.scale: per-column standardize, ddof=0, std0->1,
    with sklearn's post-scale re-centering pass."""
    x = np.asarray(x, dtype=np.float64)
    mean = x.mean(axis=0)
    std = x.std(axis=0)
    std = np.where(std == 0, 1.0, std)
    out = (x - mean) / std
    return out - out.mean(axis=0)


def compute_fbank_from_api_np(signal, samplerate=16000, nfilt=200):
    """Golden for wav_util.py:22-31."""
    return scale_np(logfbank_np(signal, samplerate, nfilt=nfilt))


def build_lfr_np(inputs, m, n):
    """Golden for util/utils.py:7-31 (faithful loop transcription of the
    documented stack-m/skip-n algorithm with repeat-last-frame padding)."""
    out = []
    t = inputs.shape[0]
    for i in range(int(np.ceil(t / n))):
        if m <= t - i * n:
            out.append(inputs[i * n:i * n + m].reshape(-1))
        else:
            frame = inputs[i * n:].reshape(-1)
            pad = np.tile(inputs[-1], m - (t - i * n))
            out.append(np.concatenate([frame, pad]))
    return np.stack(out)


def edit_distance_np(a, b):
    """Plain Levenshtein distance (golden for GetEditDistance semantics,
    util/utils.py:43-53 — difflib opcode costs equal Levenshtein with
    substitution cost max(len_i, len_j) per replace block; on token lists
    this equals classic DP distance)."""
    la, lb = len(a), len(b)
    dp = np.zeros((la + 1, lb + 1), dtype=np.int32)
    dp[:, 0] = np.arange(la + 1)
    dp[0, :] = np.arange(lb + 1)
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            dp[i, j] = min(dp[i - 1, j] + 1, dp[i, j - 1] + 1,
                           dp[i - 1, j - 1] + cost)
    return int(dp[la, lb])


def ctc_loss_np(log_probs, labels, blank):
    """Textbook log-space CTC forward algorithm. log_probs [T, V] (already
    log-softmaxed), labels: list of ints (no blanks). Returns -log p(labels).
    """
    t_len, _ = log_probs.shape
    ext = []
    for l in labels:
        ext += [blank, l]
    ext.append(blank)
    s = len(ext)
    neg_inf = -1e30
    alpha = np.full((s,), neg_inf)
    alpha[0] = log_probs[0, ext[0]]
    if s > 1:
        alpha[1] = log_probs[0, ext[1]]

    def logsumexp(vals):
        m = max(vals)
        if m <= neg_inf / 2:
            return neg_inf
        return m + math.log(sum(math.exp(v - m) for v in vals))

    for t in range(1, t_len):
        new = np.full((s,), neg_inf)
        for i in range(s):
            cands = [alpha[i]]
            if i > 0:
                cands.append(alpha[i - 1])
            if i > 1 and ext[i] != blank and ext[i] != ext[i - 2]:
                cands.append(alpha[i - 2])
            new[i] = logsumexp(cands) + log_probs[t, ext[i]]
        alpha = new
    return -logsumexp([alpha[s - 1], alpha[s - 2]] if s > 1 else [alpha[s - 1]])
