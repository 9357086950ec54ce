"""Low-frame-rate feature stacking.

TPU-native (gather-based, static-shape) equivalent of the reference's
``build_LFR_features`` Python loop (``util/utils.py:7-31``): stack ``m``
consecutive frames every ``n`` frames; the tail is padded by repeating the
last frame. With the defaults m=4, n=3 a [T, D] feature matrix becomes
[ceil(T/3), 4*D] at one third the frame rate.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def lfr_length(t: int, n: int = 3) -> int:
    return int(np.ceil(t / n))


def build_lfr_features(feat: jnp.ndarray, m: int = 4, n: int = 3) -> jnp.ndarray:
    """[T, D] -> [ceil(T/n), m*D].

    Index arithmetic replaces the reference's per-frame Python loop: output
    row i gathers input rows ``clip(i*n + j, max=T-1)`` for j in [0, m) —
    the clip reproduces the repeat-last-frame tail padding
    (utils.py:26-30).
    """
    t = feat.shape[0]
    t_lfr = lfr_length(t, n)
    idx = n * np.arange(t_lfr)[:, None] + np.arange(m)[None, :]  # [T_lfr, m]
    idx = np.minimum(idx, t - 1)
    return feat[idx].reshape(t_lfr, m * feat.shape[1])


def batched_lfr(feat: jnp.ndarray, valid: jnp.ndarray, m: int = 4, n: int = 3):
    """[B, T, D] + [B] valid frames -> ([B, ceil(T/n), m*D], [B] valid LFR rows).

    Matches per-utterance :func:`build_lfr_features` on every VALID row:
    the repeat-last-frame tail padding (utils.py:26-30) clips each
    utterance's gather indices to ITS OWN last valid frame (``valid-1``),
    not the padded buffer edge — the reference stacks LFR before batch
    assembly, so a stack window crossing the utterance end repeats the
    last real frame rather than reading the batch's zero padding.
    Valid-row count is ceil(valid/n); rows past it are zero-masked so
    padded regions stay zero (the reference pads batches with zeros).
    """
    b, t, d = feat.shape
    t_lfr = lfr_length(t, n)
    idx = n * jnp.arange(t_lfr)[:, None] + jnp.arange(m)[None, :]  # [T_lfr, m]
    last = jnp.maximum(valid.astype(jnp.int32) - 1, 0)             # [B]
    idx = jnp.minimum(idx[None], last[:, None, None])              # [B, T_lfr, m]
    out = jnp.take_along_axis(feat, idx.reshape(b, t_lfr * m)[:, :, None],
                              axis=1).reshape(b, t_lfr, m * d)
    valid_lfr = jnp.ceil(valid / n).astype(jnp.int32)
    mask = (jnp.arange(t_lfr)[None, :, None] < valid_lfr[:, None, None])
    return out * mask.astype(out.dtype), valid_lfr
