"""SpecAugment: on-device time/frequency masking of fbank features.

Beyond-reference capability (the reference's only augmentation is the
colored-noise wav corpus, ``util/noise.py`` / ``util/noise_util.py``;
see PARITY.md): SpecAugment (Park et al., 2019, arXiv:1904.08779) is the
standard ASR feature-space augmentation, and unlike the reference's
offline wav-doubling it costs no storage and no host work — the masks
are drawn and applied INSIDE the jitted train step, right after the
device-side fbank, exactly like ``audio/noise.py:add_noise_batch`` is.

Design notes (TPU):
- Fully static shapes: every utterance draws the configured number of
  masks; a "shorter" mask is just a narrower one (width 0 == no-op), so
  the program never branches on data.
- Masks are built from ``broadcasted_iota`` comparisons and applied as
  one fused select over the feature tensor — a single elementwise pass
  XLA fuses into the surrounding program (no gathers, no scatters).
- Time masks are confined to the *valid* frames: both the width bound
  (adaptive ``max_time_frac`` x valid, as in the paper's LibriSpeech
  "adaptive" policy) and the start offset are drawn per utterance from
  its true frame count, so padding rows — which CMVN already zeroed —
  are never counted as "masked".
- ``mask_value=0.0`` is the per-bin mean after the pipeline's
  per-utterance CMVN (``audio/fbank.py:cmvn``), matching the paper's
  mean-value masking.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig:
    """Masking policy. Defaults follow the paper's LD policy scaled to
    this pipeline's geometry (200 mel bins, <=1600 frames)."""

    num_freq_masks: int = 2
    max_freq_width: int = 27          # F: max mel bins per mask
    num_time_masks: int = 2
    max_time_width: int = 100         # T: absolute max frames per mask
    max_time_frac: float = 0.05       # p: adaptive cap, frac of valid len
    mask_value: float = 0.0           # post-CMVN per-bin mean


def _band_mask(starts: jnp.ndarray, widths: jnp.ndarray,
               size: int) -> jnp.ndarray:
    """[B, M] starts/widths -> [B, size] bool: True inside any band."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
    s = starts[:, :, None]
    inside = (pos >= s) & (pos < s + widths[:, :, None])
    return jnp.any(inside, axis=1)


def _rand_bands(key, n_masks: int, max_width, limit) -> tuple:
    """Draw [B, M] (starts, widths) with width <= max_width and the band
    contained in [0, limit) per row. ``max_width``/``limit`` are [B, 1]
    int32 (or scalars broadcast to it)."""
    kw, ks = jax.random.split(key)
    b = limit.shape[0]
    uw = jax.random.uniform(kw, (b, n_masks))
    us = jax.random.uniform(ks, (b, n_masks))
    wmax = jnp.minimum(max_width, limit)
    widths = jnp.floor(uw * (wmax + 1).astype(jnp.float32)).astype(jnp.int32)
    widths = jnp.minimum(widths, wmax)  # guard the u==1.0 edge
    room = jnp.maximum(limit - widths, 0)
    starts = jnp.floor(us * (room + 1).astype(jnp.float32)).astype(jnp.int32)
    starts = jnp.minimum(starts, room)
    return starts, widths


def spec_augment(key: jax.Array, feats: jnp.ndarray,
                 valid_frames: jnp.ndarray | None = None,
                 cfg: SpecAugmentConfig = SpecAugmentConfig()) -> jnp.ndarray:
    """Apply SpecAugment masks to a batch of features.

    Args:
      key: PRNG key.
      feats: [B, T, F] (or [B, T, F, 1] NHWC) float features.
      valid_frames: [B] int true frame counts; None = all T valid.
      cfg: masking policy.

    Returns:
      Masked features, same shape/dtype as ``feats``.
    """
    squeeze = feats.ndim == 4
    x = feats[..., 0] if squeeze else feats
    b, t, f = x.shape
    if valid_frames is None:
        valid = jnp.full((b, 1), t, jnp.int32)
    else:
        valid = valid_frames.astype(jnp.int32).reshape(b, 1)
        valid = jnp.clip(valid, 0, t)

    kf, kt = jax.random.split(key)
    if cfg.num_freq_masks > 0:
        fs, fw = _rand_bands(kf, cfg.num_freq_masks,
                             jnp.full((b, 1), cfg.max_freq_width, jnp.int32),
                             jnp.full((b, 1), f, jnp.int32))
        fmask = _band_mask(fs, fw, f)              # [B, F]
        x = jnp.where(fmask[:, None, :], jnp.asarray(cfg.mask_value,
                                                     x.dtype), x)
    if cfg.num_time_masks > 0:
        tmax = jnp.minimum(
            cfg.max_time_width,
            jnp.floor(cfg.max_time_frac *
                      valid.astype(jnp.float32)).astype(jnp.int32))
        ts, tw = _rand_bands(kt, cfg.num_time_masks, tmax, valid)
        tmask = _band_mask(ts, tw, t)              # [B, T]
        x = jnp.where(tmask[:, :, None], jnp.asarray(cfg.mask_value,
                                                     x.dtype), x)
    return x[..., None] if squeeze else x
