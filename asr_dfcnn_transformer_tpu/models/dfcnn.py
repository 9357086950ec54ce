"""DFCNN acoustic model family (fbank -> pinyin CTC logits).

Three variants mirroring the reference's acoustic models, re-designed as
Flax modules in NHWC bfloat16:

- :class:`DFCNN` — the plain conv stack with an optional NIN stage
  (``lm_and_am/model/acoustic_model.py:37-55``).
- :class:`SEDFCNN` — squeeze-excitation residual stages with average
  pooling, the reference's best model (``acoustic_model2.py:37-62``,
  README "新增SE-NET能达到更好效果"); ``se_first=True`` gives the
  acoustic_model3 ordering (SE applied between the stage's convolutions,
  ``acoustic_model3.py:37-55``).
- :class:`KerasDFCNN` — the Keras ``cnn_ctc`` layout whose shipped .hdf5
  weights the reference loads for inference (``cnn_ctc.py:27-49``):
  3 pooled double-conv cells (32/64/128) + 2 unpooled (128), reshape,
  Dropout(0.3), Dense 128, Dropout, Dense vocab. Use this class for
  weight-import parity with ``model_05.7.64.hdf5`` / ``model_04-14.91.hdf5``.

All emit raw logits [B, T/8, vocab]; the loss applies log_softmax once.
(The reference instead feeds log(softmax+eps) into tf CTC ops that
log_softmax again — acoustic_model2.py:67-68 — a numerical quirk, not a
capability; our decoders operate on any monotone transform so greedy
output is identical.)

Time geometry: [B, 1600, 200, 1] -> three 2x2 pools -> [B, 200, 25, C];
valid logit length = min(200, frames//8 + 1) (data_loader.py:132).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from asr_dfcnn_transformer_tpu.models.layers import (ConvBnCell,
                                                     SqueezeExcite,
                                                     bf16_dot_general)


def _logits_dense(vocab_size: int, logits_matmul: str) -> nn.Dense:
    """The final pinyin-logits projection, shared across the AM family.

    ``logits_matmul``: "f32" (default — full f32 matmul, reference
    numerics) or "bf16" (bf16 operands, f32 accumulation: ~4x MXU rate;
    the activations are already bf16-rounded by the conv stack, so only
    the weight rounding is new — see ``layers.bf16_dot_general``). Both
    use the same ``nn.Dense`` parameters: checkpoints are
    interchangeable across the setting.
    """
    if logits_matmul not in ("f32", "bf16"):
        raise ValueError(f"logits_matmul must be f32|bf16, "
                         f"got {logits_matmul!r}")
    kw = ({"dot_general": bf16_dot_general}
          if logits_matmul == "bf16" else {})
    return nn.Dense(vocab_size, dtype=jnp.float32, **kw)


class DFCNN(nn.Module):
    """Plain DFCNN: 32p/64p/128p/128/128 conv-BN cells + NIN(256) head."""

    vocab_size: int
    dropout_rate: float = 0.3
    logits_matmul: str = "f32"   # see _logits_dense
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        for feats, pool in [(32, True), (64, True), (128, True),
                            (128, False), (128, False)]:
            x = ConvBnCell(feats, pool=pool, dtype=self.dtype)(x, train)
        x = ConvBnCell(256, nin=True, nin_features=32,
                       dtype=self.dtype)(x, train)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        logits = _logits_dense(self.vocab_size, self.logits_matmul)(x)
        return logits


class SEDFCNN(nn.Module):
    """SE-DFCNN: stage = pooled cell -> unpooled cell -> +SE(residual).

    ``se_first=False`` (default) applies SE to the second conv's output and
    adds it to the pooled cell's output (acoustic_model2.py:39-59);
    ``se_first=True`` applies SE between the convolutions
    (acoustic_model3.py ordering).
    """

    vocab_size: int
    stage_features: Sequence[int] = (32, 64, 128, 128, 128)
    stage_pool: Sequence[bool] = (True, True, True, False, False)
    se_ratio: Sequence[int] = (1, 2, 2, 2, 2)
    head_features: int = 256
    dropout_rate: float = 0.3
    se_first: bool = False
    # Performance variant (NOT weight-parity with the reference): fold a
    # 2x2 input patch into channels before the conv stack. The first two
    # stages then run at quarter resolution with 4 input channels — same
    # final [B, T/8, F/8, C] geometry (use stage_pool with exactly two
    # True entries), ~2.7x fewer conv FLOPs, and the C=1 first conv the
    # MXU hates disappears.
    space_to_depth: bool = False
    # Remat the first N stages in the backward pass: their full-resolution
    # activations (stage 1 alone stores ~3.2 GB at batch 64) are
    # recomputed from the stage input instead of living in HBM across the
    # whole backward — trading cheap early-conv FLOPs for the HBM traffic
    # that bounds the standard train step (DESIGN.md §9). Weight-parity
    # and forward outputs are unchanged (same module names, same math).
    remat_stages: int = 0
    logits_matmul: str = "f32"   # see _logits_dense
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def fast(cls, vocab_size: int, **kw):
        """Space-to-depth throughput variant with matched geometry."""
        kw.setdefault("stage_pool", (True, True, False, False, False))
        return cls(vocab_size, space_to_depth=True, **kw)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.space_to_depth:
            b, t, f, c = x.shape
            x = x.reshape(b, t // 2, 2, f // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, t // 2, f // 2,
                                                      4 * c)
        n_stages = len(self.stage_features)
        for idx, (feats, pool, ratio) in enumerate(
                zip(self.stage_features, self.stage_pool, self.se_ratio)):
            if idx < self.remat_stages:
                # explicit names: nn.remat would otherwise prefix the
                # auto-names with "Checkpoint", breaking checkpoint/
                # importer weight-parity
                Cell = nn.remat(ConvBnCell, static_argnums=(2,))
                SE = nn.remat(SqueezeExcite, static_argnums=(2,))
            else:
                Cell, SE = ConvBnCell, SqueezeExcite
            cn = [f"ConvBnCell_{2 * idx}", f"ConvBnCell_{2 * idx + 1}"]
            sn = f"SqueezeExcite_{idx}"
            h = Cell(feats, pool=pool, pool_type="avg",
                     dtype=self.dtype, name=cn[0])(x, train)
            if self.se_first:
                se = SE(feats, ratio, dtype=self.dtype, name=sn)(h, train)
                h2 = Cell(feats, pool=False, pool_type="avg",
                          dtype=self.dtype, name=cn[1])(se, train)
                x = h + h2
            else:
                h2 = Cell(feats, pool=False, pool_type="avg",
                          dtype=self.dtype, name=cn[1])(h, train)
                x = h + SE(feats, ratio, dtype=self.dtype,
                           name=sn)(h2, train)
        x = ConvBnCell(self.head_features, dtype=self.dtype,
                       name=f"ConvBnCell_{2 * n_stages}")(x, train)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        logits = _logits_dense(self.vocab_size, self.logits_matmul)(x)
        return logits


class KerasDFCNN(nn.Module):
    """The Keras cnn_ctc layout (cnn_ctc.py:27-49) for .hdf5 weight parity:
    cell(32,pool) cell(64,pool) cell(128,pool) cell(128) cell(128) ->
    reshape (T/8, 25*128) -> Dropout .3 -> Dense 128 relu -> Dropout .3 ->
    Dense vocab. Keras cells are double-conv: 2x [conv3x3 relu + BN]."""

    vocab_size: int
    dense_units: int = 128
    dropout_rate: float = 0.3
    logits_matmul: str = "f32"   # see _logits_dense
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        for feats, pool in [(32, True), (64, True), (128, True),
                            (128, False), (128, False)]:
            x = ConvBnCell(feats, pool=False, dtype=self.dtype)(x, train)
            x = ConvBnCell(feats, pool=pool, pool_type="max",
                           dtype=self.dtype)(x, train)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        x = nn.Dense(self.dense_units, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        logits = _logits_dense(self.vocab_size, self.logits_matmul)(x)
        return logits


def logit_lengths(frame_lengths: jnp.ndarray,
                  max_logit_len: int = 200) -> jnp.ndarray:
    """Valid CTC input length: min(cap, frames//8 + 1) (data_loader.py:132)."""
    return jnp.minimum(max_logit_len, frame_lengths // 8 + 1).astype(jnp.int32)


def frames_from_samples(num_samples: jnp.ndarray, win: int = 400,
                        hop: int = 160) -> jnp.ndarray:
    """Exact fbank frame count per signal (python_speech_features framing:
    1 if S <= win else 1 + ceil((S - win) / hop)) — jnp elementwise."""
    n = 1 + jnp.ceil((num_samples - win) / hop).astype(jnp.int32)
    return jnp.where(num_samples <= win, 1, n)
