"""Jointly trained AM -> LM model.

The reference's ``lm_and_am/model/am_lm_model.py`` represents this
capability but is broken as written (it reads ``self.am_out`` which is
never assigned, am_lm_model.py:87; its trainer references undefined
tensors, am_lm_train.py:97-110). This is the working re-design: one train
step computes

  loss = CTC(AM logits, pinyin) + CE(LM(greedy_decode(AM logits)), hanzi)

i.e. the LM trains on the AM's actual (noisy) greedy pinyin output instead
of gold pinyin — the evident intent of the reference's in-graph decode
(am_lm_model.py:79-80) — with a stop-gradient at the decode boundary
(decode is non-differentiable; the reference's second CTC loss had the same
property).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from asr_dfcnn_transformer_tpu.models.dfcnn import SEDFCNN, logit_lengths
from asr_dfcnn_transformer_tpu.models.transformer_lm import (
    TransformerLM,
    lm_loss_and_acc,
)
from asr_dfcnn_transformer_tpu.ops import ctc_loss, ctc_greedy_decode


class AMLMJoint(nn.Module):
    acoustic_vocab_size: int
    language_vocab_size: int
    lm_position_max_length: int = 100
    small: bool = False          # reduced dims for smoke/test runs
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        if self.small:
            self.am = SEDFCNN(self.acoustic_vocab_size,
                              stage_features=(4, 4, 8, 8, 8),
                              head_features=8, dropout_rate=0.0,
                              dtype=self.dtype)
            self.lm = TransformerLM(
                self.acoustic_vocab_size, self.language_vocab_size,
                d_model=32, num_heads=4, num_blocks=1, dropout_rate=0.0,
                position_max_length=self.lm_position_max_length,
                dtype=self.dtype)
        else:
            self.am = SEDFCNN(self.acoustic_vocab_size, dtype=self.dtype)
            self.lm = TransformerLM(
                self.acoustic_vocab_size, self.language_vocab_size,
                position_max_length=self.lm_position_max_length,
                dtype=self.dtype)

    def __call__(self, feats, frame_lengths, pinyin, pinyin_lengths,
                 hanzi, train: bool = False,
                 weights=None) -> Dict[str, Any]:
        am_logits = self.am(feats, train)
        in_len = logit_lengths(frame_lengths, am_logits.shape[1])
        losses = ctc_loss(am_logits, in_len, pinyin, pinyin_lengths,
                          blank_id=-1)
        if weights is None:
            am_loss = jnp.mean(losses)
        else:
            # weight-0 backfilled rows (static-shape trailing batches)
            # must not contribute
            am_loss = jnp.sum(losses * weights) / jnp.maximum(
                jnp.sum(weights), 1.0)
            hanzi = jnp.where(weights[:, None] > 0, hanzi, 0)
        # decode boundary: non-differentiable, truncate/pad to LM length
        dec, dec_len = ctc_greedy_decode(jax.lax.stop_gradient(am_logits),
                                         in_len, blank_id=-1,
                                         max_output_len=hanzi.shape[1])
        lm_logits = self.lm(dec, train)
        lm_loss, lm_acc = lm_loss_and_acc(lm_logits, hanzi)
        return {
            "loss": am_loss + lm_loss,
            "am_loss": am_loss,
            "lm_loss": lm_loss,
            "lm_acc": lm_acc,
            "am_logits": am_logits,
            "decoded_pinyin": dec,
        }
