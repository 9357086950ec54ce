"""Transformer-encoder language model: pinyin ids -> hanzi ids.

Re-design of the reference's non-autoregressive per-position translator
(``lm_and_am/model/language_model.py``): scaled zero-pad token embedding +
learned position embedding (cap 100), dropout, 12 self-attention blocks,
final projection to the hanzi vocabulary; prediction is per-position argmax
(``language_model.py:55-56``). The model is one batched matmul pipeline —
ideal MXU shape (d_model 512, seq <= 100).

Reference quirks handled explicitly:
- ``causality=True`` in the reference's self-attention blocks
  (language_model.py:48) — surprising for a translator but kept as default
  ``causal=True`` for parity; set False for the (usually better)
  bidirectional variant.
- ``two_stack=True`` reproduces language_model2.py's doubled block stack
  (two 12-block groups; the reference reuses variable scopes across the two
  stacks — here the second stack simply shares-by-structure via scan-free
  separate parameters, documented deviation since scope-reuse in TF1 was
  almost certainly unintended).
- Position cap: ids beyond position_max_length are clipped rather than
  faulting (reference crashes, hparams.py:23 / language_model.py:29-30).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from asr_dfcnn_transformer_tpu.core import constants
from asr_dfcnn_transformer_tpu.models.layers import (
    FeedForward,
    LearnedPositionEmbed,
    MultiHeadAttention,
    ScaledEmbed,
    bf16_dot_general,
    label_smoothing,
)


class TransformerLM(nn.Module):
    input_vocab_size: int        # acoustic (pinyin) vocab, 1536
    output_vocab_size: int       # language (hanzi) vocab, 6345
    d_model: int = 512
    num_heads: int = 8
    num_blocks: int = 12
    position_max_length: int = 100
    dropout_rate: float = 0.5
    causal: bool = True
    parity_attention: bool = True
    two_stack: bool = False
    # "f32" (reference numerics) | "bf16": bf16 operands with f32
    # accumulation for the final hanzi projection (~4x MXU rate; same
    # "output" Dense parameters — checkpoints interchangeable). See
    # layers.bf16_dot_general.
    logits_matmul: str = "f32"
    fused_attention: str = "auto"  # see MultiHeadAttention.fused
    fused_ffn: str = "auto"        # see FeedForward.fused
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, ids, train: bool = False):
        """ids: [B, T] pinyin ids (0 = PAD). Returns [B, T, out_vocab]
        float32 logits."""
        det = not train
        valid = ids != constants.PAD
        x = ScaledEmbed(self.input_vocab_size, self.d_model,
                        dtype=self.dtype, name="token_embed")(ids)
        x = x + LearnedPositionEmbed(self.position_max_length, self.d_model,
                                     dtype=self.dtype,
                                     name="pos_embed")(ids.shape[1])
        x = nn.Dropout(self.dropout_rate)(x, deterministic=det)

        n_stacks = 2 if self.two_stack else 1
        for s in range(n_stacks):
            for i in range(self.num_blocks):
                x = MultiHeadAttention(
                    self.d_model, self.num_heads, self.dropout_rate,
                    parity=self.parity_attention,
                    fused=self.fused_attention, dtype=self.dtype,
                    name=f"block{s}_{i}_attn")(x, x, k_valid=valid,
                                               causal=self.causal,
                                               deterministic=det)
                x = FeedForward(self.d_model, fused=self.fused_ffn,
                                dtype=self.dtype,
                                name=f"block{s}_{i}_ffn")(x, deterministic=det)
        if self.logits_matmul not in ("f32", "bf16"):
            raise ValueError(f"logits_matmul must be f32|bf16, got "
                             f"{self.logits_matmul!r}")
        kw = ({"dot_general": bf16_dot_general}
              if self.logits_matmul == "bf16" else {})
        logits = nn.Dense(self.output_vocab_size, dtype=jnp.float32,
                          name="output", **kw)(x)
        return logits


def lm_loss_and_acc(logits: jnp.ndarray, targets: jnp.ndarray,
                    epsilon: float = 0.1):
    """Label-smoothed softmax CE normalized by non-pad count, plus
    padding-masked accuracy (language_model.py:57-67).

    Returns (mean_loss, accuracy) as float32 scalars.
    """
    istarget = (targets != constants.PAD).astype(jnp.float32)
    one_hot = jax.nn.one_hot(targets, logits.shape[-1], dtype=jnp.float32)
    smoothed = label_smoothing(one_hot, epsilon)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    xent = -jnp.sum(smoothed * log_probs, axis=-1)
    denom = jnp.maximum(jnp.sum(istarget), 1.0)
    mean_loss = jnp.sum(xent * istarget) / denom
    preds = jnp.argmax(logits, axis=-1)
    acc = jnp.sum((preds == targets).astype(jnp.float32) * istarget) / denom
    return mean_loss, acc
