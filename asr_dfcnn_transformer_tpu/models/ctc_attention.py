"""CTC-attention hybrid: LFR fbank -> DFCNN -> Transformer encoder ->
hanzi CTC.

Re-design of the reference's single-model fbank->hanzi CTC system
(``lm_and_am/model/ctc_attention.py:74-134``): an LFR-input conv stack
(three pooled stages + two plain), Dense 32 bottleneck, Dense d_model,
added learned position embedding, 12 self-attention encoder blocks, and a
CTC head over the *character* vocabulary — i.e. the acoustic model decodes
straight to hanzi, no separate LM stage. Pairs with LFR m=4/n=3 features
(train_atten.py:10 + data_loader2.py:130-136).

Length geometry: the conv stack pools time by 8, so the number of real
logit frames for an utterance with ``valid_frames`` LFR frames is
``valid_frames//8 + 1`` — that is the default here. The reference instead
feeds CTC ``ceil(valid_frames/4)`` (data_loader2.py:136), which over-counts
by ~2x and marks trailing padding frames as valid; it happens to stay
within the padded logit length for utterances under ~1600 LFR frames, so
training "works" but attends garbage frames. Set ``parity_lengths=True``
to reproduce the reference arithmetic exactly (documented deviation, see
PARITY.md).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from asr_dfcnn_transformer_tpu.models.layers import (
    ConvBnCell,
    FeedForward,
    LearnedPositionEmbed,
    MultiHeadAttention,
)


class CTCAttention(nn.Module):
    vocab_size: int              # hanzi vocab (6345)
    d_model: int = 512
    bottleneck: int = 32
    num_heads: int = 8
    num_blocks: int = 12
    position_max_length: int = 512
    dropout_rate: float = 0.1
    parity_attention: bool = True
    parity_lengths: bool = False  # reference's ceil(T/4), data_loader2.py:136
    fused_attention: str = "auto"  # see MultiHeadAttention.fused
    fused_ffn: str = "auto"        # see FeedForward.fused
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, valid_frames=None, train: bool = False):
        """x: [B, T, F, 1] LFR features. Returns ([B, T', vocab] logits,
        [B] valid logit lengths) with T' = T/8 after three 2x2 poolings."""
        det = not train
        for feats, pool in [(32, True), (64, True), (128, True),
                            (128, False), (128, False)]:
            x = ConvBnCell(feats, pool=pool, dtype=self.dtype)(x, train)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        x = nn.relu(nn.Dense(self.bottleneck, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.d_model, dtype=self.dtype)(x))
        x = x + LearnedPositionEmbed(self.position_max_length, self.d_model,
                                     dtype=self.dtype, name="pos_embed")(t)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=det)
        for i in range(self.num_blocks):
            x = MultiHeadAttention(self.d_model, self.num_heads,
                                   self.dropout_rate,
                                   parity=self.parity_attention,
                                   fused=self.fused_attention,
                                   dtype=self.dtype,
                                   name=f"block_{i}_attn")(x, x,
                                                           deterministic=det)
            x = FeedForward(self.d_model, fused=self.fused_ffn,
                            dtype=self.dtype,
                            name=f"block_{i}_ffn")(x, deterministic=det)
        logits = nn.Dense(self.vocab_size, dtype=jnp.float32,
                          name="output")(x)
        if valid_frames is None:
            lengths = jnp.full((b,), t, jnp.int32)
        elif self.parity_lengths:
            lengths = jnp.minimum(t, -(-valid_frames // 4)).astype(jnp.int32)
        else:
            lengths = jnp.minimum(t, valid_frames // 8 + 1).astype(jnp.int32)
        return logits, lengths
