"""End-to-end speech Transformer: LFR fbank -> hanzi seq2seq.

Re-design of the reference's ``end2end/model.py:174-370``:

- **Pre-net**: two 3x3 stride-2 conv(tanh)+BN stages (4x time & freq
  downsample, model.py:214-223), then two residual *dual-axis attention*
  blocks attending over the time axis and the frequency axis separately and
  concatenating (the reference's 2-D attention, model.py:226-264) —
  implemented as proper einsum attention over each axis.
- **Encoder**: flatten + Dense(d_model) + LayerNorm + learned position
  embedding; 6 blocks of self-attention + FFN (model.py:267-310).
- **Decoder**: embedding + position embedding; 6 blocks. The reference's
  decoder uses *cross-attention only* with a causal mask on the
  (dec x memory) score matrix and no self-attention (model.py:312-329) —
  reproduced under ``parity_decoder=True``; the default adds standard
  causal self-attention before cross-attention (the reference architecture
  cannot condition on its own history, which is why its predict path was
  never finished).
- **Decode**: the reference's ``predict_decoder`` is an unfinished stub
  (model.py:331-337) with declared-but-unused beam_size=3 / lp_alpha=0.6
  (model.py:38-39). Implemented here for real: scan-based autoregressive
  greedy and batched beam search with the Google-NMT length penalty
  ((5+len)/6)^alpha.
- **Loss**: label-smoothed CE over valid target positions
  (targets != IGNORE_ID, model.py:339-355).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from asr_dfcnn_transformer_tpu.core import constants
from asr_dfcnn_transformer_tpu.models.layers import (
    FeedForward,
    LearnedPositionEmbed,
    MultiHeadAttention,
    ScaledEmbed,
    label_smoothing,
)


class DualAxisAttentionBlock(nn.Module):
    """Residual block attending over time and frequency axes separately.

    Input [B, T, F, C]: one attention treats T as the sequence axis (each
    (b, f) row independently), the other treats F as the sequence axis;
    outputs are concatenated on channels and projected back (the TPU
    equivalent of the reference's conv-QKV 2-D attention, model.py:226-264).

    ``num_heads`` is a pure reshape — the Q/K/V/out Dense shapes don't
    depend on it, so checkpoints are interchangeable across head counts.
    It is also the block's perf lever on TPU: with C=64, 4 heads mean
    dh=16 contractions split into B*F*H micro-matmuls plus 4x the f32
    score traffic; measured v5e b8 per block: h=4 5.04 ms, h=2 2.76,
    h=1 1.42 (DESIGN.md §9 round 4). Default 1 head (the reference's
    pre-net attention has no learned head split either — it attends per
    conv channel, model.py:226-264).
    """

    channels: int
    num_heads: int = 1
    fused: str = "auto"          # see MultiHeadAttention.fused
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True, t_valid=None):
        b, t, f, c = x.shape
        time_in = x.transpose(0, 2, 1, 3).reshape(b * f, t, c)
        # t_valid [B]: frames past an utterance's valid extent must not be
        # attendable time-axis keys — unmasked, every valid frame gives
        # softmax weight to the batch-padding garbage, making the encoder
        # output (and the transcript) depend on which bucket the
        # utterance was padded to. Freq-axis keys are always all valid.
        kv = None
        if t_valid is not None:
            kv = jnp.repeat(jnp.arange(t)[None, :] < t_valid[:, None],
                            f, axis=0)
        time_out = MultiHeadAttention(self.channels, self.num_heads,
                                      fused=self.fused,
                                      dtype=self.dtype, name="time_attn")(
            time_in, time_in, k_valid=kv, deterministic=deterministic)
        time_out = time_out.reshape(b, f, t, c).transpose(0, 2, 1, 3)
        freq_in = x.reshape(b * t, f, c)
        freq_out = MultiHeadAttention(self.channels, self.num_heads,
                                      fused=self.fused,
                                      dtype=self.dtype, name="freq_attn")(
            freq_in, freq_in, deterministic=deterministic)
        freq_out = freq_out.reshape(b, t, f, c)
        y = jnp.concatenate([time_out, freq_out], axis=-1)
        if t_valid is not None:
            # zero every invalid time row, before the conv and in the
            # block output: the 3x3 conv at the LAST valid row then sees
            # exactly the zeros that a smaller bucket's SAME-padding
            # boundary implies, so encoder outputs are identical whether
            # an utterance fills its bucket or rides in a larger one
            tmask = (jnp.arange(t)[None, :]
                     < t_valid[:, None])[:, :, None, None]
            y = jnp.where(tmask, y, 0)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(y)
        y = nn.LayerNorm(dtype=self.dtype)(y)
        out = x + y
        if t_valid is not None:
            out = jnp.where(tmask, out, 0)
        return out


class Stride2Conv(nn.Module):
    """First pre-net conv (3x3, stride 2, C_in=1) with an optional exact
    space-to-depth execution path.

    A C_in=1 conv is the worst MXU shape there is (the contraction depth
    is the 9-tap window; cf. the AM stage-1 analysis, DESIGN.md §9).
    ``layout="pack"`` re-expresses the SAME/stride-2 conv exactly: 2x2
    input patches fold into 4 channels ([B,T,F,1] -> [B,T/2,F/2,4], a pure
    relayout) and the 3x3 kernel embeds into a 2x2x4 kernel (7 of 16 taps
    zero) applied at stride 1 — identical math (same taps, same zeros),
    checkpoint-identical parameters (kernel [3,3,1,C] + bias, the same
    tree ``nn.Conv`` stores), 4x the contraction depth for the MXU.

    ``layout``: "plain" (the nn.Conv-equivalent direct conv), "pack", or
    "auto". "auto" resolves to "plain": MEASURED on v5e (round 4,
    tools/measure_autos.py, 1600x80 frames) the packed path LOSES —
    fwd 0.86x (b8) / 0.72x (b64), fwd+bwd 0.80x; the 4x-deeper
    contraction doesn't pay for its relayouts at C_out=64 (DESIGN.md
    §9). Odd T/F fall back to plain (the packing needs even extents).
    """

    features: int
    layout: str = "auto"
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, t, f, cin = x.shape
        if cin != 1:
            raise ValueError(f"Stride2Conv packs C_in=1 inputs, got {cin}")
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 1, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        w = kernel.astype(self.dtype)
        layout = self.layout
        if layout == "auto":
            layout = "plain"    # measured: pack loses on v5e (docstring)
        if layout not in ("plain", "pack"):
            raise ValueError(f"layout must be auto|plain|pack, got "
                             f"{self.layout!r}")
        if layout == "pack" and t % 2 == 0 and f % 2 == 0:
            # xp[u, v, 2*py + px] = x[2u+py, 2v+px]
            xp = x.reshape(b, t // 2, 2, f // 2, 2, 1)
            xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, t // 2, f // 2, 4)
            # SAME padding for stride 2 / size 3 / even extent is (0, 1):
            # out[u] reads rows {2u, 2u+1, 2u+2} = packed rows {u, u+1}
            w2 = jnp.zeros((2, 2, 4, self.features), self.dtype)
            for a, py, dy in ((0, 0, 0), (0, 1, 1), (1, 0, 2)):
                for c, px, dx in ((0, 0, 0), (0, 1, 1), (1, 0, 2)):
                    w2 = w2.at[a, c, 2 * py + px, :].set(w[dy, dx, 0, :])
            y = jax.lax.conv_general_dilated(
                xp, w2, window_strides=(1, 1),
                padding=((0, 1), (0, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=(2, 2), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(self.dtype)


class PreNet(nn.Module):
    """2x stride-2 conv(tanh)+BN + 2 dual-axis attention blocks
    (model.py:214-264)."""

    channels: int = 64
    num_attn_blocks: int = 2
    num_heads: int = 1           # see DualAxisAttentionBlock.num_heads
    fused: str = "auto"          # see MultiHeadAttention.fused
    conv1_layout: str = "auto"   # see Stride2Conv.layout
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, valid=None):
        # x: [B, T, F, 1]; valid: [B] valid input frames (None = every
        # frame attendable, the pre-round-4 behavior). The first conv's
        # C_in=1 shape gets the Stride2Conv treatment; parameter paths
        # stay Conv_0/Conv_1 exactly as the previous two-nn.Conv stack
        # stored them.
        x = Stride2Conv(self.channels, layout=self.conv1_layout,
                        dtype=self.dtype, name="Conv_0")(x)
        x = jnp.tanh(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         dtype=self.dtype, name="BatchNorm_0")(x)
        x = nn.Conv(self.channels, (3, 3), strides=(2, 2),
                    padding="SAME", dtype=self.dtype, name="Conv_1")(x)
        x = jnp.tanh(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         dtype=self.dtype, name="BatchNorm_1")(x)
        t_valid = None
        if valid is not None:
            # two stride-2 convs: the block-resolution valid extent
            # matches encode()'s mem_valid rule (feat_valid // 4, min 1)
            t_valid = jnp.maximum(jnp.asarray(valid) // 4, 1)
        for i in range(self.num_attn_blocks):
            x = DualAxisAttentionBlock(self.channels,
                                       num_heads=self.num_heads,
                                       fused=self.fused,
                                       dtype=self.dtype,
                                       name=f"dual_{i}")(x, not train,
                                                         t_valid=t_valid)
        return x


class SpeechTransformer(nn.Module):
    vocab_size: int              # e2e hanzi vocab (6347: pad/sos/eos first)
    d_model: int = 512
    num_heads: int = 8
    num_enc_blocks: int = 6
    num_dec_blocks: int = 6
    prenet_channels: int = 64
    prenet_heads: int = 1        # reshape-only; see DualAxisAttentionBlock
    prenet_fused: str = "auto"   # see MultiHeadAttention.fused
    prenet_conv1_layout: str = "auto"  # see Stride2Conv.layout
    fused_attention: str = "auto"  # enc/dec blocks; see MultiHeadAttention.fused
    fused_ffn: str = "auto"        # see FeedForward.fused
    dropout_rate: float = 0.1
    position_max_length: int = 512
    parity_decoder: bool = False  # True = reference's cross-attention-only decoder
    # mask batch-padding frames out of the pre-net's time-axis attention
    # so encoder outputs don't depend on the padding bucket (the
    # reference always pads to one fixed canvas and attends it all,
    # model.py:226-264 — set False to reproduce that, or to restore
    # checkpoints trained before round 4 added the mask; PARITY.md)
    prenet_masked: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.prenet = PreNet(self.prenet_channels,
                             num_heads=self.prenet_heads,
                             fused=self.prenet_fused,
                             conv1_layout=self.prenet_conv1_layout,
                             dtype=self.dtype)
        self.enc_proj = nn.Dense(self.d_model, dtype=self.dtype)
        self.enc_ln = nn.LayerNorm(dtype=self.dtype)
        self.enc_pos = LearnedPositionEmbed(self.position_max_length,
                                            self.d_model, dtype=self.dtype)
        self.enc_dropout = nn.Dropout(self.dropout_rate)
        self.enc_attn = [
            MultiHeadAttention(self.d_model, self.num_heads,
                               self.dropout_rate,
                               fused=self.fused_attention, dtype=self.dtype)
            for _ in range(self.num_enc_blocks)]
        self.enc_ffn = [
            FeedForward(self.d_model, dropout_rate=self.dropout_rate,
                        fused=self.fused_ffn, dtype=self.dtype)
            for _ in range(self.num_enc_blocks)]
        self.dec_embed = ScaledEmbed(self.vocab_size, self.d_model,
                                     dtype=self.dtype)
        self.dec_pos = LearnedPositionEmbed(self.position_max_length,
                                            self.d_model, dtype=self.dtype)
        self.dec_dropout = nn.Dropout(self.dropout_rate)
        if not self.parity_decoder:
            self.dec_self = [
                MultiHeadAttention(self.d_model, self.num_heads,
                                   self.dropout_rate,
                                   fused=self.fused_attention,
                                   dtype=self.dtype)
                for _ in range(self.num_dec_blocks)]
        self.dec_cross = [
            MultiHeadAttention(self.d_model, self.num_heads,
                               self.dropout_rate,
                               fused=self.fused_attention, dtype=self.dtype)
            for _ in range(self.num_dec_blocks)]
        self.dec_ffn = [
            FeedForward(self.d_model, dropout_rate=self.dropout_rate,
                        fused=self.fused_ffn, dtype=self.dtype)
            for _ in range(self.num_dec_blocks)]
        self.dec_output = nn.Dense(self.vocab_size, dtype=jnp.float32)

    def __call__(self, feats, feat_valid, dec_inputs, train: bool = False):
        """feats: [B, T, F, 1] LFR features; feat_valid: [B] valid frames;
        dec_inputs: [B, L] decoder input ids ([SOS] + y).
        Returns [B, L, vocab] float32 logits."""
        memory, mem_valid = self.encode(feats, feat_valid, train)
        return self.decode(memory, mem_valid, dec_inputs, train)

    def encode(self, feats, feat_valid, train: bool = False):
        det = not train
        x = self.prenet(feats, train,
                        valid=feat_valid if self.prenet_masked else None)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        x = self.enc_proj(x)
        x = self.enc_ln(x)
        x = x + self.enc_pos(t)
        x = self.enc_dropout(x, deterministic=det)
        mem_valid = jnp.arange(t)[None, :] < jnp.maximum(
            feat_valid[:, None] // 4, 1)  # stride-2 twice = 4x downsample
        for attn, ffn in zip(self.enc_attn, self.enc_ffn):
            x = attn(x, x, k_valid=mem_valid, deterministic=det)
            x = ffn(x, deterministic=det)
        return x, mem_valid

    def decode(self, memory, mem_valid, dec_inputs, train: bool = False,
               mask_pad: bool = True):
        """``mask_pad=True`` (teacher forcing): PAD decoder positions are
        real padding and must not be attendable keys — derive the mask
        from the ids (reference's query-mask intent,
        end2end/transformer.py:64-86). ``mask_pad=False`` (autoregressive
        decoding): every generated token is an ordinary key under the
        causal mask — the exact semantics of the KV-cached ``decode_one``
        (which attends all positions <= pos), keeping the cached and
        full-recompute decoders token-identical even when an untrained
        model argmaxes PAD mid-sequence."""
        det = not train
        l = dec_inputs.shape[1]
        y = self.dec_embed(dec_inputs)
        y = y + self.dec_pos(l)
        y = self.dec_dropout(y, deterministic=det)
        if mask_pad:
            dec_valid = jnp.asarray(dec_inputs) != constants.PAD
            # position 0 is always [SOS]
            dec_valid = jnp.logical_or(
                dec_valid, jnp.arange(l)[None, :] == 0)
        else:
            dec_valid = jnp.ones(dec_inputs.shape, bool)
        for i in range(self.num_dec_blocks):
            if not self.parity_decoder:
                y = self.dec_self[i](y, y, k_valid=dec_valid, causal=True,
                                     deterministic=det)
            y = self.dec_cross[i](y, memory, k_valid=mem_valid,
                                  causal=self.parity_decoder,
                                  deterministic=det)
            y = self.dec_ffn[i](y, deterministic=det)
        return self.dec_output(y)

    # ---- KV-cached autoregressive decoding --------------------------------

    def precompute_decode_state(self, memory):
        """Project the encoder memory through every cross-attention K/V once
        (instead of once per emitted token) and materialize the position
        table. Returns (cross_k, cross_v) stacked [n_dec, B, Tmem, D] and
        the position table [position_max_length, D]."""
        ks, vs = [], []
        for i in range(self.num_dec_blocks):
            k, v = self.dec_cross[i].project_kv(memory)
            ks.append(k)
            vs.append(v)
        pos_table = self.dec_pos(self.position_max_length)
        return jnp.stack(ks), jnp.stack(vs), pos_table

    def decode_one(self, tok, pos, pos_row, cross_k, cross_v, self_k,
                   self_v, mem_len):
        """One cached decode step.

        tok: [B] input token ids at position ``pos`` (traced scalar);
        pos_row: [D] position embedding for ``pos``;
        cross_k/cross_v: [n_dec, B, Tmem, D] precomputed memory projections;
        self_k/self_v: [n_dec, B, Lmax, D] self-attention caches (ignored
        when parity_decoder);
        mem_len: [B] valid memory rows.
        Returns ([B, vocab] logits for this position, updated self_k/self_v).
        """
        y = self.dec_embed(tok[:, None]) + pos_row[None, None, :].astype(
            self.dtype)
        for i in range(self.num_dec_blocks):
            if not self.parity_decoder:
                kt, vt = self.dec_self[i].project_kv(y)
                self_k = jax.lax.dynamic_update_slice(
                    self_k, kt[None], (i, 0, pos, 0))
                self_v = jax.lax.dynamic_update_slice(
                    self_v, vt[None], (i, 0, pos, 0))
                y = self.dec_self[i].attend_step(y, self_k[i], self_v[i],
                                                 pos + 1)
            # reference parity: causal mask on (dec x memory) means step
            # ``pos`` sees memory rows <= pos
            cross_len = jnp.minimum(mem_len, pos + 1) \
                if self.parity_decoder else mem_len
            y = self.dec_cross[i].attend_step(y, cross_k[i], cross_v[i],
                                              cross_len)
            y = self.dec_ffn[i](y, deterministic=True)
        return self.dec_output(y)[:, 0], self_k, self_v


def e2e_loss(logits: jnp.ndarray, targets: jnp.ndarray,
             epsilon: float = 0.1):
    """Label-smoothed CE over targets != IGNORE_ID (model.py:339-355)."""
    valid = (targets != constants.IGNORE_ID).astype(jnp.float32)
    safe_targets = jnp.maximum(targets, 0)
    one_hot = jax.nn.one_hot(safe_targets, logits.shape[-1], dtype=jnp.float32)
    smoothed = label_smoothing(one_hot, epsilon)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    xent = -jnp.sum(smoothed * log_probs, axis=-1)
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    loss = jnp.sum(xent * valid) / denom
    acc = jnp.sum((jnp.argmax(logits, -1) == safe_targets) * valid) / denom
    return loss, acc


def _length_penalty(length, alpha: float):
    return ((5.0 + length) / 6.0) ** alpha


def _finalize_greedy(tokens):
    """Emitted [B, L+1] token array (incl. the [SOS] column) -> (ids
    [B, L] PAD-masked past the first EOS, lengths [B]). ONE home for the
    EOS/length accounting shared by the cached and full-recompute paths —
    any divergence here is exactly a cached-vs-uncached token mismatch."""
    out = tokens[:, 1:]
    seen_eos = jnp.cumsum((out == constants.EOS).astype(jnp.int32),
                          axis=1) > 0
    lengths = jnp.sum(1 - seen_eos.astype(jnp.int32), axis=1)
    return jnp.where(seen_eos, constants.PAD, out), lengths


def _finalize_beam(tokens, logp, lp_alpha: float):
    """Beam tokens [B, K, L+1] + final beam log-probs [B, K] ->
    (best ids [B, L], lengths [B], scores [B]) under the ((5+L)/6)^alpha
    length penalty — shared by beam_decode and beam_decode_cached."""
    out = tokens[:, :, 1:]
    seen = jnp.cumsum((out == constants.EOS).astype(jnp.int32), axis=2) > 0
    lengths = jnp.sum(1 - seen.astype(jnp.int32), axis=2)       # [B, K]
    score = logp / _length_penalty(lengths.astype(jnp.float32), lp_alpha)
    best = jnp.argmax(score, axis=1)
    take = lambda a: jnp.take_along_axis(
        a, best[:, None, None] if a.ndim == 3 else best[:, None],
        axis=1).squeeze(1)
    best_tokens = take(jnp.where(seen, constants.PAD, out))
    return best_tokens, take(lengths), take(score)


def beam_decode_cached(model: SpeechTransformer, params, feats, feat_valid,
                       beam_size: int = 3, lp_alpha: float = 0.6,
                       max_len: int = 64,
                       microbatch: Optional[int] = None):
    """KV-cached batched beam search (same scoring as :func:`beam_decode`,
    O(L) decoder work per step). Beams ride the batch axis; surviving
    beams gather-reorder the self-attention caches each step.

    ``microbatch``: decode in sequential chunks (exact; see
    :func:`_microbatched` — beams multiply the cross-KV working set by
    K, so the VMEM-residency cliff arrives even earlier than greedy).

    Returns (ids [B, max_len], lengths [B], scores [B]).
    """
    if microbatch is not None and feats.shape[0] > microbatch:
        return _microbatched(
            lambda f, v: beam_decode_cached(model, params, f, v,
                                            beam_size=beam_size,
                                            lp_alpha=lp_alpha,
                                            max_len=max_len),
            feats, feat_valid, microbatch)
    k = beam_size
    b = feats.shape[0]
    memory, mem_valid = model.apply(params, feats, feat_valid,
                                    method=SpeechTransformer.encode)
    mem = jnp.repeat(memory, k, axis=0)
    mem_len = jnp.repeat(jnp.sum(mem_valid.astype(jnp.int32), -1), k, axis=0)
    cross_k, cross_v, pos_table = model.apply(
        params, mem, method=SpeechTransformer.precompute_decode_state)
    n_dec, d = model.num_dec_blocks, model.d_model
    self_k = jnp.zeros((n_dec, b * k, max_len, d), cross_k.dtype)
    self_v = jnp.zeros_like(self_k)

    tokens0 = jnp.full((b, k, max_len + 1), constants.PAD, jnp.int32)
    tokens0 = tokens0.at[:, :, 0].set(constants.SOS)
    logp0 = jnp.tile(jnp.where(jnp.arange(k) == 0, 0.0, -1e30)[None], (b, 1))
    fin0 = jnp.zeros((b, k), jnp.bool_)
    neg_inf = -1e30

    def step(carry, i):
        tokens, logp, finished, sk, sv = carry
        tok = jnp.take_along_axis(
            tokens.reshape(b * k, max_len + 1),
            i[None, None].repeat(b * k, 0), axis=1)[:, 0]
        pos_row = jax.lax.dynamic_index_in_dim(
            pos_table, jnp.minimum(i, pos_table.shape[0] - 1), axis=0,
            keepdims=False)
        logits, sk, sv = model.apply(
            params, tok, i, pos_row, cross_k, cross_v, sk, sv, mem_len,
            method=SpeechTransformer.decode_one)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        v = lp.shape[-1]
        lp = lp.reshape(b, k, v)
        pad_only = jnp.full((v,), neg_inf).at[constants.PAD].set(0.0)
        lp = jnp.where(finished[..., None], pad_only[None, None, :], lp)
        cand = logp[..., None] + lp
        top_val, top_idx = jax.lax.top_k(cand.reshape(b, k * v), k)
        src_beam = top_idx // v                                  # [B, K]
        sym = (top_idx % v).astype(jnp.int32)
        tokens = jnp.take_along_axis(tokens, src_beam[..., None], axis=1)
        tokens = jax.lax.dynamic_update_slice(
            tokens, sym[..., None], (0, 0, i + 1))
        finished = jnp.take_along_axis(finished, src_beam, axis=1)
        finished = finished | (sym == constants.EOS)
        # reorder the self-attention caches to follow surviving beams
        flat_src = (jnp.arange(b)[:, None] * k + src_beam).reshape(-1)
        sk = sk[:, flat_src]
        sv = sv[:, flat_src]
        return (tokens, top_val, finished, sk, sv), None

    (tokens, logp, finished, _, _), _ = jax.lax.scan(
        step, (tokens0, logp0, fin0, self_k, self_v), jnp.arange(max_len))

    return _finalize_beam(tokens, logp, lp_alpha)


def greedy_decode(model: SpeechTransformer, params, feats, feat_valid,
                  max_len: int = 64) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Autoregressive greedy decode. Returns (ids [B, max_len], lengths [B]).

    Full-recompute per step under lax.scan (static shapes; at L<=64 and
    d_model 512 the recompute is cheap relative to launch overheads; a KV
    cache is a later optimization).
    """
    b = feats.shape[0]
    memory, mem_valid = model.apply(params, feats, feat_valid,
                                    method=SpeechTransformer.encode)
    tokens0 = jnp.full((b, max_len + 1), constants.PAD, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(constants.SOS)
    finished0 = jnp.zeros((b,), jnp.bool_)

    def step(carry, i):
        tokens, finished = carry
        logits = model.apply(params, memory, mem_valid, tokens[:, :-1],
                             mask_pad=False,
                             method=SpeechTransformer.decode)
        nxt = jnp.argmax(logits[:, i, :], axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, constants.PAD, nxt)
        tokens = tokens.at[:, i + 1].set(nxt)
        finished = finished | (nxt == constants.EOS)
        return (tokens, finished), None

    (tokens, _), _ = jax.lax.scan(step, (tokens0, finished0),
                                  jnp.arange(max_len))
    return _finalize_greedy(tokens)


def _microbatched(decode_fn, feats, feat_valid, microbatch):
    """Run ``decode_fn(chunk_feats, chunk_valid)`` over sequential
    micro-batches via ``lax.map`` and re-concatenate every output.

    Why (measured, DESIGN.md §9 round 5): the per-step cross-attention
    K/V working set grows with batch and stops fitting VMEM residency
    between micro-batch 8 and 32 on v5e — one b32 greedy decode costs
    124 ms where four sequential b8 decodes cost 62 ms. Exact: each
    utterance's decode is independent, so chunking changes nothing but
    the schedule (parity-tested)."""
    b = feats.shape[0]
    if microbatch is None or b <= microbatch:
        return decode_fn(feats, feat_valid)
    if b % microbatch != 0:
        raise ValueError(f"batch {b} not divisible by microbatch "
                         f"{microbatch}")
    n = b // microbatch
    fc = feats.reshape(n, microbatch, *feats.shape[1:])
    vc = feat_valid.reshape(n, microbatch)
    outs = jax.lax.map(lambda xv: decode_fn(xv[0], xv[1]), (fc, vc))
    return jax.tree.map(
        lambda a: a.reshape(b, *a.shape[2:]), outs)


def greedy_decode_cached(model: SpeechTransformer, params, feats, feat_valid,
                         max_len: int = 64,
                         microbatch: Optional[int] = None,
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KV-cached autoregressive greedy decode — O(L) attention work per
    token instead of the full-recompute O(L^2) of :func:`greedy_decode`
    (same outputs; validated against it in tests).

    Cross-attention K/V are projected from the encoder memory once; each
    step appends one row to per-layer self-attention caches.

    ``microbatch``: decode in sequential chunks of this many utterances
    (exact; see :func:`_microbatched` — a measured 2x at batch 32 on
    v5e where the cross-KV working set outgrows VMEM residency).
    """
    if microbatch is not None and feats.shape[0] > microbatch:
        return _microbatched(
            lambda f, v: greedy_decode_cached(model, params, f, v,
                                              max_len=max_len),
            feats, feat_valid, microbatch)
    b = feats.shape[0]
    memory, mem_valid = model.apply(params, feats, feat_valid,
                                    method=SpeechTransformer.encode)
    cross_k, cross_v, pos_table = model.apply(
        params, memory, method=SpeechTransformer.precompute_decode_state)
    mem_len = jnp.sum(mem_valid.astype(jnp.int32), axis=-1)
    n_dec = model.num_dec_blocks
    d = model.d_model
    cache_dtype = cross_k.dtype
    self_k = jnp.zeros((n_dec, b, max_len, d), cache_dtype)
    self_v = jnp.zeros((n_dec, b, max_len, d), cache_dtype)

    tokens0 = jnp.full((b, max_len + 1), constants.PAD, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(constants.SOS)
    finished0 = jnp.zeros((b,), jnp.bool_)

    def step(carry, i):
        tokens, finished, sk, sv = carry
        tok = jnp.take_along_axis(tokens, i[None, None].repeat(b, 0),
                                  axis=1)[:, 0]
        pos_row = jax.lax.dynamic_index_in_dim(
            pos_table, jnp.minimum(i, pos_table.shape[0] - 1), axis=0,
            keepdims=False)
        logits, sk, sv = model.apply(
            params, tok, i, pos_row, cross_k, cross_v, sk, sv, mem_len,
            method=SpeechTransformer.decode_one)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, constants.PAD, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None],
                                              (0, i + 1))
        finished = finished | (nxt == constants.EOS)
        return (tokens, finished, sk, sv), None

    (tokens, _, _, _), _ = jax.lax.scan(
        step, (tokens0, finished0, self_k, self_v), jnp.arange(max_len))
    return _finalize_greedy(tokens)


def beam_decode(model: SpeechTransformer, params, feats, feat_valid,
                beam_size: int = 3, lp_alpha: float = 0.6,
                max_len: int = 64):
    """Batched beam search with length penalty (the reference declared
    beam_size=3 / lp_alpha=0.6 but never implemented them, model.py:38-39).

    Beams ride the batch axis: memory is tiled to [B*K, ...] and each scan
    step scores K*V continuations, keeping the top K per utterance.
    Returns (ids [B, max_len], lengths [B], scores [B]).
    """
    k = beam_size
    b = feats.shape[0]
    memory, mem_valid = model.apply(params, feats, feat_valid,
                                    method=SpeechTransformer.encode)
    mem = jnp.repeat(memory, k, axis=0)
    mvalid = jnp.repeat(mem_valid, k, axis=0)

    tokens0 = jnp.full((b, k, max_len + 1), constants.PAD, jnp.int32)
    tokens0 = tokens0.at[:, :, 0].set(constants.SOS)
    # only beam 0 live initially
    logp0 = jnp.tile(jnp.where(jnp.arange(k) == 0, 0.0, -1e30)[None], (b, 1))
    fin0 = jnp.zeros((b, k), jnp.bool_)

    neg_inf = -1e30

    def step(carry, i):
        tokens, logp, finished = carry
        flat = tokens.reshape(b * k, max_len + 1)
        logits = model.apply(params, mem, mvalid, flat[:, :-1],
                             mask_pad=False,
                             method=SpeechTransformer.decode)
        lp = jax.nn.log_softmax(logits[:, i, :].astype(jnp.float32), -1)
        v = lp.shape[-1]
        lp = lp.reshape(b, k, v)
        # finished beams: only PAD continuation at zero cost
        pad_only = jnp.full((v,), neg_inf).at[constants.PAD].set(0.0)
        lp = jnp.where(finished[..., None], pad_only[None, None, :], lp)
        cand = logp[..., None] + lp                      # [B, K, V]
        flat_cand = cand.reshape(b, k * v)
        top_val, top_idx = jax.lax.top_k(flat_cand, k)   # [B, K]
        src_beam = top_idx // v
        sym = (top_idx % v).astype(jnp.int32)
        tokens = jnp.take_along_axis(tokens, src_beam[..., None], axis=1)
        tokens = tokens.at[:, :, i + 1].set(sym)
        finished = jnp.take_along_axis(finished, src_beam, axis=1)
        finished = finished | (sym == constants.EOS)
        return (tokens, top_val, finished), None

    (tokens, logp, finished), _ = jax.lax.scan(
        step, (tokens0, logp0, fin0), jnp.arange(max_len))

    return _finalize_beam(tokens, logp, lp_alpha)
