"""Shared Flax building blocks.

TPU-first re-designs of the reference's op library
(``end2end/transformer.py:4-344``) and CNN components
(``lm_and_am/model/acoustic_model2.py:101-151``):

- convolutions run in NHWC with bfloat16 compute / float32 params (MXU),
- attention is einsum-based with proper [B, H, T, Dh] head layout instead of
  the reference's batch-dim split (``transformer.py:144-146``),
- masks come from token ids / lengths instead of embedding-sum signs
  (``transformer.py:64-68``) — numerically equivalent given row-0
  zero-padded embeddings, but robust and free of reductions,
- the reference's nonstandard ReLU-activated bias-free Q/K/V projections
  (``transformer.py:139-141``) are kept behind ``parity_attention`` so
  weight-parity runs reproduce them while fresh training can use standard
  linear projections.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = jnp.dtype

_BIG_NEG = -1e9


def bf16_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    """``lax.dot_general`` with bf16 operands and f32 accumulation.

    Drop-in for ``nn.Dense(dot_general=...)``: the MXU runs bf16 inputs
    at ~4x the f32 rate and natively accumulates in f32, so forcing the
    operands down while keeping ``preferred_element_type=f32`` gives the
    fast path with exact f32 accumulation — the only new error is the
    bf16 rounding of the operands themselves. For the AM logits head the
    activations already went through a bf16 conv stack, so only the
    weight rounding (~3e-3 relative) is new. Output dtype stays f32.
    """
    del preferred_element_type  # always f32: the caller wants exact accum
    return jax.lax.dot_general(
        lhs.astype(jnp.bfloat16), rhs.astype(jnp.bfloat16),
        dimension_numbers, precision=precision,
        preferred_element_type=jnp.float32)


class ConvBnCell(nn.Module):
    """Conv3x3(+ReLU) then BatchNorm (the reference's layer order:
    activation inside the conv, BN after — acoustic_model2.py:107-113,127),
    optional 2x2 pooling.

    ``pool_type``: 'max' (Keras cnn_ctc.py:133) or 'avg' (the SE models'
    "maxpool" that actually average-pools, acoustic_model2.py:115-117).
    """

    features: int
    pool: bool = False
    pool_type: str = "max"
    nin: bool = False           # 1x1 network-in-network insert (acoustic_model.py:49)
    nin_features: int = 32
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         dtype=self.dtype)(x)
        if self.nin:
            x = nn.Conv(self.nin_features, (1, 1), padding="SAME",
                        dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             dtype=self.dtype)(x)
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             dtype=self.dtype)(x)
        if self.pool:
            window = (2, 2)
            if self.pool_type == "max":
                x = nn.max_pool(x, window, strides=window)
            else:
                x = nn.avg_pool(x, window, strides=window)
        return x


class SqueezeExcite(nn.Module):
    """Squeeze-excitation channel gate (acoustic_model2.py:141-148):
    BN -> global average pool -> Dense(c/ratio) relu -> Dense(c) sigmoid ->
    channel-scale."""

    features: int
    ratio: int = 2
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         dtype=self.dtype)(x)
        squeeze = jnp.mean(x, axis=(1, 2), keepdims=True)
        e = nn.Dense(max(self.features // self.ratio, 1), dtype=self.dtype)(squeeze)
        e = nn.relu(e)
        e = nn.Dense(self.features, dtype=self.dtype)(e)
        e = nn.sigmoid(e)
        return x * e


@jax.custom_vjp
def _take_rows(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """``table[ids]`` with an MXU-friendly backward.

    ``jnp.take``'s VJP is a scatter-add, which serializes on TPU: the
    token-embedding gradient alone measured 9.9 ms of a 14.5 ms LM train
    step ([64,64] ids into a [1536,512] table, v5e). The custom VJP
    computes ``d(table) = one_hot(ids)^T @ g`` — one [V, N]x[N, D]
    matmul (~0.07 ms for the same shapes), numerically the same sum.
    """
    return jnp.take(table, ids, axis=0)


def _take_rows_fwd(table, ids):
    return _take_rows(table, ids), (ids, table.shape[0])


def _take_rows_bwd(res, g):
    ids, vocab = res
    flat_ids = ids.reshape(-1)
    gflat = g.reshape(flat_ids.shape[0], -1)
    one_hot = jax.nn.one_hot(flat_ids, vocab, dtype=gflat.dtype)
    # HIGHEST precision keeps the sum exact vs the scatter-add it replaces
    # (the TPU default rounds the incoming gradients through bf16 operands)
    dtable = jnp.dot(one_hot.T, gflat, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return dtable.astype(g.dtype), np.zeros(ids.shape, jax.dtypes.float0)


_take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


class ScaledEmbed(nn.Module):
    """Token embedding with optional sqrt(d) scaling and a zeroed PAD row
    (transformer.py:30-55 'zero_pad' + 'scale')."""

    vocab_size: int
    features: int
    scale: bool = True
    zero_pad: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, ids):
        table = self.param(
            "embedding", nn.initializers.normal(stddev=1.0 / jnp.sqrt(self.features)),
            (self.vocab_size, self.features), jnp.float32)
        if self.zero_pad:
            table = jnp.asarray(table).at[0].set(0.0)
        out = _take_rows(table, ids).astype(self.dtype)
        if self.scale:
            out = out * jnp.asarray(self.features ** 0.5, self.dtype)
        return out


class LearnedPositionEmbed(nn.Module):
    """Learned absolute position embedding, capped at ``max_length``
    (language_model.py:29-30 — the reference faults beyond the cap; we clip
    indices so longer inputs degrade instead of crashing, documented
    deviation)."""

    max_length: int
    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, length: int):
        table = self.param("embedding", nn.initializers.normal(stddev=0.02),
                           (self.max_length, self.features), jnp.float32)
        idx = jnp.minimum(jnp.arange(length), self.max_length - 1)
        return _take_rows(table, idx).astype(self.dtype)


def attention_mask(q_valid: jnp.ndarray, k_valid: jnp.ndarray,
                   causal: bool = False) -> jnp.ndarray:
    """Build an additive [B, 1, Tq, Tk] mask from boolean validity vectors.

    Replaces the reference's embedding-sum key masks + tril future mask
    (transformer.py:58-86).
    """
    mask = k_valid[:, None, None, :]
    if causal:
        tq, tk = q_valid.shape[-1], k_valid.shape[-1]
        tri = jnp.tril(jnp.ones((tq, tk), jnp.bool_))
        mask = mask & tri[None, None, :, :]
    return jnp.where(mask, 0.0, _BIG_NEG)


class MultiHeadAttention(nn.Module):
    """Multi-head scaled dot-product attention with residual + LayerNorm.

    ``parity``: reproduce the reference's ReLU-activated, bias-free Q/K/V
    projections (transformer.py:139-141); otherwise standard linear ones.
    Head split is a proper reshape to [B, H, T, Dh]; softmax in float32.

    Besides the full-sequence ``__call__``, the module exposes the pieces
    needed for KV-cached autoregressive decoding: :meth:`project_kv` (run
    once per sequence / appended token) and :meth:`attend_step` (one query
    position over a cache prefix).

    ``fused``: backend for the single-head, unmasked, dropout-free case
    (the e2e pre-net's dual-axis rows): "auto" (Pallas kernel on TPU,
    einsum elsewhere — same convention as ``FbankConfig.backend``),
    "pallas" (force the kernel; interprets off-TPU), or "einsum". The
    kernel keeps the f32 score matrices in VMEM instead of round-tripping
    them through HBM (DESIGN.md §9 round-4 e2e analysis). Capturing
    attention maps (``capture_intermediates``) falls back to einsum so
    ``sow`` keeps working.
    """

    d_model: int
    num_heads: int
    dropout_rate: float = 0.0
    parity: bool = False
    fused: str = "auto"
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        # names preserve the original @nn.compact parameter paths
        self.q_proj = nn.Dense(self.d_model, use_bias=not self.parity,
                               dtype=self.dtype, name="q")
        self.k_proj = nn.Dense(self.d_model, use_bias=not self.parity,
                               dtype=self.dtype, name="k")
        self.v_proj = nn.Dense(self.d_model, use_bias=not self.parity,
                               dtype=self.dtype, name="v")
        # The reference projects the concatenated heads through a FOURTH
        # dense before the residual — ReLU'd and bias-free in parity mode,
        # like its Q/K/V (transformer.py:144-150) — standard linear
        # otherwise.
        self.out_proj = nn.Dense(self.d_model, use_bias=not self.parity,
                                 dtype=self.dtype, name="out")
        self.norm = nn.LayerNorm(dtype=self.dtype, name="LayerNorm_0")
        self.drop = nn.Dropout(self.dropout_rate)

    def _act(self, y):
        return nn.relu(y) if self.parity else y

    def project_q(self, x):
        return self._act(self.q_proj(x))

    def project_kv(self, x):
        """[B, T, D] -> (k, v) both [B, T, D] (pre head-split)."""
        return self._act(self.k_proj(x)), self._act(self.v_proj(x))

    def _finish(self, out, queries):
        out = self._act(self.out_proj(out))
        out = out + queries  # residual (transformer.py:149-151)
        return self.norm(out)

    def __call__(self, queries, keys, values=None, *, mask=None,
                 k_valid=None, causal: bool = False,
                 deterministic: bool = True):
        """``mask``: a dense additive [B, 1, Tq, Tk] tensor (arbitrary
        structure, einsum path only). ``k_valid`` [B, Tk] bool + ``causal``
        are the STRUCTURED equivalent of ``attention_mask(q_valid,
        k_valid, causal)`` — semantically identical, but the structure
        lets the masked flash kernel apply the mask in VMEM instead of
        materializing it. Pass one or the other, not both."""
        if mask is not None and (k_valid is not None or causal):
            raise ValueError("pass either a dense mask or structured "
                             "k_valid/causal, not both")
        if values is None:
            values = keys
        b, tq, _ = queries.shape
        tk = keys.shape[1]
        h, dh = self.num_heads, self.d_model // self.num_heads

        if self.fused not in ("auto", "pallas", "einsum"):
            raise ValueError(f"unknown attention backend {self.fused!r}")
        from asr_dfcnn_transformer_tpu.ops.pallas.attn_kernel import (
            dual_axis_attention, flash_wins, fused_wins, masked_flash_attention)
        dropout_on = not deterministic and self.dropout_rate > 0.0
        kernel_ok = (
            self.fused != "einsum" and mask is None
            and not self.is_mutable_collection("intermediates"))
        use_fused = (
            kernel_ok and not dropout_on
            and h == 1 and k_valid is None and not causal
            # self-attention only: the kernel derives its packing geometry
            # and slot mask from ONE length, so tq != tk (cross-attention)
            # would let zero-padded phantom keys receive softmax weight
            and tq == tk
            and (self.fused == "pallas"
                 or (jax.default_backend() == "tpu"
                     and fused_wins(b, tk))))
        if use_fused:
            q = self.project_q(queries)
            k, v = self._act(self.k_proj(keys)), self._act(self.v_proj(values))
            out = dual_axis_attention(q, k, v)
            return self._finish(out, queries)
        use_flash = (
            kernel_ok and dh <= 128
            and (self.fused == "pallas"
                 # auto never picks the kernel when attention dropout is
                 # live: measured LM/e2e training losses (flash_wins doc)
                 or (not dropout_on
                     and jax.default_backend() == "tpu"
                     and flash_wins(b * h, tq, tk))))
        if use_flash:
            q = self.project_q(queries).reshape(b, tq, h, dh)\
                .transpose(0, 2, 1, 3)
            k = self._act(self.k_proj(keys)).reshape(b, tk, h, dh)\
                .transpose(0, 2, 1, 3)
            v = self._act(self.v_proj(values)).reshape(b, tk, h, dh)\
                .transpose(0, 2, 1, 3)
            dmask, keep = None, 1.0
            if dropout_on:
                # attention-probability dropout with flax semantics; a
                # different draw than the einsum path's Dropout submodule
                # (its rng folds in the submodule path), equally valid
                keep = 1.0 - self.dropout_rate
                dmask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep, (b, h, tq, tk))
            out = masked_flash_attention(q, k, v, k_valid, causal=causal,
                                         dropout_mask=dmask,
                                         keep_prob=keep)
            out = out.transpose(0, 2, 1, 3).reshape(b, tq, self.d_model)
            return self._finish(out, queries)
        if k_valid is not None or causal:
            kv = (jnp.ones((b, tk), jnp.bool_) if k_valid is None
                  else k_valid)
            mask = attention_mask(jnp.ones((b, tq), jnp.bool_), kv,
                                  causal=causal)

        q = self.project_q(queries).reshape(b, tq, h, dh).transpose(0, 2, 1, 3)
        k = self._act(self.k_proj(keys)).reshape(b, tk, h, dh)\
            .transpose(0, 2, 1, 3)
        v = self._act(self.v_proj(values)).reshape(b, tk, h, dh)\
            .transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(dh, jnp.float32))
        if mask is not None:
            scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        # recoverable via capture_intermediates — the equivalent of the
        # reference's attention-heatmap TensorBoard summary
        # (transformer.py:105-106)
        self.sow("intermediates", "attention", probs)
        probs = self.drop(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, tq, self.d_model)
        return self._finish(out, queries)

    def attend_step(self, query_t, k_cache, v_cache, valid_len):
        """One-position cached attention.

        query_t: [B, 1, D]; k_cache/v_cache: [B, Tmax, D] (projected, only
        the first ``valid_len`` rows meaningful); valid_len: scalar or [B].
        Returns [B, 1, D] (residual + LayerNorm applied).
        """
        b, _, _ = query_t.shape
        tk = k_cache.shape[1]
        h, dh = self.num_heads, self.d_model // self.num_heads
        q = self.project_q(query_t).reshape(b, 1, h, dh).transpose(0, 2, 1, 3)
        k = k_cache.reshape(b, tk, h, dh).transpose(0, 2, 1, 3)
        v = v_cache.reshape(b, tk, h, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(dh, jnp.float32))
        valid = jnp.asarray(valid_len)
        valid = valid[:, None] if valid.ndim == 1 else valid[None, None]
        key_ok = jnp.arange(tk)[None, :] < valid
        scores = jnp.where(key_ok[:, None, None, :], scores, _BIG_NEG)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, self.d_model)
        return self._finish(out, query_t)


class _DenseParams(nn.Module):
    """Parameter container with nn.Dense's exact tree (kernel [in, out]
    f32 lecun_normal + bias [out] zeros) so FeedForward's fused and
    unfused execution paths share one checkpoint layout."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return kernel, bias


class FeedForward(nn.Module):
    """Position-wise FFN: two 1x1 projections (inner 4*d_model ReLU) with
    residual + LayerNorm (transformer.py:204-231).

    ``fused``: backend for the two projections + ReLU ("auto" / "pallas"
    / "einsum", the FbankConfig.backend convention). The Pallas kernel
    (`ops/pallas/ffn_kernel.py`) keeps the [N, inner] activation in VMEM
    instead of round-tripping it through HBM — the measured gap between
    XLA's two-dot lowering and the MXU floor (DESIGN.md §9). Parameters
    live under the same Dense_0/Dense_1 names either way (checkpoints
    interchangeable); the unfused path executes nn.Dense's exact op
    sequence on them."""

    d_model: int
    inner: Optional[int] = None
    dropout_rate: float = 0.0
    fused: str = "auto"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        inner = self.inner or 4 * self.d_model
        d_in = x.shape[-1]
        w1, b1 = _DenseParams(inner, d_in, name="Dense_0")()
        w2, b2 = _DenseParams(self.d_model, inner, name="Dense_1")()
        if self.fused not in ("auto", "pallas", "einsum"):
            raise ValueError(f"unknown ffn backend {self.fused!r}")
        from asr_dfcnn_transformer_tpu.ops.pallas.ffn_kernel import (
            ffn_wins, fused_ffn)
        n = 1
        for s in x.shape[:-1]:
            n *= s
        use_fused = (
            self.fused != "einsum"
            and (self.fused == "pallas"
                 or (deterministic
                     and jax.default_backend() == "tpu"
                     and ffn_wins(n))))
        xc = x.astype(self.dtype)
        if use_fused:
            y = fused_ffn(xc, w1, b1, w2, b2)
        else:
            w1c, b1c, w2c, b2c = (a.astype(self.dtype)
                                  for a in (w1, b1, w2, b2))
            dims = (((xc.ndim - 1,), (0,)), ((), ()))
            y = jax.lax.dot_general(xc, w1c, dims) + b1c
            y = nn.relu(y)
            y = jax.lax.dot_general(y, w2c, dims) + b2c
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        y = y + x
        return nn.LayerNorm(dtype=self.dtype)(y)


def label_smoothing(one_hot: jnp.ndarray, epsilon: float = 0.1) -> jnp.ndarray:
    """Uniform label smoothing (transformer.py:332-340)."""
    v = one_hot.shape[-1]
    return (1.0 - epsilon) * one_hot + epsilon / v


def shift_right(ids: jnp.ndarray, bos: int) -> jnp.ndarray:
    """Decoder-input shift: prepend BOS, drop last (transformer.py:342-344)."""
    return jnp.concatenate(
        [jnp.full_like(ids[:, :1], bos), ids[:, :-1]], axis=1)
