"""Fused dual-axis attention kernel vs the einsum reference path.

Covers both packing regimes: long rows (time axis, T=134 -> P=1) and short
rows packed block-diagonally (freq axis, T=20 -> P>1), forward and backward,
plus the MultiHeadAttention integration (fused="pallas" == fused="einsum",
and the intermediates-capture fallback).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_dfcnn_transformer_tpu.models.layers import MultiHeadAttention
from asr_dfcnn_transformer_tpu.ops.pallas.attn_kernel import (
    _pack_geometry,
    dual_axis_attention,
)


def _ref_attention(q, k, v):
    s = jnp.einsum("rtc,rsc->rts", q, k,
                   preferred_element_type=jnp.float32)
    s = s / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("rts,rsc->rtc", p, v)


def _rand_qkv(key, r, t, c, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (r, t, c), dtype) for k in ks)


@pytest.mark.parametrize("r,t,c", [
    (13, 134, 64),    # time axis: Tp=144, no packing, ragged row count
    (11, 80, 64),     # freq axis (LFR 80-dim features): Tp=80, no packing
    (40, 20, 64),     # short rows: Tp=32, P=4 block-diagonal packing
    (3, 7, 32),       # tiny everything (all padding paths)
])
def test_forward_matches_einsum(r, t, c):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), r, t, c)
    got = dual_axis_attention(q, k, v)
    want = _ref_attention(q, k, v)
    assert got.shape == (r, t, c) and got.dtype == q.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_pack_geometry():
    assert _pack_geometry(134) == (144, 1, 144)
    assert _pack_geometry(20) == (32, 4, 128)
    assert _pack_geometry(128) == (128, 1, 128)
    assert _pack_geometry(1) == (16, 8, 128)


def test_fused_wins_crossover():
    from asr_dfcnn_transformer_tpu.ops.pallas.attn_kernel import fused_wins
    # long rows (time axis): kernel at any batch
    assert fused_wins(160, 134) and fused_wins(8576, 134)
    # short packed rows (freq axis): kernel only below the measured R
    assert fused_wins(1072, 20)
    assert not fused_wins(4288, 20)


@pytest.mark.parametrize("r,t,c", [(5, 50, 64), (17, 20, 64)])
def test_backward_matches_einsum(r, t, c):
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), r, t, c)
    cot = jax.random.normal(jax.random.PRNGKey(2), (r, t, c), jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(dual_axis_attention(q, k, v).astype(jnp.float32) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attention(q, k, v).astype(jnp.float32) * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_fused, g_ref, "qkv"):
        gf, gr = np.asarray(gf, np.float32), np.asarray(gr, np.float32)
        scale = max(np.abs(gr).max(), 1e-3)
        np.testing.assert_allclose(gf / scale, gr / scale, atol=4e-2,
                                   err_msg=f"d{name}")


def test_mha_fused_equals_einsum():
    x = jax.random.normal(jax.random.PRNGKey(3), (10, 36, 64), jnp.bfloat16)
    mha_p = MultiHeadAttention(64, 1, fused="pallas")
    mha_e = MultiHeadAttention(64, 1, fused="einsum")
    params = mha_p.init(jax.random.PRNGKey(4), x, x)
    out_p = mha_p.apply(params, x, x)
    out_e = mha_e.apply(params, x, x)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(out_e, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_mha_fused_capture_intermediates_falls_back():
    """With capture_intermediates the einsum path (and its sow) must run
    even when fused="pallas"."""
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 16, 64), jnp.bfloat16)
    mha = MultiHeadAttention(64, 1, fused="pallas")
    params = mha.init(jax.random.PRNGKey(6), x, x)
    out, inter = mha.apply(params, x, x, mutable=["intermediates"])
    probs = inter["intermediates"]["attention"][0]
    assert probs.shape == (4, 1, 16, 16)
    np.testing.assert_allclose(np.asarray(jnp.sum(probs, -1), np.float32),
                               1.0, atol=2e-2)


def test_mha_fused_rejects_unknown_backend():
    x = jnp.zeros((2, 8, 64), jnp.bfloat16)
    mha = MultiHeadAttention(64, 1, fused="nope")
    with pytest.raises(ValueError, match="unknown attention backend"):
        mha.init(jax.random.PRNGKey(0), x, x)


def test_prenet_block_fused_equals_einsum():
    """Whole DualAxisAttentionBlock (both axes + conv/LN/residual) agrees
    across backends on shared params."""
    from asr_dfcnn_transformer_tpu.models.speech_transformer import (
        DualAxisAttentionBlock)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 34, 20, 64),
                          jnp.bfloat16)
    blk_p = DualAxisAttentionBlock(64, fused="pallas")
    blk_e = DualAxisAttentionBlock(64, fused="einsum")
    params = blk_p.init(jax.random.PRNGKey(8), x)
    out_p = blk_p.apply(params, x)
    out_e = blk_e.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(out_e, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_mha_cross_attention_never_fused():
    """tq != tk must take the einsum path even under fused="pallas": the
    kernel derives its packing geometry and slot mask from ONE length, so
    cross-attention would hand zero-padded phantom keys softmax weight.
    Exactness vs an einsum-only module on shared params is the proof."""
    q = jax.random.normal(jax.random.PRNGKey(9), (3, 24, 64), jnp.bfloat16)
    kv = jax.random.normal(jax.random.PRNGKey(10), (3, 9, 64), jnp.bfloat16)
    mha_p = MultiHeadAttention(64, 1, fused="pallas")
    mha_e = MultiHeadAttention(64, 1, fused="einsum")
    params = mha_p.init(jax.random.PRNGKey(11), q, kv)
    np.testing.assert_array_equal(
        np.asarray(mha_p.apply(params, q, kv), np.float32),
        np.asarray(mha_e.apply(params, q, kv), np.float32))
