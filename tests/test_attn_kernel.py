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


# ---------------------------------------------------------------------------
# masked_flash_attention (multi-head, causal + key-validity masks)
# ---------------------------------------------------------------------------

from asr_dfcnn_transformer_tpu.models.layers import attention_mask  # noqa: E402
from asr_dfcnn_transformer_tpu.ops.pallas.attn_kernel import (  # noqa: E402
    masked_flash_attention,
)


def _ref_masked(q, k, v, k_valid, causal):
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    kv = jnp.ones((b, tk), jnp.bool_) if k_valid is None else k_valid
    mask = attention_mask(jnp.ones((b, tq), jnp.bool_), kv, causal=causal)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s / jnp.sqrt(jnp.asarray(dh, jnp.float32)) + mask
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _rand_bhtd(key, b, h, tq, tk, dh, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 3)
    return (jax.random.normal(ks[0], (b, h, tq, dh), dtype),
            jax.random.normal(ks[1], (b, h, tk, dh), dtype),
            jax.random.normal(ks[2], (b, h, tk, dh), dtype))


@pytest.mark.parametrize("b,h,tq,tk,dh,causal,ragged", [
    (4, 8, 64, 64, 64, True, True),      # LM shape class: Tp=64, P=2 packing
    (2, 8, 100, 100, 64, True, False),   # LM position cap: P=1
    (3, 4, 24, 130, 64, False, True),    # rectangular cross-attention
    (3, 4, 24, 130, 64, True, True),     # parity_decoder causal cross-attn
    (2, 2, 7, 7, 32, True, True),        # tiny everything (padding paths)
    (1, 8, 200, 200, 64, False, True),   # ctc_attention class, unmasked keys
])
def test_masked_flash_forward_matches_einsum(b, h, tq, tk, dh, causal,
                                             ragged):
    q, k, v = _rand_bhtd(jax.random.PRNGKey(0), b, h, tq, tk, dh)
    k_valid = None
    if ragged:
        # non-contiguous validity on purpose: the mask contract is an
        # arbitrary boolean vector, not a prefix length
        k_valid = jax.random.uniform(jax.random.PRNGKey(1), (b, tk)) > 0.3
        k_valid = k_valid.at[:, 0].set(True)
    got = masked_flash_attention(q, k, v, k_valid, causal=causal)
    want = _ref_masked(q, k, v, k_valid, causal)
    assert got.shape == (b, h, tq, dh) and got.dtype == q.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_flash_wins_policy():
    from asr_dfcnn_transformer_tpu.ops.pallas.attn_kernel import flash_wins
    # atten class (t=200, P=1): einsum — the early "+4.5% kernel" A/B
    # had closure-constant lengths folding both sides' masks; the honest
    # re-measure flipped it (einsum 3.404 vs kernel 4.192 ms model fwd)
    assert not flash_wins(256, 200, 200)
    # LM inference class (t=64 packed, r=b128*h8): win
    assert flash_wins(1024, 64, 64)
    # e2e decoder self (t=64, r=512): below the LM row floor
    assert not flash_wins(512, 64, 64)
    # e2e encoder (t=400): measured wash/loss
    assert not flash_wins(512, 400, 400)
    # rectangular cross-attention: never auto
    assert not flash_wins(512, 64, 400)
    # LM position cap (t=100 -> Tp=112): outside the P=1 win band
    assert not flash_wins(1024, 100, 100)


def test_masked_flash_pack_override_matches():
    """pack=False (the P=1 tuning override) must agree with the packed
    default and the einsum reference on a P>1 shape."""
    b, h, t, dh = 3, 4, 20, 32
    q, k, v = _rand_bhtd(jax.random.PRNGKey(30), b, h, t, t, dh)
    k_valid = jnp.arange(t)[None, :] < jnp.array([20, 9, 3])[:, None]
    packed = masked_flash_attention(q, k, v, k_valid, causal=True)
    flat = masked_flash_attention(q, k, v, k_valid, causal=True,
                                  pack=False)
    want = _ref_masked(q, k, v, k_valid, True)
    for got in (packed, flat):
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=2e-2, rtol=2e-2)


def test_masked_flash_fully_invalid_row_matches_einsum():
    """A batch row whose keys are ALL invalid must reproduce the einsum
    path's uniform-softmax-over--1e9 behavior (finite, no NaN)."""
    b, h, t, dh = 2, 2, 16, 32
    q, k, v = _rand_bhtd(jax.random.PRNGKey(2), b, h, t, t, dh)
    k_valid = jnp.zeros((b, t), jnp.bool_).at[1].set(True)
    got = masked_flash_attention(q, k, v, k_valid)
    want = _ref_masked(q, k, v, k_valid, False)
    assert bool(jnp.all(jnp.isfinite(got.astype(jnp.float32))))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("b,h,tq,tk,dh,causal", [
    (2, 4, 20, 20, 32, True),    # packed, causal
    (2, 2, 40, 130, 64, False),  # rectangular
])
def test_masked_flash_backward_matches_einsum(b, h, tq, tk, dh, causal):
    q, k, v = _rand_bhtd(jax.random.PRNGKey(3), b, h, tq, tk, dh)
    k_valid = (jnp.arange(tk)[None, :]
               < jnp.linspace(tk // 2, tk, b).astype(jnp.int32)[:, None])
    cot = jax.random.normal(jax.random.PRNGKey(4), (b, h, tq, dh),
                            jnp.float32)

    def loss_flash(q, k, v):
        out = masked_flash_attention(q, k, v, k_valid, causal=causal)
        return jnp.sum(out.astype(jnp.float32) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(
            _ref_masked(q, k, v, k_valid, causal).astype(jnp.float32) * cot)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        gf, gr = np.asarray(gf, np.float32), np.asarray(gr, np.float32)
        scale = max(np.abs(gr).max(), 1e-3)
        np.testing.assert_allclose(gf / scale, gr / scale, atol=4e-2,
                                   err_msg=f"d{name}")


def _ref_masked_dropout(q, k, v, k_valid, causal, dmask, keep_prob):
    """Einsum reference applying the SAME keep-mask with flax Dropout
    semantics (select(keep, p/keep_prob, 0) on the dtype-cast probs)."""
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    kv = jnp.ones((b, tk), jnp.bool_) if k_valid is None else k_valid
    mask = attention_mask(jnp.ones((b, tq), jnp.bool_), kv, causal=causal)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s / jnp.sqrt(jnp.asarray(dh, jnp.float32)) + mask
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    p = jnp.where(dmask, p / jnp.asarray(keep_prob, p.dtype),
                  jnp.zeros((), p.dtype))
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("tq,tk,causal", [
    (20, 20, True),    # packed (P > 1)
    (40, 130, False),  # rectangular, unpacked
])
def test_masked_flash_dropout_matches_same_mask_reference(tq, tk, causal):
    b, h, dh, keep_prob = 2, 4, 32, 0.6
    q, k, v = _rand_bhtd(jax.random.PRNGKey(20), b, h, tq, tk, dh)
    k_valid = (jnp.arange(tk)[None, :]
               < jnp.array([tk - 3, tk])[:, None])
    dmask = jax.random.bernoulli(jax.random.PRNGKey(21), keep_prob,
                                 (b, h, tq, tk))
    got = masked_flash_attention(q, k, v, k_valid, causal=causal,
                                 dropout_mask=dmask, keep_prob=keep_prob)
    want = _ref_masked_dropout(q, k, v, k_valid, causal, dmask, keep_prob)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)
    # gradient: the bwd kernel must re-apply the identical mask
    cot = jax.random.normal(jax.random.PRNGKey(22), (b, h, tq, dh),
                            jnp.float32)

    def loss_flash(q, k, v):
        out = masked_flash_attention(q, k, v, k_valid, causal=causal,
                                     dropout_mask=dmask,
                                     keep_prob=keep_prob)
        return jnp.sum(out.astype(jnp.float32) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_masked_dropout(
            q, k, v, k_valid, causal, dmask, keep_prob
        ).astype(jnp.float32) * cot)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        gf, gr = np.asarray(gf, np.float32), np.asarray(gr, np.float32)
        scale = max(np.abs(gr).max(), 1e-3)
        np.testing.assert_allclose(gf / scale, gr / scale, atol=4e-2,
                                   err_msg=f"d{name}")


def test_masked_flash_all_keep_equals_deterministic():
    b, h, t, dh = 2, 2, 24, 32
    q, k, v = _rand_bhtd(jax.random.PRNGKey(23), b, h, t, t, dh)
    ones = jnp.ones((b, h, t, t), jnp.bool_)
    np.testing.assert_array_equal(
        np.asarray(masked_flash_attention(q, k, v, dropout_mask=ones,
                                          keep_prob=1.0), np.float32),
        np.asarray(masked_flash_attention(q, k, v), np.float32))


def test_mha_flash_training_dropout():
    """fused="pallas" + deterministic=False + dropout_rate > 0 must run
    the flash path with a real dropout draw: finite, differs from the
    deterministic output, and grads flow."""
    b, t, d, h = 2, 16, 64, 4
    x = jax.random.normal(jax.random.PRNGKey(24), (b, t, d), jnp.bfloat16)
    mha = MultiHeadAttention(d, h, dropout_rate=0.5, fused="pallas")
    params = mha.init(jax.random.PRNGKey(25), x, x)
    det = mha.apply(params, x, x, causal=True)
    tr = mha.apply(params, x, x, causal=True, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(26)})
    assert bool(jnp.all(jnp.isfinite(tr.astype(jnp.float32))))
    assert not np.array_equal(np.asarray(tr), np.asarray(det))

    def loss(p):
        out = mha.apply(p, x, x, causal=True, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(26)})
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(le))) for le in leaves)
    assert any(float(jnp.abs(le).max()) > 0 for le in leaves)


def test_mha_structured_mask_matches_dense_mask():
    """k_valid/causal kwargs == the dense attention_mask on the einsum
    path (exact array equality: same mask values, same program)."""
    b, t, d, h = 3, 18, 64, 4
    x = jax.random.normal(jax.random.PRNGKey(5), (b, t, d), jnp.bfloat16)
    k_valid = jnp.arange(t)[None, :] < jnp.array([18, 9, 1])[:, None]
    mha = MultiHeadAttention(d, h, fused="einsum")
    params = mha.init(jax.random.PRNGKey(6), x, x)
    dense = attention_mask(jnp.ones((b, t), jnp.bool_), k_valid, causal=True)
    np.testing.assert_array_equal(
        np.asarray(mha.apply(params, x, x, k_valid=k_valid, causal=True),
                   np.float32),
        np.asarray(mha.apply(params, x, x, mask=dense), np.float32))


def test_mha_flash_equals_einsum_structured():
    b, t, d, h = 3, 30, 64, 4
    x = jax.random.normal(jax.random.PRNGKey(7), (b, t, d), jnp.bfloat16)
    k_valid = jnp.arange(t)[None, :] < jnp.array([30, 17, 5])[:, None]
    mha_p = MultiHeadAttention(d, h, fused="pallas")
    mha_e = MultiHeadAttention(d, h, fused="einsum")
    params = mha_p.init(jax.random.PRNGKey(8), x, x)
    out_p = mha_p.apply(params, x, x, k_valid=k_valid, causal=True)
    out_e = mha_e.apply(params, x, x, k_valid=k_valid, causal=True)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(out_e, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_mha_rejects_mask_plus_structured():
    x = jnp.zeros((2, 8, 64), jnp.bfloat16)
    mha = MultiHeadAttention(64, 2)
    mask = jnp.zeros((2, 1, 8, 8), jnp.float32)
    params = mha.init(jax.random.PRNGKey(0), x, x)
    with pytest.raises(ValueError, match="not both"):
        mha.apply(params, x, x, mask=mask, causal=True)


def test_transformer_lm_flash_equals_einsum():
    """Whole-model check: the LM forward (causal + PAD-key masking) agrees
    across backends on shared params, including PAD-heavy rows."""
    from asr_dfcnn_transformer_tpu.models.transformer_lm import TransformerLM
    ids = jnp.array([[3, 5, 9, 2, 0, 0, 0, 0],
                     [7, 7, 7, 7, 7, 7, 7, 6]], jnp.int32)
    kwargs = dict(d_model=64, num_heads=4, num_blocks=2, dropout_rate=0.0)
    lm_p = TransformerLM(32, 48, fused_attention="pallas", **kwargs)
    lm_e = TransformerLM(32, 48, fused_attention="einsum", **kwargs)
    params = lm_p.init(jax.random.PRNGKey(9), ids)
    out_p = lm_p.apply(params, ids)
    out_e = lm_e.apply(params, ids)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_e),
                               atol=5e-2, rtol=5e-2)


def test_speech_transformer_flash_equals_einsum():
    """Encoder + decoder (self/cross masks) agree across backends."""
    from asr_dfcnn_transformer_tpu.models.speech_transformer import (
        SpeechTransformer)
    b, t, f = 2, 32, 20
    feats = jax.random.normal(jax.random.PRNGKey(10), (b, t, f, 1),
                              jnp.bfloat16)
    feat_valid = jnp.array([32, 17], jnp.int32)
    dec = jnp.array([[2, 5, 7, 0], [2, 9, 0, 0]], jnp.int32)
    kwargs = dict(d_model=32, num_heads=2, num_enc_blocks=1,
                  num_dec_blocks=1, prenet_channels=8, dropout_rate=0.0,
                  dtype=jnp.bfloat16)
    m_p = SpeechTransformer(16, fused_attention="pallas", **kwargs)
    m_e = SpeechTransformer(16, fused_attention="einsum", **kwargs)
    params = m_p.init(jax.random.PRNGKey(11), feats, feat_valid, dec)
    out_p = m_p.apply(params, feats, feat_valid, dec)
    out_e = m_e.apply(params, feats, feat_valid, dec)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_e),
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
