"""Parity tests for the single-load Pallas top-k kernel.

The kernel must be BIT-identical to the XLA sweep form
(``ctc_decode._topk_last_xla``) and to ``jax.lax.top_k`` — values
descending, ties broken by ascending index — because the beam search's
candidate set (and therefore every decoded transcript) depends on the
exact pick order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_dfcnn_transformer_tpu.ops.ctc_decode import _topk_last_xla
from asr_dfcnn_transformer_tpu.ops.pallas.topk_kernel import topk_last


def _check(x, k):
    vals_ref, ids_ref = _topk_last_xla(jnp.asarray(x), k)
    vals, ids = topk_last(jnp.asarray(x), k, interpret=True)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(vals_ref))
    lv, li = jax.lax.top_k(jnp.asarray(x, jnp.float32), k)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(li))
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(lv))


def test_random_beam_shape():
    x = np.random.RandomState(0).randn(4, 7, 96).astype(np.float32)
    _check(x, 8)


def test_ties_quantized():
    # coarse quantization forces many exact ties — the ascending-index
    # tie rule must match lax.top_k pick for pick
    x = np.round(np.random.RandomState(1).randn(6, 131) * 2) / 2
    _check(x.astype(np.float32), 5)


def test_all_equal_rows_and_k_equals_v():
    x = np.zeros((3, 9), np.float32)
    _check(x, 9)


def test_row_padding_unaligned():
    # 13 rows forces row padding; 33 lanes forces lane padding
    x = np.random.RandomState(2).randn(13, 33).astype(np.float32)
    _check(x, 4)


def test_neg_inf_entries():
    # entries already at the mask value must degrade identically
    x = np.random.RandomState(3).randn(5, 17).astype(np.float32)
    x[:, ::3] = -1e30
    _check(x, 10)


def test_k_greater_than_v_raises():
    with pytest.raises(ValueError):
        topk_last(jnp.zeros((2, 3)), 4, interpret=True)


def test_2d_and_4d_leading_dims():
    r = np.random.RandomState(4)
    _check(r.randn(257, 40).astype(np.float32), 3)   # rows > one tile
    _check(r.randn(2, 3, 2, 19).astype(np.float32), 2)


def test_beam_decode_unchanged_by_dispatch():
    # the dispatching _topk_last must leave the beam decode identical
    from asr_dfcnn_transformer_tpu.ops.ctc_decode import (
        _topk_last, ctc_beam_search_decode)
    r = np.random.RandomState(5)
    logits = jnp.asarray(r.randn(3, 12, 30), jnp.float32)
    lens = jnp.asarray([12, 7, 1], jnp.int32)
    v_d, i_d = _topk_last(logits, 6)
    v_x, i_x = _topk_last_xla(logits, 6)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_x))
    np.testing.assert_array_equal(np.asarray(v_d), np.asarray(v_x))
    ids, lengths, nlp = ctc_beam_search_decode(logits, lens, backend="scan")
    assert ids.shape[0] == 3 and lengths.shape == (3,)
