"""Pallas beam-search kernel vs the lax.scan reference (interpret mode).

The kernel must reproduce ctc_decode's prefix beam search exactly: same
candidates, same rolling-hash merge, same top-W, same freeze semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_dfcnn_transformer_tpu.ops import ctc_beam_search_decode


def _compare(logits, lens, **kw):
    a = ctc_beam_search_decode(jnp.asarray(logits), jnp.asarray(lens),
                               backend="scan", **kw)
    b = ctc_beam_search_decode(jnp.asarray(logits), jnp.asarray(lens),
                               backend="pallas", **kw)
    np.testing.assert_array_equal(np.asarray(b[0]), np.asarray(a[0]))
    np.testing.assert_array_equal(np.asarray(b[1]), np.asarray(a[1]))
    np.testing.assert_allclose(np.asarray(b[2]), np.asarray(a[2]),
                               rtol=1e-4, atol=1e-5)


def test_beam_kernel_matches_scan_random():
    rng = np.random.default_rng(0)
    B, T, V = 4, 20, 10
    logits = rng.standard_normal((B, T, V)).astype(np.float32) * 2.0
    lens = np.array([T, T - 5, 3, T], np.int32)
    _compare(logits, lens, beam_width=4, topk=5, blank_id=-1,
             max_decode_len=8)


def test_beam_kernel_matches_scan_peaked():
    """Peaked lattice: the true labels must come out of both backends."""
    B, T, V, blank = 2, 12, 8, 7
    path = [blank, 3, 3, blank, 4, blank, 5, 5, blank, blank, 6, blank]
    logits = np.full((B, T, V), -5.0, np.float32)
    for t, c in enumerate(path):
        logits[:, t, c] = 5.0
    lens = np.array([T, T], np.int32)
    _compare(logits, lens, beam_width=4, topk=4, blank_id=-1,
             max_decode_len=6)
    ids, l, _ = ctc_beam_search_decode(
        jnp.asarray(logits), jnp.asarray(lens), beam_width=4, topk=4,
        blank_id=-1, max_decode_len=6, backend="pallas")
    assert list(np.asarray(ids[0][:4])) == [3, 4, 5, 6]
    assert int(l[0]) == 4


def test_beam_kernel_return_all_and_odd_batch():
    rng = np.random.default_rng(3)
    B, T, V = 3, 10, 6          # batch not a multiple of the block size
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lens = np.array([T, 1, T - 2], np.int32)
    kw = dict(beam_width=3, topk=3, blank_id=-1, max_decode_len=5,
              return_all=True)
    a = ctc_beam_search_decode(jnp.asarray(logits), jnp.asarray(lens),
                               backend="scan", **kw)
    b = ctc_beam_search_decode(jnp.asarray(logits), jnp.asarray(lens),
                               backend="pallas", **kw)
    np.testing.assert_array_equal(np.asarray(b[0]), np.asarray(a[0]))
    np.testing.assert_array_equal(np.asarray(b[1]), np.asarray(a[1]))
    np.testing.assert_allclose(np.asarray(b[2]), np.asarray(a[2]),
                               rtol=1e-4, atol=1e-5)


def test_beam_backend_validation():
    with pytest.raises(ValueError):
        ctc_beam_search_decode(jnp.zeros((1, 4, 5)), jnp.array([4]),
                               backend="nope")


def test_beam_topk_clamped_to_vocab():
    """Default topk (8) on a tiny vocab must not crash jax.lax.top_k; the
    search still recovers the path (both backends)."""
    B, T, V, blank = 1, 12, 6, 5
    path = [0, blank, 2, 2, blank, 3, blank, 3, 1, blank, blank, 1]
    logits = np.full((B, T, V), -5.0, np.float32)
    for t, c in enumerate(path):
        logits[0, t, c] = 5.0
    lens = np.array([T], np.int32)
    _compare(logits, lens, beam_width=4, blank_id=blank, max_decode_len=8)
    ids, l, _ = ctc_beam_search_decode(
        jnp.asarray(logits), jnp.asarray(lens), beam_width=4,
        blank_id=blank, max_decode_len=8, backend="scan")
    assert list(np.asarray(ids[0][:6])) == [0, 2, 3, 3, 1, 1]
    assert int(l[0]) == 6
