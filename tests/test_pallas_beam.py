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


def test_beam_kernel_transposed_matches_scan():
    """batch_block > 8 routes to the transposed batch-on-lanes kernel
    (_beam_kernel_t); results must still match the scan backend exactly
    (interpret mode — the Mosaic compile is validated on TPU)."""
    import jax.numpy as jnp

    from asr_dfcnn_transformer_tpu.ops.pallas import beam_kernel

    rng = np.random.default_rng(17)
    B, T, V = 16, 15, 12
    logits = rng.standard_normal((B, T, V)).astype(np.float32) * 2.0
    lens = rng.integers(1, T + 1, size=B).astype(np.int32)
    w, k, lcap = 4, 3, 6
    import jax
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    top_lp, top_id = jax.lax.top_k(lp, k)
    ref = ctc_beam_search_decode(jnp.asarray(logits), jnp.asarray(lens),
                                 beam_width=w, topk=k, blank_id=-1,
                                 max_decode_len=lcap, backend="scan")
    pref, plen, pb, pnb = beam_kernel.beam_search(
        lp, top_lp, top_id, jnp.asarray(lens), beam_width=w, topk=k,
        blank=V - 1, max_decode_len=lcap, interpret=True, batch_block=16)
    from asr_dfcnn_transformer_tpu.ops.ctc_decode import _beam_finish
    ids, lns, nlp = _beam_finish(pref, plen, pb, pnb, lcap, False)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(lns), np.asarray(ref[1]))
    np.testing.assert_allclose(np.asarray(nlp), np.asarray(ref[2]),
                               rtol=1e-4, atol=1e-5)


def test_beam_kernel_transposed_exhausted_candidates():
    """Tie-safety of the transposed kernel's rank-based top-W when
    beam_width > live candidates (pick-loop regression analog)."""
    import jax
    import jax.numpy as jnp

    from asr_dfcnn_transformer_tpu.ops.ctc_decode import _beam_finish
    from asr_dfcnn_transformer_tpu.ops.pallas import beam_kernel

    rng = np.random.default_rng(19)
    B, T, V = 8, 10, 12
    logits = rng.standard_normal((B, T, V)).astype(np.float32) * 2.0
    lens = np.full((B,), T, np.int32)
    w, k, lcap = 6, 2, 6
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    top_lp, top_id = jax.lax.top_k(lp, k)
    ref = ctc_beam_search_decode(jnp.asarray(logits), jnp.asarray(lens),
                                 beam_width=w, topk=k, blank_id=-1,
                                 max_decode_len=lcap, backend="scan")
    pref, plen, pb, pnb = beam_kernel.beam_search(
        lp, top_lp, top_id, jnp.asarray(lens), beam_width=w, topk=k,
        blank=V - 1, max_decode_len=lcap, interpret=True, batch_block=16)
    ids, lns, nlp = _beam_finish(pref, plen, pb, pnb, lcap, False)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(lns), np.asarray(ref[1]))
    np.testing.assert_allclose(np.asarray(nlp), np.asarray(ref[2]),
                               rtol=1e-4, atol=1e-5)


def test_beam_backend_validation():
    with pytest.raises(ValueError):
        ctc_beam_search_decode(jnp.zeros((1, 4, 5)), jnp.array([4]),
                               backend="nope")


def test_beam_kernel_exhausted_candidates_no_duplicates():
    """beam_width > topk+1: after round live-candidate exhaustion the pick
    loop must fall back to DISTINCT dead candidates (regression: masking
    picked entries to the dead-candidate score re-picked index 0, creating
    full-mass duplicate beams whose merge double-counted probability)."""
    rng = np.random.default_rng(7)
    B, T, V = 2, 10, 12
    logits = rng.standard_normal((B, T, V)).astype(np.float32) * 2.0
    lens = np.array([T, T - 3], np.int32)
    kw = dict(beam_width=6, topk=2, blank_id=-1, max_decode_len=6)
    _compare(logits, lens, **kw)
    # total probability over all beams must never exceed 1
    _, _, tot = ctc_beam_search_decode(
        jnp.asarray(logits), jnp.asarray(lens), return_all=True,
        backend="pallas", **kw)
    mass = np.log(np.sum(np.exp(np.asarray(tot)), axis=1))
    assert np.all(mass <= 1e-4), mass


def test_beam_kernel_default_width_small_vocab():
    """Default beam_width=8 on a vocab < 8 (topk clamps below W): the
    kernel must stay tie-safe and match the scan backend exactly."""
    rng = np.random.default_rng(11)
    B, T, V = 3, 14, 5
    logits = rng.standard_normal((B, T, V)).astype(np.float32) * 2.0
    lens = np.array([T, 4, T - 1], np.int32)
    _compare(logits, lens, beam_width=8, topk=8, blank_id=-1,
             max_decode_len=8)


def test_beam_kernel_even_non8_batch():
    """Batches that are even but not multiples of 8 (e.g. 12) exercise the
    pad-to-8 path that keeps manual-DMA sublane offsets aligned."""
    rng = np.random.default_rng(13)
    B, T, V = 12, 9, 7
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lens = rng.integers(1, T + 1, size=B).astype(np.int32)
    _compare(logits, lens, beam_width=4, topk=3, blank_id=-1,
             max_decode_len=6)


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
