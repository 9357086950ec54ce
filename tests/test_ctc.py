import numpy as np
import optax
import pytest

from asr_dfcnn_transformer_tpu import ops
from tests import golden


def _random_problem(rng, b=4, t=30, v=12, lmax=8):
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    logit_len = rng.integers(lmax + 2, t + 1, size=b).astype(np.int32)
    label_len = rng.integers(1, lmax + 1, size=b).astype(np.int32)
    labels = rng.integers(0, v - 1, size=(b, lmax)).astype(np.int32)  # no blank
    return logits, logit_len, labels, label_len


def test_ctc_loss_matches_golden_dp():
    rng = np.random.default_rng(0)
    logits, logit_len, labels, label_len = _random_problem(rng)
    loss = np.asarray(ops.ctc_loss(logits, logit_len, labels, label_len,
                                   blank_id=-1))
    for i in range(len(loss)):
        lp = np.log(np.exp(logits[i]) / np.exp(logits[i]).sum(-1, keepdims=True))
        want = golden.ctc_loss_np(lp[: logit_len[i]],
                                  list(labels[i][: label_len[i]]),
                                  blank=logits.shape[-1] - 1)
        np.testing.assert_allclose(loss[i], want, rtol=1e-4, atol=1e-4)


def test_ctc_loss_matches_optax_blank_zero():
    """optax.ctc_loss uses blank_id semantics directly — cross-check."""
    rng = np.random.default_rng(1)
    logits, logit_len, labels, label_len = _random_problem(rng, v=10)
    b, t, v = logits.shape
    logit_pad = (np.arange(t)[None, :] >= logit_len[:, None]).astype(np.float32)
    lmax = labels.shape[1]
    label_pad = (np.arange(lmax)[None, :] >= label_len[:, None]).astype(np.float32)
    # replace any accidental blank-0 labels with 1 for a fair comparison
    labels2 = np.where(labels == 0, 1, labels)
    ours = np.asarray(ops.ctc_loss(logits, logit_len, labels2, label_len,
                                   blank_id=0))
    theirs = np.asarray(optax.ctc_loss(logits, logit_pad, labels2, label_pad,
                                       blank_id=0))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_ctc_loss_gradient_finite():
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    logits, logit_len, labels, label_len = _random_problem(rng, b=2, t=12, v=6,
                                                           lmax=4)
    f = lambda lg: jnp.sum(ops.ctc_loss(lg, logit_len, labels, label_len))
    g = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    assert np.isfinite(g).all()
    # numerical check on a few coordinates
    eps = 1e-3
    for (i, t_, v_) in [(0, 0, 0), (1, 5, 3)]:
        lp = logits.copy(); lp[i, t_, v_] += eps
        lm = logits.copy(); lm[i, t_, v_] -= eps
        num = (float(f(lp)) - float(f(lm))) / (2 * eps)
        np.testing.assert_allclose(g[i, t_, v_], num, rtol=2e-2, atol=2e-3)


def test_greedy_decode_collapses():
    v, blank = 7, 6
    t = 10
    # frame path: a a _ a b b _ _ c c  -> a a b c
    path = [0, 0, blank, 0, 1, 1, blank, blank, 2, 2]
    logits = np.full((1, t, v), -5.0, np.float32)
    for i, c in enumerate(path):
        logits[0, i, c] = 5.0
    ids, lens = ops.ctc_greedy_decode(logits, np.array([t]), blank_id=blank)
    assert int(lens[0]) == 4
    assert list(np.asarray(ids[0][:4])) == [0, 0, 1, 2]


def test_greedy_decode_respects_length():
    v, blank = 5, 4
    logits = np.full((1, 6, v), -5.0, np.float32)
    for i in range(6):
        logits[0, i, i % 3] = 5.0  # 0 1 2 0 1 2
    ids, lens = ops.ctc_greedy_decode(logits, np.array([3]))
    assert int(lens[0]) == 3
    assert list(np.asarray(ids[0][:3])) == [0, 1, 2]


def test_beam_matches_greedy_on_peaked():
    rng = np.random.default_rng(3)
    b, t, v = 3, 25, 20
    # strongly peaked lattices: beam must agree with greedy
    logits = rng.standard_normal((b, t, v)).astype(np.float32) * 0.1
    peaks = rng.integers(0, v, size=(b, t))
    for i in range(b):
        logits[i, np.arange(t), peaks[i]] += 12.0
    lens = np.array([t, t - 5, t - 10], dtype=np.int32)
    gids, glens = ops.ctc_greedy_decode(logits, lens, blank_id=-1)
    bids, blens, _ = ops.ctc_beam_search_decode(logits, lens, beam_width=4,
                                               topk=4, max_decode_len=t)
    for i in range(b):
        assert int(blens[i]) == int(glens[i])
        assert list(np.asarray(bids[i][: int(blens[i])])) == \
            list(np.asarray(gids[i][: int(glens[i])]))


def test_beam_beats_greedy_on_ambiguous():
    """Classic case: p(blank)=.6 each frame, p(a)=.4; best path is blank-blank
    (greedy -> empty) but total p(a) over alignments = .4*.6+.6*.4+.4*.4=.64
    > p(empty)=.36 — prefix beam search must return [a]."""
    v, blank = 2, 1
    p = np.array([[0.4, 0.6], [0.4, 0.6]], dtype=np.float32)
    logits = np.log(p)[None]
    gids, glens = ops.ctc_greedy_decode(logits, np.array([2]), blank_id=blank)
    assert int(glens[0]) == 0
    bids, blens, nlp = ops.ctc_beam_search_decode(
        logits, np.array([2]), beam_width=4, topk=2, blank_id=blank,
        max_decode_len=4)
    assert int(blens[0]) == 1
    assert int(bids[0][0]) == 0
    np.testing.assert_allclose(float(nlp[0]), -np.log(0.64), rtol=1e-4)


def test_beam_merges_duplicate_prefixes():
    """Probability of the best prefix must aggregate all alignments."""
    v, blank = 3, 2
    # 3 frames; symbol a=0 dominant; p(a)=.5, p(blank)=.3, p(b)=.2
    p = np.tile(np.array([0.5, 0.2, 0.3], np.float32), (3, 1))
    logits = np.log(p)[None]
    bids, blens, nlp = ops.ctc_beam_search_decode(
        logits, np.array([3]), beam_width=8, topk=3, blank_id=blank,
        max_decode_len=4)
    # enumerate exactly: P(prefix [a]) over 3 frames = sum over alignments
    # (a,a,a),(a,a,_),(a,_,_),(_,a,_),(_,_,a),(_,a,a),(a,_,... ) etc.
    from itertools import product
    total = 0.0
    for path in product([0, 1, 2], repeat=3):
        # collapse
        out = []
        prev = None
        for c in path:
            if c != blank and c != prev:
                out.append(c)
            prev = c
        if out == [0]:
            total += np.prod([p[i, c] for i, c in enumerate(path)])
    np.testing.assert_allclose(np.exp(-float(nlp[0])), total, rtol=1e-4)
    assert int(blens[0]) == 1 and int(bids[0][0]) == 0


def test_edit_distance_batched_vs_python():
    rng = np.random.default_rng(4)
    for _ in range(5):
        la, lb = rng.integers(1, 10, size=2)
        a = rng.integers(0, 5, size=la)
        b = rng.integers(0, 5, size=lb)
        want = ops.edit_distance(list(a), list(b))
        assert want == golden.edit_distance_np(list(a), list(b))
        ap = np.zeros((1, 12), np.int32); ap[0, :la] = a
        bp = np.zeros((1, 12), np.int32); bp[0, :lb] = b
        got = int(ops.batched_edit_distance(ap, np.array([la]), bp,
                                            np.array([lb]))[0])
        assert got == want


def test_edit_distance_empty():
    ap = np.zeros((2, 4), np.int32)
    bp = np.zeros((2, 4), np.int32)
    bp[0, :3] = [1, 2, 3]
    d = np.asarray(ops.batched_edit_distance(ap, np.array([0, 0]), bp,
                                             np.array([3, 0])))
    assert list(d) == [3, 0]


def test_ctc_loss_impossible_alignment_is_huge():
    """Labels longer than frames allow (needs T >= L for distinct symbols):
    probability is zero -> loss ~ 1e30, finite (no NaN)."""
    v = 8
    logits = np.zeros((1, 3, v), np.float32)
    labels = np.array([[1, 2, 3, 4, 5]], np.int32)  # 5 labels, 3 frames
    loss = np.asarray(ops.ctc_loss(logits, np.array([3]), labels,
                                   np.array([5])))
    assert np.isfinite(loss).all() and loss[0] > 1e20


def test_ctc_loss_repeated_labels_need_separator_frames():
    """'aa' needs >= 3 frames (a blank a); with exactly 3 matched frames the
    only valid path is a-blank-a."""
    v, blank = 4, 3
    p = np.full((3, v), 0.05, np.float32)
    p[0, 0] = p[2, 0] = 0.85   # 'a' at t=0,2
    p[1, blank] = 0.85         # blank at t=1
    logits = np.log(p)[None]
    labels = np.array([[0, 0]], np.int32)
    loss = float(ops.ctc_loss(logits, np.array([3]), labels, np.array([2]),
                              blank_id=blank, logits_are_log_probs=True)[0])
    want = -np.log(0.85 ** 3)
    np.testing.assert_allclose(loss, want, rtol=0.05)


def test_beam_with_blank_id_zero():
    v, blank = 5, 0
    path = [1, 1, 0, 2, 3]
    logits = np.full((1, 5, v), -5.0, np.float32)
    for i, c in enumerate(path):
        logits[0, i, c] = 5.0
    ids, lens, _ = ops.ctc_beam_search_decode(logits, np.array([5]),
                                              beam_width=3, topk=3,
                                              blank_id=0, max_decode_len=5)
    assert list(np.asarray(ids[0][: int(lens[0])])) == [1, 2, 3]


def test_greedy_capped_output_truncates():
    """More emissions than max_output_len -> truncation at the cap."""
    v, blank = 6, 5
    t = 12
    logits = np.full((1, t, v), -5.0, np.float32)
    for i in range(t):
        logits[0, i, i % 4] = 5.0  # 0 1 2 3 0 1 2 3 ... 12 distinct emissions
    ids, lens = ops.ctc_greedy_decode(logits, np.array([t]), blank_id=blank,
                                      max_output_len=5)
    assert int(lens[0]) == 5
    assert list(np.asarray(ids[0])) == [0, 1, 2, 3, 0]


def test_analytic_grad_matches_autodiff():
    """The forward-backward VJP must reproduce autodiff-through-the-scan
    gradients, including frozen padded frames and per-example cotangents."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    logits, logit_len, labels, label_len = _random_problem(rng, b=6, t=25,
                                                           v=11, lmax=7)
    w = jnp.asarray(rng.standard_normal(6).astype(np.float32))  # mixed cotans

    def mk(analytic):
        return lambda lg: jnp.sum(w * ops.ctc_loss(
            lg, logit_len, labels, label_len, analytic_grad=analytic))

    la, ls = ops.ctc_loss(logits, logit_len, labels, label_len), \
        ops.ctc_loss(logits, logit_len, labels, label_len, analytic_grad=False)
    np.testing.assert_allclose(np.asarray(la), np.asarray(ls), rtol=1e-5)
    ga = np.asarray(jax.grad(mk(True))(jnp.asarray(logits)))
    gs = np.asarray(jax.grad(mk(False))(jnp.asarray(logits)))
    assert np.isfinite(ga).all()
    np.testing.assert_allclose(ga, gs, rtol=1e-4, atol=1e-5)
    # padded frames get exactly zero gradient
    for i in range(6):
        assert np.abs(ga[i, logit_len[i]:]).max() == 0.0


def test_analytic_grad_log_probs_and_edge_cases():
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(8)
    b, t, v, lmax = 4, 10, 6, 4
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    logit_len = np.array([t, t, 1, t], np.int32)
    labels = np.zeros((b, lmax), np.int32)
    labels[0, :2] = [1, 1]          # repeated label
    labels[3, :4] = [1, 2, 3, 4]    # near-unsatisfiable vs short input ok
    label_len = np.array([2, 0, 0, 4], np.int32)  # incl. empty labels

    for analytic in (True, False):
        kw = dict(blank_id=-1, logits_are_log_probs=True,
                  analytic_grad=analytic)
        f = lambda x: jnp.sum(ops.ctc_loss(x, logit_len, labels, label_len,
                                           **kw))
        g = np.asarray(jax.grad(f)(jnp.asarray(lp)))
        assert np.isfinite(g).all()
        if analytic:
            ga = g
        else:
            np.testing.assert_allclose(ga, g, rtol=1e-4, atol=1e-5)


def test_analytic_grad_zero_when_unsatisfiable():
    """label longer than the frame budget -> P=0; gradient must be zero,
    not NaN."""
    import jax
    import jax.numpy as jnp
    logits = np.random.default_rng(9).standard_normal((1, 3, 5)) \
        .astype(np.float32)
    labels = np.array([[1, 1, 2, 2]], np.int32)  # needs >= 6 frames (repeats)
    f = lambda x: jnp.sum(ops.ctc_loss(x, np.array([3], np.int32), labels,
                                       np.array([4], np.int32)))
    g = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    assert np.all(g == 0.0)


def test_topk_last_matches_lax_top_k():
    """_topk_last is a drop-in for lax.top_k: values, indices, tie order."""
    import jax
    import jax.numpy as jnp
    from asr_dfcnn_transformer_tpu.ops.ctc_decode import _topk_last

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 7, 37)).astype(np.float32)
    # inject exact ties (top_k breaks by ascending index)
    x[0, 0, 5] = x[0, 0, 20] = x[0, 0, 31] = 3.5
    x[1, 2, :] = 0.0
    for k in (1, 4, 8):
        ref_v, ref_i = jax.lax.top_k(jnp.asarray(x), k)
        got_v, got_i = _topk_last(jnp.asarray(x), k)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))


def test_ctc_loss_zero_logit_length_rows():
    """Zero valid frames: NLL is exactly 0 for an empty label sequence and
    ~inf otherwise, with zero gradient in BOTH grad paths (the DP reads
    frame 0's scores unconditionally; the readout must correct for it).
    Unreachable via the loader drop rule (data/loader.py:137-143; ref
    end2end/data_loader.py:134-137) but the op stands on its own."""
    import jax
    import jax.numpy as jnp
    from asr_dfcnn_transformer_tpu.ops.ctc import ctc_loss

    logits = jnp.asarray(
        np.random.default_rng(7).standard_normal((3, 6, 5)), jnp.float32)
    ll = jnp.asarray([0, 0, 6], jnp.int32)
    labs = jnp.asarray([[0, 0], [1, 0], [1, 0]], jnp.int32)
    labl = jnp.asarray([0, 1, 1], jnp.int32)
    for analytic in (True, False):
        loss = np.asarray(ctc_loss(logits, ll, labs, labl,
                                   analytic_grad=analytic))
        assert loss[0] == 0.0, loss
        assert loss[1] >= 1e29, loss
        assert 0.0 < loss[2] < 100.0, loss

        def f(lg):
            return jnp.sum(jnp.minimum(
                ctc_loss(lg, ll, labs, labl, analytic_grad=analytic), 1e9))
        g = np.asarray(jax.grad(f)(logits))
        assert np.all(g[0] == 0.0) and np.all(g[1] == 0.0)
        assert np.any(g[2] != 0.0)
