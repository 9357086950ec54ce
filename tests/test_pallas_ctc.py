"""Pallas CTC DP kernels vs the lax.scan reference implementation.

The kernels run in interpreter mode here (CPU test mesh); the compiled
path is exercised on real TPU by bench.py and by the TPU-only test at
the bottom.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_dfcnn_transformer_tpu import ops
from asr_dfcnn_transformer_tpu.ops import ctc as ctc_mod
from asr_dfcnn_transformer_tpu.ops.pallas import ctc_kernel

B, T, V, L = 4, 16, 10, 5


def _problem(seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    logit_len = np.array([T, T - 3, L + 2, T], np.int32)
    labels = rng.integers(0, V - 1, size=(B, L)).astype(np.int32)
    labels[1, :2] = [3, 3]                     # repeated label
    label_len = np.array([L, 2, 0, L], np.int32)  # incl. empty
    return logits, logit_len, labels, label_len


def _setup(logits, logit_len, labels, label_len, blank):
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    ext, valid, can_skip = ctc_mod._extended_labels(
        jnp.asarray(labels), jnp.asarray(label_len), blank)
    emit_all = ctc_mod._emissions(lp, ext)
    return lp, ext, valid, can_skip, emit_all


def test_alpha_kernel_matches_scan_interpret(monkeypatch):
    logits, logit_len, labels, label_len = _problem()
    blank = V - 1
    lp, ext, valid, can_skip, emit_all = _setup(
        logits, logit_len, labels, label_len, blank)

    want_total, want_stack = ctc_mod._alpha_scan(
        lp, emit_all, jnp.asarray(logit_len), jnp.asarray(label_len),
        valid, can_skip, blank, stack=True)        # [T, B, S]

    monkeypatch.setattr(
        ctc_kernel, "alpha_stack",
        functools_partial_interpret(ctc_kernel.alpha_stack))
    got_total, got_pad = ctc_mod._alpha_pallas(
        lp, emit_all, jnp.asarray(logit_len), jnp.asarray(label_len),
        valid, can_skip, blank)                    # [T, B, S_pad]
    s = valid.shape[1]
    got_stack = got_pad[:, :, :s]
    np.testing.assert_allclose(np.asarray(got_total), np.asarray(want_total),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_stack), np.asarray(want_stack),
                               rtol=1e-5, atol=1e-5)
    # padded lanes stay at -inf
    assert np.all(np.asarray(got_pad[:, :, s:]) <= ctc_mod._NEG_INF / 2)


def test_beta_xi_kernel_matches_scan_interpret(monkeypatch):
    logits, logit_len, labels, label_len = _problem(seed=3)
    blank = V - 1
    lp, ext, valid, can_skip, emit_all = _setup(
        logits, logit_len, labels, label_len, blank)
    ll, lb = jnp.asarray(logit_len), jnp.asarray(label_len)

    total, alphas = ctc_mod._alpha_scan(lp, emit_all, ll, lb, valid,
                                        can_skip, blank, stack=True)
    betas = ctc_mod._beta_scan(emit_all, ll, lb, valid, can_skip)
    want_xi = ctc_mod._xi_scan(alphas, betas, ll, valid, total)  # [T, B, S]

    monkeypatch.setattr(
        ctc_kernel, "alpha_stack",
        functools_partial_interpret(ctc_kernel.alpha_stack))
    monkeypatch.setattr(
        ctc_kernel, "beta_xi",
        functools_partial_interpret(ctc_kernel.beta_xi))
    _, alphas_pad = ctc_mod._alpha_pallas(lp, emit_all, ll, lb, valid,
                                          can_skip, blank)
    got_xi = ctc_mod._xi_pallas(lp, emit_all, alphas_pad, ll, lb, valid,
                                can_skip, blank, total)          # [T, B, S]
    np.testing.assert_allclose(np.asarray(got_xi), np.asarray(want_xi),
                               rtol=1e-5, atol=1e-6)
    # xi rows sum to 1 on valid frames, 0 past them
    sums = np.asarray(got_xi.sum(-1)).T                          # [B, T]
    for i in range(B):
        np.testing.assert_allclose(sums[i, :logit_len[i]], 1.0, atol=1e-4)
        np.testing.assert_allclose(sums[i, logit_len[i]:], 0.0, atol=1e-6)


def functools_partial_interpret(fn):
    import functools
    return functools.partial(fn, interpret=True)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled Pallas kernels need a TPU")
def test_pallas_backend_loss_and_grad_match_scan():
    logits, logit_len, labels, label_len = _problem(seed=5)
    kw = dict(blank_id=-1)
    lp_ = jnp.asarray(logits)
    args = (jnp.asarray(logit_len), jnp.asarray(labels),
            jnp.asarray(label_len))
    l_scan = ops.ctc_loss(lp_, *args, backend="scan", **kw)
    l_pal = ops.ctc_loss(lp_, *args, backend="pallas", **kw)
    np.testing.assert_allclose(np.asarray(l_pal), np.asarray(l_scan),
                               rtol=1e-5, atol=1e-5)
    g = lambda be: np.asarray(jax.grad(lambda x: jnp.sum(ops.ctc_loss(
        x, *args, backend=be, **kw)))(lp_))
    np.testing.assert_allclose(g("pallas"), g("scan"), rtol=1e-4, atol=1e-5)
