"""CTC decoders: greedy and vectorized prefix beam search.

TPU-native replacements for the reference's in-graph
``tf.nn.ctc_greedy_decoder`` (``lm_and_am/model/acoustic_model.py:59``) and
per-utterance Keras ``K.ctc_decode`` — which spawned a fresh ``tf.Session``
per call (``util/utils.py:57-66``). Both decoders here are batched, jitted,
static-shape ``lax.scan`` programs returning dense left-aligned id arrays
plus lengths (no sparse tensors).

The beam search is the standard CTC prefix beam search (per-prefix blank /
non-blank probability split), fully vectorized: per step each of W beams
produces one "stay" candidate and K "extend" candidates; duplicate prefixes
are merged by double rolling-hash equality with an O(M^2) masked logsumexp
(M = W*(K+1) is tiny), then the top W survive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _compact(seq: jnp.ndarray, keep: jnp.ndarray, pad_value: int = 0):
    """Left-align kept entries of ``seq`` [T] by stable sort on keep-order.

    Returns (compacted [T] padded with ``pad_value``, count).
    """
    t = seq.shape[0]
    order_key = jnp.where(keep, jnp.arange(t), t)
    perm = jnp.argsort(order_key)
    gathered = seq[perm]
    count = jnp.sum(keep.astype(jnp.int32))
    mask = jnp.arange(t) < count
    return jnp.where(mask, gathered, pad_value), count


@functools.partial(jax.jit, static_argnames=("blank_id", "merge_repeated",
                                             "max_output_len"))
def ctc_greedy_decode(logits: jnp.ndarray,
                      logit_lengths: jnp.ndarray,
                      blank_id: int = -1,
                      merge_repeated: bool = True,
                      max_output_len: int | None = None):
    """Greedy (best-path) CTC decode.

    Args:
      logits: [B, T, V] (any monotone transform of probabilities works).
      logit_lengths: [B] valid frames.
      max_output_len: cap the emitted sequence length (labels are <= 64 in
        this task). When set, compaction uses a cumsum-match gather
        ([B, L, T] bool reduction — pure VPU, no sort) instead of an
        argsort, which is markedly faster on TPU.
    Returns:
      (ids [B, T or max_output_len] left-aligned, lengths [B]). Parity
      with ``tf.nn.ctc_greedy_decoder(merge_repeated=True)``; lengths are
      clipped to the cap when one is given.
    """
    v = logits.shape[-1]
    blank = blank_id % v
    best = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, T]
    t = best.shape[1]
    in_range = jnp.arange(t)[None, :] < logit_lengths[:, None]
    prev = jnp.pad(best, ((0, 0), (1, 0)), constant_values=-1)[:, :t]
    keep = (best != blank) & in_range
    if merge_repeated:
        keep &= best != prev
    if max_output_len is None:
        ids, lengths = jax.vmap(_compact)(best, keep)
        return ids, lengths
    l = max_output_len
    cum = jnp.cumsum(keep.astype(jnp.int32), axis=-1)           # [B, T]
    slots = jnp.arange(1, l + 1, dtype=jnp.int32)               # [L]
    match = keep[:, None, :] & (cum[:, None, :] == slots[None, :, None])
    t_idx = jnp.argmax(match, axis=-1)                          # [B, L]
    found = jnp.any(match, axis=-1)
    ids = jnp.take_along_axis(best, t_idx, axis=1)
    ids = jnp.where(found, ids, 0)
    lengths = jnp.minimum(cum[:, -1], l)
    return ids, lengths


def _topk_last(x: jnp.ndarray, k: int):
    """Exact top-k over the last axis; single-load Pallas kernel on the
    shapes where it measured faster, k fused XLA sweeps elsewhere.

    Both forms are bit-identical to ``jax.lax.top_k`` (descending values,
    ascending-index ties) — parity pinned by tests/test_topk_kernel.py.
    """
    from asr_dfcnn_transformer_tpu.ops.pallas import topk_kernel
    n = 1
    for d in x.shape[:-1]:
        n *= d
    if (jax.default_backend() == "tpu"
            and topk_kernel.topk_wins(n, x.shape[-1])):
        return topk_kernel.topk_last(x, k)
    return _topk_last_xla(x, k)


def _topk_last_xla(x: jnp.ndarray, k: int):
    """Exact top-k over the last axis by k passes of (max, argmax, mask).

    Drop-in for ``jax.lax.top_k`` (same values/indices incl. the
    descending-value, ascending-index tie order), but each pass is a plain
    VPU reduce over the ORIGINAL array with the previously-picked indices
    masked on the fly — one HBM read per pass, no re-materialized copy —
    which XLA fuses with the max/argmax reduces. Measured on v5e for
    [128, 200, 1536] f32 top-8: lax.top_k (sort-based) 21.5 ms, a
    mask-and-rewrite variant 8.3 ms, this ~k-reads form faster still —
    the sort was the single biggest cost of the whole beam pipeline
    (DESIGN.md §9, round 4).

    k is small (beam search uses 8); cost is k fused sweeps of the array.
    """
    iota = jnp.arange(x.shape[-1], dtype=jnp.int32)
    vals, ids = [], []
    for _ in range(k):
        if ids:
            taken = jnp.stack(ids, -1)                  # [..., j]
            masked = jnp.where(
                jnp.any(iota[..., :, None] == taken[..., None, :], -1),
                _NEG_INF, x)
        else:
            masked = x
        a = jnp.argmax(masked, axis=-1)
        vals.append(jnp.max(masked, axis=-1))
        ids.append(a.astype(jnp.int32))
    return jnp.stack(vals, -1), jnp.stack(ids, -1)


def _resolve_backend(backend: str) -> str:
    if backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "scan"
    if backend not in ("pallas", "scan"):
        raise ValueError(f"unknown beam-search backend {backend!r}")
    return backend


@functools.partial(
    jax.jit,
    static_argnames=("beam_width", "topk", "blank_id", "max_decode_len",
                     "return_all", "backend"))
def ctc_beam_search_decode(logits: jnp.ndarray,
                           logit_lengths: jnp.ndarray,
                           beam_width: int = 8,
                           topk: int = 8,
                           blank_id: int = -1,
                           max_decode_len: int = 64,
                           return_all: bool = False,
                           backend: str = "auto"):
    """Vectorized CTC prefix beam search.

    Args:
      logits: [B, T, V] raw logits (softmax applied internally).
      logit_lengths: [B] valid frames.
      beam_width: beams kept per step (W).
      topk: symbol extensions considered per step (K).
      max_decode_len: prefix length cap (labels are <= 64 in this task,
        reference data_loader.py:141).
      backend: "auto" (in-VMEM Pallas kernel on TPU, lax.scan elsewhere),
        "pallas", or "scan" — identical results (ops/pallas/beam_kernel.py).
    Returns:
      (ids [B, max_decode_len] best prefix, lengths [B],
       neg_log_prob [B] of the best prefix).
    """
    b, t, v = logits.shape
    blank = blank_id % v
    w = beam_width
    k = min(topk, v)   # can't consider more extensions than symbols exist
    lcap = max_decode_len

    lp_all = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    if _resolve_backend(backend) == "pallas":
        from asr_dfcnn_transformer_tpu.ops.pallas import beam_kernel
        top_lp_all, top_ids_all = _topk_last(lp_all, k)
        prefixes, plen, pb, pnb = beam_kernel.beam_search(
            lp_all, top_lp_all, top_ids_all, logit_lengths,
            beam_width=w, topk=k, blank=blank, max_decode_len=lcap,
            interpret=jax.default_backend() != "tpu")
        return _beam_finish(prefixes, plen, pb, pnb, lcap, return_all)

    state0 = _beam_state_init(b, w, lcap)
    step = _make_beam_step(b, w, k, lcap, blank, logit_lengths)

    # pre-compute per-step quantities once (vectorized over T) and feed the
    # scan through xs — no dynamic slicing of [B, T, V] inside the loop
    top_lp_all, top_ids_all = _topk_last(lp_all, k)         # [B, T, K]
    lp_blank_all = lp_all[:, :, blank]                      # [B, T]
    xs = (jnp.moveaxis(lp_all, 1, 0),
          jnp.moveaxis(top_lp_all, 1, 0),
          jnp.moveaxis(top_ids_all, 1, 0),
          jnp.moveaxis(lp_blank_all, 1, 0),
          jnp.arange(t))
    (prefixes, plen, _, _, pb, pnb), _ = jax.lax.scan(step, state0, xs)
    return _beam_finish(prefixes, plen, pb, pnb, lcap, return_all)


def _beam_state_init(b: int, w: int, lcap: int):
    """Fresh beam state: prefixes, lengths, rolling hashes, pb/pnb."""
    prefixes0 = jnp.zeros((b, w, lcap), jnp.int32)
    plen0 = jnp.zeros((b, w), jnp.int32)
    pb0 = jnp.full((b, w), _NEG_INF).at[:, 0].set(0.0)  # only beam 0 is live
    pnb0 = jnp.full((b, w), _NEG_INF)
    # beam 0 is the (real) empty prefix with hash 0; dead beams get unique
    # sentinel hashes so they never merge with live prefixes
    sent = jnp.arange(w, dtype=jnp.uint32)
    h10 = jnp.where(sent == 0, 0,
                    sent + jnp.uint32(0x7fffffff))[None, :].repeat(b, 0)
    h20 = jnp.where(sent == 0, 0,
                    sent + jnp.uint32(0x1fffffff))[None, :].repeat(b, 0)
    return (prefixes0, plen0, h10, h20, pb0, pnb0)


def _make_beam_step(b, w, k, lcap, blank, logit_lengths=None):
    """One prefix-beam-search frame as a lax.scan step function.

    ``logit_lengths``: per-item valid frame counts for the freeze rule;
    None = every fed frame is valid (the streaming chunked driver feeds
    only real frames)."""
    m = w * (k + 1)
    mul1 = jnp.uint32(2654435761)
    mul2 = jnp.uint32(40503)

    def step(state, xs):
        prefixes, plen, h1, h2, pb, pnb = state
        lp, top_lp, top_ids, lp_blank, t_idx = xs

        last = jnp.take_along_axis(
            prefixes, jnp.maximum(plen - 1, 0)[..., None], axis=2)[..., 0]
        last = jnp.where(plen > 0, last, -1)          # [B, W]

        # ---- "stay" candidates (prefix unchanged) ----
        stay_pb = jnp.logaddexp(pb, pnb) + lp_blank[:, None]          # [B, W]
        rep_lp = jnp.take_along_axis(lp, jnp.maximum(last, 0), axis=1)
        stay_pnb = jnp.where(plen > 0, pnb + rep_lp, _NEG_INF)        # [B, W]

        # ---- "extend" candidates: beam w extended by symbol c ----
        c_ids = top_ids[:, None, :]                                   # [B,1,K]
        c_lp = top_lp[:, None, :]                                     # [B,1,K]
        is_rep = c_ids == last[..., None]                             # [B,W,K]
        is_blank_c = c_ids == blank
        base = jnp.where(is_rep, pb[..., None],
                         jnp.logaddexp(pb, pnb)[..., None])
        ext_pnb = base + c_lp                                         # [B,W,K]
        # blank "extension" is already covered by stay; room-limit too
        ext_pnb = jnp.where(is_blank_c | (plen[..., None] >= lcap),
                            _NEG_INF, ext_pnb)
        ext_pb = jnp.full_like(ext_pnb, _NEG_INF)

        # extended prefix metadata
        cid_u = c_ids.astype(jnp.uint32) + jnp.uint32(2)
        ext_h1 = h1[..., None] * mul1 + cid_u
        ext_h2 = h2[..., None] * mul2 + cid_u
        ext_len = jnp.broadcast_to(
            jnp.minimum(plen[..., None] + 1, lcap), (b, w, k))

        # ---- assemble candidate arrays [B, M] ----
        cand_pb = jnp.concatenate([stay_pb, ext_pb.reshape(b, -1)], axis=1)
        cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(b, -1)], axis=1)
        cand_h1 = jnp.concatenate([h1, ext_h1.reshape(b, -1)], axis=1)
        cand_h2 = jnp.concatenate([h2, ext_h2.reshape(b, -1)], axis=1)
        cand_len = jnp.concatenate([plen, ext_len.reshape(b, -1)], axis=1)
        # source beam for each candidate, and which symbol (if any) was added
        src = jnp.concatenate(
            [jnp.arange(w, dtype=jnp.int32)[None, :].repeat(b, 0),
             jnp.repeat(jnp.arange(w, dtype=jnp.int32), k)[None, :].repeat(b, 0)],
            axis=1)                                                    # [B, M]
        # symbol layout must match ext_* reshape order (beam-major):
        add_sym = jnp.concatenate(
            [jnp.full((b, w), -1, jnp.int32),
             jnp.broadcast_to(top_ids[:, None, :], (b, w, k)).reshape(b, -1)
             .astype(jnp.int32)],
            axis=1)

        # ---- merge duplicates: equality of (h1, h2) ----
        eq = (cand_h1[:, :, None] == cand_h1[:, None, :]) & \
             (cand_h2[:, :, None] == cand_h2[:, None, :])              # [B,M,M]

        def masked_lse(scores):
            s_exp = jnp.where(eq, scores[:, None, :], _NEG_INF)        # [B,M,M]
            mx = jnp.max(s_exp, axis=2)
            mx_safe = jnp.maximum(mx, _NEG_INF / 2)
            out = mx_safe + jnp.log(
                jnp.sum(jnp.exp(s_exp - mx_safe[..., None]), axis=2))
            return jnp.where(mx <= _NEG_INF / 2, _NEG_INF, out)

        merged_pb = masked_lse(cand_pb)
        merged_pnb = masked_lse(cand_pnb)
        # keep only the first occurrence of each prefix
        idx = jnp.arange(m)
        first_occurrence = jnp.sum(
            eq & (idx[None, None, :] < idx[None, :, None]), axis=2) == 0
        total = jnp.logaddexp(merged_pb, merged_pnb)
        total = jnp.where(first_occurrence, total, _NEG_INF)

        # ---- top-W candidates ----
        top_tot, top_cand = jax.lax.top_k(total, w)                    # [B, W]
        sel = lambda arr: jnp.take_along_axis(arr, top_cand, axis=1)
        new_pb = sel(merged_pb)
        new_pnb = sel(merged_pnb)
        new_h1 = sel(cand_h1)
        new_h2 = sel(cand_h2)
        new_len = sel(cand_len)
        new_src = sel(src)
        new_add = sel(add_sym)

        # rebuild prefixes: gather source prefix, append added symbol
        src_prefix = jnp.take_along_axis(
            prefixes, new_src[..., None], axis=1)                      # [B,W,L]
        src_len = jnp.take_along_axis(plen, new_src, axis=1)
        app_pos = jnp.minimum(src_len, lcap - 1)
        onehot = jax.nn.one_hot(app_pos, lcap, dtype=jnp.bool_)        # [B,W,L]
        new_prefixes = jnp.where(
            (new_add[..., None] >= 0) & onehot,
            new_add[..., None], src_prefix)

        if logit_lengths is None:
            return (new_prefixes, new_len, new_h1, new_h2,
                    new_pb, new_pnb), None
        # freeze finished items
        active = (t_idx < logit_lengths)[:, None]
        f = lambda new, old: jnp.where(active, new, old)
        fp = lambda new, old: jnp.where(active[..., None], new, old)
        return (fp(new_prefixes, prefixes), f(new_len, plen),
                f(new_h1, h1), f(new_h2, h2),
                f(new_pb, pb), f(new_pnb, pnb)), None

    return step


def ctc_beam_search_stream_init(batch: int, beam_width: int = 8,
                                max_decode_len: int = 64):
    """Fresh carry state for :func:`ctc_beam_search_stream_step`."""
    return _beam_state_init(batch, beam_width, max_decode_len)


@functools.partial(jax.jit, static_argnames=("beam_width", "topk",
                                             "blank_id"))
def ctc_beam_search_stream_step(state, log_probs: jnp.ndarray,
                                beam_width: int | None = None, topk: int = 8,
                                blank_id: int = -1,
                                frame_counts: jnp.ndarray | None = None):
    """Advance the prefix beam search over a chunk of frames.

    The stateful (incremental) form of :func:`ctc_beam_search_decode`'s
    scan backend: feeding the same frames in any chunking yields exactly
    the offline result — the scan recurrence is sequential either way.
    Used by ``infer.streaming.IncrementalRecognizer(decode='beam')``.

    Args:
      state: from :func:`ctc_beam_search_stream_init` (batch, W, Lcap
        are baked into its shapes).
      beam_width: optional cross-check — W is shape-derived from the
        state, so None just uses it; an explicit value that disagrees
        raises instead of silently decoding with the state's W.
      log_probs: [B, Tc, V] already-normalized log-probs for the NEW
        frames only.
      frame_counts: optional [B] int — per-row count of VALID new
        frames in this chunk; rows freeze past their count, so a
        multi-stream pool (``infer.stream_pool.StreamPool``) can
        advance slots at different stream positions (including count 0
        = untouched) in ONE call. None = every fed frame is valid.
    Returns: the advanced state. Read results with
      :func:`ctc_beam_search_stream_best`.
    """
    b, tc, v = log_probs.shape
    w = state[0].shape[1]
    lcap = state[0].shape[2]
    if beam_width is not None and beam_width != w:
        raise ValueError(
            f"beam_width={beam_width} disagrees with the W={w} baked into "
            f"the stream state (set it in ctc_beam_search_stream_init)")
    blank = blank_id % v
    k = min(topk, v)
    step = _make_beam_step(b, w, k, lcap, blank,
                           logit_lengths=frame_counts)
    lp = log_probs.astype(jnp.float32)
    top_lp, top_ids = _topk_last(lp, k)
    xs = (jnp.moveaxis(lp, 1, 0), jnp.moveaxis(top_lp, 1, 0),
          jnp.moveaxis(top_ids, 1, 0), jnp.moveaxis(lp[:, :, blank], 1, 0),
          jnp.arange(tc))
    new_state, _ = jax.lax.scan(step, state, xs)
    return new_state


@jax.jit
def ctc_beam_search_stream_best(state):
    """(ids [B, Lcap], lengths [B], neg_log_prob [B]) of the best beam.

    Jitted: partials poll this per chunk, and eager ops through the
    tunneled backend cost ~35 ms each."""
    prefixes, plen, _, _, pb, pnb = state
    return _beam_finish(prefixes, plen, pb, pnb, prefixes.shape[2], False)


def _beam_finish(prefixes, plen, pb, pnb, lcap, return_all):
    total = jnp.logaddexp(pb, pnb)
    if return_all:
        return prefixes, plen, total
    best = jnp.argmax(total, axis=1)
    take = lambda arr: jnp.take_along_axis(    # arr: [B, W]
        arr, best[:, None], axis=1).squeeze(1)
    best_ids = jnp.take_along_axis(
        prefixes, best[:, None, None].repeat(lcap, 2), axis=1)[:, 0, :]
    best_len = take(plen)
    best_nlp = -take(total)
    # zero out padding
    best_ids = jnp.where(jnp.arange(lcap)[None, :] < best_len[:, None],
                         best_ids, 0)
    return best_ids, best_len, best_nlp
