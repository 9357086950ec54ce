"""Pallas TPU kernel for vectorized CTC prefix beam search.

The ``lax.scan`` beam search (ops/ctc_decode.py) is a long chain of small
per-step ops — candidate scoring, an O(M^2) duplicate merge, top-W
selection, prefix rebuild — whose [B, W]-sized state round-trips HBM
every frame. Ablations show no single dominant stage (merge ~5 ms, lp
streaming ~4 ms, prefix rebuild ~4 ms of 45.6 ms at [128, 200, 1536] on
v5e): the cost IS the 200-step loop. This kernel runs the whole search
inside one Pallas program per batch block with every piece of state in
VMEM; the only HBM traffic is the per-frame log-prob row (double-buffered
manual DMA, overlapped with compute) and the tiny per-frame top-K tables.

Two layouts of the same algorithm:
- **row-major** (``_beam_kernel``): batch on sublanes, bb=8 per grid
  step — minimal padding, used for small batches;
- **transposed** (``_beam_kernel_t``): batch on the LANE axis, 128
  utterances per vreg — the throughput layout; also the only multi-tile
  layout Mosaic accepts (see the notes in _batch_block / _beam_kernel_t).

Semantics are IDENTICAL to ops/ctc_decode.py:ctc_beam_search_decode
(same candidate order, same double-rolling-hash merge, same masked
logsumexp, same first-occurrence rule, same top-k tie order, same
freeze-past-length) — tested equal in interpreter mode and on TPU.
Replaces the per-utterance fresh-session ``K.ctc_decode`` of the
reference (util/utils.py:57-66) at batch scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
# Picked candidates are masked strictly BELOW the dead-candidate score so
# that when live candidates run out (beam_width > live, e.g. W > K+1 or a
# vocab smaller than W), successive argmax rounds fall back to the distinct
# dead candidates in ascending index order — matching lax.top_k's
# distinct-index tie behavior in the scan backend. Masking to _NEG_INF
# itself would tie with dead candidates and re-pick index 0's live entry,
# duplicating a full-mass beam that the next frame's merge double-counts.
_PICKED = float(np.finfo(np.float32).min)
# the scan path's rolling-hash multipliers, reinterpreted as int32: Mosaic
# has no uint32 reductions, and int32 two's-complement mul/add wrap
# bit-identically to uint32, so hash equality is preserved exactly
_MUL1 = np.int32(np.uint32(2654435761).astype(np.int64) - (1 << 32))
_MUL2 = np.int32(40503)


def _lse2(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, _NEG_INF / 2)
    out = m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe))
    return jnp.where(m <= _NEG_INF / 2, _NEG_INF, out)


def _beam_kernel(lens_ref, lp_hbm, toplp_ref, topid_ref,
                 pref_ref, plen_ref, pb_ref, pnb_ref,
                 lp_buf, sems,
                 w: int, k: int, blank: int, lcap: int):
    bb = pb_ref.shape[0]
    t_total = toplp_ref.shape[0]
    bi = pl.program_id(0)
    m = w * (k + 1)

    # ---- init beam state (beam 0 = live empty prefix) ----
    beam_iota = jax.lax.broadcasted_iota(jnp.int32, (bb, w), 1)
    pb0 = jnp.where(beam_iota == 0, 0.0, _NEG_INF)
    pnb0 = jnp.full((bb, w), _NEG_INF)
    h10 = jnp.where(beam_iota == 0, jnp.int32(0),
                    beam_iota + jnp.int32(0x7fffffff))
    h20 = jnp.where(beam_iota == 0, jnp.int32(0),
                    beam_iota + jnp.int32(0x1fffffff))
    plen0 = jnp.zeros((bb, w), jnp.int32)
    last0 = jnp.full((bb, w), -1, jnp.int32)
    pref_ref[...] = jnp.zeros((bb, w, lcap), jnp.int32)

    lens = lens_ref[...][:, :1]                            # [BB, 1] int32

    def dma(t, slot):
        return pltpu.make_async_copy(
            lp_hbm.at[t, pl.ds(bi * bb, bb), :], lp_buf.at[slot],
            sems.at[slot])

    dma(0, 0).start()

    midx = jax.lax.broadcasted_iota(jnp.int32, (bb, m), 1)
    widx = jax.lax.broadcasted_iota(jnp.int32, (bb, w), 1)

    def step(t, state):
        pb, pnb, h1, h2, plen, last = state
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < t_total)
        def _():
            dma(t + 1, 1 - slot).start()
        dma(t, slot).wait()
        lp_t = lp_buf[slot]                                # [BB, V]

        top_all = toplp_ref[t]                             # [BB, K+1]
        top_lp = top_all[:, :k]                            # [BB, K]
        lp_blank = top_all[:, k:]                          # [BB, 1]
        top_id = topid_ref[t]                              # [BB, K]

        # rep_lp[b, w] = lp_t[b, last[b, w]] — lane gather via one-hot
        # compare + masked reduce over V (TPU lane gathers don't
        # vectorize). W-loop of 2-D reductions: the 3-D form reduced over
        # a broadcast dim whose layout has nonzero offsets, which Mosaic's
        # shape_invariant_numerics rejects for every batch block > 8 (the
        # round-2/3 multi-tile blocker).
        v_iota2 = jax.lax.broadcasted_iota(
            jnp.int32, (bb, lp_t.shape[-1]), 1)
        rep_lp = jnp.zeros((bb, w))
        for j in range(w):
            hit_v = v_iota2 == last[:, j:j + 1]            # [BB, V]
            val = jnp.sum(jnp.where(hit_v, lp_t, 0.0), axis=1,
                          keepdims=True)                   # [BB, 1]
            rep_lp = jnp.where(widx == j, val, rep_lp)

        tot = _lse2(pb, pnb)                               # [BB, W]
        stay_pb = tot + lp_blank
        stay_pnb = jnp.where(plen > 0, pnb + rep_lp, _NEG_INF)

        # extend candidates live in a flat beam-major [BB, W*K] lane layout
        # (lane j = src_beam j//K extended by symbol top_id[j%K]); Mosaic
        # cannot reshape across tiled dims, so build by per-beam broadcast
        # + lane concat instead of a [BB, W, K] reshape.
        beam_rep = lambda arr: jnp.concatenate(
            [jnp.broadcast_to(arr[:, j:j + 1], (bb, k)) for j in range(w)],
            axis=1)                                        # [BB, W*K]
        tile_k = lambda arr: jnp.concatenate([arr] * w, axis=1)
        e_last = beam_rep(last)
        e_pb = beam_rep(pb)
        e_tot = beam_rep(tot)
        e_plen = beam_rep(plen)
        e_id = tile_k(top_id)
        e_lp = tile_k(top_lp)

        base = jnp.where(e_id == e_last, e_pb, e_tot)
        ext_pnb = base + e_lp
        ext_pnb = jnp.where((e_id == blank) | (e_plen >= lcap),
                            _NEG_INF, ext_pnb)
        cid = e_id + jnp.int32(2)
        ext_h1 = beam_rep(h1) * jnp.int32(_MUL1) + cid
        ext_h2 = beam_rep(h2) * jnp.int32(_MUL2) + cid
        ext_len = jnp.minimum(e_plen + 1, lcap)

        cand_pb = jnp.concatenate(
            [stay_pb, jnp.full((bb, w * k), _NEG_INF)], axis=1)
        cand_pnb = jnp.concatenate([stay_pnb, ext_pnb], 1)
        cand_h1 = jnp.concatenate([h1, ext_h1], 1)
        cand_h2 = jnp.concatenate([h2, ext_h2], 1)
        cand_len = jnp.concatenate([plen, ext_len], 1)
        cand_src = jnp.concatenate([widx, beam_rep(widx)], 1)
        cand_add = jnp.concatenate(
            [jnp.full((bb, w), -1, jnp.int32), e_id], 1)

        # ---- duplicate merge: (h1, h2) equality, first occurrence ----
        eq = (cand_h1[:, :, None] == cand_h1[:, None, :]) & \
             (cand_h2[:, :, None] == cand_h2[:, None, :])

        def masked_lse(scores):
            s_exp = jnp.where(eq, scores[:, None, :], _NEG_INF)
            mx = jnp.max(s_exp, axis=2)
            mx_safe = jnp.maximum(mx, _NEG_INF / 2)
            out = mx_safe + jnp.log(
                jnp.sum(jnp.exp(s_exp - mx_safe[..., None]), axis=2))
            return jnp.where(mx <= _NEG_INF / 2, _NEG_INF, out)

        merged_pb = masked_lse(cand_pb)
        merged_pnb = masked_lse(cand_pnb)
        first = jnp.sum(
            eq & (midx[:, None, :] < midx[:, :, None]), axis=2) == 0
        total = jnp.where(first, _lse2(merged_pb, merged_pnb), _NEG_INF)

        pick1_hit = lambda hit, arr: jnp.sum(
            jnp.where(hit, arr, jnp.zeros_like(arr)), axis=1,
            keepdims=True)

        # ---- iterative top-W (argmax + mask, W rounds) ----
        def pick(j, carry):
            (rem, n_pb, n_pnb, n_h1, n_h2, n_len, n_src, n_add) = carry
            best = jnp.argmax(rem, axis=1)                 # [BB]
            hit = midx == best[:, None]                    # [BB, M]
            wsel = widx == j                               # [BB, W]
            # exactly one hit per row -> sum with 0-neutral is an exact
            # select (ints/uint32 hashes without float detours)
            put = lambda dst, val: jnp.where(wsel, val, dst)
            n_pb = put(n_pb, pick1_hit(hit, merged_pb))
            n_pnb = put(n_pnb, pick1_hit(hit, merged_pnb))
            n_h1 = put(n_h1, pick1_hit(hit, cand_h1))
            n_h2 = put(n_h2, pick1_hit(hit, cand_h2))
            n_len = put(n_len, pick1_hit(hit, cand_len))
            n_src = put(n_src, pick1_hit(hit, cand_src))
            n_add = put(n_add, pick1_hit(hit, cand_add))
            rem = jnp.where(hit, _PICKED, rem)
            return (rem, n_pb, n_pnb, n_h1, n_h2, n_len, n_src, n_add)

        z_f = jnp.zeros((bb, w))
        z_i = jnp.zeros((bb, w), jnp.int32)
        (_, new_pb, new_pnb, new_h1, new_h2, new_len, new_src,
         new_add) = jax.lax.fori_loop(
            0, w, pick, (total, z_f, z_f, z_i, z_i, z_i, z_i, z_i))

        # ---- rebuild prefixes: gather source prefix rows, append symbol.
        # Static accumulate over the W source beams (Mosaic-safe: only
        # elementwise 2D/3D ops, no cross-tile gathers or reshapes).
        old_pref = pref_ref[...]                           # [BB, W, L]
        gath = jnp.zeros((bb, w, lcap), jnp.int32)
        src_len = jnp.zeros((bb, w), jnp.int32)
        src_last = jnp.zeros((bb, w), jnp.int32)
        for jsrc in range(w):
            hit = new_src == jsrc                          # [BB, Wnew]
            # minor-dim inserts must be 32-bit on Mosaic: broadcast the
            # mask as int32, not bool
            hit3 = hit.astype(jnp.int32)[..., None]
            gath = gath + hit3 * old_pref[:, jsrc, :][:, None, :]
            src_len = src_len + jnp.where(hit, plen[:, jsrc][:, None], 0)
            src_last = src_last + jnp.where(hit, last[:, jsrc][:, None], 0)
        # exactly one source beam hits per row, so the masked accumulate is
        # an exact select (including last == -1).
        app_pos = jnp.minimum(src_len, lcap - 1)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (bb, w, lcap), 2)
        app_hit = (l_iota == app_pos[..., None]) & (new_add[..., None] >= 0)
        new_pref = jnp.where(app_hit, new_add[..., None], gath)
        new_last = jnp.where(new_add >= 0, new_add, src_last)

        # ---- freeze finished rows ----
        active = t < lens                                  # [BB, 1]
        f = lambda new, old: jnp.where(active, new, old)
        active3 = active.astype(jnp.int32)[..., None] > 0  # 32-bit insert
        pref_ref[...] = jnp.where(active3, new_pref, old_pref)
        return (f(new_pb, pb), f(new_pnb, pnb),
                f(new_h1, h1), f(new_h2, h2),
                f(new_len, plen), f(new_last, last))

    pb, pnb, _, _, plen, _ = jax.lax.fori_loop(
        0, t_total, step, (pb0, pnb0, h10, h20, plen0, last0))
    pb_ref[...] = pb
    pnb_ref[...] = pnb
    plen_ref[...] = plen


def _beam_kernel_t(lens_ref, lp_hbm, toplp_ref, topid_ref,
                   pref_ref, plen_ref, pb_ref, pnb_ref,
                   lp_buf, sems,
                   w: int, k: int, blank: int, lcap: int):
    """Transposed (batch-on-lanes) beam search: the high-throughput layout.

    The row-major kernel above puts the batch on SUBLANES, so every state
    op on a bb=8 block uses 1/16 of each vreg — and any multi-tile batch
    block trips Mosaic (lane-dim concats/broadcasts of narrow segments,
    reduce-over-broadcast layouts). Here the batch lives on the LANE axis
    (BL = 128 utterances fill every vreg) and beams/candidates live on
    SUBLANES, where row broadcasts, row concats and axis-0 reductions are
    the shapes Mosaic likes. All stage loops are short Python loops of 2-D
    [rows, BL] ops; the host pre-transposes lp to [T, V, B] and the tiny
    outputs back. Semantics identical to the row-major kernel / scan
    backend (same candidate order, hash merge, top-k tie rule).
    """
    bl = pb_ref.shape[1]
    t_total = toplp_ref.shape[0]
    bi = pl.program_id(0)
    m = w * (k + 1)
    v = lp_buf.shape[1]

    wsub = jax.lax.broadcasted_iota(jnp.int32, (w, bl), 0)
    msub = jax.lax.broadcasted_iota(jnp.int32, (m, bl), 0)
    vsub = jax.lax.broadcasted_iota(jnp.int32, (v, bl), 0)

    # ---- init beam state (beam 0 = live empty prefix) ----
    pb0 = jnp.where(wsub == 0, 0.0, _NEG_INF)
    pnb0 = jnp.full((w, bl), _NEG_INF)
    h10 = jnp.where(wsub == 0, jnp.int32(0),
                    wsub + jnp.int32(0x7fffffff))
    h20 = jnp.where(wsub == 0, jnp.int32(0),
                    wsub + jnp.int32(0x1fffffff))
    plen0 = jnp.zeros((w, bl), jnp.int32)
    last0 = jnp.full((w, bl), -1, jnp.int32)
    pref_ref[...] = jnp.zeros((w, lcap, bl), jnp.int32)

    lens = lens_ref[0:1, :]                                # [1, BL] int32

    def dma(t, slot):
        return pltpu.make_async_copy(
            lp_hbm.at[t, :, pl.ds(bi * bl, bl)], lp_buf.at[slot],
            sems.at[slot])

    dma(0, 0).start()

    def step(t, state):
        pb, pnb, h1, h2, plen, last = state
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < t_total)
        def _():
            dma(t + 1, 1 - slot).start()
        dma(t, slot).wait()
        lp_t = lp_buf[slot]                                # [V, BL]

        top_all = toplp_ref[t]                             # [K+1, BL]
        top_lp = top_all[:k]                               # [K, BL]
        lp_blank = top_all[k:k + 1]                        # [1, BL]
        top_id = topid_ref[t]                              # [K, BL]

        # rep_lp[w, b] = lp_t[last[w, b], b] — sublane gather via one-hot
        # compare + axis-0 reduce per beam
        rep_lp = jnp.zeros((w, bl))
        for j in range(w):
            hit_v = vsub == last[j:j + 1, :]               # [V, BL]
            val = jnp.sum(jnp.where(hit_v, lp_t, 0.0), axis=0,
                          keepdims=True)                   # [1, BL]
            rep_lp = jnp.where(wsub == j, val, rep_lp)

        tot = _lse2(pb, pnb)                               # [W, BL]
        stay_pb = tot + lp_blank
        stay_pnb = jnp.where(plen > 0, pnb + rep_lp, _NEG_INF)

        # extend candidates: beam-major [W*K, BL] rows (row j*K+kk =
        # beam j extended by symbol top_id[kk]) — row broadcasts + row
        # concats, the Mosaic-friendly axis
        beam_rep = lambda arr: jnp.concatenate(
            [jnp.broadcast_to(arr[j:j + 1, :], (k, bl)) for j in range(w)],
            axis=0)                                        # [W*K, BL]
        tile_k = lambda arr: jnp.concatenate([arr] * w, axis=0)
        e_last = beam_rep(last)
        e_pb = beam_rep(pb)
        e_tot = beam_rep(tot)
        e_plen = beam_rep(plen)
        e_id = tile_k(top_id)
        e_lp = tile_k(top_lp)

        base = jnp.where(e_id == e_last, e_pb, e_tot)
        ext_pnb = base + e_lp
        ext_pnb = jnp.where((e_id == blank) | (e_plen >= lcap),
                            _NEG_INF, ext_pnb)
        cid = e_id + jnp.int32(2)
        ext_h1 = beam_rep(h1) * jnp.int32(_MUL1) + cid
        ext_h2 = beam_rep(h2) * jnp.int32(_MUL2) + cid
        ext_len = jnp.minimum(e_plen + 1, lcap)

        cand_pb = jnp.concatenate(
            [stay_pb, jnp.full((w * k, bl), _NEG_INF)], axis=0)
        cand_pnb = jnp.concatenate([stay_pnb, ext_pnb], 0)
        cand_h1 = jnp.concatenate([h1, ext_h1], 0)
        cand_h2 = jnp.concatenate([h2, ext_h2], 0)
        cand_len = jnp.concatenate([plen, ext_len], 0)
        cand_src = jnp.concatenate([wsub, beam_rep(wsub)], 0)
        cand_add = jnp.concatenate(
            [jnp.full((w, bl), -1, jnp.int32), e_id], 0)

        # ---- duplicate merge (M-loop, two-pass masked lse) ----
        def eq_row(j):
            return (cand_h1 == cand_h1[j:j + 1, :]) & \
                   (cand_h2 == cand_h2[j:j + 1, :])

        mx_pb = jnp.full((m, bl), _NEG_INF)
        mx_pnb = jnp.full((m, bl), _NEG_INF)
        dup = jnp.zeros((m, bl), jnp.int32)
        for j in range(m):
            ej = eq_row(j)
            mx_pb = jnp.maximum(mx_pb, jnp.where(ej, cand_pb[j:j + 1, :],
                                                 _NEG_INF))
            mx_pnb = jnp.maximum(
                mx_pnb, jnp.where(ej, cand_pnb[j:j + 1, :], _NEG_INF))
            if j + 1 < m:
                dup = dup + jnp.where(ej & (msub > j), 1, 0)
        s_pb = jnp.zeros((m, bl))
        s_pnb = jnp.zeros((m, bl))
        mxs_pb = jnp.maximum(mx_pb, _NEG_INF / 2)
        mxs_pnb = jnp.maximum(mx_pnb, _NEG_INF / 2)
        for j in range(m):
            ej = eq_row(j)
            s_pb = s_pb + jnp.where(
                ej, jnp.exp(cand_pb[j:j + 1, :] - mxs_pb), 0.0)
            s_pnb = s_pnb + jnp.where(
                ej, jnp.exp(cand_pnb[j:j + 1, :] - mxs_pnb), 0.0)
        merged_pb = jnp.where(
            mx_pb <= _NEG_INF / 2, _NEG_INF,
            mxs_pb + jnp.log(jnp.maximum(s_pb, 1e-37)))
        merged_pnb = jnp.where(
            mx_pnb <= _NEG_INF / 2, _NEG_INF,
            mxs_pnb + jnp.log(jnp.maximum(s_pnb, 1e-37)))
        first = dup == 0
        total = jnp.where(first, _lse2(merged_pb, merged_pnb), _NEG_INF)

        # ---- top-W by explicit rank (exact lax.top_k order) ----
        rank = jnp.zeros((m, bl), jnp.int32)
        one = jnp.ones((m, bl), jnp.int32)
        zero = jnp.zeros((m, bl), jnp.int32)
        for j in range(m):
            tj = total[j:j + 1, :]
            rank = rank + jnp.where(tj > total, one, zero)
            rank = rank + jnp.where((tj == total) & (msub > j), one, zero)

        pick1 = lambda hit, arr: jnp.sum(
            jnp.where(hit, arr, jnp.zeros_like(arr)), axis=0,
            keepdims=True)
        z_f = jnp.zeros((w, bl))
        z_i = jnp.zeros((w, bl), jnp.int32)
        new_pb, new_pnb = z_f, z_f
        new_h1 = new_h2 = new_len = new_src = new_add = z_i
        for slot2 in range(w):
            hit = rank == slot2                            # [M, BL]
            wsel = wsub == slot2                           # [W, BL]
            put = lambda dst, arr: jnp.where(wsel, pick1(hit, arr), dst)
            new_pb = put(new_pb, merged_pb)
            new_pnb = put(new_pnb, merged_pnb)
            new_h1 = put(new_h1, cand_h1)
            new_h2 = put(new_h2, cand_h2)
            new_len = put(new_len, cand_len)
            new_src = put(new_src, cand_src)
            new_add = put(new_add, cand_add)

        # ---- rebuild prefixes: accumulate over the W source beams ----
        old_pref = pref_ref[...]                           # [W, L, BL]
        gath = jnp.zeros((w, lcap, bl), jnp.int32)
        src_len = jnp.zeros((w, bl), jnp.int32)
        src_last = jnp.zeros((w, bl), jnp.int32)
        for jsrc in range(w):
            hit = new_src == jsrc                          # [W, BL]
            hit3 = hit.astype(jnp.int32)[:, None, :]
            gath = gath + hit3 * old_pref[jsrc:jsrc + 1, :, :]
            src_len = src_len + jnp.where(hit, plen[jsrc:jsrc + 1, :], 0)
            src_last = src_last + jnp.where(hit, last[jsrc:jsrc + 1, :], 0)
        app_pos = jnp.minimum(src_len, lcap - 1)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (w, lcap, bl), 1)
        app_hit = (l_iota == app_pos[:, None, :]) & \
            (new_add[:, None, :] >= 0)
        new_pref = jnp.where(app_hit, new_add[:, None, :], gath)
        new_last = jnp.where(new_add >= 0, new_add, src_last)

        # ---- freeze finished rows ----
        active = t < lens                                  # [1, BL]
        f = lambda new, old: jnp.where(active, new, old)
        pref_ref[...] = jnp.where(active[:, None, :], new_pref, old_pref)
        return (f(new_pb, pb), f(new_pnb, pnb),
                f(new_h1, h1), f(new_h2, h2),
                f(new_len, plen), f(new_last, last))

    pb, pnb, _, _, plen, _ = jax.lax.fori_loop(
        0, t_total, step, (pb0, pnb0, h10, h20, plen0, last0))
    pb_ref[...] = pb
    pnb_ref[...] = pnb
    plen_ref[...] = plen


def _beam_search_transposed(lp_all, top_lp_all, top_ids_all, logit_lengths,
                            *, w, k, blank, lcap, interpret):
    """Batch-on-lanes dispatch: pad B to a 128-lane multiple, transpose
    inputs to [..., B], run :func:`_beam_kernel_t`, transpose back."""
    b_in, t, v = lp_all.shape
    bl = 128
    b = -(-b_in // bl) * bl
    if b != b_in:
        bpad = ((0, b - b_in),)
        lp_all = jnp.pad(lp_all, bpad + ((0, 0), (0, 0)))
        top_lp_all = jnp.pad(top_lp_all, bpad + ((0, 0), (0, 0)))
        top_ids_all = jnp.pad(top_ids_all, bpad + ((0, 0), (0, 0)))
        logit_lengths = jnp.pad(logit_lengths, bpad)       # len 0 => frozen
    v_pad = -(-v // 8) * 8                                 # sublane-aligned
    if v_pad != v:
        lp_all = jnp.pad(lp_all, ((0, 0), (0, 0), (0, v_pad - v)),
                         constant_values=_NEG_INF)
    lp_tvb = jnp.transpose(lp_all, (1, 2, 0))              # [T, Vpad, B]
    toplp = jnp.transpose(
        jnp.concatenate([top_lp_all, lp_all[:, :, blank][:, :, None]], -1),
        (1, 2, 0))                                         # [T, K+1, B]
    topid = jnp.transpose(top_ids_all.astype(jnp.int32), (1, 2, 0))

    grid = (b // bl,)
    kernel = functools.partial(_beam_kernel_t, w=w, k=k, blank=blank,
                               lcap=lcap)
    out_shapes = (
        jax.ShapeDtypeStruct((w, lcap, b), jnp.int32),
        jax.ShapeDtypeStruct((w, b), jnp.int32),
        jax.ShapeDtypeStruct((w, b), jnp.float32),
        jax.ShapeDtypeStruct((w, b), jnp.float32),
    )
    pref, plen, pb, pnb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, bl), lambda i: (0, i),
                         memory_space=pltpu.VMEM),          # lens (widened)
            pl.BlockSpec(memory_space=pl.ANY),           # lp (manual DMA)
            pl.BlockSpec((t, k + 1, bl), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, k, bl), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((w, lcap, bl), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, bl), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, bl), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, bl), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, v_pad, bl), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.broadcast_to(logit_lengths.astype(jnp.int32)[None, :], (8, b)),
      lp_tvb.astype(jnp.float32), toplp.astype(jnp.float32), topid)
    pref = jnp.transpose(pref, (2, 0, 1))[:b_in]
    return (pref, jnp.transpose(plen)[:b_in], jnp.transpose(pb)[:b_in],
            jnp.transpose(pnb)[:b_in])


def _batch_block(b: int) -> int:
    # Row-major kernel block: 8 = one sublane tile; the caller pads the
    # batch to a multiple of 8 (smaller blocks would put the manual lp
    # DMA's batch offset at a non-8-multiple sublane, which Mosaic's
    # async-copy rules reject). Multi-tile batch blocks in THIS layout
    # are a dead end — round-3 bisect findings, kept for the record:
    #  1. the rep_lp one-hot gather's [BB, W, V] reduce runs over a
    #     broadcast dim whose layout has nonzero offsets
    #     ("shape_invariant_numerics ... input layout must have zero
    #     offsets over dimensions that are being reduced") — fixed by a
    #     W-loop of 2-D lane reductions;
    #  2. with that fixed, the candidate build's narrow lane-segment
    #     broadcasts/concats ([BB,1] -> [BB,K] -> lane concat) SIGABRT
    #     layout inference for every bb > 8.
    # Batches worth blocking bigger use the transposed batch-on-lanes
    # kernel instead (_beam_kernel_t), whose row-axis versions of those
    # same shapes are fine — and which uses full vregs (128 lanes) per op.
    del b
    return 8


@functools.partial(jax.jit, static_argnames=("beam_width", "topk", "blank",
                                             "max_decode_len", "interpret",
                                             "batch_block"))
def beam_search(lp_all, top_lp_all, top_ids_all, logit_lengths, *,
                beam_width: int, topk: int, blank: int, max_decode_len: int,
                interpret: bool = False, batch_block: int | None = None):
    """Run the in-VMEM prefix beam search.

    Args:
      lp_all: [B, T, V] log-probs.
      top_lp_all / top_ids_all: [B, T, K] per-frame top-K (precomputed —
        a single big XLA top_k over the whole batch is MXU/sort-friendly).
      logit_lengths: [B].
      batch_block: None = auto (transposed batch-on-lanes kernel for
        batches >= 64, row-major bb=8 below). 8 forces the row-major
        kernel; any multiple of 8 above forces the transposed kernel
        (_beam_kernel_t, 128 utterances per vreg lane).
    Returns: (prefixes [B, W, L], plen [B, W], pb [B, W], pnb [B, W]).
    """
    b_in, t, v = lp_all.shape
    w, k, lcap = beam_width, topk, max_decode_len
    if batch_block is None:
        # the transposed (batch-on-lanes) kernel amortizes its 128-lane
        # padding once the batch is a decent fraction of a lane tile;
        # below that the row-major bb=8 kernel wastes less work
        batch_block = 128 if b_in >= 64 else 8
    if batch_block % 8:
        raise ValueError("batch_block must be a multiple of 8")
    if batch_block > 8:
        return _beam_search_transposed(
            lp_all, top_lp_all, top_ids_all, logit_lengths, w=w, k=k,
            blank=blank, lcap=lcap, interpret=interpret)
    bb = batch_block
    b = -(-b_in // bb) * bb                # pad batch: 8-aligned DMA offsets
    if b != b_in:
        bpad = ((0, b - b_in),)
        lp_all = jnp.pad(lp_all, bpad + ((0, 0), (0, 0)))
        top_lp_all = jnp.pad(top_lp_all, bpad + ((0, 0), (0, 0)))
        top_ids_all = jnp.pad(top_ids_all, bpad + ((0, 0), (0, 0)))
        logit_lengths = jnp.pad(logit_lengths, bpad)       # len 0 => frozen
    v_pad = -(-v // 128) * 128                             # aligned DMA lanes
    if v_pad != v:
        lp_all = jnp.pad(lp_all, ((0, 0), (0, 0), (0, v_pad - v)),
                         constant_values=_NEG_INF)
    lp_tbv = jnp.moveaxis(lp_all, 1, 0)                    # [T, B, Vpad]
    # pack lp_blank as column K of the top-lp table (single-lane VMEM
    # blocks crash Mosaic's layout inference at large batch blocks)
    toplp = jnp.moveaxis(
        jnp.concatenate([top_lp_all, lp_all[:, :, blank][:, :, None]], -1),
        1, 0)                                              # [T, B, K+1]
    topid = jnp.moveaxis(top_ids_all, 1, 0).astype(jnp.int32)

    grid = (b // bb,)
    row3 = lambda i: (0, i, 0)
    kernel = functools.partial(_beam_kernel, w=w, k=k, blank=blank,
                               lcap=lcap)
    out_shapes = (
        jax.ShapeDtypeStruct((b, w, lcap), jnp.int32),
        jax.ShapeDtypeStruct((b, w), jnp.int32),
        jax.ShapeDtypeStruct((b, w), jnp.float32),
        jax.ShapeDtypeStruct((b, w), jnp.float32),
    )
    pref, plen, pb, pnb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # lens (widened)
            pl.BlockSpec(memory_space=pl.ANY),           # lp (manual DMA)
            pl.BlockSpec((t, bb, k + 1), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, bb, k), row3, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bb, w, lcap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, bb, v_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.broadcast_to(logit_lengths.astype(jnp.int32)[:, None], (b, 8)),
      lp_tbv.astype(jnp.float32), toplp.astype(jnp.float32), topid)
    if b != b_in:
        pref, plen, pb, pnb = (pref[:b_in], plen[:b_in], pb[:b_in],
                               pnb[:b_in])
    return pref, plen, pb, pnb
