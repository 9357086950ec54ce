"""Fused single-head attention kernel for the e2e pre-net's dual-axis blocks.

The reference's 2-D pre-net attention (``end2end/model.py:226-264``) becomes,
in this framework, per-(batch, row) single-head attention over the time axis
([B*F, T', C]) and the frequency axis ([B*T', F', C]) of the conv feature map
(``models/speech_transformer.py:DualAxisAttentionBlock``). XLA executes those
as thousands of ragged [T', C]x[C, T'] batched matmuls and round-trips every
f32 score matrix through HBM — measured 1.6-21 TFLOP/s effective and ~10 of
the 11.4 ms batch-8 e2e forward (DESIGN.md §9, round 4).

This kernel fuses scores -> masked softmax -> probs @ V per row entirely in
VMEM (scores never touch HBM), G rows per grid step, with two TPU-specific
layout moves:

- **Sequence-axis pair packing.** For short sequences (the freq axis:
  T' ~ 20), P consecutive rows are packed along the sequence axis into one
  [P*Tp, C] slot under a static block-diagonal mask: the scores dot becomes
  one MXU-shaped [P*Tp, C]x[C, P*Tp] contraction instead of P tiny ones.
  Off-diagonal probabilities are exactly zero after the masked softmax, so
  ``probs @ V_packed`` reproduces the per-row result bit-for-bit in exact
  arithmetic (and to bf16-accumulation tolerance here).
- **Flash-style custom VJP.** The backward kernel recomputes scores/probs in
  VMEM from the saved bf16 q/k/v (cheaper than storing [.., T, T] f32
  probabilities) and emits dq/dk/dv via three more in-VMEM contractions.

Numerics match the einsum path's class: bf16 operands, f32 score/softmax,
f32 accumulation (preferred_element_type) on every dot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Grid-step row-group count. Per step the forward holds 4 [G, S, C] bf16
# blocks (S <= 160, C <= 128 => <=1.3 MB) plus one [S, S] f32 score tile —
# comfortably inside the ~16 MB VMEM budget with double buffering.
_G = 8
# Pack pairs until the sequence axis spans at least one MXU tile.
_TARGET_S = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pack_geometry(t: int) -> tuple[int, int, int]:
    """(Tp, P, S): padded per-row length, rows packed per slot, slot length.

    Tp is 16-aligned (bf16 sublane tile); P packs short rows up to ~one MXU
    tile of sequence. Long rows (Tp >= 128, e.g. the time axis' 134) stay
    unpacked.
    """
    tp = _round_up(max(t, 1), 16)
    p = max(1, _TARGET_S // tp)
    # Packing LONG rows (tp >= 128, ROADMAP round-5 idea "multi-(b,row)
    # pair packing") loses by tile arithmetic, so P stays 1 there: the
    # scores dot [Tp,C]x[C,Tp] at Tp=144 costs ceil(144/128)^2 = 4 MXU
    # tile-passes per row; P=2 block-diagonal packing costs
    # ceil(288/128)^2 = 9 per TWO rows = 4.5/row (plus 2x the softmax
    # lanes). The K=64->128 zero-padding is paid identically either way,
    # so there is nothing to amortize — only the M/N tile rounding
    # changes, and it rounds worse for every P >= 2 once tp > 64.
    return tp, p, p * tp


def fused_wins(r: int, t: int) -> bool:
    """Measured v5e crossover for ``fused="auto"`` (C=64, bf16, slope-timed
    round 4): long rows (P=1, e.g. the time axis' T'~134) the kernel wins at
    every batch (1.2x at R=1280, tie in the noise at R=160); short packed
    rows (the freq axis' F'~20) the kernel wins 2.4x at R<=1072 but loses
    3x by R=4288 — the block-diagonal packing computes (S/t)^2 x the useful
    flops while XLA's batched einsum approaches the HBM roof at large R.
    """
    _, p, _ = _pack_geometry(t)
    return p == 1 or r <= 1536


def _slot_mask(s: int, tp: int, t: int):
    """[S, S] bool: key j is attendable from query i iff same packed slot
    and j's within-slot position is a real (< t) sequence position."""
    row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    return (row // tp == col // tp) & (col % tp < t)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, t, tp, scale):
    s = q_ref.shape[1]
    mask = _slot_mask(s, tp, t)
    for g in range(q_ref.shape[0]):
        scores = jax.lax.dot_general(
            q_ref[g], k_ref[g], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask, scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.dot(probs.astype(q_ref.dtype), v_ref[g],
                      preferred_element_type=jnp.float32)
        o_ref[g] = out.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, t, tp, scale):
    s = q_ref.shape[1]
    mask = _slot_mask(s, tp, t)
    for g in range(q_ref.shape[0]):
        scores = jax.lax.dot_general(
            q_ref[g], k_ref[g], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask, scores, -jnp.inf)
        probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
        # dP = dO @ V^T; softmax jacobian: dS = P * (dP - sum(dP*P, -1))
        dp = jax.lax.dot_general(
            do_ref[g], v_ref[g], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dsum = jnp.sum(dp * probs, axis=-1, keepdims=True)
        ds = (probs * (dp - dsum) * scale).astype(q_ref.dtype)
        dq_ref[g] = jnp.dot(ds, k_ref[g],
                            preferred_element_type=jnp.float32
                            ).astype(dq_ref.dtype)
        # dK = dS^T @ Q, dV = P^T @ dO — contract the query axis in place
        dk_ref[g] = jax.lax.dot_general(
            ds, q_ref[g], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        dv_ref[g] = jax.lax.dot_general(
            probs.astype(q_ref.dtype), do_ref[g],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _pack(x, tp: int, p: int, rpad: int):
    """[R, T, C] -> [Rpad, P*Tp, C] (pad rows/length, group P per slot)."""
    r, t, c = x.shape
    x = jnp.pad(x, ((0, rpad * p - r), (0, tp - t), (0, 0)))
    return x.reshape(rpad, p * tp, c)


def _grid_call(kernel, n_in, n_out, rpad, s, c, dtype, interpret, cost):
    grid = rpad // _G
    spec = pl.BlockSpec((_G, s, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((rpad, s, c), dtype)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[spec] * n_in,
        out_specs=spec if n_out == 1 else [spec] * n_out,
        out_shape=shape if n_out == 1 else [shape] * n_out,
        cost_estimate=cost,
        interpret=interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attn_packed(q, k, v, t, tp, interpret):
    """softmax(q @ k^T / sqrt(C)) @ v per packed slot; [Rpad, S, C] ops."""
    rpad, s, c = q.shape
    scale = 1.0 / float(c) ** 0.5
    cost = pl.CostEstimate(flops=4 * rpad * s * s * c,
                           bytes_accessed=4 * rpad * s * c * q.dtype.itemsize,
                           transcendentals=rpad * s * s)
    call = _grid_call(
        functools.partial(_fwd_kernel, t=t, tp=tp, scale=scale),
        3, 1, rpad, s, c, q.dtype, interpret, cost)
    return call(q, k, v)


def _attn_packed_fwd(q, k, v, t, tp, interpret):
    return _attn_packed(q, k, v, t, tp, interpret), (q, k, v)


def _attn_packed_bwd(t, tp, interpret, res, g):
    q, k, v = res
    rpad, s, c = q.shape
    scale = 1.0 / float(c) ** 0.5
    cost = pl.CostEstimate(flops=10 * rpad * s * s * c,
                           bytes_accessed=7 * rpad * s * c * q.dtype.itemsize,
                           transcendentals=rpad * s * s)
    call = _grid_call(
        functools.partial(_bwd_kernel, t=t, tp=tp, scale=scale),
        4, 3, rpad, s, c, q.dtype, interpret, cost)
    dq, dk, dv = call(q, k, v, g.astype(q.dtype))
    return dq, dk, dv


_attn_packed.defvjp(_attn_packed_fwd, _attn_packed_bwd)


# ---------------------------------------------------------------------------
# Masked multi-head flash attention
# ---------------------------------------------------------------------------
#
# Generalization of the kernel above to the framework's OTHER attention
# sites: the Transformer LM's causal masked self-attention
# (language_model.py:48 quirk), the e2e encoder/decoder blocks
# (end2end/model.py:281-330) and the ctc_attention stack. The LM stage
# ledger (DESIGN.md §9 round 4) measured the einsum path's softmax
# overhead at ~0.19 ms per block — half the block — all of it f32
# [B, H, T, T] score-tensor HBM round-trips; this kernel keeps the score
# tile in VMEM.
#
# Mask semantics match `models.layers.attention_mask` EXACTLY: semantic
# masking (invalid keys, causal future) is additive -1e9 on the scaled
# scores — the same values the einsum path softmaxes — while geometry
# padding (slot cross-talk, rows beyond the real Tk) is -inf so padded
# positions get exactly-zero probability (they do not exist in the
# einsum domain).

_BIG_NEG = -1e9


def _mask_pack_geometry(tq: int, tk: int) -> tuple[int, int, int, int, int]:
    """(Tqp, Tkp, P, Sq, Sk): per-side padded lengths, rows packed per
    slot, packed slot lengths. Rectangular (cross-attention) shapes pack
    only when BOTH sides are short — P is set by the larger side, so the
    block-diagonal overcompute (P^2 tiles for P rows) never exceeds the
    square case analyzed in `_pack_geometry`."""
    tqp = _round_up(max(tq, 1), 16)
    tkp = _round_up(max(tk, 1), 16)
    p = max(1, _TARGET_S // max(tqp, tkp))
    return tqp, tkp, p, p * tqp, p * tkp


def _pick_g(sq: int, sk: int, dh: int, bwd: bool,
            dropout: bool = False) -> int:
    """Rows per grid step, halved from _G until the step's VMEM residency
    (double-buffered blocks + the per-row f32 score tile) fits ~8 MB."""
    per_row = 2 * ((sq + 2 * sk) * dh * 2 + sk * 4 + sq * dh * 2)
    if bwd:
        per_row += 2 * (2 * sq * dh * 2 + sk * dh * 4)
    if dropout:
        per_row += 2 * sq * sk * 2
    g = _G
    while g > 1 and g * per_row + 2 * sq * sk * 4 > 8 * 1024 * 1024:
        g //= 2
    return g


def flash_wins(r: int, tq: int, tk: int) -> bool:
    """Measured v5e policy for the masked kernel under
    ``MultiHeadAttention.fused="auto"`` (bf16, dh=64, round 4;
    tools/measure_flash_attn.py MODEL-level A/B). On this toolchain
    XLA's einsum attention is already near its wall at every shape this
    framework runs, so the kernel auto-engages only on the one class
    where an honest model-level win was measured, and
    `MultiHeadAttention` never auto-picks it when attention dropout is
    live (LM fwd+grad 14.55 vs 10.81 ms einsum, e2e 104.8 vs 99.5 — the
    pack relayouts + recompute backward lose in training):

    - self-attention, packed T<=64 at r >= 1024 (the LM inference class,
      b128: full model 7.22 vs 7.32 / 7.30 vs 7.56 across two runs; this
      config's lengths were always traced — ids enter the jitted scan)

    Measured-rejected for auto (kernel still available via
    fused="pallas"): the ctc_attention class P=1 t=200 — an early A/B
    captured the valid-lengths as CLOSURE CONSTANTS, letting XLA fold
    BOTH sides' mask arithmetic, and under that fold the kernel looked
    +4.5%; with lengths derived from the traced tensor (the production
    situation) the verdict flips decisively, einsum 3.404 vs kernel
    4.192 ms model forward — e2e encoder T=400 (b64 model fwd 30.75 vs
    30.82 — wash; b8 3.34 vs 3.12 — loses), rectangular
    cross-attention, and every training path."""
    tqp, tkp, p, _, _ = _mask_pack_geometry(tq, tk)
    if tq != tk:
        return False
    if p == 1:
        return False
    return tqp <= 64 and r >= 1024


def _sem_geo_masks(sq, sk, tqp, tkp, tq, tk, causal):
    """([Sq, Sk] geometry-exists bool, [Sq, Sk] semantically-allowed bool).

    Geometry: same packed slot AND a real (< tk) key position — the
    einsum path's domain. Semantic: the causal tril (col <= row in
    within-slot positions, matching jnp.tril over rectangular [Tq, Tk]).
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
    geo = (row // tqp == col // tkp) & (col % tkp < tk)
    sem = (col % tkp <= row % tqp) if causal else None
    return geo, sem


def _mflash_fwd_kernel(*refs, tq, tk, tqp, tkp, scale, causal, keep_prob):
    if keep_prob is not None:
        q_ref, k_ref, v_ref, m_ref, d_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, m_ref, o_ref = refs
    sq, sk = q_ref.shape[1], k_ref.shape[1]
    geo, sem = _sem_geo_masks(sq, sk, tqp, tkp, tq, tk, causal)
    for g in range(q_ref.shape[0]):
        scores = jax.lax.dot_general(
            q_ref[g], k_ref[g], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        ok = m_ref[g:g + 1] > 0.5          # [1, Sk] key validity
        if sem is not None:
            ok = ok & sem
        scores = scores + jnp.where(ok, 0.0, _BIG_NEG)
        scores = jnp.where(geo, scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(q_ref.dtype)
        if keep_prob is not None:
            # flax Dropout semantics on the dtype-cast probabilities:
            # select(keep, p/kp, 0) == (p/kp) * mask for a 0/1 mask —
            # multiplication because Mosaic cannot compare bf16 vectors
            probs = (probs / jnp.asarray(keep_prob, probs.dtype)) * d_ref[g]
        o_ref[g] = jnp.dot(probs, v_ref[g],
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)


def _mflash_bwd_kernel(*refs, tq, tk, tqp, tkp, scale, causal, keep_prob):
    if keep_prob is not None:
        (q_ref, k_ref, v_ref, m_ref, d_ref, do_ref,
         dq_ref, dk_ref, dv_ref) = refs
    else:
        q_ref, k_ref, v_ref, m_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
    sq, sk = q_ref.shape[1], k_ref.shape[1]
    geo, sem = _sem_geo_masks(sq, sk, tqp, tkp, tq, tk, causal)
    for g in range(q_ref.shape[0]):
        scores = jax.lax.dot_general(
            q_ref[g], k_ref[g], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        ok = m_ref[g:g + 1] > 0.5
        if sem is not None:
            ok = ok & sem
        scores = scores + jnp.where(ok, 0.0, _BIG_NEG)
        scores = jnp.where(geo, scores, -jnp.inf)
        probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
        dp = jax.lax.dot_general(
            do_ref[g], v_ref[g], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if keep_prob is not None:
            # dropped probabilities feed the PV dot (and hence dV); the
            # gradient w.r.t. the pre-dropout probs is mask / keep_prob
            # (0/1 mask applied by multiplication — see forward kernel)
            dropped = (probs.astype(q_ref.dtype)
                       / jnp.asarray(keep_prob, q_ref.dtype)) * d_ref[g]
            dp = dp * (d_ref[g].astype(jnp.float32) / keep_prob)
        else:
            dropped = probs.astype(q_ref.dtype)
        dsum = jnp.sum(dp * probs, axis=-1, keepdims=True)
        ds = (probs * (dp - dsum) * scale).astype(q_ref.dtype)
        dq_ref[g] = jnp.dot(ds, k_ref[g],
                            preferred_element_type=jnp.float32
                            ).astype(dq_ref.dtype)
        dk_ref[g] = jax.lax.dot_general(
            ds, q_ref[g], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        dv_ref[g] = jax.lax.dot_general(
            dropped, do_ref[g],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _pack2(x, tp: int, p: int, rpad: int):
    """[R, T] -> [Rpad, P*Tp] (2-D counterpart of `_pack`)."""
    r, t = x.shape
    x = jnp.pad(x, ((0, rpad * p - r), (0, tp - t)))
    return x.reshape(rpad, p * tp)


def _mflash_specs(g, sq, sk, dh, dropout):
    spec_q = pl.BlockSpec((g, sq, dh), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((g, sk, dh), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((g, sk), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_d = pl.BlockSpec((g, sq, sk), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM) if dropout else None
    return spec_q, spec_k, spec_m, spec_d


def _mflash_run_fwd(q, k, v, kmask, dmask, tq, tk, tqp, tkp, causal,
                    keep_prob, interpret):
    rpad, sq, dh = q.shape
    sk = k.shape[1]
    scale = 1.0 / float(dh) ** 0.5
    g = _pick_g(sq, sk, dh, bwd=False, dropout=dmask is not None)
    spec_q, spec_k, spec_m, spec_d = _mflash_specs(
        g, sq, sk, dh, dmask is not None)
    in_specs = [spec_q, spec_k, spec_k, spec_m]
    args = [q, k, v, kmask]
    if dmask is not None:
        in_specs.append(spec_d)
        args.append(dmask)
    cost = pl.CostEstimate(flops=4 * rpad * sq * sk * dh,
                           bytes_accessed=(2 * rpad * sq * dh + 2 * rpad
                                           * sk * dh) * q.dtype.itemsize
                           + 4 * rpad * sk,
                           transcendentals=rpad * sq * sk)
    return pl.pallas_call(
        functools.partial(_mflash_fwd_kernel, tq=tq, tk=tk, tqp=tqp,
                          tkp=tkp, scale=scale, causal=causal,
                          keep_prob=keep_prob),
        grid=(rpad // g,),
        in_specs=in_specs,
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((rpad, sq, dh), q.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)


def _mflash_run_bwd(q, k, v, kmask, dmask, gout, tq, tk, tqp, tkp, causal,
                    keep_prob, interpret):
    rpad, sq, dh = q.shape
    sk = k.shape[1]
    scale = 1.0 / float(dh) ** 0.5
    g = _pick_g(sq, sk, dh, bwd=True, dropout=dmask is not None)
    grid = rpad // g if rpad % g == 0 else rpad // g + 1
    if rpad % g:
        pad = grid * g - rpad
        q, k, v = (jnp.pad(x, ((0, pad), (0, 0), (0, 0))) for x in (q, k, v))
        kmask = jnp.pad(kmask, ((0, pad), (0, 0)))
        gout = jnp.pad(gout, ((0, pad), (0, 0), (0, 0)))
        if dmask is not None:
            dmask = jnp.pad(dmask, ((0, pad), (0, 0), (0, 0)))
    rg = grid * g
    spec_q, spec_k, spec_m, spec_d = _mflash_specs(
        g, sq, sk, dh, dmask is not None)
    in_specs = [spec_q, spec_k, spec_k, spec_m]
    args = [q, k, v, kmask]
    if dmask is not None:
        in_specs.append(spec_d)
        args.append(dmask)
    in_specs.append(spec_q)
    args.append(gout.astype(q.dtype))
    cost = pl.CostEstimate(flops=10 * rg * sq * sk * dh,
                           bytes_accessed=(4 * rg * sq * dh + 3 * rg * sk
                                           * dh) * q.dtype.itemsize
                           + 4 * rg * sk,
                           transcendentals=rg * sq * sk)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_mflash_bwd_kernel, tq=tq, tk=tk, tqp=tqp,
                          tkp=tkp, scale=scale, causal=causal,
                          keep_prob=keep_prob),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[spec_q, spec_k, spec_k],
        out_shape=[jax.ShapeDtypeStruct((rg, sq, dh), q.dtype),
                   jax.ShapeDtypeStruct((rg, sk, dh), q.dtype),
                   jax.ShapeDtypeStruct((rg, sk, dh), q.dtype)],
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
    if rg != rpad:
        dq, dk, dv = dq[:rpad], dk[:rpad], dv[:rpad]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _mflash_packed(q, k, v, kmask, tq, tk, tqp, tkp, causal, interpret):
    """softmax(q @ k^T * scale + mask) @ v per packed slot.

    q [Rpad, Sq, Dh]; k/v [Rpad, Sk, Dh]; kmask [Rpad, Sk] f32 (1=valid).
    """
    return _mflash_run_fwd(q, k, v, kmask, None, tq, tk, tqp, tkp, causal,
                           None, interpret)


def _mflash_fwd(q, k, v, kmask, tq, tk, tqp, tkp, causal, interpret):
    out = _mflash_packed(q, k, v, kmask, tq, tk, tqp, tkp, causal,
                         interpret)
    return out, (q, k, v, kmask)


def _mflash_bwd(tq, tk, tqp, tkp, causal, interpret, res, gout):
    q, k, v, kmask = res
    dq, dk, dv = _mflash_run_bwd(q, k, v, kmask, None, gout, tq, tk, tqp,
                                 tkp, causal, None, interpret)
    return dq, dk, dv, jnp.zeros_like(kmask)


_mflash_packed.defvjp(_mflash_fwd, _mflash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _mflash_packed_drop(q, k, v, kmask, dmask, tq, tk, tqp, tkp, causal,
                        keep_prob, interpret):
    """The dropout variant: dmask [Rpad, Sq, Sk] (>0.5 = keep) applies
    flax-Dropout semantics to the dtype-cast probabilities; the backward
    kernel re-applies the SAME mask (it is an input, not in-kernel RNG),
    so the VJP is exact by construction."""
    return _mflash_run_fwd(q, k, v, kmask, dmask, tq, tk, tqp, tkp, causal,
                           keep_prob, interpret)


def _mflash_drop_fwd(q, k, v, kmask, dmask, tq, tk, tqp, tkp, causal,
                     keep_prob, interpret):
    out = _mflash_packed_drop(q, k, v, kmask, dmask, tq, tk, tqp, tkp,
                              causal, keep_prob, interpret)
    return out, (q, k, v, kmask, dmask)


def _mflash_drop_bwd(tq, tk, tqp, tkp, causal, keep_prob, interpret, res,
                     gout):
    q, k, v, kmask, dmask = res
    dq, dk, dv = _mflash_run_bwd(q, k, v, kmask, dmask, gout, tq, tk, tqp,
                                 tkp, causal, keep_prob, interpret)
    return dq, dk, dv, jnp.zeros_like(kmask), jnp.zeros_like(dmask)


_mflash_packed_drop.defvjp(_mflash_drop_fwd, _mflash_drop_bwd)


def _pack_diag(m, tqp: int, tkp: int, p: int, rpad: int):
    """[R, Tq, Tk] -> [Rpad, P*Tqp, P*Tkp]: each row's matrix lands on its
    slot's block diagonal (off-diagonal regions are unread — the slot mask
    zeroes those probabilities)."""
    r, tq, tk = m.shape
    m = jnp.pad(m, ((0, rpad * p - r), (0, tqp - tq), (0, tkp - tk)))
    m = m.reshape(rpad, p, tqp, tkp)
    if p == 1:
        return m[:, 0]
    out = jnp.zeros((rpad, p * tqp, p * tkp), m.dtype)
    for pp in range(p):
        out = out.at[:, pp * tqp:(pp + 1) * tqp,
                     pp * tkp:(pp + 1) * tkp].set(m[:, pp])
    return out


@functools.partial(jax.jit, static_argnames=("causal", "keep_prob",
                                              "pack", "interpret"))
def masked_flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           k_valid: jnp.ndarray | None = None, *,
                           causal: bool = False,
                           dropout_mask: jnp.ndarray | None = None,
                           keep_prob: float = 1.0,
                           pack: bool = True,
                           interpret: bool | None = None) -> jnp.ndarray:
    """Multi-head attention with key-validity + causal masking, fused.

    Args: q [B, H, Tq, Dh]; k/v [B, H, Tk, Dh]; k_valid [B, Tk] bool
    (True = attendable key; None = all keys valid); causal adds the
    within-sequence future mask (jnp.tril semantics, valid for Tq != Tk
    too — the reference's parity_decoder causal cross-attention).
    ``dropout_mask`` [B, H, Tq, Tk] bool (True = keep) applies attention-
    probability dropout with flax semantics — select(keep, p/keep_prob,
    0) on the dtype-cast probabilities; the mask is an INPUT (generated
    by the caller's RNG, e.g. jax.random.bernoulli) rather than in-kernel
    PRNG, so the custom-VJP backward re-applies the identical mask and
    the path stays CPU-testable under interpret mode.
    Returns [B, H, Tq, Dh] in q's dtype — numerically the einsum path's
    class (bf16 operands, f32 scores/softmax/accumulation), with the
    exact `attention_mask` additive -1e9 semantics.
    ``interpret=None`` auto-interprets off TPU (CPU tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, tq, dh = q.shape
    tk = k.shape[2]
    r = b * h
    dropout = dropout_mask is not None and keep_prob < 1.0
    tqp, tkp, p, sq, sk = _mask_pack_geometry(tq, tk)
    if not pack:
        # tuning override: skip slot packing (the [R, T, Dh] ->
        # [R/P, P*T, Dh] row-pairing relayout has real HBM cost)
        p, sq, sk = 1, tqp, tkp
    rpad = _round_up(max((r + p - 1) // p, 1),
                     _pick_g(sq, sk, dh, bwd=False, dropout=dropout))
    qp = _pack(q.reshape(r, tq, dh), tqp, p, rpad)
    kp = _pack(k.reshape(r, tk, dh), tkp, p, rpad)
    vp = _pack(v.reshape(r, tk, dh), tkp, p, rpad)
    if k_valid is None:
        km = jnp.ones((b, tk), jnp.float32)
    else:
        km = k_valid.astype(jnp.float32)
    km = jnp.repeat(km, h, axis=0)       # rows are b-major, h-minor
    kmp = _pack2(km, tkp, p, rpad)
    if dropout:
        dm = _pack_diag(dropout_mask.reshape(r, tq, tk).astype(q.dtype),
                        tqp, tkp, p, rpad)
        out = _mflash_packed_drop(qp, kp, vp, kmp, dm, tq, tk, tqp, tkp,
                                  causal, float(keep_prob), interpret)
    else:
        out = _mflash_packed(qp, kp, vp, kmp, tq, tk, tqp, tkp, causal,
                             interpret)
    return out.reshape(rpad * p, tqp, dh)[:r, :tq].reshape(b, h, tq, dh)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dual_axis_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        interpret: bool | None = None) -> jnp.ndarray:
    """Batched single-head attention: softmax(q @ k^T / sqrt(C)) @ v.

    Args: q/k/v [R, T, C] (each of the R rows attends over its own T
    positions — the (b, f)/(b, t) rows of the dual-axis pre-net blocks).
    Returns [R, T, C] in q's dtype. ``interpret=None`` auto-interprets off
    TPU (CPU tests); the einsum path stays the product default off-TPU —
    see ``MultiHeadAttention.fused``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r, t, c = q.shape
    tp, p, s = _pack_geometry(t)
    rpad = _round_up(max((r + p - 1) // p, 1), _G)
    args = [_pack(x, tp, p, rpad) for x in (q, k, v)]
    out = _attn_packed(*args, t, tp, interpret)
    return out.reshape(rpad * p, tp, c)[:r, :t]
