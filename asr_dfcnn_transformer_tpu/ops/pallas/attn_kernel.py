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
