"""Fused position-wise FFN kernel: x @ W1 + b1 -> ReLU -> @ W2 + b2.

The LM stage ledger (DESIGN.md §9 round 4) measured one FFN block's two
matmuls at 0.206 ms (b128 x seq64, d=512, inner=2048) against a 0.09 ms
MXU floor — the gap is exactly the HBM round-trip of the [N, 4d] inner
activation (67 MB write+read at N=8192), which XLA cannot avoid because
the two dots are separate HLOs. This kernel keeps the inner activation
in VMEM: the grid walks N-tiles with both weight matrices resident
(constant index_map — Mosaic fetches them once), so per-step traffic is
just the x tile in and the out tile back.

Numerics match ``flax.linen.Dense(dtype=bf16)`` exactly: operands cast
to the compute dtype, MXU f32 accumulation, output cast back, bias added
in the compute dtype.

The custom VJP recomputes the inner activation from x (standard
rematerialization) and evaluates the gradient formulas as plain XLA ops
— correct everywhere; the fused path is gated to inference by the
module layer (`FeedForward.fused`), where the backward never runs.
Reference being re-designed: the two Dense layers of
``end2end/transformer.py:204-231``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from asr_dfcnn_transformer_tpu.ops.pallas.attn_kernel import _round_up


def _pick_gn(d: int, f: int, itemsize: int = 2) -> int:
    """N-tile rows per grid step: weights (resident) + double-buffered
    x/out tiles + the inner scratch must fit ~10 MB of VMEM."""
    weights = (2 * d * f + d + f) * itemsize
    gn = 1024
    while gn > 128 and weights + gn * (2 * 2 * d + f) * itemsize \
            > 10 * 1024 * 1024:
        gn //= 2
    return gn


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    inner = jax.lax.dot_general(
        x_ref[...], w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x_ref.dtype)
    inner = jax.nn.relu(inner + b1_ref[...])
    out = jax.lax.dot_general(
        inner, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x_ref.dtype)
    o_ref[...] = out + b2_ref[...]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_ffn(x, w1, b1, w2, b2, interpret):
    """x [Npad, D] @ w1 [D, F] + b1 -> relu -> @ w2 [F, D] + b2.

    All operands already in the compute dtype (the module layer casts,
    mirroring nn.Dense's promote_dtype).
    """
    n, d = x.shape
    f = w1.shape[1]
    gn = _pick_gn(d, f, x.dtype.itemsize)
    grid = n // gn
    spec_x = pl.BlockSpec((gn, d), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_w1 = pl.BlockSpec((d, f), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    spec_b1 = pl.BlockSpec((1, f), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    spec_w2 = pl.BlockSpec((f, d), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    spec_b2 = pl.BlockSpec((1, d), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(flops=4 * n * d * f,
                           bytes_accessed=(2 * n * d + 2 * d * f)
                           * x.dtype.itemsize,
                           transcendentals=0)
    return pl.pallas_call(
        _ffn_kernel,
        grid=(grid,),
        in_specs=[spec_x, spec_w1, spec_b1, spec_w2, spec_b2],
        out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(x, w1, b1.reshape(1, f), w2, b2.reshape(1, d))


def _fused_ffn_fwd(x, w1, b1, w2, b2, interpret):
    return _fused_ffn(x, w1, b1, w2, b2, interpret), (x, w1, b1, w2, b2)


def _fused_ffn_bwd(interpret, res, g):
    del interpret
    x, w1, b1, w2, b2 = res
    # rematerialize the inner activation (plain XLA: the fused path is
    # inference-gated, so this only runs if a caller differentiates it
    # anyway — correctness over speed here)
    pre = jax.lax.dot_general(
        x, w1, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype) + b1
    inner = jax.nn.relu(pre)
    g = g.astype(x.dtype)
    db2 = jnp.sum(g.astype(jnp.float32), axis=0).astype(b2.dtype)
    dw2 = jax.lax.dot_general(
        inner, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w2.dtype)
    dinner = jax.lax.dot_general(
        g, w2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    dinner = jnp.where(pre > 0, dinner, jnp.zeros((), x.dtype))
    db1 = jnp.sum(dinner.astype(jnp.float32), axis=0).astype(b1.dtype)
    dw1 = jax.lax.dot_general(
        x, dinner, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w1.dtype)
    dx = jax.lax.dot_general(
        dinner, w1, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return dx, dw1, db1, dw2, db2


_fused_ffn.defvjp(_fused_ffn_fwd, _fused_ffn_bwd)


def ffn_wins(n: int) -> bool:
    """Measured v5e policy for ``FeedForward.fused="auto"`` (d=512,
    inner=2048, bf16; tools/measure_flash_attn.py --only ffn, round 4):
    the kernel NEVER auto-engages. Block-level at the LM shape it is a
    wash (N=8192: 0.203 vs 0.209 ms einsum) and at the full-LM level it
    LOSES 5% (7.67 vs 7.32 ms) — the [N, 4d] inner-activation HBM
    round-trip the kernel removes is evidently already hidden behind the
    MXU pipeline by XLA's lowering at these sizes, while the kernel
    serializes its two dots per grid step. Kept available via
    fused="pallas" (exact-parity tested) for shapes/toolchains where the
    traffic term dominates."""
    del n
    return False


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ffn(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
              w2: jnp.ndarray, b2: jnp.ndarray,
              interpret: bool | None = None) -> jnp.ndarray:
    """relu(x @ w1 + b1) @ w2 + b2 with the inner activation in VMEM.

    x: [..., D] (leading axes flattened internally); w1 [D, F]; w2
    [F, D]. Operands are used as given (cast to x.dtype) — callers cast
    params exactly like nn.Dense's promote_dtype.
    Returns x.shape in x.dtype. ``interpret=None`` auto-interprets off
    TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    orig_shape = x.shape
    d = orig_shape[-1]
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    gn = _pick_gn(d, w1.shape[1], x.dtype.itemsize)
    npad = _round_up(max(n, 1), gn)
    if npad != n:
        x2 = jnp.pad(x2, ((0, npad - n), (0, 0)))
    w1c, b1c, w2c, b2c = (a.astype(x.dtype) for a in (w1, b1, w2, b2))
    out = _fused_ffn(x2, w1c, b1c, w2c, b2c, interpret)
    return out[:n].reshape(orig_shape)
