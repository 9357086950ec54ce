"""Single-load top-K over the last axis (the beam-search pre-prune).

``ops.ctc_decode._topk_last`` runs K fused (max, argmax, mask) sweeps in
XLA — exact and already 7.6x faster than ``lax.top_k``'s sort (DESIGN.md
§9), but each sweep re-reads the whole [B, T, V] log-prob tensor from
HBM: at the beam pipeline's [128, 200, 1536] f32 that is K x 157 MB of
traffic for ~40 MB of useful output. This kernel loads each row tile
into VMEM once and runs all K rounds there, so HBM traffic drops to one
read + the [N, K] outputs.

Semantics are bit-identical to ``_topk_last`` (and so to ``lax.top_k``):
values descending, ties broken by ascending index, repeated picks masked
at exactly -1e30 so a row with fewer than K finite entries degrades the
same way. Pure f32 compares — no arithmetic — so parity is exact, not
approximate (regression-tested against the XLA form).

Reference capability being accelerated: the per-step symbol pruning of
the CTC beam search (``/root/reference/util/utils.py:57-66`` decodes via
``K.ctc_decode``'s beam search, whose per-frame candidate cut this
framework batches as one [B, T, V] -> [B, T, K] pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30          # matches ops.ctc_decode._NEG_INF


def topk_wins(n: int, v: int) -> bool:
    """Measured v5e policy (round 4, tools/measure_autos.py --which topk,
    K=8, V=1536, slope-timed): the kernel wins at every measured row
    count — isolated 0.217->0.035 ms (6.1x) at n=1600, 0.538->0.205
    (2.6x) at n=6400, 2.88->1.028 (2.8x) at the beam pipeline's n=25600;
    at the full-beam-decode level 1.005->0.937 / 3.719->3.455 /
    6.312->3.734 ms (1.07x / 1.08x / 1.69x). Below n=1024 (the
    streaming chunks) the XLA sweeps are already sub-0.05 ms and the
    crossover is unmeasured, so auto stays conservative there."""
    del v
    return n >= 1024


def _topk_kernel(x_ref, vals_ref, ids_ref, *, k: int, rows: int):
    xw = x_ref[...]                                    # [R, V] f32
    v = xw.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, v), 1)
    vals, ids = [], []
    for _ in range(k):
        m = jnp.max(xw, axis=-1, keepdims=True)        # [R, 1]
        # first index attaining the max (jnp.argmax tie order)
        a = jnp.min(jnp.where(xw == m, iota, v), axis=-1,
                    keepdims=True)                     # [R, 1]
        vals.append(m)
        ids.append(a)
        xw = jnp.where(iota == a, _NEG_INF, xw)
    vals_ref[...] = jnp.concatenate(vals, axis=-1)
    ids_ref[...] = jnp.concatenate(ids, axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def topk_last(x: jnp.ndarray, k: int,
              interpret: bool | None = None):
    """Top-k of ``x`` [..., V] over the last axis -> (vals, ids) [..., k].

    Exact ``lax.top_k`` semantics (descending values, ascending-index
    ties). ``interpret=None`` auto-interprets off TPU, like every other
    kernel entry point in this package.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if x.ndim < 1 or k < 1:
        raise ValueError("topk_last needs x [..., V] and k >= 1")
    lead = x.shape[:-1]
    v = x.shape[-1]
    if k > v:
        raise ValueError(f"k={k} exceeds the last-axis size {v}")
    xf = x.astype(jnp.float32).reshape(-1, v)
    n = xf.shape[0]
    # row tile: <=4 MB of VMEM for the [R, V] block (double-buffered by
    # the pipeline), rows 8-aligned
    rows = max(8, min(256, (4 << 20) // (v * 4)) // 8 * 8)
    rows = min(rows, -(-n // 8) * 8)
    n_pad = -(-n // rows) * rows
    if n_pad != n:
        xf = jnp.pad(xf, ((0, n_pad - n), (0, 0)))
    kernel = functools.partial(_topk_kernel, k=k, rows=rows)
    # the (R, k) output blocks keep k on lanes; k is tiny (<= W=8) so the
    # lane padding is irrelevant next to the [R, V] input tile
    vals, ids = pl.pallas_call(
        kernel,
        grid=(n_pad // rows,),
        in_specs=[pl.BlockSpec((rows, v), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((rows, k), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((rows, k), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, k), jnp.int32)),
        cost_estimate=pl.CostEstimate(
            flops=5 * k * n_pad * v, bytes_accessed=n_pad * v * 4,
            transcendentals=0),
        interpret=interpret,
    )(xf)
    vals = vals[:n].reshape(*lead, k)
    ids = ids[:n].reshape(*lead, k)
    return vals.astype(x.dtype), ids
