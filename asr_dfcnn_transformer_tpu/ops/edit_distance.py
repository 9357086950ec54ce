"""Edit distance: python reference + batched JAX wavefront DP.

The reference computes Levenshtein distance two ways: difflib opcode costs
on strings (``util/utils.py:43-53``, eval CER) and in-graph
``tf.edit_distance`` on sparse decodes for the training LER metric
(``lm_and_am/model/acoustic_model.py:60-62``). Here:

- :func:`edit_distance` — plain python DP on sequences (used host-side by
  the eval protocol; on token-id lists it equals the difflib opcode cost).
- :func:`batched_edit_distance` — jitted [B]-batched DP via ``lax.scan``
  rows with an associative-scan prefix-min handling the in-row insertion
  dependency; supplies the in-training label-error-rate on device.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def edit_distance(a: Sequence, b: Sequence) -> int:
    """Classic Levenshtein distance (host-side golden path)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = np.arange(lb + 1)
    for i in range(1, la + 1):
        cur = np.empty(lb + 1, dtype=np.int64)
        cur[0] = i
        ai = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ai == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return int(prev[lb])


@jax.jit
def batched_edit_distance(a: jnp.ndarray, a_len: jnp.ndarray,
                          b: jnp.ndarray, b_len: jnp.ndarray) -> jnp.ndarray:
    """Levenshtein distance for each row pair.

    Args:
      a: [B, La] padded id sequences; a_len: [B] true lengths.
      b: [B, Lb] padded id sequences; b_len: [B] true lengths.
    Returns: [B] int32 distances.

    Row recurrence: with ``m[j] = min(prev[j-1] + sub_cost_j, prev[j] + 1)``
    (deletion handled via prev[j]+1, substitution via prev[j-1]+cost), the
    insertion chain ``cur[j] = min(m[j], cur[j-1]+1)`` equals
    ``min_k<=j (m[k] + (j-k))`` — a prefix-min of ``m[k]-k`` plus ``j``,
    computed with ``jax.lax.associative_scan(min)``.
    """
    bsz, la = a.shape
    lb = b.shape[1]
    big = jnp.int32(la + lb + 1)

    # prev row i=0: dp[0, j] = j  (clamped at valid b positions is not
    # needed: we only read dp[a_len, b_len] at the end)
    row0 = jnp.broadcast_to(jnp.arange(lb + 1, dtype=jnp.int32), (bsz, lb + 1))

    def step(prev, i):
        # i is scanned over [1, la], so i-1 always indexes a valid column
        ai = jax.lax.dynamic_index_in_dim(a, i - 1, axis=1,
                                          keepdims=False)           # [B]
        sub_cost = (ai[:, None] != b).astype(jnp.int32)              # [B, Lb]
        diag = prev[:, :-1] + sub_cost                               # dp[i-1,j-1]+c
        up = prev[:, 1:] + 1                                         # dp[i-1,j]+1
        m = jnp.minimum(diag, up)                                    # [B, Lb]
        m0 = jnp.full((bsz, 1), i, dtype=jnp.int32)                  # cur[0] = i
        mj = jnp.concatenate([m0, m], axis=1)                        # [B, Lb+1]
        shifted = mj - jnp.arange(lb + 1, dtype=jnp.int32)[None, :]
        pref = jax.lax.associative_scan(jnp.minimum, shifted, axis=1)
        cur = pref + jnp.arange(lb + 1, dtype=jnp.int32)[None, :]
        # freeze rows past a_len
        active = (i <= a_len)[:, None]
        return jnp.where(active, cur, prev), None

    final, _ = jax.lax.scan(step, row0,
                            jnp.arange(1, la + 1, dtype=jnp.int32))
    dist = jnp.take_along_axis(final, b_len[:, None], axis=1)[:, 0]
    # degenerate cases fall out naturally, but clamp for safety
    return jnp.minimum(dist, big)


def label_error_rate(decoded: jnp.ndarray, decoded_len: jnp.ndarray,
                     labels: jnp.ndarray, label_len: jnp.ndarray) -> jnp.ndarray:
    """Mean normalized edit distance — parity with the reference's
    ``tf.reduce_mean(tf.edit_distance(...))`` metric
    (acoustic_model.py:60-62), where tf.edit_distance normalizes by the
    reference (label) length."""
    d = batched_edit_distance(decoded, decoded_len, labels, label_len)
    return jnp.mean(d.astype(jnp.float32)
                    / jnp.maximum(label_len.astype(jnp.float32), 1.0))
