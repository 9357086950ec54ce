"""BiGRU CTC acoustic model.

Re-design of the reference's alternative Keras AM (``cnn_rnn_ctc.py:37-56``):
flatten features -> Dense512 x2 -> 3 bidirectional GRU(512) layers whose
forward/backward outputs are summed -> Dense512 -> vocab logits. The
reference wraps this model in ``multi_gpu_model`` (cnn_rnn_ctc.py:59-62) —
its only parallelism; here parallelism comes from the shared pjit mesh
(parallel/mesh.py) instead of a model-level wrapper.

Recurrence is a ``flax.linen.RNN`` scan — sequential over time (inherent to
GRU), batched across utterances, matmuls on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from asr_dfcnn_transformer_tpu.models.dfcnn import _logits_dense


def _hard_sigmoid(x):
    """Old-Keras hard_sigmoid: clip(0.2*x + 0.5, 0, 1) — the default
    ``recurrent_activation`` of ``keras.layers.recurrent.GRU``."""
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


class KerasGRU(nn.Module):
    """Whole-sequence GRU matching ``keras.layers.recurrent.GRU`` exactly
    (the reference's ``bi_gru`` building block, cnn_rnn_ctc.py:49-54), for
    bit-parity inference on imported ``cnn_rnn_ctc`` weights.

    Semantics reproduced (all differ from flax ``nn.GRUCell``):
    - gate order [z | r | h] in the fused [F, 3H] kernel,
    - ``recurrent_activation = hard_sigmoid`` (old-Keras default),
    - ``reset_after = False``: candidate uses ``(r * h) @ U_h`` (reset
      applied BEFORE the recurrent matmul),
    - ``go_backwards = True`` feeds the sequence reversed and returns
      outputs in PROCESSING order (Keras does not flip them back; the
      reference adds these reversed outputs to the forward ones —
      cnn_rnn_ctc.py:50-53 — and that quirk is kept by callers).

    TPU-wise the input projection for all three gates and all timesteps is
    hoisted out of the ``lax.scan`` into one [B*T, F] x [F, 3H] MXU matmul;
    only the [B, H] recurrence scans.
    """

    hidden: int
    go_backwards: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, T, F] -> outputs [B, T, H] (processing order)
        f = x.shape[-1]
        h = self.hidden
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (f, 3 * h), jnp.float32)
        rec = self.param("recurrent_kernel", nn.initializers.orthogonal(),
                         (h, 3 * h), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (3 * h,),
                          jnp.float32)
        x = x.astype(self.dtype)
        if self.go_backwards:
            x = x[:, ::-1]
        # hoisted input projection: one big MXU matmul for every step/gate
        xw = (x @ kernel.astype(self.dtype)) + bias.astype(self.dtype)
        u = rec.astype(self.dtype)
        uz, ur, uh = u[:, :h], u[:, h:2 * h], u[:, 2 * h:]

        def step(hprev, xw_t):
            z = _hard_sigmoid(xw_t[:, :h] + hprev @ uz)
            r = _hard_sigmoid(xw_t[:, h:2 * h] + hprev @ ur)
            hh = jnp.tanh(xw_t[:, 2 * h:] + (r * hprev) @ uh)
            hnew = z * hprev + (1.0 - z) * hh
            return hnew, hnew

        h0 = jnp.zeros((x.shape[0], h), self.dtype)
        _, ys = jax.lax.scan(step, h0, jnp.moveaxis(xw, 1, 0))
        return jnp.moveaxis(ys, 0, 1)


class BiGRUCTC(nn.Module):
    """``keras_parity=True`` swaps the recurrence for :class:`KerasGRU`
    (with the reference's reversed-backward add merge and pre-layer
    dropout placement) so ``cnn_rnn_ctc`` .hdf5 weights load bit-exact;
    the default keeps the TPU-first design (flax GRU cells, time-aligned
    bidirectional merge)."""

    vocab_size: int
    hidden: int = 512
    num_layers: int = 3
    dropout_rate: float = 0.2
    keras_parity: bool = False
    logits_matmul: str = "f32"   # see dfcnn._logits_dense
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, T, F] (or [B, T, F, 1] — squeezed)
        if x.ndim == 4:
            x = x[..., 0]
        x = x.astype(self.dtype)
        drop = lambda y: nn.Dropout(self.dropout_rate)(
            y, deterministic=not train)
        if self.keras_parity:
            # parity means parity: compute in f32 regardless of
            # self.dtype — a bf16 recurrence compounds rounding across
            # ~200 steps of 3 stacked GRUs, which would silently break
            # the bit-level agreement this flag promises on imported
            # cnn_rnn_ctc weights (the CLI's --am-hdf5 path builds this
            # model with the default dtype)
            pdt = jnp.float32
            x = x.astype(pdt)
            # reference order: Dropout BEFORE each dense/gru block
            # (cnn_rnn_ctc.py:49-56)
            x = nn.relu(nn.Dense(self.hidden, dtype=pdt)(drop(x)))
            x = nn.relu(nn.Dense(self.hidden, dtype=pdt)(drop(x)))
            for i in range(self.num_layers):
                x = drop(x)
                fwd = KerasGRU(self.hidden, dtype=pdt,
                               name=f"gru_fwd_{i}")(x)
                bwd = KerasGRU(self.hidden, go_backwards=True,
                               dtype=pdt, name=f"gru_bwd_{i}")(x)
                # Keras go_backwards outputs stay time-reversed; the
                # reference adds them to the forward outputs as-is
                x = fwd + bwd
            x = nn.relu(nn.Dense(self.hidden, dtype=pdt)(drop(x)))
            logits = _logits_dense(self.vocab_size,
                                   self.logits_matmul)(drop(x))
            return logits
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        x = drop(x)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        x = drop(x)
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.GRUCell(self.hidden, dtype=self.dtype),
                         name=f"gru_fwd_{i}")
            bwd = nn.RNN(nn.GRUCell(self.hidden, dtype=self.dtype),
                         reverse=True, keep_order=True, name=f"gru_bwd_{i}")
            x = fwd(x) + bwd(x)  # fwd+bwd 'add' merge (cnn_rnn_ctc.py:51)
            x = drop(x)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        logits = _logits_dense(self.vocab_size, self.logits_matmul)(x)
        return logits
