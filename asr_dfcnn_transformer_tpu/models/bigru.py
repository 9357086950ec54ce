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

import jax.numpy as jnp
from flax import linen as nn


class BiGRUCTC(nn.Module):
    vocab_size: int
    hidden: int = 512
    num_layers: int = 3
    dropout_rate: float = 0.2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, T, F] (or [B, T, F, 1] — squeezed)
        if x.ndim == 4:
            x = x[..., 0]
        x = x.astype(self.dtype)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.GRUCell(self.hidden, dtype=self.dtype),
                         name=f"gru_fwd_{i}")
            bwd = nn.RNN(nn.GRUCell(self.hidden, dtype=self.dtype),
                         reverse=True, keep_order=True, name=f"gru_bwd_{i}")
            x = fwd(x) + bwd(x)  # fwd+bwd 'add' merge (cnn_rnn_ctc.py:51)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        logits = nn.Dense(self.vocab_size, dtype=jnp.float32)(x)
        return logits
