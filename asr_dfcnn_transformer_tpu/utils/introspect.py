"""Model introspection helpers.

:func:`attention_maps` recovers every attention probability tensor from a
forward pass — the API equivalent of the reference's attention-heatmap
image summaries (``end2end/transformer.py:105-106`` wrote the first head's
scores to TensorBoard). Works on any model built from
``models.layers.MultiHeadAttention`` (LM, CTC-attention, speech
Transformer), via flax's ``capture_intermediates``.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def attention_maps(model, variables, *args, **kwargs) -> Dict[str, jnp.ndarray]:
    """Run ``model.apply`` capturing attention probabilities.

    Returns {flat/module/path: [B, H, Tq, Tk] probs}. Extra args/kwargs
    are forwarded to the model's ``__call__``.
    """
    _, state = model.apply(
        variables, *args, **kwargs,
        capture_intermediates=lambda mdl, name: name == "attention",
        mutable=["intermediates"])

    out = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            if k == "attention" and isinstance(v, tuple):
                out[prefix.rstrip("/")] = v[0]
            elif isinstance(v, dict):
                walk(v, prefix + k + "/")

    walk(state["intermediates"])
    return out
