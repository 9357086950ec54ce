"""Fused FFN kernel (ops/pallas/ffn_kernel.py) vs nn.Dense semantics.

The kernel must reproduce flax.linen.Dense(dtype=bf16) numerics exactly
(operand casts, MXU f32 accumulation, bias in compute dtype) because the
FeedForward module runs it on the SAME parameters the Dense path owns —
checkpoints are shared between backends.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_dfcnn_transformer_tpu.models.layers import FeedForward
from asr_dfcnn_transformer_tpu.ops.pallas.ffn_kernel import ffn_wins, fused_ffn


class _DenseRef(nn.Module):
    """The pre-round-4 FeedForward core: two nn.Dense + ReLU."""

    d_model: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(4 * self.d_model, dtype=self.dtype)(x)
        y = nn.relu(y)
        return nn.Dense(self.d_model, dtype=self.dtype)(y)


@pytest.mark.parametrize("shape,d", [
    ((4, 10, 64), 64),      # 3-D input, N=40 (pad path)
    ((256, 32), 32),        # 2-D input, exact tile
    ((1, 7, 16), 16),       # tiny everything
])
def test_fused_ffn_matches_dense(shape, d):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    ref = _DenseRef(d)
    params = ref.init(jax.random.PRNGKey(1), x)
    want = ref.apply(params, x)
    p = params["params"]
    got = fused_ffn(x, p["Dense_0"]["kernel"], p["Dense_0"]["bias"],
                    p["Dense_1"]["kernel"], p["Dense_1"]["bias"])
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_fused_ffn_backward_matches_dense():
    x = jax.random.normal(jax.random.PRNGKey(2), (6, 9, 32), jnp.bfloat16)
    ref = _DenseRef(32)
    params = ref.init(jax.random.PRNGKey(3), x)
    p = params["params"]
    cot = jax.random.normal(jax.random.PRNGKey(4), x.shape, jnp.float32)

    def loss_fused(x, p):
        out = fused_ffn(x, p["Dense_0"]["kernel"], p["Dense_0"]["bias"],
                        p["Dense_1"]["kernel"], p["Dense_1"]["bias"])
        return jnp.sum(out.astype(jnp.float32) * cot)

    def loss_ref(x, p):
        return jnp.sum(
            ref.apply({"params": p}, x).astype(jnp.float32) * cot)

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    flat_f = jax.tree_util.tree_leaves_with_path(gp_f)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(gp_r))
    for path, gf in flat_f:
        gr = flat_r[path]
        scale = max(float(jnp.abs(gr).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(gf, np.float32) / scale,
                                   np.asarray(gr, np.float32) / scale,
                                   atol=4e-2, err_msg=str(path))
    scale = max(float(jnp.abs(gx_r).max()), 1e-3)
    np.testing.assert_allclose(np.asarray(gx_f, np.float32) / scale,
                               np.asarray(gx_r, np.float32) / scale,
                               atol=4e-2)


def test_feedforward_backends_share_checkpoints():
    """einsum and pallas FeedForward agree on the SAME params, and the
    param tree matches the historical nn.Dense layout."""
    x = jax.random.normal(jax.random.PRNGKey(5), (3, 12, 48), jnp.bfloat16)
    ffn_e = FeedForward(48, fused="einsum")
    ffn_p = FeedForward(48, fused="pallas")
    params = ffn_e.init(jax.random.PRNGKey(6), x)
    assert set(params["params"]) == {"Dense_0", "Dense_1", "LayerNorm_0"}
    assert params["params"]["Dense_0"]["kernel"].shape == (48, 192)
    assert params["params"]["Dense_1"]["kernel"].shape == (192, 48)
    out_e = ffn_e.apply(params, x)
    out_p = ffn_p.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(out_e, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_feedforward_rejects_unknown_backend():
    x = jnp.zeros((2, 4, 16), jnp.bfloat16)
    with pytest.raises(ValueError, match="unknown ffn backend"):
        FeedForward(16, fused="nope").init(jax.random.PRNGKey(0), x)


def test_transformer_lm_ffn_backends_agree():
    from asr_dfcnn_transformer_tpu.models.transformer_lm import TransformerLM
    ids = jnp.array([[3, 5, 9, 2, 0, 0, 0, 0],
                     [7, 7, 7, 7, 7, 7, 7, 6]], jnp.int32)
    kwargs = dict(d_model=64, num_heads=4, num_blocks=2, dropout_rate=0.0)
    lm_e = TransformerLM(32, 48, fused_ffn="einsum", **kwargs)
    lm_p = TransformerLM(32, 48, fused_ffn="pallas", **kwargs)
    params = lm_e.init(jax.random.PRNGKey(7), ids)
    np.testing.assert_allclose(np.asarray(lm_e.apply(params, ids)),
                               np.asarray(lm_p.apply(params, ids)),
                               atol=5e-2, rtol=5e-2)


def test_ffn_wins_is_boolean_policy():
    assert isinstance(ffn_wins(8192), bool)
    assert isinstance(ffn_wins(64), bool)
