"""Stride2Conv: the pre-net's C_in=1 conv and its packed execution path.

The space-to-depth layout must be an exact re-expression of the SAME /
stride-2 / 3x3 conv (same taps, zeros elsewhere) with the parameter tree
nn.Conv would store (checkpoint compatibility across the rewrite).
"""

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from asr_dfcnn_transformer_tpu.models.speech_transformer import (
    PreNet,
    Stride2Conv,
)


def _conv_ref(x, kernel, bias):
    """The previous implementation: plain nn.Conv, SAME, stride 2."""
    mod = nn.Conv(kernel.shape[-1], (3, 3), strides=(2, 2), padding="SAME",
                  dtype=jnp.float32)
    return mod.apply({"params": {"kernel": kernel, "bias": bias}}, x)


def test_pack_matches_plain_and_nn_conv_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 8, 1)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((3, 3, 1, 5)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((5,)), jnp.float32)
    variables = {"params": {"kernel": kernel, "bias": bias}}
    ref = np.asarray(_conv_ref(x, kernel, bias))
    for layout in ("plain", "pack", "auto"):
        got = np.asarray(Stride2Conv(5, layout=layout,
                                     dtype=jnp.float32).apply(variables, x))
        assert got.shape == ref.shape == (2, 6, 4, 5)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pack_bf16_close_to_plain():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 10, 1)), jnp.float32)
    kernel = jnp.asarray(0.3 * rng.standard_normal((3, 3, 1, 4)),
                         jnp.float32)
    bias = jnp.zeros((4,), jnp.float32)
    variables = {"params": {"kernel": kernel, "bias": bias}}
    plain = np.asarray(Stride2Conv(4, layout="plain").apply(
        variables, x)).astype(np.float32)
    pack = np.asarray(Stride2Conv(4, layout="pack").apply(
        variables, x)).astype(np.float32)
    np.testing.assert_allclose(pack, plain, rtol=0.05, atol=0.05)


def test_pack_falls_back_on_odd_extents():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 11, 8, 1)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((3, 3, 1, 3)), jnp.float32)
    bias = jnp.zeros((3,), jnp.float32)
    variables = {"params": {"kernel": kernel, "bias": bias}}
    ref = np.asarray(_conv_ref(x, kernel, bias))
    got = np.asarray(Stride2Conv(3, layout="pack",
                                 dtype=jnp.float32).apply(variables, x))
    assert got.shape == (1, 6, 4, 3)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_prenet_param_tree_unchanged():
    """The rewrite must keep the exact parameter paths/shapes the previous
    two-nn.Conv PreNet stored (prenet checkpoints restore across it)."""
    pn = PreNet(channels=8)
    variables = pn.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 12, 8, 1), jnp.float32))
    params = variables["params"]
    assert params["Conv_0"]["kernel"].shape == (3, 3, 1, 8)
    assert params["Conv_0"]["bias"].shape == (8,)
    assert params["Conv_1"]["kernel"].shape == (3, 3, 8, 8)
    assert params["Conv_1"]["bias"].shape == (8,)
    assert set(variables["batch_stats"].keys()) == {"BatchNorm_0",
                                                    "BatchNorm_1"}
    for k in ("BatchNorm_0", "BatchNorm_1"):
        assert params[k]["scale"].shape == (8,)
    # gradients flow through the packed path
    def loss(p):
        out = pn.apply({"params": p,
                        "batch_stats": variables["batch_stats"]},
                       jnp.ones((1, 12, 8, 1), jnp.float32))
        return jnp.sum(out.astype(jnp.float32) ** 2)
    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["Conv_0"]["kernel"]).sum()) > 0.0


def test_prenet_pack_layout_same_outputs():
    pn_plain = PreNet(channels=8, conv1_layout="plain", dtype=jnp.float32)
    pn_pack = PreNet(channels=8, conv1_layout="pack", dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 12, 8, 1)),
                    jnp.float32)
    variables = pn_plain.init(jax.random.PRNGKey(1), x)
    a = np.asarray(pn_plain.apply(variables, x))
    b = np.asarray(pn_pack.apply(variables, x))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
