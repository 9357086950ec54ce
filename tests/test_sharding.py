"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from asr_dfcnn_transformer_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
)


def test_make_mesh_shapes():
    mesh = make_mesh(-1, 1)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(4, 2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_shard_batch_places_leading_axis():
    mesh = make_mesh(8, 1)
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    (sx,) = shard_batch(mesh, (x,))
    assert sx.sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(sx), x)


def test_param_shardings_tensor_parallel_rules():
    mesh = make_mesh(4, 2)
    params = {
        "block0_0_attn": {"q": {"kernel": jnp.zeros((64, 64))},
                          "out": {"kernel": jnp.zeros((64, 64))}},
        "block0_0_ffn": {"Dense_0": {"kernel": jnp.zeros((64, 256))},
                         "Dense_1": {"kernel": jnp.zeros((256, 64))}},
        "output": {"kernel": jnp.zeros((64, 128)),
                   "bias": jnp.zeros((128,))},
        "odd": {"kernel": jnp.zeros((64, 63))},  # not divisible by 2
    }
    sh = param_shardings(mesh, params, tensor_parallel=True)
    P = jax.sharding.PartitionSpec
    assert sh["block0_0_attn"]["q"]["kernel"].spec == P(None, "model")
    assert sh["block0_0_attn"]["out"]["kernel"].spec == P("model", None)
    assert sh["block0_0_ffn"]["Dense_0"]["kernel"].spec == P(None, "model")
    assert sh["block0_0_ffn"]["Dense_1"]["kernel"].spec == P("model", None)
    assert sh["output"]["kernel"].spec == P(None, "model")
    assert sh["output"]["bias"].spec == P()       # 1-D: replicated
    assert sh["odd"]["kernel"].spec == P()        # indivisible: replicated
    # replicated mode
    sh2 = param_shardings(mesh, params, tensor_parallel=False)
    assert sh2["block0_0_attn"]["q"]["kernel"].spec == P()


def test_dryrun_multichip_8_devices():
    """The driver's multichip validation path must work end-to-end."""
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_replicated_matches():
    mesh = make_mesh(8, 1)
    x = jax.device_put(jnp.ones((3, 3)), replicated(mesh))
    assert x.sharding.spec == jax.sharding.PartitionSpec()
    b = jax.device_put(jnp.ones((8, 3)), batch_sharding(mesh))
    assert b.sharding.spec == jax.sharding.PartitionSpec("data")
