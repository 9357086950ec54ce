"""Round-trip test: fabricate a Keras-layout hdf5, import, run KerasDFCNN."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from asr_dfcnn_transformer_tpu.infer.hdf5_import import load_keras_dfcnn_hdf5
from asr_dfcnn_transformer_tpu.models import KerasDFCNN


def _write_fake_keras(path, vocab=30, dense_units=128):
    """Emulate the Keras save format for the cnn_ctc layer stack
    (10 conv+BN pairs with the reference's channel plan, 2 dense)."""
    rng = np.random.default_rng(0)
    chans = [(1, 32), (32, 32), (32, 64), (64, 64), (64, 128), (128, 128),
             (128, 128), (128, 128), (128, 128), (128, 128)]
    layer_names = []
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        for i, (cin, cout) in enumerate(chans):
            lname = "conv2d" if i == 0 else f"conv2d_{i}"
            g = mw.create_group(lname)
            names = [f"{lname}/kernel:0", f"{lname}/bias:0"]
            g.create_dataset(names[0], data=rng.standard_normal(
                (3, 3, cin, cout)).astype(np.float32) * 0.1)
            g.create_dataset(names[1], data=np.zeros(cout, np.float32))
            g.attrs["weight_names"] = np.array(
                [n.encode() for n in names])
            layer_names.append(lname)
            bname = "batch_normalization" if i == 0 \
                else f"batch_normalization_{i}"
            g = mw.create_group(bname)
            names = [f"{bname}/gamma:0", f"{bname}/beta:0",
                     f"{bname}/moving_mean:0", f"{bname}/moving_variance:0"]
            g.create_dataset(names[0], data=np.ones(cout, np.float32))
            g.create_dataset(names[1], data=np.zeros(cout, np.float32))
            g.create_dataset(names[2], data=np.zeros(cout, np.float32))
            g.create_dataset(names[3], data=np.ones(cout, np.float32))
            g.attrs["weight_names"] = np.array([n.encode() for n in names])
            layer_names.append(bname)
        flat_in = 128 * 5  # 128 channels * (40/8) freq bins
        for i, (din, dout) in enumerate([(flat_in, dense_units),
                                         (dense_units, vocab)]):
            lname = "dense" if i == 0 else f"dense_{i}"
            g = mw.create_group(lname)
            names = [f"{lname}/kernel:0", f"{lname}/bias:0"]
            g.create_dataset(names[0], data=rng.standard_normal(
                (din, dout)).astype(np.float32) * 0.1)
            g.create_dataset(names[1], data=np.zeros(dout, np.float32))
            g.attrs["weight_names"] = np.array([n.encode() for n in names])
            layer_names.append(lname)
        mw.attrs["layer_names"] = np.array([n.encode() for n in layer_names])


def test_hdf5_import_runs_forward(tmp_path):
    path = str(tmp_path / "model.hdf5")
    _write_fake_keras(path)
    variables = load_keras_dfcnn_hdf5(path, vocab_size=30, dense_units=128)
    model = KerasDFCNN(vocab_size=30, dense_units=128, dtype=jnp.float32)
    x = np.random.default_rng(1).standard_normal((2, 32, 40, 1)).astype(np.float32)
    y = model.apply(jax.tree.map(jnp.asarray, variables), x, train=False)
    assert y.shape == (2, 4, 30)
    assert np.isfinite(np.asarray(y)).all()


def test_hdf5_import_validates_vocab(tmp_path):
    path = str(tmp_path / "model.hdf5")
    _write_fake_keras(path, vocab=30)
    try:
        load_keras_dfcnn_hdf5(path, vocab_size=999)
    except ValueError as e:
        assert "vocab" in str(e)
    else:
        raise AssertionError("expected ValueError")
