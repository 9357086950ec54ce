"""TF1 tensor_bundle checkpoint reader/writer tests (no TensorFlow).

Round-trips cover the full stack: varint protobuf, LevelDB block table
with masked CRC32C, snappy decoding, dtype mapping, and the TF1 SE-DFCNN
variable-name mapping (acoustic_model2.py creation order)."""

import numpy as np
import pytest

from asr_dfcnn_transformer_tpu.infer import tf_ckpt


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC32C (Castagnoli)
    assert tf_ckpt.crc32c(b"") == 0x00000000
    assert tf_ckpt.crc32c(b"123456789") == 0xE3069283
    assert tf_ckpt.crc32c(b"\x00" * 32) == 0x8A9136AA
    # mask/unmask round-trip
    for v in (0, 1, 0xE3069283, 0xFFFFFFFF):
        assert tf_ckpt._unmask((((v >> 15) | (v << 17)) +
                                tf_ckpt._MASK_DELTA) & 0xFFFFFFFF) == v


def test_snappy_decompress_handwritten_stream():
    # varint(9) + literal "abc" + copy(len=6, offset=3) -> "abcabcabc"
    stream = b"\x09" + b"\x08" + b"abc" + bytes([(2 << 2) | 1, 3])
    assert tf_ckpt.snappy_decompress(stream) == b"abcabcabc"
    # literal-only
    stream = b"\x05" + b"\x10" + b"hello"
    assert tf_ckpt.snappy_decompress(stream) == b"hello"


def test_sstable_roundtrip(tmp_path):
    items = {f"key_{i:03d}".encode(): bytes([i]) * (i + 1)
             for i in range(50)}
    path = str(tmp_path / "table")
    tf_ckpt.write_sstable(path, items)
    assert tf_ckpt.read_sstable(path) == items


def test_sstable_detects_corruption(tmp_path):
    path = str(tmp_path / "table")
    tf_ckpt.write_sstable(path, {b"k": b"value"})
    raw = bytearray(open(path, "rb").read())
    raw[2] ^= 0xFF  # flip a byte inside the data block
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum"):
        tf_ckpt.read_sstable(path)


def test_checkpoint_roundtrip_dtypes(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a/kernel": rng.standard_normal((3, 3, 2, 4)).astype(np.float32),
        "a/bias": rng.standard_normal((4,)).astype(np.float64),
        "step": np.array(1234, np.int64),
        "counts": rng.integers(0, 100, (7,)).astype(np.int32),
        "flag": np.array([True, False]),
        "scalar_f": np.array(2.5, np.float32),
    }
    prefix = str(tmp_path / "model.ckpt")
    tf_ckpt.write_tf_checkpoint(prefix, tensors)
    got = tf_ckpt.read_tf_checkpoint(prefix)
    assert set(got) == set(tensors)
    for k in tensors:
        assert got[k].dtype == tensors[k].dtype, k
        np.testing.assert_array_equal(got[k], tensors[k])
    listing = tf_ckpt.list_tf_checkpoint(prefix)
    assert listing["a/kernel"] == ("float32", (3, 3, 2, 4))
    assert listing["step"] == ("int64", ())


def test_checkpoint_detects_tensor_corruption(tmp_path):
    prefix = str(tmp_path / "m.ckpt")
    tf_ckpt.write_tf_checkpoint(
        prefix, {"w": np.arange(16, dtype=np.float32)})
    data_path = prefix + ".data-00000-of-00001"
    raw = bytearray(open(data_path, "rb").read())
    raw[0] ^= 0xFF
    open(data_path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum"):
        tf_ckpt.read_tf_checkpoint(prefix)
    # verify_crc=False reads through
    tf_ckpt.read_tf_checkpoint(prefix, verify_crc=False)


def test_tf1_sedfcnn_mapping_roundtrip(tmp_path):
    """SEDFCNN variables -> TF1 names -> bundle on disk -> load_tf1_sedfcnn
    reproduces the exact variable tree and forward pass."""
    import jax
    import jax.numpy as jnp

    from asr_dfcnn_transformer_tpu import models

    model = models.SEDFCNN(vocab_size=32, stage_features=(4, 4, 8, 8, 8),
                           se_ratio=(1, 2, 2, 2, 2), head_features=8,
                           dropout_rate=0.0, dtype=jnp.float32)
    x = np.random.default_rng(0).standard_normal((1, 32, 40, 1)) \
        .astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    variables = jax.tree.map(np.asarray, variables)

    tensors = tf_ckpt.export_tf1_sedfcnn(variables)
    # creation-order naming: 11 convs, 16 BNs, 11 denses
    assert sum(k.endswith("/kernel") and k.startswith("conv2d")
               for k in tensors) == 11
    assert sum(k.endswith("/gamma") for k in tensors) == 16
    assert sum(k.endswith("/kernel") and k.startswith("dense")
               for k in tensors) == 11

    prefix = str(tmp_path / "am.ckpt")
    tf_ckpt.write_tf_checkpoint(prefix, tensors)
    restored = tf_ckpt.load_tf1_sedfcnn(prefix, vocab_size=32)

    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, restored))[0])
    assert len(flat_a) == len(flat_b)
    for path, arr in flat_a:
        np.testing.assert_array_equal(arr, flat_b[path], err_msg=str(path))

    y0 = model.apply(variables, x, train=False)
    y1 = model.apply(jax.tree.map(jnp.asarray, restored), x, train=False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_tf1_sedfcnn_vocab_validation(tmp_path):
    import jax
    import jax.numpy as jnp

    from asr_dfcnn_transformer_tpu import models
    model = models.SEDFCNN(vocab_size=32, stage_features=(4, 4, 8, 8, 8),
                           se_ratio=(1, 2, 2, 2, 2), head_features=8,
                           dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0),
                   np.zeros((1, 32, 40, 1), np.float32), train=False)
    prefix = str(tmp_path / "am.ckpt")
    tf_ckpt.write_tf_checkpoint(
        prefix, tf_ckpt.export_tf1_sedfcnn(jax.tree.map(np.asarray, v)))
    with pytest.raises(ValueError, match="vocab"):
        tf_ckpt.load_tf1_sedfcnn(prefix, vocab_size=999)
