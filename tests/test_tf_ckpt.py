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


def _small_lm(jnp):
    from asr_dfcnn_transformer_tpu.models import TransformerLM
    return TransformerLM(input_vocab_size=20, output_vocab_size=25,
                         d_model=16, num_heads=4, num_blocks=2,
                         position_max_length=12, dropout_rate=0.0,
                         dtype=jnp.float32)


def test_tf1_lm_mapping_roundtrip(tmp_path):
    """TransformerLM variables -> TF1 names -> bundle on disk -> load_tf1_lm
    reproduces the exact variable tree and forward pass."""
    import jax
    import jax.numpy as jnp

    model = _small_lm(jnp)
    ids = np.array([[3, 5, 2, 7, 1, 4, 9, 11]], np.int32)
    variables = jax.tree.map(
        np.asarray, model.init(jax.random.PRNGKey(0), ids, train=False))

    tensors = tf_ckpt.export_tf1_lm(variables, num_blocks=2)
    # layout: 2 embeddings, per block 4 attn kernels + 2 conv1d pairs +
    # 2 ln pairs, root dense, global_step
    assert "enc_embed/lookup_table" in tensors
    assert "num_blocks_1/multihead_attention/dense_3/kernel" in tensors
    assert tensors["num_blocks_0/positionwise_ffnn/conv1d/kernel"].ndim == 3
    assert "global_step" in tensors

    prefix = str(tmp_path / "lm.ckpt")
    tf_ckpt.write_tf_checkpoint(prefix, tensors)
    restored = tf_ckpt.load_tf1_lm(prefix, input_vocab_size=20,
                                   output_vocab_size=25, num_blocks=2)

    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, restored))[0])
    assert len(flat_a) == len(flat_b)
    for path, arr in flat_a:
        np.testing.assert_array_equal(arr, flat_b[path], err_msg=str(path))

    y0 = model.apply(variables, ids, train=False)
    y1 = model.apply(jax.tree.map(jnp.asarray, restored), ids, train=False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_tf1_lm_vocab_validation(tmp_path):
    import jax
    import jax.numpy as jnp
    model = _small_lm(jnp)
    ids = np.zeros((1, 4), np.int32)
    v = jax.tree.map(np.asarray,
                     model.init(jax.random.PRNGKey(0), ids, train=False))
    prefix = str(tmp_path / "lm.ckpt")
    tf_ckpt.write_tf_checkpoint(prefix, tf_ckpt.export_tf1_lm(v, num_blocks=2))
    with pytest.raises(ValueError, match="vocab"):
        tf_ckpt.load_tf1_lm(prefix, input_vocab_size=999,
                            output_vocab_size=25, num_blocks=2)
    with pytest.raises(ValueError, match="vocab"):
        tf_ckpt.load_tf1_lm(prefix, input_vocab_size=20,
                            output_vocab_size=999, num_blocks=2)


def _np_layer_norm(x, gamma, beta, eps=1e-8):
    """transformer.py:18-27 (population variance, epsilon 1e-8)."""
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return gamma * (x - mean) / np.sqrt(var + eps) + beta


def _np_tf1_lm(t, ids, num_blocks=2, num_heads=4):
    """float64 re-implementation of the reference language_model.py:26-56
    inference graph from TF1-named tensors (no padding in ``ids``, so the
    embedding-sum key mask never fires and attention is purely causal)."""
    relu = lambda a: np.maximum(a, 0.0)
    b, tlen = ids.shape
    emb = np.asarray(t["enc_embed/lookup_table"], np.float64).copy()
    emb[0] = 0.0                                   # zero_pad
    d = emb.shape[1]
    x = emb[ids] * np.sqrt(d)                      # scale
    x = x + np.asarray(t["enc_pe/lookup_table"], np.float64)[:tlen]
    dh = d // num_heads
    causal = np.tril(np.ones((tlen, tlen), bool))
    for i in range(num_blocks):
        mha = f"num_blocks_{i}/multihead_attention"
        q = relu(x @ np.asarray(t[f"{mha}/dense/kernel"], np.float64))
        k = relu(x @ np.asarray(t[f"{mha}/dense_1/kernel"], np.float64))
        v = relu(x @ np.asarray(t[f"{mha}/dense_2/kernel"], np.float64))
        heads = []
        for h in range(num_heads):
            sl = slice(h * dh, (h + 1) * dh)
            s = q[..., sl] @ k[..., sl].transpose(0, 2, 1) / np.sqrt(dh)
            s = np.where(causal, s, -1e30)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            heads.append(p @ v[..., sl])
        o = relu(np.concatenate(heads, -1)
                 @ np.asarray(t[f"{mha}/dense_3/kernel"], np.float64))
        x = _np_layer_norm(o + x,
                           np.asarray(t[f"{mha}/ln/Variable_1"], np.float64),
                           np.asarray(t[f"{mha}/ln/Variable"], np.float64))
        ffn = f"num_blocks_{i}/positionwise_ffnn"
        y = relu(x @ np.asarray(t[f"{ffn}/conv1d/kernel"], np.float64)[0]
                 + np.asarray(t[f"{ffn}/conv1d/bias"], np.float64))
        y = y @ np.asarray(t[f"{ffn}/conv1d_1/kernel"], np.float64)[0] \
            + np.asarray(t[f"{ffn}/conv1d_1/bias"], np.float64)
        x = _np_layer_norm(y + x,
                           np.asarray(t[f"{ffn}/ln/Variable_1"], np.float64),
                           np.asarray(t[f"{ffn}/ln/Variable"], np.float64))
    return x @ np.asarray(t["dense/kernel"], np.float64) \
        + np.asarray(t["dense/bias"], np.float64)


def test_tf1_lm_matches_float64_numpy_reference(tmp_path):
    """Imported TF1 LM weights: the Flax forward matches a float64 numpy
    re-implementation of the reference graph (structural parity proof for
    the mapping — catches swapped gamma/beta, wrong head split, missing
    ReLU, transposed conv1d squeeze)."""
    import jax
    import jax.numpy as jnp

    model = _small_lm(jnp)
    rng = np.random.default_rng(21)
    ids = rng.integers(1, 20, size=(2, 10)).astype(np.int32)  # no PAD
    variables = jax.tree.map(
        np.asarray, model.init(jax.random.PRNGKey(4), ids, train=False))
    # randomize LN params so gamma/beta swaps cannot hide behind 1/0 inits
    for blk in list(variables["params"]):
        node = variables["params"][blk]
        if isinstance(node, dict) and "LayerNorm_0" in node:
            ln = node["LayerNorm_0"]
            ln["scale"] = rng.uniform(0.8, 1.2, ln["scale"].shape) \
                .astype(np.float32)
            ln["bias"] = (0.1 * rng.standard_normal(ln["bias"].shape)) \
                .astype(np.float32)
    tensors = tf_ckpt.export_tf1_lm(variables, num_blocks=2)
    want = _np_tf1_lm(tensors, ids)
    restored = tf_ckpt.load_tf1_lm(tensors, input_vocab_size=20,
                                   output_vocab_size=25, num_blocks=2)
    got = np.asarray(model.apply(jax.tree.map(jnp.asarray, restored), ids,
                                 train=False), np.float64)
    assert got.shape == want.shape
    scale = np.maximum(np.abs(want), 1.0)
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-4)


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
