"""Variant coverage: two-stack LM, standard (non-parity) attention,
BiGRU under the AM trainer, causal-off LM."""

import jax
import jax.numpy as jnp
import numpy as np

from asr_dfcnn_transformer_tpu.core import vocab
from asr_dfcnn_transformer_tpu.data import DataLoader, load_manifests, make_synthetic_corpus
from asr_dfcnn_transformer_tpu.models import BiGRUCTC, TransformerLM
from asr_dfcnn_transformer_tpu.parallel import make_mesh
from asr_dfcnn_transformer_tpu.train import AMTrainer


def test_two_stack_lm_has_double_blocks():
    m = TransformerLM(input_vocab_size=20, output_vocab_size=30,
                      d_model=16, num_heads=2, num_blocks=2, two_stack=True,
                      dropout_rate=0.0, dtype=jnp.float32)
    ids = np.array([[1, 2, 3]], np.int32)
    params = m.init(jax.random.PRNGKey(0), ids, train=False)["params"]
    names = set(params.keys())
    assert "block0_0_attn" in names and "block1_1_attn" in names
    y = m.apply({"params": params}, ids, train=False)
    assert y.shape == (1, 3, 30)


def test_standard_attention_variant():
    m = TransformerLM(input_vocab_size=20, output_vocab_size=30,
                      d_model=16, num_heads=2, num_blocks=1,
                      parity_attention=False, causal=False,
                      dropout_rate=0.0, dtype=jnp.float32)
    ids = np.array([[1, 2, 3, 0]], np.int32)
    params = m.init(jax.random.PRNGKey(0), ids, train=False)["params"]
    # standard variant has an output projection in attention
    assert "out" in params["block0_0_attn"]
    y = m.apply({"params": params}, ids, train=False)
    assert np.isfinite(np.asarray(y)).all()


def test_bigru_trains_under_am_trainer(tmp_path):
    data_dir, wav_root, _, _ = make_synthetic_corpus(
        str(tmp_path), num_utts=8, num_classes=3, tone_ms=200, seed=9)
    m = load_manifests(data_dir, "train", corpora=("thchs",))
    dl = DataLoader(m, vocab.acoustic_vocab(), vocab.language_vocab(),
                    speech_root=wav_root, bucket_bounds=(128,))
    model = BiGRUCTC(vocab_size=dl.av.size, hidden=16, num_layers=1,
                     dropout_rate=0.0, dtype=jnp.float32)
    mesh = make_mesh(4, 1, jax.devices()[:4])
    tr = AMTrainer(model, str(tmp_path / "w"), lr=1e-3, mesh=mesh)
    batches = list(dl.am_batches(batch_size=4, shuffle=False))
    tr.restore_or_init(lambda: tr.init_state(jax.random.PRNGKey(0),
                                             batches[0]))
    losses = []
    rng = jax.random.PRNGKey(1)
    for i in range(6):
        rng, sub = jax.random.split(rng)
        losses.append(float(tr.train_step(batches[i % len(batches)],
                                          sub)["loss"]))
    # recurrent nets need more than a handful of steps to reliably drop;
    # assert the step runs, stays finite, and eval works
    assert np.isfinite(losses).all()
    ev = tr.eval_step(batches[0])
    assert np.isfinite(float(ev["loss"]))
