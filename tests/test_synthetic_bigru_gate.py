"""BiGRU-CTC accuracy gate on the synthetic tone corpus (VERDICT r3 #5).

Trains the reference's alternative recurrent AM (cnn_rnn_ctc.py:37-56 —
dense stack + bidirectional GRU + CTC) from scratch under the shared
AMTrainer and asserts a held-out pinyin accuracy floor.

Recurrent nets generalize more slowly than the conv AMs on this corpus:
the tuned configuration (160 utts, hidden 48, 1 layer, dropout 0.1,
64-frame buckets, 700 steps, lr 2e-3) reaches ~76% held-out token
accuracy — far above the near-zero of an untrained decode but short of
the conv gates' >97%; the 0.65 floor asserts real learning with margin
for seed/backend drift. Runtime ~4.5 min on CPU. Marked slow.
"""

import jax
import jax.numpy as jnp
import pytest

from asr_dfcnn_transformer_tpu.core import vocab
from asr_dfcnn_transformer_tpu.data import (
    DataLoader,
    load_manifests,
    make_synthetic_corpus,
)
from asr_dfcnn_transformer_tpu.models import BiGRUCTC
from asr_dfcnn_transformer_tpu.parallel import make_mesh
from asr_dfcnn_transformer_tpu.train import AMTrainer
from asr_dfcnn_transformer_tpu.train.trainer import _dev_mean


@pytest.mark.slow
def test_bigru_accuracy_gate(tmp_path):
    data_dir, wav_root, _, _ = make_synthetic_corpus(
        str(tmp_path / "corpus"), num_utts=160, num_classes=4,
        syllables_per_utt=(2, 3), tone_ms=200, seed=42)
    av, lv = vocab.acoustic_vocab(), vocab.language_vocab()

    def mk(mode):
        return DataLoader(load_manifests(data_dir, mode, corpora=("thchs",)),
                          av, lv, speech_root=wav_root, bucket_bounds=(64,))

    train_dl, test_dl = mk("train"), mk("test")
    model = BiGRUCTC(vocab_size=av.size, hidden=48, num_layers=1,
                     dropout_rate=0.1, dtype=jnp.float32)
    tr = AMTrainer(model, str(tmp_path / "work"), lr=2e-3,
                   feature_dim=40, mesh=make_mesh(8, 1))
    batches = list(train_dl.am_batches(8, shuffle=False))
    tr.restore_or_init(lambda: tr.init_state(jax.random.PRNGKey(0),
                                             batches[0]))
    rng = jax.random.PRNGKey(1)
    for step in range(700):
        rng, sub = jax.random.split(rng)
        tr.train_step(batches[step % len(batches)], sub)

    evals = [tr.eval_step(b) for b in test_dl.am_batches(8, shuffle=False)]
    ler = _dev_mean(evals, "ler")
    assert 1.0 - ler > 0.65, f"held-out pinyin accuracy {1 - ler:.3f} <= 0.65"
