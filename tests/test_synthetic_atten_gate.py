"""CTC-attention accuracy gate on the synthetic tone corpus (VERDICT r3 #5).

Trains the fbank->LFR->DFCNN->transformer-encoder->hanzi-CTC system
(reference: ctc_attention.py:74-134 + train_atten.py:18-93) from scratch
and asserts a held-out accuracy floor — the "trains to a working model"
proof the loss-decreases unit tests cannot give.

Uses ``parity_lengths=True`` (the reference's ceil(T/4) CTC input-length
arithmetic, data_loader2.py:136): with the geometric T//8+1 lengths the
synthetic utterances' short LFR windows leave too few logit rows for
labels with repeats (infeasible CTC alignments saturate the loss on some
batches). The reference always pairs this model with the ceil(T/4) rule,
so the gate does too.

Tuned configuration (d_model 64, 2 blocks, 40-dim fbank, 400 steps,
lr 1e-3) reaches ~88% held-out hanzi accuracy; the 0.8 floor leaves
margin for seed/backend drift. Runtime ~3 min on CPU. Marked slow.
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
from asr_dfcnn_transformer_tpu.models import CTCAttention
from asr_dfcnn_transformer_tpu.parallel import make_mesh
from asr_dfcnn_transformer_tpu.train import AttenTrainer
from asr_dfcnn_transformer_tpu.train.trainer import _dev_mean


@pytest.mark.slow
def test_ctc_attention_accuracy_gate(tmp_path):
    data_dir, wav_root, _, _ = make_synthetic_corpus(
        str(tmp_path / "corpus"), num_utts=96, num_classes=4,
        syllables_per_utt=(2, 4), tone_ms=250, seed=42)
    av, lv = vocab.acoustic_vocab(), vocab.language_vocab()

    def mk(mode):
        return DataLoader(load_manifests(data_dir, mode, corpora=("thchs",)),
                          av, lv, speech_root=wav_root, bucket_bounds=(128,))

    train_dl, test_dl = mk("train"), mk("test")
    model = CTCAttention(vocab_size=lv.size, d_model=64, num_heads=4,
                         num_blocks=2, dropout_rate=0.0,
                         parity_lengths=True, dtype=jnp.float32)
    tr = AttenTrainer(model, str(tmp_path / "work"), lr=1e-3,
                      feature_dim=40, mesh=make_mesh(8, 1))
    batches = list(train_dl.am_batches(8, shuffle=False))
    tr.restore_or_init(lambda: tr.init_state(jax.random.PRNGKey(0),
                                             batches[0]))
    rng = jax.random.PRNGKey(1)
    for step in range(400):
        rng, sub = jax.random.split(rng)
        tr.train_step(batches[step % len(batches)], sub)

    evals = [tr.eval_step(b) for b in test_dl.am_batches(8, shuffle=False)]
    ler = _dev_mean(evals, "ler")
    assert 1.0 - ler > 0.8, f"held-out hanzi accuracy {1 - ler:.3f} <= 0.8"
