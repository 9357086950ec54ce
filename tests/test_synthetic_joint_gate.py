"""Joint AM+LM trainer accuracy gate on the synthetic corpus (VERDICT r3 #5).

The reference's joint model/driver are broken as written (am_lm_model.py:87
reads a never-assigned attribute; am_lm_train.py:97-110 references
undefined tensors); models.AMLMJoint + JointTrainer implement the evident
intent — CTC(AM, pinyin) + CE(LM on the AM's own greedy pinyin, hanzi) in
one step. This gate proves that intent *works*: trained from scratch, the
held-out hanzi position accuracy (through the real decode boundary — the
LM sees the AM's noisy output, not gold pinyin) must clear a floor.

Tuned configuration (small=True tier, 40-dim fbank, 450 steps, lr 1.5e-3)
reaches 100% held-out lm_acc; the 0.92 floor leaves margin for
seed/backend drift. Runtime ~2.5 min on CPU. Marked slow.
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
from asr_dfcnn_transformer_tpu.models import AMLMJoint
from asr_dfcnn_transformer_tpu.parallel import make_mesh
from asr_dfcnn_transformer_tpu.train import JointTrainer
from asr_dfcnn_transformer_tpu.train.trainer import _dev_mean


@pytest.mark.slow
def test_joint_am_lm_accuracy_gate(tmp_path):
    data_dir, wav_root, _, _ = make_synthetic_corpus(
        str(tmp_path / "corpus"), num_utts=96, num_classes=4,
        syllables_per_utt=(2, 4), tone_ms=250, seed=42)
    av, lv = vocab.acoustic_vocab(), vocab.language_vocab()

    def mk(mode):
        return DataLoader(load_manifests(data_dir, mode, corpora=("thchs",)),
                          av, lv, speech_root=wav_root, bucket_bounds=(128,))

    train_dl, test_dl = mk("train"), mk("test")
    model = AMLMJoint(av.size, lv.size, small=True, dtype=jnp.float32)
    tr = JointTrainer(model, str(tmp_path / "work"), lr=1.5e-3,
                      feature_dim=40, mesh=make_mesh(8, 1))
    batches = list(train_dl.am_batches(8, shuffle=False))
    tr.restore_or_init(lambda: tr.init_state(jax.random.PRNGKey(0),
                                             batches[0]))
    rng = jax.random.PRNGKey(1)
    for step in range(450):
        rng, sub = jax.random.split(rng)
        tr.train_step(batches[step % len(batches)], sub)

    evals = [tr.eval_step(b) for b in test_dl.am_batches(8, shuffle=False)]
    acc = _dev_mean(evals, "lm_acc")
    assert acc > 0.92, f"held-out joint lm_acc {acc:.3f} <= 0.92"
