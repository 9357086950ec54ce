"""Accuracy gate for the space-to-depth fast AM (VERDICT r4 next-2).

The 4,600-utt/s inference / 1,175-utt/s training numbers in BASELINE.md
ride on ``SEDFCNN.fast`` — until round 5 that variant was validated by a
geometry-only test, so the repo's best perf number was attached to a
model nothing had trained to the flagship accuracy floor. This clones
the full-pipeline gate (test_synthetic_cer_gate.py) with the fast
variant: train fast-AM + LM from scratch on the synthetic tone corpus,
assert the SAME >97% floors on the unseen test split under the clipped
edit-distance protocol (reference protocol: lm_and_am/test.py:92-101).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_dfcnn_transformer_tpu.core import vocab
from asr_dfcnn_transformer_tpu.data import (
    DataLoader,
    load_manifests,
    make_synthetic_corpus,
)
from asr_dfcnn_transformer_tpu.infer import Pipeline
from asr_dfcnn_transformer_tpu.models import SEDFCNN, TransformerLM
from asr_dfcnn_transformer_tpu.parallel import make_mesh
from asr_dfcnn_transformer_tpu.train import AMTrainer, LMTrainer


@pytest.mark.slow
def test_fast_am_pipeline_accuracy_gate(tmp_path):
    data_dir, wav_root, _, _ = make_synthetic_corpus(
        str(tmp_path / "corpus"), num_utts=96, num_classes=4,
        syllables_per_utt=(2, 4), tone_ms=250, seed=42)
    av, lv = vocab.acoustic_vocab(), vocab.language_vocab()

    def mk(mode):
        return DataLoader(load_manifests(data_dir, mode, corpora=("thchs",)),
                          av, lv, speech_root=wav_root, bucket_bounds=(128,))

    train_dl, test_dl = mk("train"), mk("test")
    mesh = make_mesh(8, 1)

    am = SEDFCNN.fast(vocab_size=av.size,
                      stage_features=(12, 12, 24, 24, 24),
                      head_features=24, dropout_rate=0.0,
                      dtype=jnp.float32)
    amt = AMTrainer(am, str(tmp_path / "work"), lr=1.5e-3, mesh=mesh)
    batches = list(train_dl.am_batches(8, shuffle=False))
    amt.restore_or_init(lambda: amt.init_state(jax.random.PRNGKey(0),
                                               batches[0]))
    rng = jax.random.PRNGKey(1)
    for step in range(500):
        rng, sub = jax.random.split(rng)
        amt.train_step(batches[step % len(batches)], sub)

    lm = TransformerLM(av.size, lv.size, d_model=64, num_heads=4,
                       num_blocks=2, dropout_rate=0.0, dtype=jnp.float32)
    lmt = LMTrainer(lm, str(tmp_path / "work"), lr=2e-3, mesh=mesh)
    lm_batches = list(train_dl.lm_batches(8, shuffle=False))
    lmt.restore_or_init(lambda: lmt.init_state(jax.random.PRNGKey(1),
                                               lm_batches[0]))
    for step in range(240):
        rng, sub = jax.random.split(rng)
        lmt.train_step(lm_batches[step % len(lm_batches)], sub)

    pipe = Pipeline(am, {"params": amt.state.params,
                         "batch_stats": amt.state.batch_stats},
                    lm, {"params": lmt.state.params},
                    acoustic_vocab=av, language_vocab=lv)
    res = pipe.evaluate(test_dl.am_batches(8, shuffle=False))
    assert res.num_utterances == 96
    assert res.pinyin_accuracy > 0.97, res
    assert res.hanzi_accuracy > 0.97, res
