"""End-to-end demonstration on the synthetic tone corpus (CPU-runnable).

Trains a small SE-DFCNN acoustic model (500 steps) and a Transformer LM
(240 steps) on 96 synthetic utterances where each pinyin syllable is a
distinct tone, then evaluates the full AM->LM pipeline on the UNSEEN test
split with both greedy and beam CTC decoding under the reference's
clipped-edit-distance protocol. Expected output: ~1.0 accuracy on the
toy task (same configuration as the asserted CI gate,
tests/test_synthetic_cer_gate.py). Runtime ~5 min on CPU.

    python examples/synthetic_demo.py     # from anywhere
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np, jax.numpy as jnp
from asr_dfcnn_transformer_tpu.core import vocab
from asr_dfcnn_transformer_tpu.data import DataLoader, load_manifests, make_synthetic_corpus
from asr_dfcnn_transformer_tpu.models import SEDFCNN, TransformerLM
from asr_dfcnn_transformer_tpu.train import AMTrainer, LMTrainer
from asr_dfcnn_transformer_tpu.infer import Pipeline
from asr_dfcnn_transformer_tpu.parallel import make_mesh

data_dir, wav_root, _, _ = make_synthetic_corpus(
    os.path.join('/tmp', 'asr_demo', 'corpus'), num_utts=96, num_classes=4,
    syllables_per_utt=(2, 4), tone_ms=250, seed=42)
av, lv = vocab.acoustic_vocab(), vocab.language_vocab()
mk = lambda mode: DataLoader(load_manifests(data_dir, mode, corpora=("thchs",)),
                             av, lv, speech_root=wav_root, bucket_bounds=(128,))
train_dl, test_dl = mk("train"), mk("test")
mesh = make_mesh(8, 1)
am = SEDFCNN(vocab_size=av.size, stage_features=(12, 12, 24, 24, 24),
             head_features=24, dropout_rate=0.0, dtype=jnp.float32)
amt = AMTrainer(am, os.path.join('/tmp', 'asr_demo', 'work'), lr=1.5e-3, mesh=mesh)
batches = list(train_dl.am_batches(8, shuffle=False))
amt.restore_or_init(lambda: amt.init_state(jax.random.PRNGKey(0), batches[0]))
rng = jax.random.PRNGKey(1)
for step in range(500):
    rng, sub = jax.random.split(rng)
    amt.train_step(batches[step % len(batches)], sub)
lm = TransformerLM(av.size, lv.size, d_model=64, num_heads=4, num_blocks=2,
                   dropout_rate=0.0, dtype=jnp.float32)
lmt = LMTrainer(lm, os.path.join('/tmp', 'asr_demo', 'work'), lr=2e-3, mesh=mesh)
lm_batches = list(train_dl.lm_batches(8, shuffle=False))
lmt.restore_or_init(lambda: lmt.init_state(jax.random.PRNGKey(1), lm_batches[0]))
for step in range(240):
    rng, sub = jax.random.split(rng)
    lmt.train_step(lm_batches[step % len(lm_batches)], sub)
pipe = Pipeline(am, {"params": amt.state.params, "batch_stats": amt.state.batch_stats},
                lm, {"params": lmt.state.params}, acoustic_vocab=av, language_vocab=lv)
res = pipe.evaluate(test_dl.am_batches(8, shuffle=False),
                    pred_log_path=os.path.join('/tmp', 'asr_demo', 'pred_log'))
print(f'PIPELINE EVAL (unseen test set): pinyin acc {res.pinyin_accuracy:.3f}, '
      f'hanzi acc {res.hanzi_accuracy:.3f}, utts {res.num_utterances}', flush=True)
# beam-decode pipeline too
pipe_b = Pipeline(am, {"params": amt.state.params, "batch_stats": amt.state.batch_stats},
                  lm, {"params": lmt.state.params}, acoustic_vocab=av,
                  language_vocab=lv, decode="beam", beam_width=4)
res_b = pipe_b.evaluate(test_dl.am_batches(8, shuffle=False))
print(f'BEAM EVAL: pinyin acc {res_b.pinyin_accuracy:.3f}, hanzi acc {res_b.hanzi_accuracy:.3f}', flush=True)
