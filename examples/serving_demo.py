"""Serving-surface demonstration on the synthetic tone corpus
(CPU-runnable).

Trains a tiny AM+LM, then walks the three serving layers:

1. ``BatchingServer`` — concurrent single-utterance requests coalesced
   into length-bucketed batches behind futures.
2. ``export_pipeline`` -> one self-contained ``.asrx`` artifact
   (jax.export StableHLO + weights + vocabs).
3. ``ServingPipeline.load`` — artifact-only inference (no model code,
   checkpoints or assets) whose outputs must match the live pipeline
   exactly.
4. ``StreamPool`` — concurrent LIVE audio streams multiplexed through
   one batched compiled program per stage; finals must match the
   offline pipeline's per-utterance results.

Runtime ~2 min on CPU.

    python examples/serving_demo.py     # from anywhere
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
# ASR_DEMO_PLATFORM=<jax platform> runs the same demo on a device (e.g.
# "tpu" on a real TPU host, "axon" through this image's tunnel) — the
# exported artifact then embeds the TPU-lowered programs (auto-selected
# Pallas kernels included), making this the on-device export-serving
# smoke.
jax.config.update('jax_platforms',
                  os.environ.get('ASR_DEMO_PLATFORM', 'cpu'))
import numpy as np, jax.numpy as jnp
from asr_dfcnn_transformer_tpu.core import vocab
from asr_dfcnn_transformer_tpu.data import DataLoader, load_manifests, make_synthetic_corpus
from asr_dfcnn_transformer_tpu.models import SEDFCNN, TransformerLM
from asr_dfcnn_transformer_tpu.train import AMTrainer, LMTrainer
from asr_dfcnn_transformer_tpu.infer import BatchingServer, Pipeline
from asr_dfcnn_transformer_tpu.infer.export_serving import ServingPipeline, export_pipeline

work = os.path.join('/tmp', 'asr_serving_demo')
data_dir, wav_root, _, _ = make_synthetic_corpus(
    os.path.join(work, 'corpus'), num_utts=48, num_classes=4,
    syllables_per_utt=(2, 3), tone_ms=250, seed=7)
av, lv = vocab.acoustic_vocab(), vocab.language_vocab()
mk = lambda mode: DataLoader(load_manifests(data_dir, mode, corpora=("thchs",)),
                             av, lv, speech_root=wav_root, bucket_bounds=(128,))
train_dl, test_dl = mk("train"), mk("test")

am = SEDFCNN(vocab_size=av.size, stage_features=(8, 8, 16, 16, 16),
             head_features=16, dropout_rate=0.0, dtype=jnp.float32)
amt = AMTrainer(am, os.path.join(work, 'work'), lr=1.5e-3)
batches = list(train_dl.am_batches(8, shuffle=False))
amt.restore_or_init(lambda: amt.init_state(jax.random.PRNGKey(0), batches[0]))
rng = jax.random.PRNGKey(1)
for step in range(220):
    rng, sub = jax.random.split(rng)
    amt.train_step(batches[step % len(batches)], sub)
lm = TransformerLM(av.size, lv.size, d_model=32, num_heads=4, num_blocks=1,
                   dropout_rate=0.0, dtype=jnp.float32)
lmt = LMTrainer(lm, os.path.join(work, 'work'), lr=2e-3)
lm_batches = list(train_dl.lm_batches(8, shuffle=False))
lmt.restore_or_init(lambda: lmt.init_state(jax.random.PRNGKey(1), lm_batches[0]))
for step in range(120):
    rng, sub = jax.random.split(rng)
    lmt.train_step(lm_batches[step % len(lm_batches)], sub)

pipe = Pipeline(am, {"params": amt.state.params, "batch_stats": amt.state.batch_stats},
                lm, {"params": lmt.state.params}, acoustic_vocab=av, language_vocab=lv)

# 1. micro-batching server: concurrent requests -> one compiled program
test_batch = next(test_dl.am_batches(4, shuffle=False))
server = BatchingServer(pipe, max_batch=4, max_wait_ms=20.0)
futures = [server.submit(test_batch.signals[i][: test_batch.signal_lengths[i]])
           for i in range(4)]
for i, f in enumerate(futures):
    pinyin, hanzi = f.result()
    print(f'SERVER utt{i}: {" ".join(pinyin)} | {hanzi}', flush=True)
server.close()

# 2. one-file AOT artifact
artifact = os.path.join(work, 'pipeline.asrx')
meta = export_pipeline(pipe, artifact, batch_sizes=(1, 4), buckets=(128,))
print(f'ARTIFACT: {artifact} ({os.path.getsize(artifact)} bytes, '
      f'{len(meta["programs"])} entry points)', flush=True)

# 3. artifact-only serving — must agree with the live pipeline exactly
served = ServingPipeline.load(artifact)
live = pipe.recognize_batch(test_batch.signals, test_batch.signal_lengths,
                            test_batch.bucket_frames)
aot = served.recognize_batch(test_batch.signals, test_batch.signal_lengths)
assert np.array_equal(np.asarray(live[0]), aot[0])
assert np.array_equal(np.asarray(live[2]), aot[2])
pinyin, hanzi = served.recognize_signal(
    test_batch.signals[0][: test_batch.signal_lengths[0]])
print(f'AOT ARTIFACT utt0: {" ".join(pinyin)} | {hanzi}', flush=True)

# 4. multi-stream pool: 4 concurrent live streams, interleaved 0.25 s
# chunks, one batched device program per stage per round
from asr_dfcnn_transformer_tpu.infer import StreamPool
pool = StreamPool(pipe, n_slots=4)
sigs = [np.asarray(test_batch.signals[i][: test_batch.signal_lengths[i]])
        for i in range(4)]
slots = [pool.open() for _ in sigs]
offs = [0] * len(sigs)
hop = 4000
while any(o < len(s) for o, s in zip(offs, sigs)):
    for k, s in enumerate(sigs):
        if offs[k] < len(s):
            pool.push(slots[k], s[offs[k]: offs[k] + hop], step=False)
            offs[k] += hop
    pool.step()
for k, sl in enumerate(slots):
    pinyin, hanzi = pool.finalize(sl)
    print(f'STREAM POOL utt{k}: {" ".join(pinyin)} | {hanzi}', flush=True)
    pool.close(sl)
print('SERVING DEMO OK: artifact outputs match the live pipeline exactly',
      flush=True)
