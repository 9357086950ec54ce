"""Benchmark suite: the five BASELINE.json configs on one TPU chip.

Emits ONE JSON line. The headline metric/value is the BASELINE.json
north-star path — batched AM+LM inference, batch 128 — and ``extra.suite``
carries one entry per benchmark config (BASELINE.json "configs"):

  1. single_utt_greedy   — batch-1 fbank->DFCNN->CTC greedy latency
  2. am_batched_b32      — batched fbank + AM inference, batch 32
  3. lm_only             — pinyin->hanzi Transformer LM (test_lm.py path)
  4. beam_noise_pipeline — on-device noise aug + AM + CTC beam + LM
  5. train_step_standard / train_step_fast — full AM training step
                           (fbank+fwd+CTC+grads+Adam), batch 64;
     train_step_lm / train_step_e2e — LM (batch 64) and end-to-end
                           speech-Transformer (batch 8) training steps
  plus am_lm_fast_b128   — the space-to-depth AM pipeline variant.

All utterances are WORST-CASE full 1600-frame (16 s) inputs at reference
geometry (200-dim fbank, acoustic vocab 1536, hanzi vocab 6345, LM
12x512); real corpora with ~5 s means and length bucketing run
proportionally faster. ALL timings run N iterations inside ONE jitted
lax.scan whose carry is a data-dependent, non-foldable function of each
iteration's output (sum(out) * 1e-30): pure device time that per-request
result caching (observed on tunneled TPU backends) cannot inflate, XLA
cannot constant-fold, and dead-code elimination cannot hollow out. Round
1's repeat-input methodology overstated the XLA-fbank pipeline ~5x.

    python bench.py              # full suite (one JSON line)
    python bench.py --only lm_only --batch 64
"""

import json
import sys
import time

import numpy as np

FRAMES = 1600
N_SAMPLES = (FRAMES - 1) * 160 + 400
ACOUSTIC_VOCAB, LANGUAGE_VOCAB = 1536, 6345
UTT_SECONDS = 16.0


def _signals(batch, seed=0):
    import jax
    rs = np.random.default_rng(seed)
    sig = (0.1 * rs.standard_normal((batch, N_SAMPLES))).astype(np.float32)
    return (jax.device_put(sig),
            jax.device_put(np.full((batch,), N_SAMPLES, np.int32)))


def _scan_time(body, x, iters=10):
    """Seconds/iteration of ``body(x + carry, i)`` scanned ``iters`` times
    inside one jit. The carry is sum(output) * 1e-30 — data-dependent so
    nothing folds, caches, or DCEs; numerically a no-op perturbation."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def multi(x):
        def step(c, i):
            out = body(x + c.astype(x.dtype), i)
            first = jax.tree.leaves(out)[0]
            return jnp.sum(first.astype(jnp.float32)) * 1e-30, 0
        return jax.lax.scan(step, jnp.zeros((), jnp.float32),
                            jnp.arange(iters))[0]

    out = multi(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = multi(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


class _Models:
    def __init__(self):
        import jax
        import jax.numpy as jnp
        from asr_dfcnn_transformer_tpu import models
        rng = jax.random.PRNGKey(0)
        feats0 = jnp.zeros((1, FRAMES, 200, 1), jnp.float32)
        self.am = models.SEDFCNN(vocab_size=ACOUSTIC_VOCAB)
        self.am_vars = self.am.init(rng, feats0, train=False)
        self.lm = models.TransformerLM(ACOUSTIC_VOCAB, LANGUAGE_VOCAB)
        self.lm_vars = self.lm.init(rng, jnp.zeros((1, 64), jnp.int32),
                                    train=False)
        self.fast = models.SEDFCNN.fast(ACOUSTIC_VOCAB)
        self.fast_vars = self.fast.init(rng, feats0, train=False)


def _pipeline_fn(m, am, am_vars, decode="greedy", beam_width=8,
                 noise=False):
    import jax
    import jax.numpy as jnp
    from asr_dfcnn_transformer_tpu.audio import add_noise_batch, batched_fbank
    from asr_dfcnn_transformer_tpu.models.dfcnn import (
        frames_from_samples, logit_lengths)
    from asr_dfcnn_transformer_tpu.ops import (
        ctc_beam_search_decode, ctc_greedy_decode)

    def forward(signals, signal_lengths, key):
        if noise:
            signals = add_noise_batch(key, signals, signal_lengths)
        feats, _ = batched_fbank(signals, signal_lengths, out_frames=FRAMES)
        logits = am.apply(am_vars, feats[..., None], train=False)
        in_len = logit_lengths(frames_from_samples(signal_lengths),
                               logits.shape[1])
        if decode == "beam":
            pny_ids, pny_len, _ = ctc_beam_search_decode(
                logits, in_len, beam_width=beam_width, topk=beam_width,
                blank_id=-1, max_decode_len=64)
        else:
            pny_ids, pny_len = ctc_greedy_decode(logits, in_len, blank_id=-1,
                                                 max_output_len=64)
        lm_logits = m.lm.apply(m.lm_vars, pny_ids, train=False)
        return pny_ids, pny_len, jnp.argmax(lm_logits, axis=-1)

    return forward


def bench_am_lm(m, batch, am=None, am_vars=None, decode="greedy",
                noise=False, iters=10):
    import jax
    fwd = _pipeline_fn(m, am or m.am, am_vars or m.am_vars, decode=decode,
                       noise=noise)
    sig, lens = _signals(batch)
    key = jax.random.PRNGKey(0)
    dt = _scan_time(
        lambda z, i: fwd(z, lens, jax.random.fold_in(key, i)), sig,
        iters=iters)
    return {"ms_per_batch": round(1000 * dt, 2), "batch": batch,
            "utts_per_sec": round(batch / dt, 2),
            "rtfx": round(UTT_SECONDS * batch / dt, 1)}


def bench_single_utt(m):
    """BASELINE config 1: single-utterance greedy decode latency."""
    import jax
    import jax.numpy as jnp
    from asr_dfcnn_transformer_tpu.audio import batched_fbank
    from asr_dfcnn_transformer_tpu.models.dfcnn import (
        frames_from_samples, logit_lengths)
    from asr_dfcnn_transformer_tpu.ops import ctc_greedy_decode

    def forward(signals, signal_lengths):
        feats, _ = batched_fbank(signals, signal_lengths, out_frames=FRAMES)
        logits = m.am.apply(m.am_vars, feats[..., None], train=False)
        in_len = logit_lengths(frames_from_samples(signal_lengths),
                               logits.shape[1])
        return ctc_greedy_decode(logits, in_len, blank_id=-1,
                                 max_output_len=64)

    sig, lens = _signals(1)
    dt = _scan_time(lambda z, i: forward(z, lens), sig, iters=20)
    return {"latency_ms": round(1000 * dt, 2),
            "rtfx": round(UTT_SECONDS / dt, 1)}


def bench_lm_only(m, batch=128, seq_len=64):
    """BASELINE config 3: LM-only inference (test_lm.py path)."""
    import jax
    import jax.numpy as jnp

    def forward(ids):
        return jnp.argmax(m.lm.apply(m.lm_vars, ids, train=False), axis=-1)

    rs = np.random.default_rng(0)
    ids = jax.device_put(
        rs.integers(3, ACOUSTIC_VOCAB - 1, (batch, seq_len)).astype(np.int32))
    dt = _scan_time(lambda z, i: forward(z), ids, iters=20)
    return {"ms_per_batch": round(1000 * dt, 2), "batch": batch,
            "utts_per_sec": round(batch / dt, 2)}


def bench_train(m, fast=False, batch=64, steps=10):
    """BASELINE config 5: full training step (pure device time, scanned)."""
    import tempfile

    import jax
    import jax.numpy as jnp
    from asr_dfcnn_transformer_tpu.data.loader import AMBatch
    from asr_dfcnn_transformer_tpu.train import AMTrainer

    rng = np.random.default_rng(0)
    sig = (0.1 * rng.standard_normal((batch, N_SAMPLES))).astype(np.float32)
    lab = np.concatenate([rng.integers(3, ACOUSTIC_VOCAB - 64, (batch, 48)),
                          np.zeros((batch, 16))], 1).astype(np.int32)
    ab = AMBatch(signals=sig,
                 signal_lengths=np.full((batch,), N_SAMPLES, np.int32),
                 frame_lengths=np.full((batch,), FRAMES, np.int32),
                 pinyin=lab, pinyin_lengths=np.full((batch,), 48, np.int32),
                 hanzi=lab, hanzi_lengths=np.full((batch,), 48, np.int32),
                 weights=np.ones((batch,), np.float32),
                 bucket_frames=FRAMES)
    model = m.fast if fast else m.am
    tr = AMTrainer(model, tempfile.mkdtemp(prefix="bench_train_"))
    tr.restore_or_init(lambda: tr.init_state(jax.random.PRNGKey(0), ab))
    dev = [jax.device_put(x) for x in (ab.signals, ab.signal_lengths,
                                       ab.pinyin, ab.pinyin_lengths,
                                       ab.weights)]

    @jax.jit
    def multi(state, rng):
        def body(st, i):
            st, metrics = tr._train_step(st, *dev, jax.random.fold_in(rng, i),
                                         ab.bucket_frames)
            return st, metrics["loss"]
        return jax.lax.scan(body, state, jnp.arange(steps))

    st, losses = multi(tr.state, jax.random.PRNGKey(1))
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    st, losses = multi(st, jax.random.PRNGKey(2))
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / steps
    return {"ms_per_step": round(1000 * dt, 2), "batch": batch,
            "utts_per_sec": round(batch / dt, 2),
            "audio_sec_per_sec": round(UTT_SECONDS * batch / dt, 1)}


def bench_train_lm(m, batch=64, seq_len=64, steps=10):
    """LM training step (train_language_model cadence, train.py:100-165)."""
    import tempfile

    import jax
    import jax.numpy as jnp
    from asr_dfcnn_transformer_tpu.data.loader import LMBatch
    from asr_dfcnn_transformer_tpu.train import LMTrainer

    rng = np.random.default_rng(0)
    lb = LMBatch(
        pinyin=rng.integers(3, ACOUSTIC_VOCAB - 1,
                            (batch, seq_len)).astype(np.int32),
        hanzi=rng.integers(3, LANGUAGE_VOCAB - 1,
                           (batch, seq_len)).astype(np.int32),
        lengths=np.full((batch,), seq_len, np.int32),
        weights=np.ones((batch,), np.float32))
    tr = LMTrainer(m.lm, tempfile.mkdtemp(prefix="bench_lm_"))
    tr.restore_or_init(lambda: tr.init_state(jax.random.PRNGKey(0), lb))
    dev = [jax.device_put(x) for x in (lb.pinyin, lb.hanzi, lb.weights)]

    @jax.jit
    def multi(state, rng):
        def body(st, i):
            st, metrics = tr._train_step(st, *dev,
                                         jax.random.fold_in(rng, i))
            return st, metrics["loss"]
        return jax.lax.scan(body, state, jnp.arange(steps))

    st, losses = multi(tr.state, jax.random.PRNGKey(1))
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    st, losses = multi(st, jax.random.PRNGKey(2))
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / steps
    return {"ms_per_step": round(1000 * dt, 2), "batch": batch,
            "utts_per_sec": round(batch / dt, 2)}


def bench_train_e2e(m, batch=8, steps=5):
    """End-to-end speech-Transformer training step (reference cadence:
    batch 8, 80-dim features, end2end/model.py:15-54)."""
    import tempfile

    import jax
    import jax.numpy as jnp
    from asr_dfcnn_transformer_tpu import models
    from asr_dfcnn_transformer_tpu.data.loader import AMBatch
    from asr_dfcnn_transformer_tpu.train import E2ETrainer

    rng = np.random.default_rng(0)
    sig = (0.1 * rng.standard_normal((batch, N_SAMPLES))).astype(np.float32)
    lab = np.concatenate([rng.integers(3, 6000, (batch, 48)),
                          np.zeros((batch, 16))], 1).astype(np.int32)
    ab = AMBatch(signals=sig,
                 signal_lengths=np.full((batch,), N_SAMPLES, np.int32),
                 frame_lengths=np.full((batch,), FRAMES, np.int32),
                 pinyin=lab, pinyin_lengths=np.full((batch,), 48, np.int32),
                 hanzi=lab, hanzi_lengths=np.full((batch,), 48, np.int32),
                 weights=np.ones((batch,), np.float32),
                 bucket_frames=FRAMES)
    model = models.SpeechTransformer(vocab_size=6347)
    tr = E2ETrainer(model, tempfile.mkdtemp(prefix="bench_e2e_"),
                    feature_dim=80)
    tr.restore_or_init(lambda: tr.init_state(jax.random.PRNGKey(0), ab))
    dec_in, targets = tr.make_decoder_io(ab.hanzi, ab.hanzi_lengths)
    dev = [jax.device_put(x) for x in (ab.signals, ab.signal_lengths,
                                       dec_in, targets)]

    @jax.jit
    def multi(state, rng):
        def body(st, i):
            st, metrics = tr._train_step(st, *dev,
                                         jax.random.fold_in(rng, i),
                                         ab.bucket_frames)
            return st, metrics["loss"]
        return jax.lax.scan(body, state, jnp.arange(steps))

    st, losses = multi(tr.state, jax.random.PRNGKey(1))
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    st, losses = multi(st, jax.random.PRNGKey(2))
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / steps
    return {"ms_per_step": round(1000 * dt, 2), "batch": batch,
            "utts_per_sec": round(batch / dt, 2),
            "audio_sec_per_sec": round(UTT_SECONDS * batch / dt, 1)}


def main():
    import jax

    import os
    try:  # persistent XLA compile cache: the suite is 10 programs, and the
        # beam-search config alone can cost minutes of compile time. Keep
        # the cache next to the repo so a pre-warmed cache survives for
        # later runs of the same code.
        cache_dir = os.environ.get(
            "ASR_TPU_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    argv = sys.argv[1:]
    batch = int(argv[argv.index("--batch") + 1]) if "--batch" in argv else 128
    only = argv[argv.index("--only") + 1] if "--only" in argv else None

    m = _Models()
    suite = {}

    def want(name):
        return only is None or only == name

    def emit():
        """Print the (current) result line. Called once mid-suite and once
        at the end so that even a time-capped run leaves a complete JSON
        record as its last stdout line."""
        head = suite.get("am_lm_b128", next(iter(suite.values())))
        utts = head.get("utts_per_sec", 0.0)
        print(json.dumps({
            "metric": "am_lm_inference_utts_per_sec_per_chip",
            "value": utts,
            "unit": "utterances/sec/chip (worst-case 16s utts, batch %d)"
                    % batch,
            "vs_baseline": round(utts / 1000.0, 3),
            "extra": {"device": str(jax.devices()[0]),
                      "suite": suite},
        }), flush=True)

    if want("am_lm_b128"):
        suite["am_lm_b128"] = bench_am_lm(m, batch)
    if want("single_utt_greedy"):
        suite["single_utt_greedy"] = bench_single_utt(m)
    if want("am_batched_b32"):
        suite["am_batched_b32"] = bench_am_lm(m, 32)
    if want("lm_only"):
        suite["lm_only"] = bench_lm_only(m)
    if want("beam_noise_pipeline"):
        suite["beam_noise_pipeline"] = bench_am_lm(m, batch, decode="beam",
                                                   noise=True, iters=5)
    if only is None:
        emit()  # checkpoint: the five BASELINE configs are in
    if want("am_lm_fast_b128"):
        suite["am_lm_fast_b128"] = bench_am_lm(m, batch, am=m.fast,
                                               am_vars=m.fast_vars)
    if want("train_step_standard"):
        suite["train_step_standard"] = bench_train(m, fast=False)
    if want("train_step_fast"):
        suite["train_step_fast"] = bench_train(m, fast=True)
    if want("train_step_lm"):
        suite["train_step_lm"] = bench_train_lm(m)
    if want("train_step_e2e"):
        suite["train_step_e2e"] = bench_train_e2e(m)
    emit()


if __name__ == "__main__":
    main()
