"""Benchmark: batched AM+LM inference throughput on one TPU chip.

Measures the BASELINE.json north-star path — device-side fbank ->
SE-DFCNN acoustic model -> CTC greedy decode -> Transformer LM ->
hanzi ids — as ONE jitted program, at full reference geometry
(1600x200 features, acoustic vocab 1536, hanzi vocab 6345, LM 12x512).

Prints one JSON line: utterances/sec/chip vs the 1000 utt/s/chip target
(BASELINE.json:5). Utterances here are worst-case 16 s (full 1600-frame
bucket, no length-bucketing advantage) — real corpora with ~5 s means and
bucketing run proportionally faster.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from asr_dfcnn_transformer_tpu import models
    from asr_dfcnn_transformer_tpu.audio import batched_fbank
    from asr_dfcnn_transformer_tpu.ops import ctc_greedy_decode

    batch = int(sys.argv[sys.argv.index("--batch") + 1]) \
        if "--batch" in sys.argv else 128
    frames = 1600
    n_samples = (frames - 1) * 160 + 400
    acoustic_vocab, language_vocab = 1536, 6345

    am = models.SEDFCNN(vocab_size=acoustic_vocab)
    lm = models.TransformerLM(acoustic_vocab, language_vocab)
    rng = jax.random.PRNGKey(0)
    am_vars = am.init(rng, jnp.zeros((1, frames, 200, 1), jnp.float32),
                      train=False)
    lm_vars = lm.init(rng, jnp.zeros((1, 64), jnp.int32), train=False)

    @jax.jit
    def forward(signals, signal_lengths):
        feats, _ = batched_fbank(signals, signal_lengths, out_frames=frames)
        logits = am.apply(am_vars, feats[..., None], train=False)
        from asr_dfcnn_transformer_tpu.models.dfcnn import (
            frames_from_samples, logit_lengths)
        in_len = logit_lengths(frames_from_samples(signal_lengths),
                               logits.shape[1])
        pny_ids, pny_len = ctc_greedy_decode(logits, in_len, blank_id=-1,
                                             max_output_len=64)
        lm_logits = lm.apply(lm_vars, pny_ids, train=False)
        return pny_ids, pny_len, jnp.argmax(lm_logits, axis=-1)

    rs = np.random.default_rng(0)
    signals = (0.1 * rs.standard_normal((batch, n_samples))).astype(np.float32)
    lengths = np.full((batch,), n_samples, np.int32)
    signals = jax.device_put(signals)
    lengths = jax.device_put(lengths)

    # warmup / compile
    out = forward(signals, lengths)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(signals, lengths)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    utts_per_sec = batch * iters / dt
    audio_seconds = 16.0 * batch * iters
    rtfx = audio_seconds / dt
    result = {
        "metric": "am_lm_inference_utts_per_sec_per_chip",
        "value": round(utts_per_sec, 2),
        "unit": "utterances/sec/chip (16s utts, batch %d)" % batch,
        "vs_baseline": round(utts_per_sec / 1000.0, 3),
        "extra": {"rtfx": round(rtfx, 1),
                  "batch": batch,
                  "device": str(jax.devices()[0]),
                  "ms_per_batch": round(1000 * dt / iters, 2)},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
