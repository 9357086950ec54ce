"""Incremental streaming decode: exactness and invariance.

The hard claims of infer/streaming.py:IncrementalRecognizer, tested on a
conv-only CTC model (the exactness class — SE models' global squeeze is
inherently non-causal):

1. with the utterance's own CMVN stats, the streamed final tokens equal
   the offline ``Pipeline.recognize_signal`` decode exactly;
2. with running CMVN, results are exactly invariant to how the audio was
   chunked (stats freeze per fixed frame group, not per push);
3. partials are monotone prefixes refined into the final hypothesis.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from asr_dfcnn_transformer_tpu.audio.fbank import FbankConfig, logfbank
from asr_dfcnn_transformer_tpu.infer import Pipeline
from asr_dfcnn_transformer_tpu.infer.streaming import IncrementalRecognizer
from asr_dfcnn_transformer_tpu.models import TransformerLM


class TinyConvCTC(nn.Module):
    """3x(conv3x3 + maxpool2) + Dense head: same 8x time pooling and SAME
    padding as the DFCNN family, receptive field ~14 frames << the 64-frame
    halo; conv-only, so chunked streaming must be exact."""

    vocab_size: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for feats in (4, 4, 8):
            x = nn.relu(nn.Conv(feats, (3, 3), dtype=jnp.float32)(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        return nn.Dense(self.vocab_size, dtype=jnp.float32)(x)


def _make_pipeline(with_lm=False, nfilt=40, vocab=32, seed=0,
                   decode="greedy"):
    am = TinyConvCTC(vocab_size=vocab)
    am_vars = am.init(jax.random.PRNGKey(seed),
                      np.zeros((1, 64, nfilt, 1), np.float32), train=False)
    lm = lm_vars = None
    if with_lm:
        lm = TransformerLM(input_vocab_size=vocab, output_vocab_size=48,
                           d_model=16, num_heads=4, num_blocks=1,
                           position_max_length=24, dropout_rate=0.0,
                           dtype=jnp.float32)
        lm_vars = lm.init(jax.random.PRNGKey(seed + 1),
                          np.zeros((1, 8), np.int32), train=False)
    from asr_dfcnn_transformer_tpu.core import vocab as vocab_mod
    return Pipeline(am, am_vars, lm, lm_vars,
                    acoustic_vocab=vocab_mod.acoustic_vocab(),
                    language_vocab=vocab_mod.language_vocab()
                    if with_lm else None,
                    feature_dim=nfilt, decode=decode)


def _signal(seconds=2.7, seed=3):
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    t = np.arange(n) / 16000.0
    sig = 0.4 * np.sin(2 * np.pi * 350 * t) \
        + 0.3 * np.sin(2 * np.pi * 1200 * t ** 1.1) \
        + 0.2 * rng.standard_normal(n)
    return sig.astype(np.float32)


def _exact_global_stats(signal, nfilt):
    """(mean', std) such that single-centering matches the offline cmvn's
    double-centering bit for bit: mean' = mean + std * mean2."""
    cfg = FbankConfig(nfilt=nfilt, backend="xla")
    raw = np.asarray(logfbank(jnp.asarray(signal), cfg), np.float64)
    mean = raw.mean(axis=0)
    std = raw.std(axis=0)
    std = np.where(std == 0.0, 1.0, std)
    mean2 = ((raw - mean) / std).mean(axis=0)
    return (mean + std * mean2).astype(np.float32), std.astype(np.float32)


def test_incremental_equals_offline_with_global_stats():
    pipe = _make_pipeline()
    sig = _signal()
    stats = _exact_global_stats(sig, 40)
    rec = IncrementalRecognizer(pipe, chunk_logits=8, halo_frames=64,
                                frame_group=64, cmvn="global",
                                global_stats=stats)
    # odd-sized pushes straddling every internal boundary
    i = 0
    rng = np.random.default_rng(11)
    while i < len(sig):
        step = int(rng.integers(137, 5003))
        rec.push(sig[i: i + step])
        i += step
    pinyin, _ = rec.finalize()
    off_pinyin, _ = pipe.recognize_signal(sig)
    assert pinyin == off_pinyin, (pinyin, off_pinyin)
    assert len(pinyin) > 0          # decode produced something non-trivial


def test_incremental_beam_equals_offline_with_global_stats():
    """decode='beam' carries prefix-beam state across chunks
    (ops.ctc_beam_search_stream_step); the final hypothesis must equal the
    offline beam pipeline exactly."""
    pipe = _make_pipeline(decode="beam")
    sig = _signal(seconds=2.3, seed=13)
    stats = _exact_global_stats(sig, 40)
    rec = IncrementalRecognizer(pipe, chunk_logits=8, halo_frames=64,
                                frame_group=64, cmvn="global",
                                global_stats=stats)
    assert rec.decode == "beam"      # inherited from the pipeline
    i = 0
    rng = np.random.default_rng(23)
    while i < len(sig):
        step = int(rng.integers(211, 4801))
        rec.push(sig[i: i + step])
        i += step
    pinyin, _ = rec.finalize()
    off_pinyin, _ = pipe.recognize_signal(sig)
    assert pinyin == off_pinyin, (pinyin, off_pinyin)
    assert len(pinyin) > 0


def test_incremental_chunk_size_invariance_running_cmvn():
    sig = _signal(seconds=2.1, seed=5)
    outs = []
    for sizes in (1600, 7777, len(sig)):
        pipe = _make_pipeline()
        rec = IncrementalRecognizer(pipe, chunk_logits=8, halo_frames=64,
                                    frame_group=64, cmvn="running")
        i = 0
        while i < len(sig):
            rec.push(sig[i: i + sizes])
            i += sizes
        rec.finalize()
        outs.append(rec.pinyin_ids)
    assert outs[0] == outs[1] == outs[2], outs


def test_incremental_partials_and_lm():
    sig = _signal(seconds=1.9, seed=7)
    pipe = _make_pipeline(with_lm=True)
    rec = IncrementalRecognizer(pipe, chunk_logits=8, halo_frames=64,
                                frame_group=64, cmvn="running")
    partial_lens = []
    for i in range(0, len(sig), 6400):
        rec.push(sig[i: i + 6400])
        pinyin, hanzi = rec.partial()
        partial_lens.append(len(rec.pinyin_ids))
        assert isinstance(hanzi, str)
        # the LM maps position-wise: one vocab entry per decoded syllable
        # (entries can be multi-char strings like <pad> for random models)
        assert (hanzi == "") == (len(pinyin) == 0)
    pinyin, hanzi = rec.finalize()
    # decoded prefix only ever grows, and the final includes the tail
    assert partial_lens == sorted(partial_lens)
    assert len(rec.pinyin_ids) >= partial_lens[-1]
    assert len(pinyin) > 0 and hanzi != ""


def test_incremental_rejects_bad_config():
    pipe = _make_pipeline()
    import pytest
    with pytest.raises(ValueError, match="halo"):
        IncrementalRecognizer(pipe, halo_frames=30)
    with pytest.raises(ValueError, match="chunk_logits"):
        IncrementalRecognizer(pipe, chunk_logits=0)
    with pytest.raises(ValueError, match="cmvn"):
        IncrementalRecognizer(pipe, cmvn="nope")
    with pytest.raises(ValueError, match="global_stats"):
        IncrementalRecognizer(pipe, cmvn="global")


def test_incremental_exact_bucket_boundary_parity():
    """Frame count exactly on the 128-frame bucket grid (ADVICE r3 #1):
    offline caps in_len at bucket_frames//8, one BELOW frames//8+1 there;
    the streamed finalize must drop that extra all-padding logit too."""
    pipe = _make_pipeline()
    n = 400 + 255 * 160                     # -> exactly 256 frames
    sig = _signal(seconds=n / 16000.0, seed=17)
    assert len(sig) == n
    stats = _exact_global_stats(sig, 40)
    rec = IncrementalRecognizer(pipe, chunk_logits=8, halo_frames=64,
                                frame_group=64, cmvn="global",
                                global_stats=stats)
    for i in range(0, len(sig), 3001):
        rec.push(sig[i: i + 3001])
    pinyin, _ = rec.finalize()
    assert rec._logits_done == 256 // 8     # not frames//8 + 1 == 33
    off_pinyin, _ = pipe.recognize_signal(sig)
    assert pinyin == off_pinyin, (pinyin, off_pinyin)


def test_incremental_near_bucket_boundary_parity():
    """Frame count a few rows UNDER the bucket edge: the last logits'
    receptive fields reach the offline program's conv SAME boundary at
    ``bucket_frames``. A zero-halo window is NOT equivalent there (the
    first conv row past real data leaks f(last_real, 0, 0) != 0 back
    through deeper layers), so the finalize tail window must end exactly
    at the bucket edge. Both decode backends, multiple phases."""
    for seed, decode in ((21, "greedy"), (29, "greedy"), (31, "beam")):
        pipe = _make_pipeline(decode=decode)
        n = 400 + 249 * 160                 # exactly 250 frames, bucket 256
        sig = _signal(seconds=n / 16000.0, seed=seed)
        stats = _exact_global_stats(sig, 40)
        rec = IncrementalRecognizer(pipe, chunk_logits=8, halo_frames=64,
                                    frame_group=64, cmvn="global",
                                    global_stats=stats)
        for i in range(0, len(sig), 2777):
            rec.push(sig[i: i + 2777])
        pinyin, _ = rec.finalize()
        off_pinyin, _ = pipe.recognize_signal(sig)
        assert pinyin == off_pinyin, (seed, decode, pinyin, off_pinyin)


def test_incremental_random_geometry_sweep():
    """Breadth insurance for the exactness claim: random utterance
    lengths (every residue class mod 8 / mod 128 is fair game), random
    push sizes and random chunk/group geometry must ALL reproduce the
    offline decode exactly. Catches window-planning off-by-ones the
    hand-picked boundary tests above can miss."""
    rng = np.random.default_rng(123)
    pipes = {"greedy": _make_pipeline(),
             "beam": _make_pipeline(decode="beam")}
    for trial in range(8):
        frames = int(rng.integers(40, 300))
        n = 400 + (frames - 1) * 160        # exactly `frames` fbank rows
        sig = _signal(seconds=(n + 1) / 16000.0, seed=100 + trial)[:n]
        assert len(sig) == n
        decode = "beam" if trial % 4 == 3 else "greedy"
        pipe = pipes[decode]
        stats = _exact_global_stats(sig, 40)
        rec = IncrementalRecognizer(
            pipe, chunk_logits=int(rng.choice([4, 8, 16])),
            halo_frames=64, frame_group=int(rng.choice([32, 64, 128])),
            cmvn="global", global_stats=stats)
        i = 0
        while i < len(sig):
            step = int(rng.integers(97, 6007))
            rec.push(sig[i: i + step])
            i += step
        pinyin, _ = rec.finalize()
        off_pinyin, _ = pipe.recognize_signal(sig)
        assert pinyin == off_pinyin, (
            trial, frames, decode, pinyin, off_pinyin)


def test_incremental_max_logits_enforced_mid_stream():
    """max_logits bounds decode during push(), not only at finalize
    (ADVICE r3 #2) — long streams stop decoding at the cap."""
    pipe = _make_pipeline()
    rec = IncrementalRecognizer(pipe, chunk_logits=8, halo_frames=64,
                                frame_group=64, cmvn="running",
                                max_logits=16)
    sig = _signal(seconds=4.0, seed=19)     # ~400 frames >> 8 * 16
    for i in range(0, len(sig), 4000):
        rec.push(sig[i: i + 4000])
        assert rec._logits_done <= 16
    rec.finalize()
    assert rec._logits_done <= 16
    assert len(rec.pinyin_ids) <= 16
