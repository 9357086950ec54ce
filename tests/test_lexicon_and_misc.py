import numpy as np

from asr_dfcnn_transformer_tpu.core.lexicon import Lexicon
from asr_dfcnn_transformer_tpu.core import vocab


def test_lexicon_loads_and_looks_up():
    lx = Lexicon()
    # 1423 lines with one duplicated syllable -> 1422 unique keys
    assert len(lx.table) == 1422
    cands = lx.candidates("a1")
    assert cands and all(len(c) == 1 for c in cands)
    assert lx.candidates("not_a_syllable") == []


def test_lexicon_covers_acoustic_vocab_toned_syllables():
    lx = Lexicon()
    av = vocab.acoustic_vocab()
    # most toned syllables in mixdict have lexicon entries
    toned = [s for s in av.symbols[:-1] if s[-1].isdigit()]
    covered = sum(1 for s in toned if lx.candidates(s))
    assert covered / len(toned) > 0.9


def test_first_candidate_transcription():
    lx = Lexicon()
    out = lx.first_candidate_transcription(["a1", "a2", "zzz"])
    assert len(out) == 3
    assert out[2] == "?"


def test_eval_protocol_clips_long_predictions(tmp_path):
    """A prediction far longer than the reference must cost at most the
    reference length (test.py:77-81 semantics) -> accuracy floor 0."""
    import jax.numpy as jnp
    from flax import linen as nn

    from asr_dfcnn_transformer_tpu.data.loader import AMBatch
    from asr_dfcnn_transformer_tpu.infer import Pipeline

    class JunkAM(nn.Module):
        """Emits a rotating non-blank argmax every frame -> max-length
        garbage decode."""
        vocab_size: int = 40

        @nn.compact
        def __call__(self, x, train=False):
            b, t = x.shape[0], x.shape[1]
            # bias parameter so init works; deterministic junk logits
            _ = self.param("dummy", nn.initializers.zeros, (1,))
            frame = jnp.arange(t) % (self.vocab_size - 1)
            logits = jnp.full((b, t, self.vocab_size), -5.0)
            return logits.at[:, jnp.arange(t), frame].set(5.0)

    import jax
    av = vocab.acoustic_vocab()
    am = JunkAM(vocab_size=40)
    sig = np.zeros((2, 20960), np.float32)
    feats_shape = (1, 128, 200, 1)
    am_vars = am.init(jax.random.PRNGKey(0), jnp.zeros(feats_shape))
    pipe = Pipeline(am, am_vars, acoustic_vocab=av)
    batch = AMBatch(
        signals=sig, signal_lengths=np.full((2,), 20960, np.int32),
        frame_lengths=np.full((2,), 128, np.int32),
        pinyin=np.pad(np.array([[5, 6], [7, 8]], np.int32),
                      ((0, 0), (0, 62))),
        pinyin_lengths=np.array([2, 2], np.int32),
        hanzi=np.zeros((2, 64), np.int32),
        hanzi_lengths=np.array([2, 2], np.int32),
        weights=np.ones((2,), np.float32), bucket_frames=128)
    res = pipe.evaluate([batch])
    # junk decode is way longer than the 2-symbol references; clipped cost
    # means accuracy exactly 0, never negative
    assert res.pinyin_accuracy == 0.0
