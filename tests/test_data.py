import os

import numpy as np
import pytest

from asr_dfcnn_transformer_tpu.core import vocab
from asr_dfcnn_transformer_tpu.data import (
    DataLoader,
    load_manifests,
    make_synthetic_corpus,
)
from asr_dfcnn_transformer_tpu.data.loader import prefetch
from asr_dfcnn_transformer_tpu.data.manifest import generate_hanzi_dict


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    data_dir, wav_root, syls, hanzi = make_synthetic_corpus(
        str(root), num_utts=12, num_classes=4, seed=0)
    return data_dir, wav_root, syls, hanzi


def test_manifest_roundtrip(corpus):
    data_dir, wav_root, _, _ = corpus
    m = load_manifests(data_dir, "train", corpora=("thchs",))
    assert len(m) == 12
    assert all(p.endswith(".wav") for p in m.paths)
    assert all(" " in p for p in m.pinyin)  # multi-syllable
    m2 = load_manifests(data_dir, "train", corpora=("thchs",),
                        shuffle=True, seed=1, batch_size=5)
    assert len(m2) == 10  # truncated to multiple of 5


def test_manifest_missing_corpus_ok(corpus):
    data_dir, _, _, _ = corpus
    m = load_manifests(data_dir, "train", corpora=("aishell",))
    assert len(m) == 0


def test_generate_hanzi_dict(corpus, tmp_path):
    data_dir, _, _, hanzi = corpus
    m = load_manifests(data_dir, "train", corpora=("thchs",))
    out = tmp_path / "new_hanzi.txt"
    n = generate_hanzi_dict(m, str(out))
    assert n == len(set("".join(m.hanzi)))
    lines = out.read_text(encoding="utf-8").splitlines()
    assert len(lines) == n


def test_am_batches_shapes_and_weights(corpus):
    data_dir, wav_root, _, _ = corpus
    m = load_manifests(data_dir, "train", corpora=("thchs",))
    dl = DataLoader(m, vocab.acoustic_vocab(), vocab.language_vocab(),
                    speech_root=wav_root, bucket_bounds=(128, 256))
    batches = list(dl.am_batches(batch_size=4, shuffle=False))
    assert batches
    total_valid = 0
    for b in batches:
        assert b.signals.shape[0] == 4
        assert b.signals.dtype == np.float32
        assert b.pinyin.shape == (4, 64)
        assert (b.frame_lengths <= b.bucket_frames).all()
        assert set(np.unique(b.weights)) <= {0.0, 1.0}
        total_valid += int(b.weights.sum())
        # labels valid where weights=1
        for j in range(4):
            if b.weights[j] > 0:
                assert b.pinyin_lengths[j] > 0
                assert b.pinyin[j, : b.pinyin_lengths[j]].min() > 0
    assert total_valid == 12


def test_lm_batches(corpus):
    data_dir, wav_root, _, _ = corpus
    m = load_manifests(data_dir, "train", corpora=("thchs",))
    dl = DataLoader(m, vocab.acoustic_vocab(), vocab.language_vocab(),
                    speech_root=wav_root)
    batches = list(dl.lm_batches(batch_size=4, shuffle=False))
    assert batches
    for b in batches:
        assert b.pinyin.shape == b.hanzi.shape
        assert b.pinyin.shape[1] in (25, 50, 75, 100)
        for j in range(b.pinyin.shape[0]):
            n = int(b.lengths[j])
            assert (b.pinyin[j, :n] > 0).all()
            assert (b.pinyin[j, n:] == 0).all()


def test_loader_drops_bad_rows(corpus):
    data_dir, wav_root, _, _ = corpus
    m = load_manifests(data_dir, "train", corpora=("thchs",))
    m.pinyin[0] = "not_a_syllable xx"          # OOV -> drop
    m.paths[1] = "missing/file.wav"            # missing -> drop
    dl = DataLoader(m, vocab.acoustic_vocab(), vocab.language_vocab(),
                    speech_root=wav_root, bucket_bounds=(256,))
    batches = list(dl.am_batches(batch_size=4, shuffle=False))
    assert sum(int(b.weights.sum()) for b in batches) == 10


def test_single_utterance(corpus):
    data_dir, wav_root, _, _ = corpus
    m = load_manifests(data_dir, "train", corpora=("thchs",))
    dl = DataLoader(m, vocab.acoustic_vocab(), vocab.language_vocab(),
                    speech_root=wav_root)
    sig, pny, hanzi = dl.load_utterance(0)
    assert sig.ndim == 1 and len(pny) >= 2 and len(hanzi) >= 2


def test_prefetch_passthrough_and_errors():
    assert list(prefetch(iter(range(5)), depth=2)) == [0, 1, 2, 3, 4]

    def boom():
        yield 1
        raise RuntimeError("loader died")

    gen = prefetch(boom(), depth=2)
    assert next(gen) == 1
    with pytest.raises(RuntimeError):
        list(gen)
