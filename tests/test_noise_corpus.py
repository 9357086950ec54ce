import os

import numpy as np

from asr_dfcnn_transformer_tpu.audio.noise_corpus import (
    add_noise_to_file,
    generate_noise_corpus,
    main,
)
from asr_dfcnn_transformer_tpu.core import vocab
from asr_dfcnn_transformer_tpu.data import (
    DataLoader,
    load_manifests,
    make_synthetic_corpus,
)


def test_generate_noise_corpus_and_loader_fallback(tmp_path):
    data_dir, wav_root, _, _ = make_synthetic_corpus(
        str(tmp_path), num_utts=6, num_classes=3, seed=3)
    m = load_manifests(data_dir, "train", corpora=("thchs",))
    out_root = str(tmp_path / "noisy")
    n = generate_noise_corpus(m, wav_root, out_root, data_dir, rate=1.0,
                              seed=0)
    assert n == 6
    manifest_path = os.path.join(data_dir, "noise_data.txt")
    assert os.path.isfile(manifest_path)
    rows = open(manifest_path, encoding="utf-8").read().strip().split("\n")
    assert len(rows) == 6 and all("\t" in r for r in rows)

    # the noise manifest loads through the loaders' noise_root fallback
    nm = load_manifests(data_dir, "train", corpora=(), use_noise=True)
    assert len(nm) == 6
    dl = DataLoader(nm, vocab.acoustic_vocab(), vocab.language_vocab(),
                    speech_root="/nonexistent", noise_root=out_root,
                    bucket_bounds=(256,))
    batches = list(dl.am_batches(batch_size=3, shuffle=False))
    assert sum(int(b.weights.sum()) for b in batches) == 6


def test_noise_changes_signal_but_preserves_snr(tmp_path):
    data_dir, wav_root, _, _ = make_synthetic_corpus(
        str(tmp_path), num_utts=1, num_classes=2, seed=4)
    m = load_manifests(data_dir, "train", corpora=("thchs",))
    src = os.path.join(wav_root, m.paths[0])
    rng = np.random.default_rng(0)
    noisy, sr, snr, alpha = add_noise_to_file(src, rng, snr_db=8)
    from asr_dfcnn_transformer_tpu.audio.wav import read_wav
    clean, _ = read_wav(src)
    assert sr == 16000 and snr == 8 and -1.0 <= alpha <= 1.0
    diff = noisy - clean[: len(noisy)]
    measured = 10 * np.log10(np.mean(clean ** 2) / np.mean(diff ** 2))
    assert 6.0 < measured < 10.0  # 8 dB nominal


def test_noise_corpus_cli(tmp_path, capsys):
    data_dir, wav_root, _, _ = make_synthetic_corpus(
        str(tmp_path), num_utts=4, num_classes=2, seed=5)
    main(["--data-dir", data_dir, "--speech-root", wav_root,
          "--out-root", str(tmp_path / "out"), "--rate", "1.0"])
    out = capsys.readouterr().out
    assert "wrote 4 noisy utterances" in out
