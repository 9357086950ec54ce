"""Native C++ wav decode library vs the Python reader."""

import os
import subprocess
import time

import numpy as np
import pytest

from asr_dfcnn_transformer_tpu.audio.wav import read_wav, synth_wav, write_wav
from asr_dfcnn_transformer_tpu.data import native_loader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native_loader.available():
        ok = native_loader.build_native(REPO)
        if not ok:
            pytest.skip("native library could not be built")


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    paths = []
    rng = np.random.default_rng(0)
    for i in range(8):
        p = str(d / f"f{i}.wav")
        sig = (0.3 * rng.standard_normal(8000 + 500 * i)).astype(np.float32)
        write_wav(p, sig, 16000)
        paths.append(p)
    return paths


def test_probe_matches_python(wavs):
    import wave
    for p in wavs:
        n, sr = native_loader.probe(p)
        with wave.open(p, "rb") as w:
            assert n == w.getnframes()
            assert sr == w.getframerate()


def test_decode_batch_matches_python(wavs):
    out, lengths = native_loader.decode_batch(wavs, max_samples=16000)
    assert out.shape == (8, 16000)
    for i, p in enumerate(wavs):
        ref, _ = read_wav(p)
        n = int(lengths[i])
        assert n == len(ref)
        np.testing.assert_allclose(out[i, :n], ref, atol=1e-6)
        assert np.all(out[i, n:] == 0)


def test_decode_batch_bad_file(tmp_path, wavs):
    bad = str(tmp_path / "not_a_wav.wav")
    with open(bad, "wb") as f:
        f.write(b"garbage data that is not RIFF")
    out, lengths = native_loader.decode_batch([wavs[0], bad, wavs[1]],
                                              max_samples=16000)
    assert lengths[0] > 0 and lengths[2] > 0
    assert lengths[1] == -1
    assert np.all(out[1] == 0)


def test_decode_truncates_to_max(wavs):
    out, lengths = native_loader.decode_batch(wavs[:2], max_samples=1000)
    assert out.shape == (2, 1000)
    assert list(lengths) == [1000, 1000]


def _wav_bytes_with_bits(bits: int, channels: int = 1) -> bytes:
    """Hand-craft a minimal RIFF/WAVE header with an arbitrary bit depth."""
    import struct
    data = b"\x00" * 64
    fmt = struct.pack("<HHIIHH", 1, channels, 16000,
                      16000 * channels * max(bits // 8, 1),
                      channels * max(bits // 8, 1), bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_malformed_bit_depth_rejected_not_crash(tmp_path, wavs):
    """bits<8 used to integer-divide by zero (SIGFPE) in the C++ decoder."""
    bad4 = str(tmp_path / "fourbit.wav")
    with open(bad4, "wb") as f:
        f.write(_wav_bytes_with_bits(4))
    bad24 = str(tmp_path / "b24.wav")  # unsupported width: reject, not crash
    with open(bad24, "wb") as f:
        f.write(_wav_bytes_with_bits(24))
    out, lengths = native_loader.decode_batch([wavs[0], bad4, bad24],
                                              max_samples=16000)
    assert lengths[0] > 0
    assert lengths[1] == -1 and lengths[2] == -1
    with pytest.raises(IOError):
        native_loader.probe(bad4)
