"""TensorBoard event-file writer: format-level known answers, round-trips
through the real ``tensorboard`` reader, MetricWriter teeing, and the
e2e trainer's attention-image dumps (reference capability:
lm_and_am/train.py:51-53 scalars, end2end/transformer.py:105-106 images).
"""

import glob
import io
import json
import os

import jax
import numpy as np
import pytest

from asr_dfcnn_transformer_tpu.utils.tb_events import (
    TBEventWriter,
    _crc32c,
    _masked_crc,
    _varint,
    png_encode,
)


def test_crc32c_known_answers():
    # RFC 3720 / Castagnoli test vectors
    assert _crc32c(b"") == 0x00000000
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes(32)) == 0x8A9136AA
    assert _crc32c(bytes([0xFF] * 32)) == 0x62A8AB43


def test_masked_crc_matches_tfrecord_convention():
    # mask(crc) = rot15(crc) + 0xa282ead8 (tensorflow record_writer.cc)
    c = _crc32c(b"123456789")
    want = ((((c >> 15) | (c << 17)) & 0xFFFFFFFF) + 0xA282EAD8) & 0xFFFFFFFF
    assert _masked_crc(b"123456789") == want


def test_varint_edges():
    assert _varint(0) == b"\x00"
    assert _varint(127) == b"\x7f"
    assert _varint(128) == b"\x80\x01"
    assert _varint(300) == b"\xac\x02"


def test_png_roundtrip_gray_and_rgb():
    pil = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(0)
    gray = rng.integers(0, 255, (33, 47), dtype=np.uint8)
    arr = np.array(pil.open(io.BytesIO(png_encode(gray))))
    np.testing.assert_array_equal(arr, gray)
    rgb = rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)
    arr = np.array(pil.open(io.BytesIO(png_encode(rgb))))
    np.testing.assert_array_equal(arr, rgb)
    # float input is min-max normalized to uint8
    f = np.linspace(-1.0, 1.0, 64).reshape(8, 8)
    arr = np.array(pil.open(io.BytesIO(png_encode(f))))
    assert arr.min() == 0 and arr.max() == 255


def test_unused_writer_leaves_no_file(tmp_path):
    d = str(tmp_path / "tb")
    w = TBEventWriter(d)
    w.close()
    assert not os.path.exists(d)


def _load_events(path):
    """Read events back with the REAL tensorboard reader (raw protos —
    the default loader migrates legacy simple_value/image summaries to
    tensors, which would hide encoding bugs)."""
    tb_loader = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader")
    event_pb2 = pytest.importorskip("tensorboard.compat.proto.event_pb2")
    return [event_pb2.Event.FromString(r)
            for r in tb_loader.RawEventFileLoader(path).Load()]


def test_scalars_and_images_roundtrip_through_tensorboard(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.scalar("train/loss", 3.25, step=7)
    w.scalar("train/acc", 0.5, step=7)
    img = (np.arange(64 * 48).reshape(64, 48) % 251).astype(np.uint8)
    w.image("attn/enc0", img, step=9)
    w.close()

    evs = _load_events(w.path)
    assert evs[0].file_version == "brain.Event:2"
    scalars = {(e.step, v.tag): v.simple_value
               for e in evs[1:] for v in e.summary.value
               if v.HasField("simple_value")}
    assert scalars[(7, "train/loss")] == 3.25
    assert scalars[(7, "train/acc")] == 0.5
    images = {(e.step, v.tag): v.image
              for e in evs[1:] for v in e.summary.value
              if v.HasField("image")}
    im = images[(9, "attn/enc0")]
    assert (im.height, im.width, im.colorspace) == (64, 48, 1)
    try:
        from PIL import Image
        arr = np.array(Image.open(io.BytesIO(im.encoded_image_string)))
        np.testing.assert_array_equal(arr, img)
    except ImportError:
        pass


def test_metric_writer_tee(tmp_path):
    from asr_dfcnn_transformer_tpu.train.trainer import MetricWriter
    mw = MetricWriter(str(tmp_path), "am")
    mw.write(1, epoch=0, split="train", loss=2.5, wer=0.9)
    mw.enable_tensorboard()
    mw.write(2, epoch=0, split="dev", loss=1.5, wer=0.7, note="text")
    mw.write(3, loss=float("nan"), acc=0.25)

    # JSONL sink unchanged
    with open(mw.path) as f:
        recs = [json.loads(l) for l in f]
    assert [r["step"] for r in recs] == [1, 2, 3]

    evs = _load_events(mw.tb.path)
    scalars = {(e.step, v.tag): v.simple_value
               for e in evs[1:] for v in e.summary.value
               if v.HasField("simple_value")}
    # pre-enable record not teed; split goes into the tag; non-floats
    # and non-finite values skipped; epoch/step/time bookkeeping skipped
    want = {(2, "am/dev/loss"): 1.5, (2, "am/dev/wer"): 0.7,
            (3, "am/acc"): 0.25}
    assert scalars.keys() == want.keys()
    for k, v in want.items():
        assert scalars[k] == pytest.approx(v)  # simple_value is float32


def test_e2e_trainer_attention_images(tmp_path):
    import jax.numpy as jnp

    from asr_dfcnn_transformer_tpu.core import vocab
    from asr_dfcnn_transformer_tpu.data import (
        DataLoader,
        load_manifests,
        make_synthetic_corpus,
    )
    from asr_dfcnn_transformer_tpu.models import SpeechTransformer
    from asr_dfcnn_transformer_tpu.train import E2ETrainer

    data_dir, wav_root, _, _ = make_synthetic_corpus(
        str(tmp_path / "corpus"), num_utts=8, num_classes=4,
        syllables_per_utt=(2, 3), tone_ms=200, seed=1)
    m = load_manifests(data_dir, "train", corpora=("thchs",))
    loader = DataLoader(m, vocab.acoustic_vocab(),
                        vocab.e2e_language_vocab(),
                        speech_root=wav_root, bucket_bounds=(128,))
    ev = vocab.e2e_language_vocab()
    model = SpeechTransformer(vocab_size=ev.size, d_model=32, num_heads=4,
                              num_enc_blocks=1, num_dec_blocks=1,
                              prenet_channels=8, dropout_rate=0.0,
                              dtype=jnp.float32)
    from asr_dfcnn_transformer_tpu.parallel import make_mesh
    tr = E2ETrainer(model, str(tmp_path / "wd"), lr=1e-3, feature_dim=40,
                    mesh=make_mesh(4, 1, jax.devices()[:4]))
    tr.enable_tensorboard()
    batches = lambda: loader.am_batches(batch_size=4, shuffle=False)
    tr.restore_or_init(lambda: tr.init_state(jax.random.PRNGKey(0),
                                             next(batches())))
    tr.fit(batches, epochs=1, dev_batches=batches)

    evs = _load_events(tr.metrics.tb.path)
    tags = [v.tag for e in evs[1:] for v in e.summary.value]
    assert any(t.startswith("e2e/train/") for t in tags)
    assert any(t.startswith("e2e/dev/") for t in tags)
    img_tags = [v.tag for e in evs[1:] for v in e.summary.value
                if v.HasField("image")]
    assert img_tags and all(t.startswith("e2e/attention/")
                            for t in img_tags)


def test_cli_tensorboard_flag(tmp_path):
    from asr_dfcnn_transformer_tpu.train import cli
    wd = str(tmp_path / "wd")
    cli.main(["lm", "--workdir", wd, "--synthetic", "16", "--small",
              "--epochs", "1", "--batch-size", "8", "--lr", "1e-3",
              "--tensorboard"])
    files = glob.glob(os.path.join(wd, "tb", "lm", "events.out.tfevents.*"))
    assert len(files) == 1
    evs = _load_events(files[0])
    assert any(v.tag.startswith("lm/") for e in evs[1:]
               for v in e.summary.value)
