import pytest

from asr_dfcnn_transformer_tpu.core import constants, vocab


def test_acoustic_vocab_size_and_blank_last():
    v = vocab.acoustic_vocab()
    assert v.size == 1536  # 1535 mixdict entries + trailing blank
    assert v.symbols[-1] == constants.BLANK_SYMBOL
    assert v.to_id(constants.BLANK_SYMBOL) == v.size - 1


def test_language_vocab_pad_first():
    v = vocab.language_vocab()
    assert v.size == 6345  # <pad> + 6344 hanzi
    assert v.symbols[0] == constants.PAD_FLAG
    assert v.to_id(constants.PAD_FLAG) == constants.PAD == 0


def test_e2e_vocab_specials():
    v = vocab.e2e_language_vocab()
    assert v.size == 6347
    assert v.symbols[:3] == (constants.PAD_FLAG, constants.SOS_FLAG,
                             constants.EOS_FLAG)


def test_pinyin_roundtrip():
    v = vocab.acoustic_vocab()
    ids = vocab.pinyin_to_ids(v, "a1 ba4 zuo4")
    assert len(ids) == 3
    assert v.decode(ids) == ["a1", "ba4", "zuo4"]


def test_oov_raises_valueerror():
    v = vocab.acoustic_vocab()
    with pytest.raises(ValueError):
        vocab.pinyin_to_ids(v, "notapinyin")


def test_hanzi_encode():
    v = vocab.language_vocab()
    text = "".join(v.symbols[5:8])
    assert vocab.hanzi_to_ids(v, text) == [5, 6, 7]
