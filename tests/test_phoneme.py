"""Phonemization: pinyin decomposition + hanzi G2P via the lexicon.

Covers the capability of the reference's phoneme_tool.py demo
(text -> phoneme tokens), implemented natively in utils/phoneme.py.
"""

import os

import pytest

from asr_dfcnn_transformer_tpu.core import constants
from asr_dfcnn_transformer_tpu.utils.phoneme import (
    HanziPhonemizer, phoneme_inventory, phonemize_pinyin, split_pinyin)

MIXDICT = os.path.join(constants.ASSET_DIR, "mixdict.txt")


@pytest.mark.parametrize("syl,expect", [
    ("zhong4", ("zh", "ong", 4)),
    ("a", ("", "a", 0)),
    ("a1", ("", "a", 1)),
    ("er2", ("", "er", 2)),
    ("xian4", ("x", "ian", 4)),
    ("shuang1", ("sh", "uang", 1)),
    ("nv3", ("n", "v", 3)),
    ("yi1", ("y", "i", 1)),
    ("ZHONG4", ("zh", "ong", 4)),  # case-insensitive
])
def test_split_pinyin(syl, expect):
    assert split_pinyin(syl) == expect


def test_split_pinyin_rejects_empty():
    with pytest.raises(ValueError):
        split_pinyin("")
    with pytest.raises(ValueError):
        split_pinyin("4")


def test_phonemize_pinyin_sequence():
    assert phonemize_pinyin(["zhong1", "guo2"]) == \
        ["zh", "ong", "1", "g", "uo", "2"]
    assert phonemize_pinyin(["zhong1", "guo2"], tones=False) == \
        ["zh", "ong", "g", "uo"]


def test_whole_mixdict_decomposes():
    """Every syllable in the acoustic vocabulary must decompose, and the
    induced phoneme alphabet must be much smaller than the syllable one."""
    with open(MIXDICT, encoding="utf-8") as f:
        syllables = [ln.strip() for ln in f if ln.strip()]
    inv = phoneme_inventory(syllables)
    assert len(syllables) > 1400
    assert 30 < len(inv) < 80  # ~23 initials + ~35 finals + 5 tones
    # round-trip: initial+final reassembles the toneless syllable
    for syl in syllables:
        ini, fin, tone = split_pinyin(syl)
        base = syl[:-1] if syl[-1].isdigit() else syl
        assert ini + fin == base, syl


def test_hanzi_phonemizer():
    g2p = HanziPhonemizer()
    # 阿 is the first candidate of a1 in dict.txt
    assert g2p.pinyin("阿") == ["a1"]
    assert g2p.pinyin("阿X") == ["a1", "?"]
    ph = g2p.phonemize("阿")
    assert ph == ["a", "1"]
    # unknown chars are dropped from the phoneme stream
    assert g2p.phonemize("X") == []
