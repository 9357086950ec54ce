"""Special token ids and framework-wide constants.

Mirrors the semantics of the reference's ``util/const.py:32-78`` (special ids
``IGNORE_ID=-1, PAD=0, SOS=1, EOS=2`` and their string flags) without the
reference's per-machine ``ServerId`` path switching — paths live in the config
tree (:mod:`asr_dfcnn_transformer_tpu.core.config`) instead.
"""

from __future__ import annotations

import os

# Label-side special ids (reference util/const.py:35-41).
IGNORE_ID = -1
PAD = 0
SOS = 1
EOS = 2

PAD_FLAG = "<pad>"
SOS_FLAG = "<sos>"
EOS_FLAG = "</sos>"  # the reference uses "</sos>" as its EOS string flag

# The CTC blank for the acoustic model is the LAST index of the acoustic
# vocabulary (the '_' symbol appended after mixdict.txt entries,
# reference lm_and_am/data_loader.py:88 and blank_index=vocab-1 at
# lm_and_am/model/acoustic_model.py:75-76).
BLANK_SYMBOL = "_"

# Acoustic-model geometry invariants (reference util/hparams.py:15-19 and the
# three 2x2 poolings comment at lm_and_am/model/acoustic_model.py:72-73).
FEATURE_MAX_LENGTH = 1600  # max input frames (~16 s at 10 ms hop)
FEATURE_DIM = 200          # log-filterbank bins
TIME_REDUCTION = 8         # three 2x2 poolings => 1600 -> 200 frames
MAX_LABEL_LENGTH = 64      # pinyin/hanzi label cap (data_loader.py:109,141)

# Asset locations bundled with the package.
ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")
PINYIN_DICT_PATH = os.path.join(ASSET_DIR, "mixdict.txt")
HANZI_DICT_PATH = os.path.join(ASSET_DIR, "hanzi.txt")
