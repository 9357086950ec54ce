"""Utilities: introspection, phonemization, plotting, metrics helpers."""

from asr_dfcnn_transformer_tpu.utils.introspect import attention_maps  # noqa: F401
from asr_dfcnn_transformer_tpu.utils.plotting import (  # noqa: F401
    plot_freq, plot_spectrogram, plot_time, save_figure, wav_show)
from asr_dfcnn_transformer_tpu.utils.phoneme import (  # noqa: F401
    HanziPhonemizer, phoneme_inventory, phonemize_pinyin, split_pinyin)
