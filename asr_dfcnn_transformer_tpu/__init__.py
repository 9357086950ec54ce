"""TPU-native Chinese ASR framework (JAX / XLA / Pallas / pjit).

A from-scratch rebuild of the capabilities of the TensorFlow-1.x reference
``786440445/ASR_DFCNN_Transformer``:

- log-filterbank / spectrogram audio front-end with low-frame-rate stacking
  and device-side colored-noise augmentation (``audio/``),
- DFCNN / SE-DFCNN / BiGRU + CTC acoustic models emitting pinyin
  (``models/dfcnn.py``, ``models/bigru.py``),
- Transformer-encoder language model converting pinyin to hanzi
  (``models/transformer_lm.py``),
- end-to-end speech Transformer (conv + time/frequency-attention pre-net,
  encoder-decoder) mapping fbank directly to hanzi
  (``models/speech_transformer.py``),
- CTC loss / greedy / beam decoding as XLA-friendly ``lax.scan`` programs and
  Pallas kernels for the hot ops (``ops/``),
- manifest-driven multi-corpus data loading with length bucketing (``data/``),
- pjit/shard_map training loops with polynomial-decay Adam, metric-gated
  orbax checkpointing and resume (``train/``),
- a batched AM->LM inference/eval pipeline with edit-distance CER scoring
  (``infer/``).

The design is TPU-first: static shapes, ``lax.scan``/``lax.cond`` control
flow, bfloat16 matmuls on the MXU, sharding via ``jax.sharding.Mesh`` +
``pjit`` with XLA collectives over ICI. None of the reference's code is
copied; reference files are cited in docstrings (``file:line`` into the
reference tree) for behavioral parity only.
"""

__version__ = "0.1.0"

from asr_dfcnn_transformer_tpu.core import config, constants, vocab  # noqa: F401
