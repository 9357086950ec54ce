"""Inference & evaluation: batched AM->LM pipeline, streaming, weight import."""

from asr_dfcnn_transformer_tpu.infer.pipeline import Pipeline, EvalResult  # noqa: F401
from asr_dfcnn_transformer_tpu.infer.streaming import StreamingRecognizer  # noqa: F401
