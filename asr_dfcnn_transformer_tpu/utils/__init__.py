"""Utilities: introspection, metrics helpers."""

from asr_dfcnn_transformer_tpu.utils.introspect import attention_maps  # noqa: F401
