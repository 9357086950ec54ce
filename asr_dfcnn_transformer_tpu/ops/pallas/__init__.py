"""Pallas TPU kernels for the hot ops."""

from asr_dfcnn_transformer_tpu.ops.pallas.fbank_kernel import pallas_log_mel  # noqa: F401
