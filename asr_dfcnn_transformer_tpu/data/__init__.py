"""Data layer: manifests, bucketing loaders, synthetic fixtures."""

from asr_dfcnn_transformer_tpu.data.manifest import Manifest, load_manifests, generate_hanzi_dict  # noqa: F401
from asr_dfcnn_transformer_tpu.data.loader import AMBatch, LMBatch, DataLoader  # noqa: F401
from asr_dfcnn_transformer_tpu.data.synthetic import make_synthetic_corpus  # noqa: F401
