"""Inference & evaluation: batched AM->LM pipeline, streaming, weight import."""

from asr_dfcnn_transformer_tpu.infer.export_serving import (  # noqa: F401
    E2EServing,
    ServingPipeline,
    export_e2e,
    export_pipeline,
    load_artifact,
)
from asr_dfcnn_transformer_tpu.infer.http_server import (  # noqa: F401
    HTTPRecognitionServer,
)
from asr_dfcnn_transformer_tpu.infer.pipeline import Pipeline, EvalResult  # noqa: F401
from asr_dfcnn_transformer_tpu.infer.serving import BatchingServer, ServerStats  # noqa: F401
from asr_dfcnn_transformer_tpu.infer.stream_pool import StreamPool  # noqa: F401
from asr_dfcnn_transformer_tpu.infer.streaming import (  # noqa: F401
    IncrementalRecognizer,
    StreamingRecognizer,
)
from asr_dfcnn_transformer_tpu.infer.tf_ckpt import (  # noqa: F401
    export_tf1_sedfcnn,
    list_tf_checkpoint,
    load_tf1_sedfcnn,
    read_tf_checkpoint,
    write_tf_checkpoint,
)
