"""XLA/Pallas op library: CTC loss & decoders, edit distance, attention."""

from asr_dfcnn_transformer_tpu.ops.ctc import ctc_loss  # noqa: F401
from asr_dfcnn_transformer_tpu.ops.ctc_decode import (  # noqa: F401
    ctc_greedy_decode,
    ctc_beam_search_decode,
    ctc_beam_search_stream_init,
    ctc_beam_search_stream_step,
    ctc_beam_search_stream_best,
)
from asr_dfcnn_transformer_tpu.ops.edit_distance import (  # noqa: F401
    edit_distance,
    batched_edit_distance,
)
