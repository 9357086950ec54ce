"""Model zoo: DFCNN/SE-DFCNN/BiGRU acoustic models, Transformer LM,
CTC-attention hybrid, end-to-end speech Transformer."""

from asr_dfcnn_transformer_tpu.models.dfcnn import DFCNN, SEDFCNN, KerasDFCNN  # noqa: F401
from asr_dfcnn_transformer_tpu.models.bigru import BiGRUCTC  # noqa: F401
from asr_dfcnn_transformer_tpu.models.transformer_lm import TransformerLM  # noqa: F401
from asr_dfcnn_transformer_tpu.models.ctc_attention import CTCAttention  # noqa: F401
from asr_dfcnn_transformer_tpu.models.speech_transformer import (  # noqa: F401
    SpeechTransformer,
    e2e_loss,
    greedy_decode,
    greedy_decode_cached,
    beam_decode,
    beam_decode_cached,
)
from asr_dfcnn_transformer_tpu.models.am_lm_joint import AMLMJoint  # noqa: F401
from asr_dfcnn_transformer_tpu.models.dfcnn import logit_lengths  # noqa: F401
from asr_dfcnn_transformer_tpu.models.transformer_lm import lm_loss_and_acc  # noqa: F401
