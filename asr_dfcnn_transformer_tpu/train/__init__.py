"""Training: schedules, train states/steps, loops, checkpointing."""

from asr_dfcnn_transformer_tpu.train.schedule import polynomial_decay_with_cycle  # noqa: F401
from asr_dfcnn_transformer_tpu.train.trainer import (  # noqa: F401
    AMTrainer,
    AttenTrainer,
    JointTrainer,
    LMTrainer,
    E2ETrainer,
)
