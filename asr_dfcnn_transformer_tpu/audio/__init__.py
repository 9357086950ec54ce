"""Audio front-end: log-filterbank features, LFR stacking, noise augmentation."""

from asr_dfcnn_transformer_tpu.audio.fbank import (  # noqa: F401
    FbankConfig,
    num_frames,
    mel_filterbank,
    logfbank,
    cmvn,
    compute_fbank_from_signal,
    batched_fbank,
    log_spectrogram,
)
from asr_dfcnn_transformer_tpu.audio.lfr import build_lfr_features, lfr_length  # noqa: F401
from asr_dfcnn_transformer_tpu.audio.noise import color_noise, snr_to_gain, add_noise_batch  # noqa: F401
from asr_dfcnn_transformer_tpu.audio.specaugment import (  # noqa: F401
    SpecAugmentConfig,
    spec_augment,
)
