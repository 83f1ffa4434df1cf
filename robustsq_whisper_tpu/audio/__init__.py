from .frontend import (
    CHUNK_LENGTH,
    HOP_LENGTH,
    N_FFT,
    N_MELS,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
    log_mel_spectrogram_jit,
    pad_or_trim,
)
from .fbank import kaldi_fbank
from .specaug import SpecAugConfig, apply_specaug
