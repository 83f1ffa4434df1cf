from .long_audio import chunk_waveform, decode_long_audio
from .pipeline import DecodeResult, decode_dataset
from .scorer import cer, edit_distance, wer
from .search import (
    DecodeConfig,
    build_beam_decoder,
    build_greedy_decoder,
    strip_eot,
)
from .sharded import build_sharded_decoder
