from .config import WhisperDims, whisper_dims, sinusoids
from .modules import AudioEncoder, TextDecoder, MultiHeadAttention, ResidualAttentionBlock
from . import load

__all__ = [
    "WhisperDims",
    "whisper_dims",
    "sinusoids",
    "AudioEncoder",
    "TextDecoder",
    "MultiHeadAttention",
    "ResidualAttentionBlock",
    "load",
]
