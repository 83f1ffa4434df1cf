from .qformer import QFormerAdapter, QformerConfig
from .ts_decoder import STARTOFPREV, TSDecoder
from .ts_encoder import (
    ConditionalLayerNorm,
    FiLM,
    QFormerTSEncoder,
    SpkAdapter,
    SpkAdapterTSEncoder,
    TSEncoderConfig,
)
from .ts_model import TSASRModel, TSModelConfig
from .whisper import AudioEncoder, TextDecoder, WhisperDims, whisper_dims

__all__ = [
    "AudioEncoder",
    "ConditionalLayerNorm",
    "FiLM",
    "QFormerAdapter",
    "QformerConfig",
    "QFormerTSEncoder",
    "SpkAdapter",
    "SpkAdapterTSEncoder",
    "STARTOFPREV",
    "TextDecoder",
    "TSASRModel",
    "TSDecoder",
    "TSEncoderConfig",
    "TSModelConfig",
    "WhisperDims",
    "whisper_dims",
]
