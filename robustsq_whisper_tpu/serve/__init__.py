"""Online serving: micro-batching transcription engine + HTTP daemon.

The reference serves nothing online — its decode is the offline stage-12
batch job (/root/reference/run_tswhisper.sh:67-90). This package is the
TPU-native production-serving half the brief asks for: one compiled
decode program (static shapes, quantized KV, Pallas kernels) shared by
all requests, a micro-batcher that coalesces concurrent requests into
full device batches, and a dependency-free HTTP front end.
"""

from .engine import EngineConfig, TranscriptionEngine
from .server import MicroBatcher, make_server

__all__ = [
    "EngineConfig",
    "TranscriptionEngine",
    "MicroBatcher",
    "make_server",
]
