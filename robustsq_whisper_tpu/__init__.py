"""RobustSQ-Whisper-TPU: a TPU-native target-speaker ASR framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
colaudiolab/RobustSQ-Whisper (target-speaker ASR with overlapped/noisy
enrollment): Whisper encoder/decoder with a Qformer speaker-query adapter,
Attentive Statistics Pooling, Arc-InfoNCE + AAM-Softmax heads, hybrid
CTC/attention training, on-device data augmentation (SIR overlap mixing,
WHAM! SNR noise injection), and a KV-cached batched beam decoder.

Everything is built TPU-first: static shapes, bf16 matmuls on the MXU,
`pjit` over `jax.sharding.Mesh` for scaling, and Pallas kernels for the
hot attention paths.
"""

__version__ = "0.1.0"
