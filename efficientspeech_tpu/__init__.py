"""EfficientSpeech-TPU: a TPU-native (JAX/XLA/Pallas/pjit) text-to-speech framework.

A from-scratch rebuild of the capabilities of EfficientSpeech (ICASSP 2023,
reference: roatienza/efficientspeech) designed TPU-first:

- static shapes everywhere (length-bucketed jit programs),
- a gather-based length regulator instead of dynamic ``repeat_interleave``
  (reference: layers/networks.py:222-258),
- one jitted program from phoneme IDs to waveform,
- ``jax.sharding.Mesh`` + NamedSharding data parallelism instead of
  Lightning/DDP/NCCL (reference: train.py:66-70),
- bf16 compute with f32 parameter masters,
- Pallas kernels for the hot conv fusions.
"""

__version__ = "0.1.0"

from efficientspeech_tpu.config import (  # noqa: F401
    AudioConfig,
    ModelConfig,
    PreprocessConfig,
    TrainConfig,
)
