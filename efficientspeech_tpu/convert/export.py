"""Model export: serialized StableHLO via jax.export.

The TPU-native analogue of the reference's ONNX/TorchScript export
(reference: convert.py:17-48).  Like the reference's ONNX path, the exported
artifact has a FIXED phoneme input size (reference: convert.py:40-41,
demo.py:45-47) — which here is simply the native length-bucket semantics,
not a degraded mode.  The artifact is a single serialized XLA program
(phoneme IDs → waveform) runnable on any JAX backend via
``load_exported``.
"""

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from efficientspeech_tpu.config import HifiGanConfig, ModelConfig
from efficientspeech_tpu.models.efficientspeech import EfficientSpeech


def export_text_to_wav(cfg: ModelConfig, hifigan_cfg: HifiGanConfig, params,
                       insize: int = 128, mel_expansion: int = 16,
                       dtype=jnp.bfloat16,
                       platforms: Optional[Tuple[str, ...]] = None) -> bytes:
    """Serialize the full phoneme→wav program at a fixed input size.

    insize mirrors the reference's --onnx-insize (default 128,
    reference: utils/tools.py:441-444).
    """
    cfg = dataclasses.replace(cfg, max_phoneme_len=insize,
                              max_mel_len=insize * mel_expansion)
    model = EfficientSpeech(cfg=cfg, hifigan_cfg=hifigan_cfg, dtype=dtype)

    def predict(phoneme, pad_mask):
        return model.apply({"params": params}, phoneme, pad_mask,
                           method=model.predict)

    args = (jax.ShapeDtypeStruct((1, insize), jnp.int32),
            jax.ShapeDtypeStruct((1, insize), jnp.bool_))
    kwargs = {}
    if platforms:
        kwargs["platforms"] = list(platforms)
    exported = jax_export.export(jax.jit(predict), **kwargs)(*args)
    return bytes(exported.serialize())


def save_exported(path: str, blob: bytes):
    with open(path, "wb") as f:
        f.write(blob)


def load_exported(path: str):
    """Returns a callable (phoneme, pad_mask) → (wav, wav_len, mel_len, dur)."""
    with open(path, "rb") as f:
        blob = f.read()
    exported = jax_export.deserialize(blob)
    return lambda phoneme, pad_mask: exported.call(phoneme, pad_mask)
