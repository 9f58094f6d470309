"""Export round-trip: serialize the phoneme→wav program to StableHLO bytes,
deserialize, and check output parity with the live model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficientspeech_tpu.config import HifiGanConfig, ModelConfig
from efficientspeech_tpu.convert.export import export_text_to_wav, load_exported
from efficientspeech_tpu.models import EfficientSpeech


def test_export_roundtrip(tmp_path):
    cfg = ModelConfig.preset("tiny")
    hifigan_cfg = HifiGanConfig()
    insize, mel_exp = 16, 4

    import dataclasses

    small_cfg = dataclasses.replace(cfg, max_phoneme_len=insize,
                                    max_mel_len=insize * mel_exp)
    model = EfficientSpeech(cfg=small_cfg, hifigan_cfg=hifigan_cfg,
                            dtype=jnp.float32)
    rng = np.random.default_rng(0)
    phoneme = jnp.asarray(rng.integers(1, 152, (1, insize)), jnp.int32)
    pad_mask = jnp.zeros((1, insize), bool)
    params = model.init(jax.random.PRNGKey(0), phoneme, pad_mask,
                        method=model.predict)["params"]
    # bias duration head so output has frames
    params["phoneme2mel"]["encoder"]["duration_decoder"]["linear"]["bias"] = \
        jnp.asarray([3.0])

    blob = export_text_to_wav(cfg, hifigan_cfg, params, insize=insize,
                              mel_expansion=mel_exp, dtype=jnp.float32)
    assert isinstance(blob, bytes) and len(blob) > 1000

    path = str(tmp_path / "model.stablehlo")
    with open(path, "wb") as f:
        f.write(blob)
    runner = load_exported(path)
    wav_e, wav_len_e, mel_len_e, dur_e = runner(phoneme, pad_mask)

    wav, wav_len, mel_len, dur = model.apply(
        {"params": params}, phoneme, pad_mask, method=model.predict)
    np.testing.assert_array_equal(np.asarray(mel_len_e), np.asarray(mel_len))
    np.testing.assert_allclose(np.asarray(wav_e), np.asarray(wav),
                               atol=1e-6)
