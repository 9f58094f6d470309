"""Released-checkpoint load path: a Lightning-style .ckpt (as the reference
publishes, README.md:35-87) round-trips through load_efficientspeech_checkpoint
and drives our model to the reference outputs."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp

from efficientspeech_tpu.config import ModelConfig
from efficientspeech_tpu.convert import load_efficientspeech_checkpoint
from efficientspeech_tpu.models import Phoneme2Mel

torch = pytest.importorskip("torch")
REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference not mounted")


def test_lightning_ckpt_roundtrip(tmp_path):
    from ref_loader import load_reference_layers

    ref = load_reference_layers()
    PITCH = (-2.917079304729967, 11.391254536985771)
    ENERGY = (-1.431044578552246, 8.184337615966797)
    torch.manual_seed(7)
    pe = ref.PhonemeEncoder(pitch_stats=list(PITCH), energy_stats=list(ENERGY),
                            depth=2, reduction=4, head=1, embed_dim=128,
                            kernel_size=3, expansion=1)
    md = ref.MelDecoder(dim=32, kernel_size=5, n_blocks=2, block_depth=2)
    p2m = ref.Phoneme2Mel(encoder=pe, decoder=md).eval()

    # emulate a Lightning checkpoint: {"state_dict": {"phoneme2mel.*": ...}}
    sd = {"phoneme2mel." + k: v for k, v in p2m.state_dict().items()}
    ckpt_path = str(tmp_path / "tiny_test.ckpt")
    torch.save({"state_dict": sd, "hyper_parameters": {"depth": 2}}, ckpt_path)

    params = load_efficientspeech_checkpoint(ckpt_path, depth=2, n_blocks=2,
                                             block_depth=2)
    assert "phoneme2mel" in params

    cfg = ModelConfig.preset("tiny", max_phoneme_len=64, max_mel_len=512,
                             pitch_stats=PITCH, energy_stats=ENERGY)
    model = Phoneme2Mel(cfg)
    rng = np.random.default_rng(3)
    n = 57
    phoneme = rng.integers(1, 152, size=(1, n)).astype(np.int32)
    with torch.no_grad():
        ref_mel, ref_len, _ = p2m({"phoneme": torch.from_numpy(phoneme).long()},
                                  train=False)
    pad = np.zeros((1, 64), np.int32)
    pad[:, :n] = phoneme
    mask = np.ones((1, 64), bool)
    mask[:, :n] = False
    pred = model.apply({"params": params["phoneme2mel"]}, jnp.asarray(pad),
                       jnp.asarray(mask), train=False)
    L = int(ref_len[0])
    assert int(pred["mel_len"][0]) == L
    np.testing.assert_allclose(np.asarray(pred["mel"])[0, :L],
                               ref_mel.numpy()[0, :L], rtol=1e-4, atol=1e-4)


def test_inverse_converter_roundtrip():
    """our params → reference state_dict → reference torch model produces
    identical outputs (framework interop both directions)."""
    from ref_loader import load_reference_layers

    from efficientspeech_tpu.convert.to_torch import (
        efficientspeech_params_to_state_dict)
    from efficientspeech_tpu.utils.host_init import host_init

    PITCH = (-2.9, 11.4)
    ENERGY = (-1.4, 8.2)
    cfg = ModelConfig.preset("tiny", max_phoneme_len=32, max_mel_len=256,
                             pitch_stats=PITCH, energy_stats=ENERGY)
    model = Phoneme2Mel(cfg)
    import jax

    params = host_init(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32), jnp.int32),
        jnp.ones((1, 32), bool), train=False)["params"], seed=1)

    sd_np = efficientspeech_params_to_state_dict(
        {"phoneme2mel": params}, pitch_stats=PITCH, energy_stats=ENERGY)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in sd_np.items()}

    ref = load_reference_layers()
    pe = ref.PhonemeEncoder(pitch_stats=list(PITCH), energy_stats=list(ENERGY),
                            depth=2, reduction=4, head=1, embed_dim=128,
                            kernel_size=3, expansion=1)
    md = ref.MelDecoder(dim=32, kernel_size=5, n_blocks=2, block_depth=2)
    p2m = ref.Phoneme2Mel(encoder=pe, decoder=md)
    stripped = {k[len("phoneme2mel."):]: v for k, v in sd.items()}
    missing, unexpected = p2m.load_state_dict(stripped, strict=True), None
    p2m.eval()

    rng = np.random.default_rng(5)
    n = 23
    phoneme = rng.integers(1, 152, size=(1, n)).astype(np.int32)
    # bias durations so the reference can run its conv stack
    with torch.no_grad():
        p2m.encoder.duration_decoder.linear.bias.fill_(3.0)
    params["encoder"]["duration_decoder"]["linear"]["bias"] = \
        np.asarray([3.0], np.float32)

    with torch.no_grad():
        ref_mel, ref_len, _ = p2m({"phoneme": torch.from_numpy(phoneme).long()},
                                  train=False)
    pad = np.zeros((1, 32), np.int32)
    pad[:, :n] = phoneme
    mask = np.ones((1, 32), bool)
    mask[:, :n] = False
    pred = model.apply({"params": params}, jnp.asarray(pad),
                       jnp.asarray(mask), train=False)
    L = int(ref_len[0])
    assert int(pred["mel_len"][0]) == L
    np.testing.assert_allclose(np.asarray(pred["mel"])[0, :L],
                               ref_mel.numpy()[0, :L], rtol=1e-4, atol=1e-4)
