"""Numerical parity vs the live reference torch implementation.

Strategy (no released acoustic checkpoints ship in this environment): build
the reference torch modules with seeded random init, convert their
state_dict through our converter, and require our JAX model to reproduce
their outputs — this is exactly the path a released checkpoint would take.

Covers:
- bs=1 unpadded reference inference vs our padded static-shape program
  (mask_logits=True must be exact on the valid region),
- padded training batch vs reference semantics (mask_logits=False),
- HiFi-GAN generator incl. weight-norm folding and tail-masking parity,
  using the real bundled LJ_V2 weights.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp

from efficientspeech_tpu.config import HifiGanConfig, ModelConfig
from efficientspeech_tpu.convert import (
    convert_efficientspeech_state_dict,
    load_hifigan_checkpoint,
)
from efficientspeech_tpu.models import HifiGanGenerator, Phoneme2Mel

from ref_loader import load_reference_hifigan, load_reference_layers

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference not mounted")

PITCH_STATS = (-2.917079304729967, 11.391254536985771)
ENERGY_STATS = (-1.431044578552246, 8.184337615966797)


def _build_reference_phoneme2mel(preset: str, seed: int = 7):
    ref = load_reference_layers()
    cfg = ModelConfig.preset(preset, max_phoneme_len=64, max_mel_len=512,
                             pitch_stats=PITCH_STATS, energy_stats=ENERGY_STATS)
    torch.manual_seed(seed)
    pe = ref.PhonemeEncoder(pitch_stats=list(PITCH_STATS),
                            energy_stats=list(ENERGY_STATS),
                            depth=cfg.depth, reduction=cfg.reduction,
                            head=cfg.head, embed_dim=cfg.embed_dim,
                            kernel_size=cfg.kernel_size,
                            expansion=cfg.expansion)
    md = ref.MelDecoder(dim=cfg.embed_dim // cfg.reduction,
                        kernel_size=cfg.decoder_kernel_size,
                        n_blocks=cfg.n_blocks, block_depth=cfg.block_depth)
    p2m = ref.Phoneme2Mel(encoder=pe, decoder=md).eval()
    return p2m, cfg


def _convert(p2m, cfg):
    sd = {"phoneme2mel." + k: v.detach().numpy()
          for k, v in p2m.state_dict().items()}
    params = convert_efficientspeech_state_dict(
        sd, depth=cfg.depth, n_blocks=cfg.n_blocks,
        block_depth=cfg.block_depth)
    return params["phoneme2mel"]


@pytest.mark.parametrize("preset,n", [
    ("tiny", 57),    # odd length: exercises the ceil(n/2) stage boundary
    ("tiny", 64),    # exactly the bucket: no padding at all
    ("tiny", 5),     # very short
    ("small", 57),
    ("base", 57),
])
def test_phoneme2mel_bs1_inference_parity(preset, n):
    """Reference unpadded bs=1 inference == our padded program (valid region)."""
    rng = np.random.default_rng(3)
    phoneme = rng.integers(1, 152, size=(1, n)).astype(np.int32)

    # random-init duration heads sometimes predict ~0 total frames, which the
    # reference's own conv stack cannot run on; retry seeds until usable
    found = False
    for seed in range(7, 120):
        p2m, cfg = _build_reference_phoneme2mel(preset, seed=seed)
        with torch.no_grad():
            dur, _ = p2m.encoder.duration_decoder(
                p2m.encoder.fuse(*p2m.encoder.encoder(
                    torch.from_numpy(phoneme).long(), mask=None)))
        if torch.round(dur).sum() >= 5:
            found = True
            break
    if not found:
        pytest.skip("no random seed yields enough frames for the reference's "
                    "own conv stack at this length")
    params = _convert(p2m, cfg)

    with torch.no_grad():
        ref_mel, ref_mel_len, ref_dur = p2m(
            {"phoneme": torch.from_numpy(phoneme).long()}, train=False)
    ref_mel = ref_mel.numpy()          # (1, L, 80)
    ref_len = int(ref_mel_len[0])
    ref_dur = ref_dur.numpy()

    model = Phoneme2Mel(cfg)
    pad = np.full((1, cfg.max_phoneme_len), 0, dtype=np.int32)
    pad[:, :n] = phoneme
    pad_mask = np.ones((1, cfg.max_phoneme_len), dtype=bool)
    pad_mask[:, :n] = False
    pred = model.apply({"params": params}, jnp.asarray(pad),
                       jnp.asarray(pad_mask), train=False)

    got_len = int(pred["mel_len"][0])
    assert got_len == ref_len
    got_mel = np.asarray(pred["mel"])[0, :ref_len]
    np.testing.assert_allclose(got_mel, ref_mel[0, :ref_len],
                               rtol=1e-4, atol=1e-4)
    got_dur = np.asarray(pred["duration"])[0, :n, 0]
    np.testing.assert_allclose(got_dur, ref_dur[0, :n, 0], rtol=1e-4, atol=1e-4)


def test_phoneme2mel_train_batch_parity():
    """Padded training batch, reference mask semantics (mask_logits=False)."""
    p2m, cfg = _build_reference_phoneme2mel("tiny")
    params = _convert(p2m, cfg)

    rng = np.random.default_rng(4)
    lens = [64, 41, 17]
    b, n = len(lens), 64
    phoneme = np.zeros((b, n), dtype=np.int64)
    pad_mask = np.ones((b, n), dtype=bool)
    pitch = np.zeros((b, n), dtype=np.float32)
    energy = np.zeros((b, n), dtype=np.float32)
    duration = np.zeros((b, n), dtype=np.int64)
    for i, L in enumerate(lens):
        phoneme[i, :L] = rng.integers(1, 152, size=L)
        pad_mask[i, :L] = False
        pitch[i, :L] = rng.normal(0, 2, size=L)
        energy[i, :L] = rng.normal(0, 2, size=L)
        duration[i, :L] = rng.integers(1, 6, size=L)
    # reference pads frames to the batch max mel length; to compare junk-free
    # we make the batch max coincide with our static bucket (512 = 64 * 8)
    duration[0, :] = 8
    mel_len = duration.sum(axis=1)

    x = {"phoneme": torch.from_numpy(phoneme),
         "phoneme_mask": torch.from_numpy(pad_mask),
         "pitch": torch.from_numpy(pitch),
         "energy": torch.from_numpy(energy),
         "duration": torch.from_numpy(duration),
         "mel_len": torch.from_numpy(mel_len)}
    with torch.no_grad():
        ref = p2m(x, train=True)

    model = Phoneme2Mel(cfg, ref_pad_semantics=True)
    pred = model.apply(
        {"params": params}, jnp.asarray(phoneme.astype(np.int32)),
        jnp.asarray(pad_mask), pitch_target=jnp.asarray(pitch),
        energy_target=jnp.asarray(energy),
        duration_target=jnp.asarray(duration.astype(np.int32)), train=True)

    max_L = int(mel_len.max())
    ref_mel = ref["mel"].numpy()
    got_mel = np.asarray(pred["mel"])[:, :max_L]
    # compare valid frames only (ref pads to batch max; we pad to bucket)
    for i, L in enumerate(mel_len):
        np.testing.assert_allclose(got_mel[i, :L], ref_mel[i, :L],
                                   rtol=1e-4, atol=1e-4)
    for key in ["pitch", "energy", "duration"]:
        ref_v = ref[key].numpy()[..., 0]
        got_v = np.asarray(pred[key])[..., 0]
        for i, L in enumerate(lens):
            np.testing.assert_allclose(got_v[i, :L], ref_v[i, :L],
                                       rtol=1e-4, atol=1e-4, err_msg=key)
    np.testing.assert_array_equal(np.asarray(pred["mel_len"]), mel_len)


HIFIGAN_CKPT = os.path.join(REFERENCE, "hifigan/LJ_V2/generator_v2")


@pytest.mark.skipif(not os.path.isfile(HIFIGAN_CKPT),
                    reason="bundled hifigan weights absent")
def test_hifigan_generator_parity_real_weights():
    """Bundled LJ_V2 generator: torch (remove_weight_norm) vs ours
    (fold_weight_norm at conversion), unpadded vs padded+masked."""
    ref_hifigan = load_reference_hifigan()
    import json

    with open(os.path.join(REFERENCE, "hifigan/LJ_V2/config.json")) as f:
        raw_cfg = json.load(f)
    torch.manual_seed(raw_cfg["seed"])
    gen = ref_hifigan.Generator(ref_hifigan.AttrDict(raw_cfg))
    ckpt = torch.load(HIFIGAN_CKPT, map_location="cpu", weights_only=False)
    gen.load_state_dict(ckpt["generator"])
    gen.eval()
    gen.remove_weight_norm()

    cfg = HifiGanConfig.from_json(os.path.join(REFERENCE, "hifigan/LJ_V2/config.json"))
    params = load_hifigan_checkpoint(HIFIGAN_CKPT)

    rng = np.random.default_rng(5)
    t = 37
    mel = rng.normal(-3, 2, size=(1, t, 80)).astype(np.float32)

    with torch.no_grad():
        ref_wav = gen(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()[:, 0]

    model = HifiGanGenerator(cfg)
    # padded to 48 frames with zero tail + valid_len masking
    mel_pad = np.zeros((1, 48, 80), dtype=np.float32)
    mel_pad[:, :t] = mel
    wav = model.apply({"params": params}, jnp.asarray(mel_pad),
                      valid_len=jnp.asarray([t]))
    wav = np.asarray(wav)

    n_samples = t * cfg.total_upsample
    assert ref_wav.shape[-1] == n_samples
    np.testing.assert_allclose(wav[0, :n_samples], ref_wav[0],
                               rtol=1e-4, atol=2e-5)
    # masked tail must be tanh(conv bias-free zero) == 0
    assert np.abs(wav[0, n_samples:]).max() == 0.0
