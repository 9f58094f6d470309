"""Parity tests for HiFi-GAN discriminators + GAN losses vs the reference
(reference: hifigan/models.py:137-291).  Weights are read from the live
torch modules (weight_norm/spectral_norm parametrizations are evaluated by
accessing .weight)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp

from efficientspeech_tpu.models.hifigan_disc import (
    DiscriminatorP,
    DiscriminatorS,
    discriminator_loss,
    feature_loss,
    generator_loss,
)

torch = pytest.importorskip("torch")
REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference not mounted")


def _ref_models():
    from ref_loader import load_reference_hifigan

    hifigan = load_reference_hifigan()
    import hifigan.models as m

    return m


def _conv2d_params(conv):
    with torch.no_grad():
        w = conv.weight.detach().numpy()  # (out, in, kh, kw)
        b = conv.bias.detach().numpy()
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}


def _conv1d_params(conv):
    with torch.no_grad():
        w = conv.weight.detach().numpy()  # (out, in/groups, k)
        b = conv.bias.detach().numpy()
    return {"kernel": w.transpose(2, 1, 0), "bias": b}


def test_discriminator_p_parity():
    m = _ref_models()
    torch.manual_seed(0)
    ref = m.DiscriminatorP(3).eval()
    params = {}
    for i, conv in enumerate(ref.convs):
        params[f"conv{i}"] = _conv2d_params(conv)
    params["conv_post"] = _conv2d_params(ref.conv_post)

    rng = np.random.default_rng(0)
    wav = rng.normal(0, 0.3, size=(2, 4096)).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_fmap = ref(torch.from_numpy(wav[:, None, :]))

    mine = DiscriminatorP(period=3)
    out, fmap = mine.apply({"params": params}, jnp.asarray(wav))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=1e-4, atol=1e-4)
    assert len(fmap) == len(ref_fmap)
    # feature maps: ours NHWC vs torch NCHW
    for got, want in zip(fmap, ref_fmap):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
            rtol=1e-4, atol=1e-4)


def test_discriminator_s_parity():
    m = _ref_models()
    torch.manual_seed(1)
    ref = m.DiscriminatorS().eval()
    params = {}
    for i, conv in enumerate(ref.convs):
        params[f"conv{i}"] = _conv1d_params(conv)
    params["conv_post"] = _conv1d_params(ref.conv_post)

    rng = np.random.default_rng(1)
    wav = rng.normal(0, 0.3, size=(1, 4096)).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(wav[:, None, :]))

    mine = DiscriminatorS()
    out, _ = mine.apply({"params": params}, jnp.asarray(wav))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_gan_losses_match_reference():
    m = _ref_models()
    rng = np.random.default_rng(2)
    real = [rng.normal(size=(2, 10)).astype(np.float32) for _ in range(3)]
    gen = [rng.normal(size=(2, 10)).astype(np.float32) for _ in range(3)]
    fr = [[rng.normal(size=(2, 4, 5)).astype(np.float32) for _ in range(2)]
          for _ in range(3)]
    fg = [[rng.normal(size=(2, 4, 5)).astype(np.float32) for _ in range(2)]
          for _ in range(3)]

    ref_d, _, _ = m.discriminator_loss(
        [torch.from_numpy(x) for x in real],
        [torch.from_numpy(x) for x in gen])
    got_d, _, _ = discriminator_loss([jnp.asarray(x) for x in real],
                                     [jnp.asarray(x) for x in gen])
    np.testing.assert_allclose(float(got_d), float(ref_d), rtol=1e-5)

    ref_g, _ = m.generator_loss([torch.from_numpy(x) for x in gen])
    got_g, _ = generator_loss([jnp.asarray(x) for x in gen])
    np.testing.assert_allclose(float(got_g), float(ref_g), rtol=1e-5)

    ref_f = m.feature_loss(
        [[torch.from_numpy(x) for x in fs] for fs in fr],
        [[torch.from_numpy(x) for x in fs] for fs in fg])
    got_f = feature_loss([[jnp.asarray(x) for x in fs] for fs in fr],
                         [[jnp.asarray(x) for x in fs] for fs in fg])
    np.testing.assert_allclose(float(got_f), float(ref_f), rtol=1e-5)
