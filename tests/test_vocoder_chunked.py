"""Chunked vocoder exactness: time-folded batched execution must match the
full-length masked run bit-for-bit (up to f32 reassociation)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from efficientspeech_tpu.config import HifiGanConfig
from efficientspeech_tpu.models.hifigan import (
    CHUNK_HALO_FRAMES,
    HifiGanGenerator,
    vocode_chunked,
)

REFERENCE_CKPT = "/root/reference/hifigan/LJ_V2/generator_v2"


@pytest.fixture(scope="module")
def gen_and_params():
    cfg = HifiGanConfig()
    gen = HifiGanGenerator(cfg)
    if os.path.isfile(REFERENCE_CKPT):
        from efficientspeech_tpu.convert import load_hifigan_checkpoint

        params = load_hifigan_checkpoint(REFERENCE_CKPT)
    else:
        import jax

        params = gen.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 8, 80)))["params"]
    return gen, params


@pytest.mark.parametrize("t,valid", [(96, 77), (96, None), (130, 96)])
def test_chunked_matches_unchunked(gen_and_params, t, valid):
    gen, params = gen_and_params
    rng = np.random.default_rng(0)
    mel = rng.normal(-3, 2, size=(1, t, 80)).astype(np.float32)
    valid_len = None if valid is None else jnp.asarray([valid])
    if valid is not None:
        mel[0, valid:] = 0.0  # invalid tail is zero (as the model emits it)

    full = gen.apply({"params": params}, jnp.asarray(mel),
                     valid_len=valid_len)
    chunked = vocode_chunked(gen, params, jnp.asarray(mel),
                             valid_len=valid_len, chunk_frames=32,
                             halo=CHUNK_HALO_FRAMES)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-4, atol=2e-5)
