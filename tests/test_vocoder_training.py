"""Vocoder fine-tuning smoke: one adversarial step runs, losses finite,
parameters move."""

import numpy as np

import jax
import jax.numpy as jnp

from efficientspeech_tpu.config import AudioConfig, HifiGanConfig
from efficientspeech_tpu.training.vocoder import create_vocoder_trainer


def test_vocoder_adversarial_step():
    cfg = HifiGanConfig(upsample_initial_channel=16)
    audio = AudioConfig()
    gen, init, train_step = create_vocoder_trainer(cfg, audio)

    rng = jax.random.PRNGKey(0)
    segment = 2048  # samples; mel frames = 8
    mel = jnp.asarray(
        np.random.default_rng(0).normal(-3, 2, (1, segment // 256, 80)),
        jnp.float32)
    wav = jnp.asarray(
        np.random.default_rng(1).normal(0, 0.3, (1, segment)), jnp.float32)

    gen_params = gen.init(rng, mel)["params"]
    state = init(rng, gen_params, segment=segment)

    before = jax.tree_util.tree_leaves(state.gen_params)[0].copy()
    state, metrics = train_step(state, mel, wav)
    metrics = jax.device_get(metrics)
    assert np.isfinite(metrics["gen_loss"])
    assert np.isfinite(metrics["disc_loss"])
    assert np.isfinite(metrics["mel_l1"])
    after = jax.tree_util.tree_leaves(state.gen_params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    assert int(state.step) == 1
