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


def test_vocoder_mr_stft_aux_loss():
    """mr_stft_weight adds the multi-resolution STFT term: the metric is
    reported, the generator loss grows by exactly weight*mr_stft, and
    the term pulls the STFT magnitudes toward the target (loss is lower
    for a closer waveform)."""
    from efficientspeech_tpu.training.vocoder import (
        multi_resolution_stft_loss)

    cfg = HifiGanConfig(upsample_initial_channel=16)
    audio = AudioConfig()
    gen, init, step0 = create_vocoder_trainer(cfg, audio)
    _, _, step_mr = create_vocoder_trainer(cfg, audio, mr_stft_weight=2.5)

    rng = jax.random.PRNGKey(0)
    segment = 2048
    mel = jnp.asarray(
        np.random.default_rng(0).normal(-3, 2, (1, segment // 256, 80)),
        jnp.float32)
    wav = jnp.asarray(
        np.random.default_rng(1).normal(0, 0.3, (1, segment)), jnp.float32)
    gen_params = gen.init(rng, mel)["params"]

    _, m0 = step0(init(rng, gen_params, segment=segment), mel, wav)
    _, mm = step_mr(init(rng, gen_params, segment=segment), mel, wav)
    m0, mm = jax.device_get((m0, mm))
    assert "mr_stft" not in m0 and np.isfinite(mm["mr_stft"])
    # both steps start from identical states, so the loss decomposes
    np.testing.assert_allclose(
        mm["gen_loss"], m0["gen_loss"] + 2.5 * mm["mr_stft"],
        rtol=1e-5, atol=1e-5)

    # the loss orders waveforms by spectral closeness
    t = jnp.linspace(0, 1, segment)[None, :]
    target = jnp.sin(2 * jnp.pi * 440 * t)
    near = 0.9 * target
    far = jnp.sin(2 * jnp.pi * 1763 * t)
    l_near, parts = multi_resolution_stft_loss(near, target)
    l_far, _ = multi_resolution_stft_loss(far, target)
    assert float(l_near) < float(l_far)
    assert np.isfinite(float(parts["mr_sc"]))
    assert np.isfinite(float(parts["mr_logmag"]))


def test_vocoder_adversarial_step_dp_mesh():
    """The adversarial step over a 4-way data mesh == single-device
    numerics (losses are mean-reduced; XLA inserts the gradient psums)."""
    from efficientspeech_tpu.parallel import make_mesh

    cfg = HifiGanConfig(upsample_initial_channel=16)
    audio = AudioConfig()
    mesh = make_mesh(data_parallel=4)
    gen, init1, step1 = create_vocoder_trainer(cfg, audio)
    _, initm, stepm = create_vocoder_trainer(cfg, audio, mesh=mesh)

    rng = jax.random.PRNGKey(0)
    segment, b = 2048, 4
    mel = jnp.asarray(
        np.random.default_rng(0).normal(-3, 2, (b, segment // 256, 80)),
        jnp.float32)
    wav = jnp.asarray(
        np.random.default_rng(1).normal(0, 0.3, (b, segment)), jnp.float32)

    gen_params = gen.init(rng, mel[:1])["params"]
    s1 = init1(rng, gen_params, segment=segment)
    sm = initm(rng, gen_params, segment=segment)

    s1, m1 = step1(s1, mel, wav)
    sm, mm = stepm(sm, mel, wav)
    m1, mm = jax.device_get((m1, mm))
    for k in m1:
        np.testing.assert_allclose(mm[k], m1[k], rtol=2e-5, atol=2e-5,
                                   err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5),
        jax.device_get(s1.gen_params), jax.device_get(sm.gen_params))
