"""Folded (polyphase matmul) vocoder vs the conv-based generator:
exact weight folding and end-to-end equivalence."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficientspeech_tpu.config import HifiGanConfig
from efficientspeech_tpu.models.hifigan import HifiGanGenerator
from efficientspeech_tpu.models.hifigan_folded import (
    fold_conv1d,
    fold_conv_transpose1d,
    fold_hifigan,
    folded_generator_apply,
    _folded_apply,
)
from efficientspeech_tpu.ops.conv import conv1d, conv_transpose1d


def _fold_run(x_long, W, b, w, rate_in, rate_out):
    """apply folded op to a long (B, L, C) signal."""
    bsz, L, c = x_long.shape
    t = L // rate_in
    x_f = x_long.reshape(bsz, t, rate_in * c)
    y_f = _folded_apply(x_f, (W, b, w), jnp.float32)
    d_out = y_f.shape[-1]
    c_out = d_out // rate_out
    return y_f.reshape(bsz, t * rate_out, c_out)


@pytest.mark.parametrize("rate,k,d,cin,cout", [
    (1, 7, 1, 80, 32),
    (8, 3, 1, 16, 16),
    (8, 11, 5, 16, 16),
    (64, 7, 3, 8, 8),
])
def test_fold_conv1d_exact(rate, k, d, cin, cout):
    rng = np.random.default_rng(0)
    w_kio = rng.standard_normal((k, cin, cout)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    t = 6
    x = rng.standard_normal((2, t * rate, cin)).astype(np.float32)

    pad = (k * d - d) // 2
    ref = conv1d(jnp.asarray(x), jnp.asarray(w_kio), jnp.asarray(bias),
                 padding=pad, dilation=d)
    W, b, w = fold_conv1d(w_kio, bias, rate, d, pad)
    got = _fold_run(jnp.asarray(x), W, b, w, rate, rate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("rate_in,k,s,cin,cout", [
    (1, 16, 8, 12, 8),
    (8, 16, 8, 8, 8),
    (64, 4, 2, 8, 4),
])
def test_fold_conv_transpose1d_exact(rate_in, k, s, cin, cout):
    rng = np.random.default_rng(1)
    w_kio = rng.standard_normal((k, cin, cout)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    t = 5
    x = rng.standard_normal((1, t * rate_in, cin)).astype(np.float32)
    pad = (k - s) // 2

    ref = conv_transpose1d(jnp.asarray(x), jnp.asarray(w_kio),
                           jnp.asarray(bias), stride=s, padding=pad)
    W, b, w = fold_conv_transpose1d(w_kio, bias, rate_in, s, pad)
    got = _fold_run(jnp.asarray(x), W, b, w, rate_in, rate_in * s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


REFERENCE_CKPT = "/root/reference/hifigan/LJ_V2/generator_v2"


def test_folded_generator_matches_conv_generator():
    cfg = HifiGanConfig(upsample_initial_channel=32)  # small for CPU speed
    gen = HifiGanGenerator(cfg)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 80)))["params"]
    folded = fold_hifigan(jax.tree.map(np.asarray, params), cfg)

    rng = np.random.default_rng(2)
    t, valid = 24, 17
    mel = rng.normal(-3, 2, size=(1, t, 80)).astype(np.float32)
    mel[0, valid:] = 0
    vl = jnp.asarray([valid])

    ref = gen.apply({"params": params}, jnp.asarray(mel), valid_len=vl)
    got = folded_generator_apply(folded, cfg, jnp.asarray(mel), vl,
                                 dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(not os.path.isfile(REFERENCE_CKPT),
                    reason="bundled weights absent")
def test_folded_generator_real_weights():
    from efficientspeech_tpu.convert import load_hifigan_checkpoint

    cfg = HifiGanConfig()
    params = load_hifigan_checkpoint(REFERENCE_CKPT)
    gen = HifiGanGenerator(cfg)
    folded = fold_hifigan(params, cfg)

    rng = np.random.default_rng(3)
    t, valid = 16, 13
    mel = rng.normal(-3, 2, size=(1, t, 80)).astype(np.float32)
    mel[0, valid:] = 0
    vl = jnp.asarray([valid])

    ref = gen.apply({"params": params}, jnp.asarray(mel), valid_len=vl)
    got = folded_generator_apply(folded, cfg, jnp.asarray(mel), vl,
                                 dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_plan_apply_regridded_matches_conv_generator():
    """Per-stage re-gridded fold == conv generator, at both the default
    minimum-lane grid (D=128, the round-3 FLOP-optimal plan) and the
    round-2 D=512 grid."""
    from efficientspeech_tpu.models.hifigan_folded import (
        fold_hifigan_device, folded_plan_apply, make_grid_plan)

    cfg = HifiGanConfig()  # real dims: channels 64/32/16/8
    ch, rate, g, rpf = make_grid_plan(cfg)          # default d128
    assert g == [2, 4, 8, 16] and rpf == [4, 16, 16, 16]
    ch, rate, g, rpf = make_grid_plan(cfg, d_target=512)
    assert g == [8, 16, 32, 64] and rpf == [1, 4, 4, 4]

    gen = HifiGanGenerator(cfg)
    params = gen.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 80)))["params"]
    arrays, meta = fold_hifigan_device(params, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(4)
    t, valid = 12, 9
    mel = rng.normal(-3, 2, size=(1, t, 80)).astype(np.float32)
    mel[0, valid:] = 0
    vl = jnp.asarray([valid])
    ref = gen.apply({"params": params}, jnp.asarray(mel), valid_len=vl)
    got = folded_plan_apply(arrays, meta, cfg, jnp.asarray(mel), vl,
                            dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # pallas interpret path
    got_p = folded_plan_apply(arrays, meta, cfg, jnp.asarray(mel), vl,
                              dtype=jnp.float32, use_pallas=True,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # fused-K kernel variant (single deep-K dot)
    got_fk = folded_plan_apply(arrays, meta, cfg, jnp.asarray(mel), vl,
                               dtype=jnp.float32, use_pallas=True,
                               interpret=True, pallas_fuse_k=True)
    np.testing.assert_allclose(np.asarray(got_fk), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_plan_apply_fused_stage_sum_and_bf16_activations():
    """The kernel-epilogue stage-sum fusion (accum + out_scale) is
    numerically equivalent to the unfused XLA adds, and bf16 inter-op
    activations stay far above the serving wire-codec SNR floor."""
    from efficientspeech_tpu.models.hifigan_folded import (
        fold_hifigan_device, folded_plan_apply)

    cfg = HifiGanConfig()
    gen = HifiGanGenerator(cfg)
    params = gen.init(jax.random.PRNGKey(2), jnp.zeros((1, 4, 80)))["params"]
    arrays, meta = fold_hifigan_device(params, cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(5)
    t, valid = 16, 13
    mel = jnp.asarray(rng.normal(-3, 2, size=(1, t, 80)).astype(np.float32))
    vl = jnp.asarray([valid])

    def run(**kw):
        return np.asarray(folded_plan_apply(
            arrays, meta, cfg, mel, valid_len=vl, dtype=jnp.bfloat16,
            use_pallas=True, interpret=True, pallas_tm=32, **kw))

    base = run(fuse_stage_sum=False)
    fused = run(fuse_stage_sum=True)
    # commutative adds + epilogue multiply: near-exact (measured 1.4e-9)
    np.testing.assert_allclose(fused, base, atol=1e-6)

    b16 = run(fuse_stage_sum=True, act_dtype=jnp.bfloat16)
    err = b16 - base
    snr = 10 * np.log10(float((base ** 2).mean())
                        / max(float((err ** 2).mean()), 1e-30))
    # adpcm4 wire floor ~26 dB, mulaw ~30 dB; bf16 activations measured
    # ~42 dB on random weights (and the serving default stays f32)
    assert snr > 35.0, snr

    # whole-stage MRF fused kernel (ops/pallas/mrf_block.py): 18 convs +
    # residuals + stage sum + /num_kernels in one program per stage —
    # near-exact vs the op-by-op path in f32, rounding-level in bf16
    mrf = run(fuse_mrf=True, mrf_tm=32)
    np.testing.assert_allclose(mrf, base, atol=1e-6)
    mrfb = run(fuse_mrf=True, mrf_tm=32, act_dtype=jnp.bfloat16)
    err = mrfb - base
    snr = 10 * np.log10(float((base ** 2).mean())
                        / max(float((err ** 2).mean()), 1e-30))
    assert snr > 35.0, snr


def test_plan_apply_resblock2_v3_config():
    """The folded plan serves the LJ_V3 config too (resblock '2': one
    residual conv per dilation, 3 upsample stages ×8·8·4 — reference:
    hifigan/LJ_V3/config.json, hifigan/models.py:60-81): XLA and pallas
    paths both match the conv generator, with the MRF fusion flag
    silently inert (it is a resblock-'1' kernel)."""
    from efficientspeech_tpu.models.hifigan_folded import (
        fold_hifigan_device, folded_plan_apply, make_grid_plan)

    cfg = HifiGanConfig(
        resblock="2", upsample_rates=(8, 8, 4),
        upsample_kernel_sizes=(16, 16, 8), upsample_initial_channel=256,
        resblock_kernel_sizes=(3, 5, 7),
        resblock_dilation_sizes=((1, 2), (2, 6), (3, 12)))
    ch, rate, g, rpf = make_grid_plan(cfg)
    assert ch == [128, 64, 32] and g == [1, 2, 4] and rpf == [8, 32, 64]

    gen = HifiGanGenerator(cfg)
    params = gen.init(jax.random.PRNGKey(2), jnp.zeros((1, 4, 80)))["params"]
    arrays, meta = fold_hifigan_device(params, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(7)
    t, valid = 12, 9
    mel = rng.normal(-3, 2, size=(1, t, 80)).astype(np.float32)
    mel[0, valid:] = 0
    vl = jnp.asarray([valid])
    ref = gen.apply({"params": params}, jnp.asarray(mel), valid_len=vl)
    got = folded_plan_apply(arrays, meta, cfg, jnp.asarray(mel), vl,
                            dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # pallas per-op path, with fuse_mrf requested (must be inert for "2")
    got_p = folded_plan_apply(arrays, meta, cfg, jnp.asarray(mel), vl,
                              dtype=jnp.float32, use_pallas=True,
                              interpret=True, fuse_mrf=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
