"""Real-TPU smoke tests for the compiled Pallas kernels.

The regular suite runs the kernels in interpret mode on CPU
(test_pallas_kernels.py) — numerics are covered there, but a Mosaic
compile/lowering regression would go unseen until a benchmark run.
These tests run the COMPILED kernels on the actual chip and are skipped
whenever the backend is CPU (i.e. under scripts/test.sh).

Run them on the TPU with (ES_TPU_SMOKE=1 stops conftest.py from forcing
the CPU backend):

    ES_TPU_SMOKE=1 PYTHONPATH=/root/repo:/root/.axon_site \
        python -m pytest tests/test_tpu_smoke.py -v

Shapes are kept small-but-real (8-aligned sublanes, 128-lane multiples)
so first compile stays in the minutes range and later runs hit the
persistent compile cache.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="real-TPU smoke test (kernels are interpret-tested on CPU)")


@pytest.fixture(scope="module", autouse=True)
def _cache():
    from efficientspeech_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()


def test_folded_matmul_compiled():
    """Compiled folded-matmul kernel vs the XLA windowed reference at a
    serving-like shape (the vocoder's d128 grid, w=1)."""
    from efficientspeech_tpu.ops.pallas.folded_matmul import folded_matmul

    t, d_in, d_out, w, valid = 1024, 128, 128, 1, 1000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((t, d_in)), jnp.float32)
    W = jnp.asarray(rng.standard_normal(((2 * w + 1) * d_in, d_out)) * 0.05,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((d_out,)), jnp.float32)

    got = jax.jit(lambda x: folded_matmul(
        x, W, b, w, jnp.int32(valid), pre_lrelu=True, tm=512))(x)

    xp = np.pad(np.asarray(x), ((w, w), (0, 0)))
    xl = np.where(xp >= 0, xp, xp * 0.1)
    window = np.concatenate([xl[i: i + t] for i in range(2 * w + 1)], -1)
    want = window @ np.asarray(W) + np.asarray(b)
    want[valid:] = 0.0
    # f32 matmuls on the MXU run at DEFAULT precision = one bf16 pass
    # (measured max|Δ| 8.4e-3 on O(4) outputs at this shape — pure
    # rounding, no structural error; benchmarks/fm_debug.py is the
    # diagnostic).  The serving path feeds the kernel bf16 anyway; the
    # tolerance here reflects the hardware contract, not a kernel bug.
    np.testing.assert_allclose(np.asarray(jax.device_get(got)), want,
                               rtol=5e-3, atol=2.5e-2)


def test_mrf_fused_compiled():
    """Compiled whole-stage MRF kernel vs the op-by-op folded path at a
    small-but-real shape (d128 grid, full LJ_V2 MRF structure)."""
    from efficientspeech_tpu.config import HifiGanConfig
    from efficientspeech_tpu.models.hifigan import HifiGanGenerator
    from efficientspeech_tpu.models.hifigan_folded import (
        fold_hifigan_device, folded_plan_apply)
    from efficientspeech_tpu.utils.host_init import host_init

    cfg = HifiGanConfig()
    gen = HifiGanGenerator(cfg, dtype=jnp.float32)
    params = host_init(lambda: gen.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 4, 80)))["params"], seed=1)
    arrays, meta = fold_hifigan_device(params, cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(3)
    t = 64
    mel = jnp.asarray(rng.normal(-3, 2, size=(1, t, 80)), jnp.float32)
    vl = jnp.asarray([int(t * 0.9)])

    base = jax.device_get(jax.jit(lambda m: folded_plan_apply(
        arrays, meta, cfg, m, valid_len=vl, dtype=jnp.bfloat16,
        use_pallas=True, fuse_stage_sum=False, pallas_tm=256))(mel))
    mrf = jax.device_get(jax.jit(lambda m: folded_plan_apply(
        arrays, meta, cfg, m, valid_len=vl, dtype=jnp.bfloat16,
        use_pallas=True, fuse_mrf=True, mrf_tm=256))(mel))
    # f32 activations through identical per-tap dot order: near-exact
    np.testing.assert_allclose(np.asarray(mrf, np.float32),
                               np.asarray(base, np.float32), atol=1e-5)


def test_layer_norm_fused_compiled():
    """Compiled fused-LN kernel: bf16 forward parity + f32 grad parity."""
    from efficientspeech_tpu.ops.pallas.layer_norm import layer_norm_fused

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 64, 128)) * 2 + 0.5, jnp.bfloat16)
    s = jnp.asarray(rng.normal(size=(128,)) * 0.5 + 1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(128,)) * 0.1, jnp.float32)

    def ref_ln(x, s, b):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), -1, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * s + b).astype(x.dtype)

    y1 = jax.device_get(jax.jit(
        lambda x: layer_norm_fused(x, s, b, 1e-5, 16, False))(x))
    y2 = jax.device_get(jax.jit(lambda x: ref_ln(x, s, b))(x))
    np.testing.assert_allclose(np.asarray(y1, np.float32),
                               np.asarray(y2, np.float32), atol=0.02)

    g1 = jax.device_get(jax.jit(jax.grad(
        lambda s: jnp.sum(layer_norm_fused(
            x, s, b, 1e-5, 16, False).astype(jnp.float32))))(s))
    g2 = jax.device_get(jax.jit(jax.grad(
        lambda s: jnp.sum(ref_ln(x, s, b).astype(jnp.float32))))(s))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=5e-3, atol=5e-2)


def test_decoder_block_fused_compiled():
    """Compiled fused decoder-block kernel (fwd + custom-VJP bwd) vs the
    plain-module path at a training-like (tg-multiple) batch."""
    from efficientspeech_tpu.config import ModelConfig
    from efficientspeech_tpu.models.mel_decoder import MelDecoder

    cfg = ModelConfig.preset("tiny", max_phoneme_len=16, max_mel_len=128)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 128, 4 * cfg.filter_dim)),
                    jnp.bfloat16)
    mask = jnp.asarray(rng.random((8, 128)) < 0.2)

    plain = MelDecoder(cfg, dtype=jnp.bfloat16)
    fused = MelDecoder(cfg, dtype=jnp.bfloat16, fused_block=True)
    params = plain.init(jax.random.PRNGKey(0), x, mask)["params"]

    y1 = jax.device_get(jax.jit(
        lambda p: plain.apply({"params": p}, x, mask))(params))
    y2 = jax.device_get(jax.jit(
        lambda p: fused.apply({"params": p}, x, mask))(params))
    np.testing.assert_allclose(np.asarray(y1, np.float32),
                               np.asarray(y2, np.float32), atol=0.08)

    def loss(model, p):
        return jnp.sum(model.apply(
            {"params": p}, x, mask).astype(jnp.float32) ** 2)

    g1 = jax.device_get(jax.jit(jax.grad(
        lambda p: loss(plain, p)))(params))
    g2 = jax.device_get(jax.jit(jax.grad(
        lambda p: loss(fused, p)))(params))
    for (ka, va), (_, vb) in zip(
            jax.tree_util.tree_flatten_with_path(g1)[0],
            jax.tree_util.tree_flatten_with_path(g2)[0]):
        va, vb = np.asarray(va, np.float32), np.asarray(vb, np.float32)
        scale = np.max(np.abs(va)) + 1e-12
        np.testing.assert_allclose(vb / scale, va / scale, atol=0.02,
                                   err_msg=str(ka))


def test_decoder_block_fused_compiled():
    """Compiled decoder-block kernel (fwd + custom-VJP bwd at tg_bwd=2,
    the production training config) vs the unfused MelDecoder on chip."""
    import jax.tree_util as jtu

    from efficientspeech_tpu.config import ModelConfig
    from efficientspeech_tpu.models.mel_decoder import MelDecoder

    cfg = ModelConfig.preset("tiny", max_phoneme_len=16, max_mel_len=64)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 64, 4 * cfg.filter_dim)),
                    jnp.float32)
    mask = jnp.asarray(rng.random((4, 64)) < 0.2)

    plain = MelDecoder(cfg, dtype=jnp.float32)
    fused = MelDecoder(cfg, dtype=jnp.float32, fused_block=True,
                       fused_block_tg=2, fused_block_tg_bwd=2)
    p = plain.init(jax.random.PRNGKey(0), x, mask)["params"]

    y1 = jax.device_get(jax.jit(
        lambda p: plain.apply({"params": p}, x, mask))(p))
    y2 = jax.device_get(jax.jit(
        lambda p: fused.apply({"params": p}, x, mask))(p))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=1e-4, atol=1e-4)

    def loss(model, p):
        return jnp.sum(model.apply({"params": p}, x, mask) ** 2)

    g1 = jax.device_get(jax.jit(jax.grad(
        lambda p: loss(plain, p)))(p))
    g2 = jax.device_get(jax.jit(jax.grad(
        lambda p: loss(fused, p)))(p))
    for (ka, va), (_, vb) in zip(jtu.tree_flatten_with_path(g1)[0],
                                 jtu.tree_flatten_with_path(g2)[0]):
        scale = np.max(np.abs(np.asarray(va))) + 1e-12
        np.testing.assert_allclose(np.asarray(vb) / scale,
                                   np.asarray(va) / scale,
                                   atol=2e-4, err_msg=jtu.keystr(ka)
                                   if not isinstance(ka, str) else ka)
