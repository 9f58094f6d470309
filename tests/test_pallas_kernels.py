"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficientspeech_tpu.ops.pallas.folded_matmul import folded_matmul


def _oracle(x, W, b, w, valid, residual=None, pre_lrelu=False,
            accum=None, out_scale=None):
    t = x.shape[0]
    if pre_lrelu:
        x = np.where(x >= 0, x, x * 0.1)
    xp = np.pad(x, ((w, w), (0, 0)))
    window = np.concatenate([xp[i: i + t] for i in range(2 * w + 1)], axis=-1)
    y = window @ W + b
    if residual is not None:
        y = y + residual
    if accum is not None:
        y = y + accum
    if out_scale is not None:
        y = y * out_scale
    y[valid:] = 0.0
    return y


@pytest.mark.parametrize("t,d_in,d_out,w,valid,res,lrelu", [
    (64, 128, 256, 1, 50, False, False),
    (64, 128, 256, 1, 64, True, True),
    (100, 256, 128, 4, 77, True, False),
    (256, 512, 512, 2, 200, False, True),
])
def test_folded_matmul_interpret(t, d_in, d_out, w, valid, res, lrelu):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((t, d_in)).astype(np.float32)
    W = (rng.standard_normal(((2 * w + 1) * d_in, d_out)) * 0.05).astype(np.float32)
    b = rng.standard_normal((d_out,)).astype(np.float32)
    residual = (rng.standard_normal((t, d_out)).astype(np.float32)
                if res else None)

    got = folded_matmul(jnp.asarray(x), jnp.asarray(W), jnp.asarray(b), w,
                        jnp.int32(valid),
                        residual=None if residual is None
                        else jnp.asarray(residual),
                        pre_lrelu=lrelu, tm=32, tn=128, interpret=True)
    want = _oracle(x, W, b, w, valid, residual, lrelu)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("t,d_in,d_out,w,valid,res,scale", [
    (64, 128, 128, 1, 50, True, None),      # accum only
    (64, 128, 128, 1, 64, True, 1.0 / 3),   # accum + stage-sum scale
    (100, 128, 128, 2, 77, False, 0.5),     # accum without residual
])
def test_folded_matmul_accum_interpret(t, d_in, d_out, w, valid, res, scale):
    """Second-residual (stage-sum) + output-scale epilogue vs the oracle —
    the fused xs+v / num_kernels path of folded_plan_apply."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((t, d_in)).astype(np.float32)
    W = (rng.standard_normal(((2 * w + 1) * d_in, d_out)) * 0.05
         ).astype(np.float32)
    b = rng.standard_normal((d_out,)).astype(np.float32)
    residual = (rng.standard_normal((t, d_out)).astype(np.float32)
                if res else None)
    accum = rng.standard_normal((t, d_out)).astype(np.float32)

    got = folded_matmul(jnp.asarray(x), jnp.asarray(W), jnp.asarray(b), w,
                        jnp.int32(valid),
                        residual=None if residual is None
                        else jnp.asarray(residual),
                        accum=jnp.asarray(accum), out_scale=scale,
                        pre_lrelu=True, tm=32, tn=128, interpret=True)
    want = _oracle(x, W, b, w, valid, residual, True, accum, scale)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("t,w,tm,res,lrelu", [
    (300, 1, 64, True, True),
    (129, 2, 128, True, False),
    (50, 13, 256, False, True),   # tm > t, window wider than the input
])
def test_folded_matmul_window_dma_interpret(t, w, tm, res, lrelu):
    """window_dma variant (interpret runs its same-step sequential form;
    the cross-step pipeline is validated on-chip by grid_sweep's
    numerics probe — measured bit-exact vs the accumulate-loop kernel)."""
    d_in = d_out = 128
    rng = np.random.default_rng(1)
    x = rng.standard_normal((t, d_in)).astype(np.float32)
    W = (rng.standard_normal(((2 * w + 1) * d_in, d_out)) * 0.05
         ).astype(np.float32)
    b = rng.standard_normal((d_out,)).astype(np.float32)
    residual = (rng.standard_normal((t, d_out)).astype(np.float32)
                if res else None)
    valid = int(t * 0.9)
    got = folded_matmul(jnp.asarray(x), jnp.asarray(W), jnp.asarray(b), w,
                        jnp.int32(valid),
                        residual=None if residual is None
                        else jnp.asarray(residual),
                        pre_lrelu=lrelu, tm=tm, tn=128, window_dma=True,
                        interpret=True)
    want = _oracle(x, W, b, w, valid, residual, lrelu)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_layer_norm_fused_matches_reference():
    """Fused LN kernel (interpret): forward bit-parity in bf16 and
    grad parity for x/scale/bias vs the plain-module math."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from efficientspeech_tpu.ops.pallas.layer_norm import layer_norm_fused

    rng = np.random.default_rng(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.normal(size=(5, 21, 128)) * 2 + 0.5, dtype)
        s = jnp.asarray(rng.normal(size=(128,)) * 0.5 + 1, jnp.float32)
        b = jnp.asarray(rng.normal(size=(128,)) * 0.1, jnp.float32)

        def ref_ln(x, s, b):
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, -1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), -1, keepdims=True)
            return ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * s
                    + b).astype(x.dtype)

        y1 = layer_norm_fused(x, s, b, 1e-5, 16, True)
        y2 = ref_ln(x, s, b)
        np.testing.assert_allclose(
            np.asarray(y1, np.float32), np.asarray(y2, np.float32),
            atol=1e-6 if dtype == jnp.float32 else 0.0)

        g1 = jax.grad(lambda *a: jnp.sum(jnp.sin(layer_norm_fused(
            *a, 1e-5, 16, True).astype(jnp.float32))),
            argnums=(0, 1, 2))(x, s, b)
        g2 = jax.grad(lambda *a: jnp.sum(jnp.sin(ref_ln(
            *a).astype(jnp.float32))), argnums=(0, 1, 2))(x, s, b)
        for a, c in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(c, np.float32),
                                       rtol=1e-3, atol=1e-4)


def test_mel_decoder_fused_norm_and_remat_match_plain():
    """MelDecoder with fused Pallas norms + Phoneme2Mel remat == plain
    path (same params), forward and gradients."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from efficientspeech_tpu.config import ModelConfig
    from efficientspeech_tpu.models.mel_decoder import MelDecoder

    cfg = ModelConfig.preset("tiny", max_phoneme_len=16, max_mel_len=64)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 64, 4 * cfg.filter_dim)),
                    jnp.float32)
    mask = jnp.zeros((2, 64), bool).at[:, 50:].set(True)

    plain = MelDecoder(cfg, dtype=jnp.float32)
    fused = MelDecoder(cfg, dtype=jnp.float32, fused_norm=True,
                       fused_interpret=True)
    params = plain.init(jax.random.PRNGKey(0), x)["params"]

    y1 = plain.apply({"params": params}, x, frame_pad_mask=mask)
    y2 = fused.apply({"params": params}, x, frame_pad_mask=mask)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=2e-5, atol=2e-5)

    g1 = jax.grad(lambda p: jnp.sum(jnp.abs(plain.apply(
        {"params": p}, x, frame_pad_mask=mask))))(params)
    g2 = jax.grad(lambda p: jnp.sum(jnp.abs(fused.apply(
        {"params": p}, x, frame_pad_mask=mask))))(params)
    flat2 = {str(k): v for k, v in
             jax.tree_util.tree_leaves_with_path(g2)}
    for k1, a in jax.tree_util.tree_leaves_with_path(g1):
        np.testing.assert_allclose(np.asarray(a),
                                   np.asarray(flat2[str(k1)]),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=str(k1))


def test_decoder_block_fused_matches_plain():
    """Fused decoder-block kernel (interpret): identical param tree, f32
    forward/grad parity, bf16 forward within rounding-order tolerance."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from efficientspeech_tpu.config import ModelConfig
    from efficientspeech_tpu.models.mel_decoder import MelDecoder

    cfg = ModelConfig.preset("tiny", max_phoneme_len=16, max_mel_len=32)
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.normal(size=(3, 32, 4 * cfg.filter_dim)),
                      jnp.float32)
    mask = jnp.asarray(rng.random((3, 32)) < 0.2)

    plain = MelDecoder(cfg, dtype=jnp.float32)
    fused = MelDecoder(cfg, dtype=jnp.float32, fused_block=True,
                       fused_interpret=True, fused_block_tg=2)
    p1 = plain.init(jax.random.PRNGKey(0), x32, mask)["params"]
    p2 = fused.init(jax.random.PRNGKey(0), x32, mask)["params"]

    # identical tree: same paths, same values (checkpoints interchange)
    k1 = [(jtu.keystr(k), np.asarray(v))
          for k, v in jtu.tree_flatten_with_path(p1)[0]]
    k2 = [(jtu.keystr(k), np.asarray(v))
          for k, v in jtu.tree_flatten_with_path(p2)[0]]
    assert [a for a, _ in k1] == [a for a, _ in k2]
    for (ka, va), (_, vb) in zip(k1, k2):
        np.testing.assert_array_equal(va, vb, err_msg=ka)

    # f32: near-exact forward and gradient parity
    y1 = plain.apply({"params": p1}, x32, mask)
    y2 = fused.apply({"params": p1}, x32, mask)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)

    def loss(model, p):
        return jnp.sum(model.apply({"params": p}, x32, mask) ** 2)

    g1 = jax.grad(lambda p: loss(plain, p))(p1)
    g2 = jax.grad(lambda p: loss(fused, p))(p1)
    for (ka, va), (_, vb) in zip(jtu.tree_flatten_with_path(g1)[0],
                                 jtu.tree_flatten_with_path(g2)[0]):
        scale = np.max(np.abs(np.asarray(va))) + 1e-12
        np.testing.assert_allclose(np.asarray(vb) / scale,
                                   np.asarray(va) / scale,
                                   atol=1e-5, err_msg=ka)

    # bf16: rounding-order tolerance on the forward
    xb = x32.astype(jnp.bfloat16)
    pb = MelDecoder(cfg, dtype=jnp.bfloat16).init(
        jax.random.PRNGKey(0), xb, mask)["params"]
    yb1 = MelDecoder(cfg, dtype=jnp.bfloat16).apply(
        {"params": pb}, xb, mask)
    yb2 = MelDecoder(cfg, dtype=jnp.bfloat16, fused_block=True,
                     fused_interpret=True, fused_block_tg=2).apply(
        {"params": pb}, xb, mask)
    np.testing.assert_allclose(np.asarray(yb1, np.float32),
                               np.asarray(yb2, np.float32),
                               atol=0.06)


def test_decoder_block_tg_fits_vmem_budget():
    """Batch-group sizes self-clamp to the calibrated scoped-VMEM element
    budget: the tiny preset keeps its tuned tg=4/tg_bwd=2; the C=256 mel
    decoders of small/base (min(4*dim,256)) halve both — discovered when
    the small preset failed Mosaic compile at tg=4 (25.13M > 16M)."""
    from efficientspeech_tpu.ops.pallas.decoder_block import (
        _BWD_ELEM_BUDGET, _FWD_ELEM_BUDGET, _fit_tg)

    assert _fit_tg(4, 1152, 128, _FWD_ELEM_BUDGET) == 4   # tiny fwd
    assert _fit_tg(2, 1152, 128, _BWD_ELEM_BUDGET) == 2   # tiny bwd
    assert _fit_tg(4, 1024, 256, _FWD_ELEM_BUDGET) == 2   # small/base fwd
    assert _fit_tg(2, 1024, 256, _BWD_ELEM_BUDGET) == 1   # small/base bwd
    assert _fit_tg(4, 4096, 512, _FWD_ELEM_BUDGET) == 1   # never below 1
