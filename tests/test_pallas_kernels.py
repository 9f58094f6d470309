"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficientspeech_tpu.ops.pallas.folded_matmul import folded_matmul


def _oracle(x, W, b, w, valid, residual=None, pre_lrelu=False):
    t = x.shape[0]
    if pre_lrelu:
        x = np.where(x >= 0, x, x * 0.1)
    xp = np.pad(x, ((w, w), (0, 0)))
    window = np.concatenate([xp[i: i + t] for i in range(2 * w + 1)], axis=-1)
    y = window @ W + b
    if residual is not None:
        y = y + residual
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
