"""Unit tests: conv primitives vs torch semantics, length regulator vs a
numpy repeat_interleave oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from efficientspeech_tpu.ops.conv import conv1d, conv_transpose1d
from efficientspeech_tpu.ops.length_regulator import length_regulate

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("stride,padding,dilation,groups", [
    (1, 0, 1, 1),
    (1, 1, 1, 1),
    (2, 0, 1, 1),
    (2, 1, 1, 1),
    (1, 2, 1, 8),     # depthwise-ish
    (1, 3, 3, 1),     # dilated (hifigan MRF)
    (1, 7, 1, 16),    # grouped
])
def test_conv1d_matches_torch(stride, padding, dilation, groups):
    rng = np.random.default_rng(0)
    b, t, cin, cout, k = 2, 33, 16, 16, 3
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((cout, cin // groups, k)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)

    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(w),
        torch.from_numpy(bias), stride=stride, padding=padding,
        dilation=dilation, groups=groups).numpy().transpose(0, 2, 1)

    got = conv1d(jnp.asarray(x), jnp.asarray(w.transpose(2, 1, 0)),
                 jnp.asarray(bias), stride=stride, padding=padding,
                 dilation=dilation, groups=groups)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("stride,padding,k", [
    (2, 1, 3),     # Fuse upsampler (kernel_size=3, stride=2)
    (8, 4, 16),    # hifigan up stage
    (2, 1, 4),     # hifigan up stage
    (1, 0, 3),
])
def test_conv_transpose1d_matches_torch(stride, padding, k):
    rng = np.random.default_rng(1)
    b, t, cin, cout = 2, 19, 8, 12
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((cin, cout, k)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)

    ref = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(w),
        torch.from_numpy(bias), stride=stride,
        padding=padding).numpy().transpose(0, 2, 1)

    got = conv_transpose1d(jnp.asarray(x), jnp.asarray(w.transpose(2, 0, 1)),
                           jnp.asarray(bias), stride=stride, padding=padding)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)


def test_length_regulator_matches_repeat_interleave():
    rng = np.random.default_rng(2)
    b, n, c, m = 3, 11, 5, 64
    features = rng.standard_normal((b, n, c)).astype(np.float32)
    durations = rng.integers(0, 7, size=(b, n)).astype(np.int32)

    frames, valid, mel_len = length_regulate(
        jnp.asarray(features), jnp.asarray(durations), m)
    frames, valid, mel_len = map(np.asarray, (frames, valid, mel_len))

    for i in range(b):
        expect = np.repeat(features[i], durations[i], axis=0)
        L = expect.shape[0]
        assert mel_len[i] == L
        np.testing.assert_array_equal(frames[i, :L], expect)
        assert frames[i, L:].sum() == 0.0
        np.testing.assert_array_equal(valid[i], np.arange(m) < L)


def test_length_regulator_overflow_clamps():
    # durations summing beyond max_mel_len: frames fill the static buffer,
    # mel_len reports the true (larger) total
    features = jnp.ones((1, 4, 2))
    durations = jnp.array([[10, 10, 10, 10]])
    frames, valid, mel_len = length_regulate(features, durations, 16)
    assert int(mel_len[0]) == 40
    assert bool(valid.all())
    assert np.asarray(frames).shape == (1, 16, 2)


def test_length_regulate_via_matmul_bit_exact():
    """One-hot-matmul expansion (the scatter-free training path) is
    BIT-EXACT vs the gather for bf16 features, including all-zero
    durations and overflow past max_mel_len."""
    import numpy as np

    import jax.numpy as jnp

    from efficientspeech_tpu.ops.length_regulator import length_regulate

    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.normal(size=(3, 17, 32)), jnp.bfloat16)
    for durs in (rng.integers(0, 5, size=(3, 17)),
                 np.zeros((3, 17), np.int64),
                 np.full((3, 17), 9)):         # 153 frames > M=64
        d = jnp.asarray(durs, jnp.int32)
        a = length_regulate(f, d, 64)
        b = length_regulate(f, d, 64, via_matmul=True)
        assert (a[0] == b[0]).all()
        assert (a[1] == b[1]).all() and (a[2] == b[2]).all()
    # f32 features fall back to the gather (matmul would round)
    f32 = f.astype(jnp.float32)
    c = length_regulate(f32, jnp.asarray(durs, jnp.int32), 64,
                        via_matmul=True)
    ref = length_regulate(f32, jnp.asarray(durs, jnp.int32), 64)
    assert (c[0] == ref[0]).all()
