"""Sequence-parallel folded vocoder (frame axis sharded over the mesh with
halo exchange) must equal the single-device folded path exactly — including
validity masking across shard boundaries."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from efficientspeech_tpu.config import HifiGanConfig
from efficientspeech_tpu.models.hifigan import HifiGanGenerator
from efficientspeech_tpu.models.hifigan_folded import (
    fold_hifigan_device,
    folded_plan_apply,
)
from efficientspeech_tpu.parallel.seq_vocoder import seq_parallel_vocode


def _small_setup(key=1):
    cfg = HifiGanConfig(upsample_rates=(8, 8),
                        upsample_kernel_sizes=(16, 16),
                        upsample_initial_channel=32,
                        resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 3),))
    gen = HifiGanGenerator(cfg, dtype=jnp.float32)
    params = gen.init(jax.random.PRNGKey(key),
                      jnp.zeros((1, 4, 80), jnp.float32))["params"]
    arrays, meta = fold_hifigan_device(params, cfg, dtype=jnp.float32)
    return cfg, arrays, meta


@pytest.mark.parametrize("n_sp,t,valid", [(4, 16, 13), (8, 32, 29), (2, 16, 5)])
def test_seq_parallel_matches_single_device(n_sp, t, valid):
    assert jax.device_count() >= 8, "conftest should give 8 CPU devices"
    cfg, arrays, meta = _small_setup()
    mesh = Mesh(np.array(jax.devices()[:n_sp]), ("sp",))

    rng = np.random.default_rng(0)
    mel = rng.normal(-3, 2, size=(1, t, 80)).astype(np.float32)
    mel[0, valid:] = 0
    vl = jnp.asarray([valid], jnp.int32)

    ref = folded_plan_apply(arrays, meta, cfg, jnp.asarray(mel), vl,
                            dtype=jnp.float32)

    mel_sh = jax.device_put(mel, NamedSharding(mesh, P(None, "sp", None)))
    got = jax.jit(
        lambda a, m, v: seq_parallel_vocode(a, meta, cfg, m, mesh,
                                            valid_len=v, dtype=jnp.float32)
    )(arrays, mel_sh, vl)

    np.testing.assert_allclose(jax.device_get(got), jax.device_get(ref),
                               rtol=1e-5, atol=1e-5)
    # output really lives on all sp shards
    assert len(got.sharding.device_set) == n_sp


def test_seq_parallel_no_valid_len():
    cfg, arrays, meta = _small_setup(2)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    rng = np.random.default_rng(1)
    mel = rng.normal(-3, 2, size=(1, 16, 80)).astype(np.float32)

    ref = folded_plan_apply(arrays, meta, cfg, jnp.asarray(mel),
                            jnp.asarray([16], jnp.int32), dtype=jnp.float32)
    got = jax.jit(
        lambda a, m: seq_parallel_vocode(a, meta, cfg, m, mesh,
                                         valid_len=None, dtype=jnp.float32)
    )(arrays, jax.device_put(
        mel, NamedSharding(mesh, P(None, "sp", None))))
    np.testing.assert_allclose(jax.device_get(got), jax.device_get(ref),
                               rtol=1e-5, atol=1e-5)


def test_dp_sp_composed_matches_single_device():
    """Batch axis sharded over 'data' AND frame axis over 'sp' in one
    program: the composed (2, 4) mesh must equal the single-device path
    (halos ride only the sp dimension)."""
    cfg, arrays, meta = _small_setup(3)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "sp"))

    rng = np.random.default_rng(2)
    b, t = 4, 16
    mel = rng.normal(-3, 2, size=(b, t, 80)).astype(np.float32)
    valid = np.array([13, 16, 5, 9], np.int32)
    for i, v in enumerate(valid):
        mel[i, v:] = 0
    vl = jnp.asarray(valid)

    ref = folded_plan_apply(arrays, meta, cfg, jnp.asarray(mel), vl,
                            dtype=jnp.float32)
    mel_sh = jax.device_put(
        mel, NamedSharding(mesh, P("data", "sp", None)))
    vl_sh = jax.device_put(np.asarray(valid),
                           NamedSharding(mesh, P("data")))
    got = jax.jit(
        lambda a, m, v: seq_parallel_vocode(
            a, meta, cfg, m, mesh, valid_len=v, axis="sp",
            batch_axis="data", dtype=jnp.float32)
    )(arrays, mel_sh, vl_sh)
    np.testing.assert_allclose(jax.device_get(got), jax.device_get(ref),
                               rtol=1e-5, atol=1e-5)
    assert len(got.sharding.device_set) == 8
