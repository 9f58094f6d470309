"""Multi-chip INFERENCE coverage (VERDICT round 1, item 7): data-sharded
batched predict (acoustic + folded vocoder) on the virtual 8-CPU mesh must
equal single-device numerics.  Mirrors __graft_entry__.dryrun_multichip's
inference check as a pytest."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from efficientspeech_tpu.config import HifiGanConfig, ModelConfig
from efficientspeech_tpu.models.hifigan import HifiGanGenerator
from efficientspeech_tpu.models.hifigan_folded import (
    fold_hifigan_device,
    folded_plan_apply,
)
from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel
from efficientspeech_tpu.parallel import make_mesh


def test_data_sharded_predict_matches_single_device():
    assert jax.device_count() >= 8, "conftest should give 8 CPU devices"
    mesh = make_mesh(data_parallel=4, model_parallel=2)

    cfg = ModelConfig.preset("tiny", max_phoneme_len=32, max_mel_len=128)
    model = Phoneme2Mel(cfg, dtype=jnp.float32)
    h_cfg = HifiGanConfig(upsample_rates=(8, 8),
                          upsample_kernel_sizes=(16, 16),
                          upsample_initial_channel=32,
                          resblock_kernel_sizes=(3,),
                          resblock_dilation_sizes=((1, 3),))
    gen = HifiGanGenerator(h_cfg, dtype=jnp.float32)
    h_params = gen.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 4, 80), jnp.float32))["params"]
    arrays, meta = fold_hifigan_device(h_params, h_cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    b, n = 8, 32
    phoneme = np.zeros((b, n), np.int32)
    pad_mask = np.ones((b, n), bool)
    for i, L in enumerate(rng.integers(8, n + 1, size=b)):
        phoneme[i, :L] = rng.integers(1, 152, size=L)
        pad_mask[i, :L] = False

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(phoneme),
                        jnp.asarray(pad_mask), train=False)["params"]

    def predict(p, arrs, ph, mask):
        pred = model.apply({"params": p}, ph, mask, train=False)
        mel_len = jnp.minimum(pred["mel_len"], pred["mel"].shape[1])
        wav = folded_plan_apply(arrs, meta, h_cfg, pred["mel"],
                                valid_len=mel_len, dtype=jnp.float32)
        return wav, pred["mel_len"]

    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))
    pj = jax.jit(predict, in_shardings=(repl, repl, dsh, dsh),
                 out_shardings=(dsh, dsh))
    wav_mc, len_mc = pj(params, arrays, phoneme, pad_mask)
    wav_1, len_1 = jax.jit(predict)(params, arrays, jnp.asarray(phoneme),
                                    jnp.asarray(pad_mask))

    np.testing.assert_array_equal(jax.device_get(len_mc),
                                  jax.device_get(len_1))
    np.testing.assert_allclose(jax.device_get(wav_mc),
                               jax.device_get(wav_1),
                               rtol=1e-5, atol=1e-5)
    # the sharded output really is distributed over the data axis
    assert len(wav_mc.sharding.device_set) >= 4
