"""Tensor-parallel shardings: a (data=2, model=2) mesh with column/row
parallel attention+FFN params must reproduce fully-replicated numerics."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from efficientspeech_tpu.config import ModelConfig, TrainConfig
from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel
from efficientspeech_tpu.parallel import make_mesh, shard_batch
from efficientspeech_tpu.parallel.sharding import (
    state_shardings,
    tp_param_shardings,
)
from efficientspeech_tpu.training.state import create_train_state, make_optimizer
from efficientspeech_tpu.training.step import make_train_step

from test_training import _toy_batch  # reuse the synthetic batch builder


def test_tp_rules_assign_model_axis():
    mesh = make_mesh(data_parallel=2, model_parallel=2)
    cfg = ModelConfig.preset("tiny", max_phoneme_len=32, max_mel_len=128)
    model = Phoneme2Mel(cfg)
    rng = np.random.default_rng(0)
    batch = _toy_batch(rng, b=4)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["phoneme"]),
        jnp.asarray(batch["phoneme_mask"]),
        pitch_target=jnp.asarray(batch["pitch"]),
        energy_target=jnp.asarray(batch["energy"]),
        duration_target=jnp.asarray(batch["duration"]), train=True)["params"]
    sh = tp_param_shardings({"phoneme2mel": params}, mesh)
    specs = jax.tree_util.tree_leaves_with_path(sh)
    sharded = [(p, s) for p, s in specs if s.spec != P()]
    assert sharded, "no parameters picked up TP shardings"
    names = {"/".join(str(x.key) for x in p if hasattr(x, "key"))
             for p, _ in sharded}
    assert any("qkv" in n for n in names)
    assert any("mlp1" in n for n in names)


def test_tp_step_matches_replicated():
    assert jax.device_count() >= 4
    rng = np.random.default_rng(2)
    cfg = ModelConfig.preset("tiny", max_phoneme_len=32, max_mel_len=128)
    model = Phoneme2Mel(cfg)
    batch = _toy_batch(rng, b=4)
    train_cfg = TrainConfig(batch_size=4)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["phoneme"]),
        jnp.asarray(batch["phoneme_mask"]),
        pitch_target=jnp.asarray(batch["pitch"]),
        energy_target=jnp.asarray(batch["energy"]),
        duration_target=jnp.asarray(batch["duration"]), train=True)["params"]
    tx = make_optimizer(train_cfg, 10)

    # replicated baseline (1 device)
    s1 = create_train_state({"phoneme2mel": params}, train_cfg, 10)
    step1 = make_train_step(model, tx, donate=False)
    s1, m1 = step1(s1, {k: jnp.asarray(v) for k, v in batch.items()})

    # DP×TP mesh
    mesh = make_mesh(data_parallel=2, model_parallel=2)
    s2 = create_train_state({"phoneme2mel": params}, train_cfg, 10)
    st_sh = state_shardings(s2, mesh)
    s2 = jax.device_put(s2, st_sh)
    step2 = make_train_step(model, tx, mesh=mesh, donate=False,
                            state_sharding=st_sh)
    s2, m2 = step2(s2, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s1.params)),
                    jax.tree_util.tree_leaves(jax.device_get(s2.params))):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-5)
