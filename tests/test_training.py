"""Training-step tests: loss parity vs reference formulas, multi-device DP
step on the virtual 8-CPU mesh, checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficientspeech_tpu.config import ModelConfig, TrainConfig
from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel
from efficientspeech_tpu.parallel import make_mesh, shard_batch
from efficientspeech_tpu.training.losses import compute_losses
from efficientspeech_tpu.training.schedule import warmup_cosine_schedule
from efficientspeech_tpu.training.state import create_train_state, make_optimizer
from efficientspeech_tpu.training.step import make_train_step


def _toy_batch(rng, b=4, n=32, m=128):
    lens = rng.integers(8, n + 1, size=b)
    phoneme = np.zeros((b, n), np.int32)
    pad_mask = np.ones((b, n), bool)
    duration = np.zeros((b, n), np.int32)
    for i, L in enumerate(lens):
        phoneme[i, :L] = rng.integers(1, 152, size=L)
        pad_mask[i, :L] = False
        duration[i, :L] = rng.integers(1, max(2, m // L), size=L)
    mel_len = duration.sum(1)
    return {
        "phoneme": phoneme,
        "phoneme_mask": pad_mask,
        "pitch": (rng.normal(size=(b, n)) * ~pad_mask).astype(np.float32),
        "energy": (rng.normal(size=(b, n)) * ~pad_mask).astype(np.float32),
        "duration": duration,
        "mel": rng.normal(size=(b, m, 80)).astype(np.float32),
        "mel_mask": np.arange(m)[None, :] >= mel_len[:, None],
    }


def test_masked_losses_match_masked_select():
    """mask-weighted means == reference masked_select means (model.py:167-209)."""
    rng = np.random.default_rng(0)
    batch = _toy_batch(rng)
    b, n = batch["phoneme"].shape
    m = batch["mel"].shape[1]
    pred = {
        "mel": jnp.asarray(rng.normal(size=(b, m, 80)).astype(np.float32)),
        "pitch": jnp.asarray(rng.normal(size=(b, n, 1)).astype(np.float32)),
        "energy": jnp.asarray(rng.normal(size=(b, n, 1)).astype(np.float32)),
        "duration": jnp.asarray(
            np.abs(rng.normal(size=(b, n, 1))).astype(np.float32)),
    }
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = compute_losses(pred, batch_j)

    pv = ~batch["phoneme_mask"]
    mv = ~batch["mel_mask"]
    mel_ref = np.abs(np.asarray(pred["mel"]) - batch["mel"])[mv].mean()
    pitch_ref = ((np.asarray(pred["pitch"])[..., 0] - batch["pitch"])[pv] ** 2).mean()
    energy_ref = ((np.asarray(pred["energy"])[..., 0] - batch["energy"])[pv] ** 2).mean()
    dur_ref = ((np.log(np.asarray(pred["duration"])[..., 0] + 1)
                - np.log(batch["duration"].astype(np.float32) + 1))[pv] ** 2).mean()
    np.testing.assert_allclose(float(losses["mel_loss"]), mel_ref, rtol=1e-5)
    np.testing.assert_allclose(float(losses["pitch_loss"]), pitch_ref, rtol=1e-5)
    np.testing.assert_allclose(float(losses["energy_loss"]), energy_ref, rtol=1e-5)
    np.testing.assert_allclose(float(losses["duration_loss"]), dur_ref, rtol=1e-5)
    total = 10 * mel_ref + 2 * pitch_ref + 2 * energy_ref + dur_ref
    np.testing.assert_allclose(float(losses["loss"]), total, rtol=1e-5)


def test_schedule_matches_reference_lambda():
    """warmup-cosine factor == reference lr_lambda (model.py:91-101)."""
    import math

    sched = warmup_cosine_schedule(1e-3, warmup_epochs=50, total_epochs=5000,
                                   steps_per_epoch=10)
    for epoch in [0, 1, 25, 49, 50, 100, 2500, 4999]:
        step = epoch * 10
        if epoch < 50:
            expect = 1e-3 * epoch / 50
        else:
            progress = (epoch - 50) / (5000 - 50)
            expect = 1e-3 * 0.5 * (1 + math.cos(math.pi * progress))
        np.testing.assert_allclose(float(sched(step)), expect, rtol=1e-5,
                                   atol=1e-9, err_msg=f"epoch {epoch}")


def test_train_step_runs_and_descends():
    rng = np.random.default_rng(1)
    cfg = ModelConfig.preset("tiny", max_phoneme_len=32, max_mel_len=128)
    model = Phoneme2Mel(cfg)
    batch = _toy_batch(rng)
    train_cfg = TrainConfig(batch_size=4, lr=1e-3)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["phoneme"]),
        jnp.asarray(batch["phoneme_mask"]),
        pitch_target=jnp.asarray(batch["pitch"]),
        energy_target=jnp.asarray(batch["energy"]),
        duration_target=jnp.asarray(batch["duration"]), train=True)["params"]
    tx = make_optimizer(train_cfg, steps_per_epoch=10)
    state = create_train_state({"phoneme2mel": params}, train_cfg,
                               steps_per_epoch=10)
    step_fn = make_train_step(model, tx, donate=False)

    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for _ in range(30):
        state, metrics = step_fn(state, batch_j)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # overfitting one batch must reduce the loss
    assert losses[-1] < losses[0], (losses[0], losses[-1])


def test_train_step_multichip_dp():
    """8-virtual-device data-parallel step == single-device step numerics."""
    assert jax.device_count() >= 8, "conftest should give 8 CPU devices"
    rng = np.random.default_rng(2)
    cfg = ModelConfig.preset("tiny", max_phoneme_len=32, max_mel_len=128)
    model = Phoneme2Mel(cfg)
    batch = _toy_batch(rng, b=8)
    train_cfg = TrainConfig(batch_size=8)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["phoneme"]),
        jnp.asarray(batch["phoneme_mask"]),
        pitch_target=jnp.asarray(batch["pitch"]),
        energy_target=jnp.asarray(batch["energy"]),
        duration_target=jnp.asarray(batch["duration"]), train=True)["params"]
    tx = make_optimizer(train_cfg, steps_per_epoch=10)

    # single-device
    state1 = create_train_state({"phoneme2mel": params}, train_cfg, 10)
    step1 = make_train_step(model, tx, donate=False)
    state1, m1 = step1(state1, {k: jnp.asarray(v) for k, v in batch.items()})

    # 8-way DP mesh
    mesh = make_mesh(data_parallel=8, model_parallel=1)
    from jax.sharding import NamedSharding, PartitionSpec as P

    state8 = create_train_state({"phoneme2mel": params}, train_cfg, 10)
    state8 = jax.device_put(state8, NamedSharding(mesh, P()))
    step8 = make_train_step(model, tx, mesh=mesh, donate=False)
    state8, m8 = step8(state8, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    # updated parameters must agree between 1-device and 8-device runs
    flat1 = jax.tree_util.tree_leaves(jax.device_get(state1.params))
    flat8 = jax.tree_util.tree_leaves(jax.device_get(state8.params))
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_checkpoint_roundtrip(tmp_path):
    from efficientspeech_tpu.training.checkpoint import (
        latest_checkpoint, restore_checkpoint, save_checkpoint)

    rng = np.random.default_rng(3)
    cfg = ModelConfig.preset("tiny", max_phoneme_len=32, max_mel_len=128)
    model = Phoneme2Mel(cfg)
    batch = _toy_batch(rng)
    train_cfg = TrainConfig(batch_size=4)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["phoneme"]),
        jnp.asarray(batch["phoneme_mask"]),
        pitch_target=jnp.asarray(batch["pitch"]),
        energy_target=jnp.asarray(batch["energy"]),
        duration_target=jnp.asarray(batch["duration"]), train=True)["params"]
    tx = make_optimizer(train_cfg, steps_per_epoch=10)
    state = create_train_state({"phoneme2mel": params}, train_cfg, 10)
    step_fn = make_train_step(model, tx, donate=False)
    state, _ = step_fn(state, {k: jnp.asarray(v) for k, v in batch.items()})

    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state)
    path = latest_checkpoint(ckpt_dir)
    assert path is not None

    fresh = create_train_state({"phoneme2mel": params}, train_cfg, 10)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state.params)),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(a, b)


def test_flat_optimizer_matches_tree():
    """flat_wrap'd AdamW (one flattened vector) produces bit-identical
    updates to the tree-shaped optimizer — the math is elementwise."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from efficientspeech_tpu.config import TrainConfig
    from efficientspeech_tpu.training.state import make_optimizer

    rng = np.random.default_rng(0)
    params = {"a": {"w": jnp.asarray(rng.normal(size=(7, 5)), jnp.float32),
                    "b": jnp.asarray(rng.normal(size=(5,)), jnp.float32)},
              "c": jnp.asarray(rng.normal(size=(3, 2, 4)), jnp.float32)}
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params)

    cfg = TrainConfig(batch_size=4)
    tx_tree = make_optimizer(cfg, 10, flat=False)
    tx_flat = make_optimizer(cfg, 10, flat=True)

    st_t = tx_tree.init(params)
    st_f = tx_flat.init(params)
    pt, pf = params, params
    for _ in range(3):
        ut, st_t = tx_tree.update(grads, st_t, pt)
        uf, st_f = tx_flat.update(grads, st_f, pf)
        import optax
        pt = optax.apply_updates(pt, ut)
        pf = optax.apply_updates(pf, uf)
        for a, b in zip(jax.tree_util.tree_leaves(ut),
                        jax.tree_util.tree_leaves(uf)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
