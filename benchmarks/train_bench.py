#!/usr/bin/env python3
"""Training-step throughput benchmark on synthetic data.

Reference anchor: tiny training is ~17 h for 5000 epochs of LJSpeech on one
A100 (reference: README.md:102) ≈ 8 steps/s at batch 128.

    python benchmarks/train_bench.py --preset tiny --batch-size 128 --steps 30
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="tiny")
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--max-phoneme-len", type=int, default=128)
    parser.add_argument("--max-mel-len", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--precision", default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--data-parallel", type=int, default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from efficientspeech_tpu.config import ModelConfig, TrainConfig
    from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel
    from efficientspeech_tpu.parallel import make_mesh, shard_batch
    from efficientspeech_tpu.training.state import (
        create_train_state, make_optimizer)
    from efficientspeech_tpu.training.step import make_train_step
    from efficientspeech_tpu.utils.host_init import host_init
    from jax.sharding import NamedSharding, PartitionSpec as P

    b, n, m = args.batch_size, args.max_phoneme_len, args.max_mel_len
    cfg = ModelConfig.preset(args.preset, max_phoneme_len=n, max_mel_len=m)
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    model = Phoneme2Mel(cfg, dtype=dtype)

    rng = np.random.default_rng(0)
    lens = rng.integers(n // 2, n + 1, size=b)
    phoneme = np.zeros((b, n), np.int32)
    pad_mask = np.ones((b, n), bool)
    duration = np.zeros((b, n), np.int32)
    for i, L in enumerate(lens):
        phoneme[i, :L] = rng.integers(1, 152, size=L)
        pad_mask[i, :L] = False
        duration[i, :L] = np.minimum(rng.integers(4, 9, size=L), m // L)
    mel_len = duration.sum(1)
    batch = {
        "phoneme": phoneme, "phoneme_mask": pad_mask,
        "pitch": (rng.normal(size=(b, n)) * ~pad_mask).astype(np.float32),
        "energy": (rng.normal(size=(b, n)) * ~pad_mask).astype(np.float32),
        "duration": duration,
        "mel": rng.normal(size=(b, m, 80)).astype(np.float32),
        "mel_mask": np.arange(m)[None, :] >= mel_len[:, None],
    }

    params = host_init(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, n), jnp.int32),
        jnp.ones((1, n), bool), pitch_target=jnp.zeros((1, n)),
        energy_target=jnp.zeros((1, n)),
        duration_target=jnp.ones((1, n), jnp.int32), train=True)["params"])

    train_cfg = TrainConfig(batch_size=b)
    tx = make_optimizer(train_cfg, 100)
    mesh = make_mesh(data_parallel=args.data_parallel)
    state = jax.device_put(
        create_train_state({"phoneme2mel": params}, train_cfg, 100),
        NamedSharding(mesh, P()))
    step_fn = make_train_step(model, tx, mesh=mesh)

    sharded = shard_batch(batch, mesh)
    state, metrics = step_fn(state, sharded)  # compile
    jax.block_until_ready(metrics)

    t0 = time.time()
    for _ in range(args.steps):
        state, metrics = step_fn(state, sharded)
    jax.block_until_ready(metrics)
    dt = (time.time() - t0) / args.steps
    print(f"step: {dt*1e3:.1f} ms  ->  {1/dt:.2f} steps/s "
          f"(batch {b}, {n} phonemes, {m} mel frames, {args.precision}, "
          f"mesh {mesh.shape})")
    print(f"epoch of 12588 utts: {12588/b*dt:.1f} s; "
          f"5000 epochs: {12588/b*dt*5000/3600:.1f} h "
          f"(reference: ~17 h on A100)")


if __name__ == "__main__":
    main()
