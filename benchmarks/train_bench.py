#!/usr/bin/env python3
"""Training-step throughput benchmark on synthetic data.

Reference anchor: tiny training is ~17 h for 5000 epochs of LJSpeech on one
A100 (reference: README.md:102) ≈ 8 steps/s at batch 128.

Feed modes (--feed):
  resident      the SAME device batch every step — the pure device-step
                ceiling (no data movement at all)
  host          a host batch uploaded every step — the reference-style
                DataLoader feed (on tunneled rigs this is the measured
                bottleneck: each step ships ~42 MB at batch 128)
  device-cache  the device-resident corpus (data/device_cache.py): the
                whole dataset lives in HBM, each step uploads only B int32
                indices and gathers on device

    python benchmarks/train_bench.py --feed device-cache --steps 200
"""

import argparse
import time

import numpy as np


def synth_samples(rng, s, n, m):
    """Synthetic per-utterance features shaped like the preprocessed corpus."""
    lens = rng.integers(n // 2, n + 1, size=s)
    cache = {
        "phoneme": np.zeros((s, n), np.int32),
        "speaker": np.zeros((s,), np.int32),
        "pitch": rng.normal(size=(s, n)).astype(np.float32),
        "energy": rng.normal(size=(s, n)).astype(np.float32),
        "duration": np.zeros((s, n), np.int32),
        "mel": rng.normal(size=(s, m, 80)).astype(np.float32),
        "phoneme_len": lens.astype(np.int32),
        "mel_len": np.zeros((s,), np.int32),
    }
    for i, L in enumerate(lens):
        cache["phoneme"][i, :L] = rng.integers(1, 152, size=L)
        d = np.minimum(rng.integers(4, 9, size=L), m // L)
        cache["duration"][i, :L] = d
        cache["mel_len"][i] = d.sum()
        cache["pitch"][i, L:] = 0.0
        cache["energy"][i, L:] = 0.0
    return cache


def batch_from_cache(cache, idx, n, m):
    plen = cache["phoneme_len"][idx]
    mlen = cache["mel_len"][idx]
    return {
        "phoneme": cache["phoneme"][idx],
        "phoneme_mask": np.arange(n)[None, :] >= plen[:, None],
        "speaker": cache["speaker"][idx],
        "pitch": cache["pitch"][idx],
        "energy": cache["energy"][idx],
        "duration": cache["duration"][idx],
        "mel": cache["mel"][idx],
        "mel_mask": np.arange(m)[None, :] >= mlen[:, None],
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="tiny")
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--max-phoneme-len", type=int, default=128)
    parser.add_argument("--max-mel-len", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--precision", default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--data-parallel", type=int, default=None)
    parser.add_argument("--feed", default="resident",
                        choices=["resident", "host", "device-cache"])
    parser.add_argument("--corpus-size", type=int, default=2000,
                        help="synthetic corpus size for --feed device-cache")
    parser.add_argument("--scan-steps", type=int, default=1,
                        help="with --feed device-cache: optimizer steps per "
                             "dispatch (lax.scan over a (K,B) index matrix)")
    parser.add_argument("--no-fused-block", action="store_true",
                        help="disable the fused decoder-block Pallas kernel "
                             "(the Trainer's on-accelerator default is ON)")
    parser.add_argument("--flat-optimizer", action="store_true",
                        help="run AdamW over one flattened vector "
                             "(training/state.flat_wrap; measured ~0.3 ms "
                             "SLOWER than the tree default at batch 128)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from efficientspeech_tpu.config import ModelConfig, TrainConfig
    from efficientspeech_tpu.data.device_cache import (
        make_cached_multi_step, make_cached_train_step, upload_cache)
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
    on_accel = jax.default_backend() != "cpu"
    fused_block = on_accel and not args.no_fused_block
    model = Phoneme2Mel(cfg, dtype=dtype, fused_decoder_norm=on_accel,
                        fused_decoder_block=fused_block)

    rng = np.random.default_rng(0)
    s = args.corpus_size if args.feed == "device-cache" else b
    host_cache = synth_samples(rng, s, n, m)

    params = host_init(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, n), jnp.int32),
        jnp.ones((1, n), bool), pitch_target=jnp.zeros((1, n)),
        energy_target=jnp.zeros((1, n)),
        duration_target=jnp.ones((1, n), jnp.int32), train=True)["params"])

    train_cfg = TrainConfig(batch_size=b,
                            flat_optimizer=args.flat_optimizer)
    tx = make_optimizer(train_cfg, 100)
    mesh = make_mesh(data_parallel=args.data_parallel)
    state = jax.device_put(
        create_train_state({"phoneme2mel": params}, train_cfg, 100),
        NamedSharding(mesh, P()))

    if args.feed == "device-cache":
        cached_step = make_cached_train_step(model, tx, mesh=mesh)
        t_up = time.time()
        dev_cache = upload_cache(host_cache, mesh=mesh)
        jax.block_until_ready(dev_cache["mel"])
        up_mb = sum(v.nbytes for v in host_cache.values()) / 2**20
        print(f"cache upload: {up_mb:.0f} MB in {time.time()-t_up:.1f} s "
              f"({s} utterances)")

        idx0 = rng.integers(0, s, size=b).astype(np.int32)
        state, metrics = cached_step(state, dev_cache, idx0)  # compile
        print("compiled; loss:", float(jax.device_get(metrics["loss"])))

        if args.scan_steps > 1:
            K = args.scan_steps
            multi = make_cached_multi_step(model, tx, mesh=mesh)
            imat = np.stack([rng.permutation(s)[:b].astype(np.int32)
                             for _ in range(K)])
            state, ms = multi(state, dev_cache, imat)  # compile
            print("scan compiled; loss:",
                  float(jax.device_get(ms["loss"][-1])))
            n_chunks = max(1, args.steps // K)
            imats = [np.stack([rng.permutation(s)[:b].astype(np.int32)
                               for _ in range(K)])
                     for _ in range(n_chunks)]
            t0 = time.time()
            for im in imats:
                state, ms = multi(state, dev_cache, im)
            jax.device_get(ms["loss"])
            dt = (time.time() - t0) / (n_chunks * K)
        else:
            idxs = [rng.permutation(s)[:b].astype(np.int32)
                    for _ in range(args.steps)]
            t0 = time.time()
            for idx in idxs:
                state, metrics = cached_step(state, dev_cache, idx)
            jax.device_get(metrics["loss"])  # barrier (device_get, not block)
            dt = (time.time() - t0) / args.steps
    else:
        step_fn = make_train_step(model, tx, mesh=mesh)
        batch = batch_from_cache(host_cache, np.arange(b) % s, n, m)
        sharded = shard_batch(batch, mesh)
        state, metrics = step_fn(state, sharded)  # compile
        jax.block_until_ready(metrics)

        t0 = time.time()
        for i in range(args.steps):
            if args.feed == "host":
                # fresh upload every step (rotate rows so args vary)
                batch = batch_from_cache(
                    host_cache, (np.arange(b) + i) % s, n, m)
                sharded = shard_batch(batch, mesh)
            state, metrics = step_fn(state, sharded)
        jax.device_get(metrics["loss"])
        dt = (time.time() - t0) / args.steps

    print(f"step: {dt*1e3:.1f} ms  ->  {1/dt:.2f} steps/s "
          f"(feed {args.feed}, batch {b}, {n} phonemes, {m} mel frames, "
          f"{args.precision}, mesh {mesh.shape})")
    print(f"epoch of 12588 utts: {12588/b*dt:.1f} s; "
          f"5000 epochs: {12588/b*dt*5000/3600:.1f} h "
          f"(reference: ~17 h on A100)")


if __name__ == "__main__":
    main()
