#!/usr/bin/env python3
"""HiFi-GAN vocoder training CLI (adversarial fine-tuning on TPU).

The reference ships the discriminators + GAN losses as dead code
(reference: hifigan/models.py:137-291 — there is no vocoder trainer to
run); this CLI makes vocoder (fine-)training a first-class workflow:
random wav segments from the corpus, on-device mel targets, the full
LSGAN + feature-matching + 45·mel-L1 objective (training/vocoder.py),
mesh data-parallelism, orbax checkpoints with resume, and metrics.jsonl.

    python train_vocoder.py --preprocess-config config.yaml \
        --steps 1000 --batch-size 8 [--resume] [--init-generator PATH]
"""

import argparse
import glob
import json
import os
import time

import numpy as np


def find_wavs(config: dict):
    raw = config["path"]["raw_path"]
    wavs = sorted(glob.glob(os.path.join(raw, "**", "*.wav"),
                            recursive=True))
    if not wavs:  # fall back to the un-prepared corpus layout
        wavs = sorted(glob.glob(os.path.join(
            config["path"]["corpus_path"], "**", "*.wav"), recursive=True))
    return wavs


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--preprocess-config", required=True)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--segment", type=int, default=8192,
                        help="training crop in samples (HiFi-GAN default)")
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--data-parallel", type=int, default=1,
                        help="data-mesh size (must divide batch-size)")
    parser.add_argument("--init-generator", default=None,
                        help="warm-start generator weights: a HiFi-GAN "
                             "torch checkpoint (e.g. the bundled LJ_V2 "
                             "generator) or an orbax params dir")
    parser.add_argument("--checkpoint-dir", default="vocoder_ckpt")
    parser.add_argument("--log-dir", default="vocoder_logs")
    parser.add_argument("--checkpoint-every", type=int, default=500)
    parser.add_argument("--log-every", type=int, default=50)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--initial-channels", type=int, default=None,
                        help="override upsample_initial_channel (smaller "
                             "generators for smoke tests)")
    args = parser.parse_args(argv)
    if args.batch_size % args.data_parallel:
        parser.error(f"--batch-size ({args.batch_size}) must be divisible "
                     f"by --data-parallel ({args.data_parallel})")

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    import yaml

    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from efficientspeech_tpu.config import AudioConfig, HifiGanConfig
    from efficientspeech_tpu.data.preprocessor import load_wav
    from efficientspeech_tpu.parallel import make_mesh
    from efficientspeech_tpu.training.vocoder import (
        create_vocoder_trainer, make_mel_fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    config = yaml.safe_load(open(args.preprocess_config))
    audio = AudioConfig(
        sampling_rate=config["preprocessing"]["audio"]["sampling_rate"])
    cfg = HifiGanConfig() if args.initial_channels is None else \
        HifiGanConfig(upsample_initial_channel=args.initial_channels)
    mesh = make_mesh(data_parallel=args.data_parallel)

    wav_paths = find_wavs(config)
    if not wav_paths:
        raise SystemExit(f"no .wav files under "
                         f"{config['path']['raw_path']}")
    print(f"{len(wav_paths)} wav files; batch {args.batch_size} x "
          f"{args.segment} samples; mesh {dict(mesh.shape)}")

    gen, init, train_step = create_vocoder_trainer(
        cfg, audio, lr=args.lr, mesh=mesh)
    mel_of = jax.jit(make_mel_fn(audio))

    rng = jax.random.PRNGKey(args.seed)
    if args.init_generator:
        from efficientspeech_tpu.convert import load_hifigan_checkpoint

        gen_params = load_hifigan_checkpoint(args.init_generator)
        print(f"generator warm-started from {args.init_generator}")
    else:
        dummy = jnp.zeros((1, args.segment // audio.hop_length, 80))
        gen_params = gen.init(rng, dummy)["params"]
    state = init(rng, gen_params, segment=args.segment)
    state = jax.device_put(state, NamedSharding(mesh, P()))

    ckptr = ocp.StandardCheckpointer()
    start_step = 0
    if args.resume:
        steps = sorted(glob.glob(os.path.join(
            os.path.abspath(args.checkpoint_dir), "step_*")))
        if steps:
            template = jax.device_get(state)
            state = ckptr.restore(steps[-1], template)
            state = jax.device_put(state, NamedSharding(mesh, P()))
            start_step = int(jax.device_get(state.step))
            print(f"resumed from {steps[-1]} (step {start_step})")

    def save(state):
        step = int(jax.device_get(state.step))
        path = os.path.join(os.path.abspath(args.checkpoint_dir),
                            f"step_{step:08d}")
        ckptr.save(path, jax.device_get(state), force=True)
        ckptr.wait_until_finished()
        return path

    os.makedirs(args.log_dir, exist_ok=True)
    log_f = open(os.path.join(args.log_dir, "metrics.jsonl"), "a")

    # host-side sampler: random file, random crop (standard HiFi-GAN
    # recipe); mel targets are computed ON DEVICE from the same crop
    nrng = np.random.default_rng(args.seed + start_step)
    cache = {}

    def sample_batch():
        b = args.batch_size
        out = np.zeros((b, args.segment), np.float32)
        for i in range(b):
            path = wav_paths[int(nrng.integers(len(wav_paths)))]
            wav = cache.get(path)
            if wav is None:
                wav = load_wav(path, audio.sampling_rate)
                if len(cache) < 2000:
                    cache[path] = wav
            if len(wav) <= args.segment:
                out[i, : len(wav)] = wav
            else:
                s = int(nrng.integers(len(wav) - args.segment))
                out[i] = wav[s: s + args.segment]
        return out

    t0 = time.time()
    metrics = None
    for step in range(start_step + 1, args.steps + 1):
        wav = jnp.asarray(sample_batch())
        mel = mel_of(wav)[:, : args.segment // audio.hop_length, :]
        state, metrics = train_step(state, mel, wav)
        if step % args.log_every == 0 or step == args.steps:
            m = {k: round(float(v), 4)
                 for k, v in jax.device_get(metrics).items()}
            m.update(step=step, wall_secs=round(time.time() - t0, 1))
            print(m, flush=True)
            log_f.write(json.dumps(m) + "\n")
            log_f.flush()
        if step % args.checkpoint_every == 0:
            save(state)
    path = save(state)
    print(f"done at step {int(jax.device_get(state.step))}; "
          f"checkpoint {path}")


if __name__ == "__main__":
    main()
