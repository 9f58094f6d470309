#!/usr/bin/env python3
"""Training CLI (reference: train.py:33-78).

    python train.py --preset tiny --preprocess-config configs/ljspeech.yaml \
        --batch-size 128 --max-epochs 5000

Data parallelism: --data-parallel N shards the batch over an N-device mesh
(replacing the reference's Lightning `--devices N` DDP).
"""

import argparse
import time


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="tiny",
                        choices=["tiny", "small", "base"])
    parser.add_argument("--preprocess-config",
                        default="configs/ljspeech.yaml")
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--weight-decay", type=float, default=1e-5)
    parser.add_argument("--max-epochs", type=int, default=5000)
    parser.add_argument("--warmup-epochs", type=int, default=50)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--data-parallel", type=int, default=None,
                        help="mesh data axis size (default: all devices)")
    parser.add_argument("--precision", default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--max-phoneme-len", type=int, default=128)
    parser.add_argument("--max-mel-len", type=int, default=1024)
    parser.add_argument("--checkpoint-dir", default="checkpoints")
    parser.add_argument("--log-dir", default="logs")
    parser.add_argument("--wav-path", default="wavs")
    parser.add_argument("--hifigan-checkpoint",
                        default="/root/reference/hifigan/LJ_V2/generator_v2")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--resume", action="store_true",
                        help="resume from latest checkpoint in checkpoint-dir")
    parser.add_argument("--device-data", action="store_true",
                        help="upload the whole preprocessed corpus to HBM "
                             "once and gather batches on device (per-step "
                             "host traffic drops to the batch indices; "
                             "removes the host-feed bottleneck)")
    parser.add_argument("--device-data-bf16-mel", action="store_true",
                        help="store cached mel targets as bf16 (halves the "
                             "cache footprint and upload time)")
    parser.add_argument("--device-data-scan-steps", type=int, default=1,
                        help="with --device-data: optimizer steps per "
                             "dispatch (lax.scan); amortizes per-dispatch "
                             "overhead on tunneled links")
    from efficientspeech_tpu.config import add_arch_args

    add_arch_args(parser)
    return parser.parse_args()


def main():
    args = get_args()

    import os

    import jax
    import jax.numpy as jnp

    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from efficientspeech_tpu.config import (
        HifiGanConfig, ModelConfig, PreprocessConfig, TrainConfig,
        arch_overrides)
    from efficientspeech_tpu.parallel import make_mesh
    from efficientspeech_tpu.training.loop import Trainer

    preprocess_cfg = PreprocessConfig.from_yaml(args.preprocess_config)
    stats = preprocess_cfg.load_stats()
    model_cfg = ModelConfig.preset(
        args.preset,
        pitch_stats=tuple(stats["pitch"][:2]),
        energy_stats=tuple(stats["energy"][:2]),
        max_phoneme_len=args.max_phoneme_len,
        max_mel_len=args.max_mel_len,
        **arch_overrides(args))
    train_cfg = TrainConfig(
        lr=args.lr, weight_decay=args.weight_decay,
        batch_size=args.batch_size, max_epochs=args.max_epochs,
        warmup_epochs=args.warmup_epochs,
        precision=args.precision, seed=args.seed,
        checkpoint_dir=args.checkpoint_dir, log_dir=args.log_dir,
        wav_path=args.wav_path,
        device_data=args.device_data,
        device_cache_bf16_mel=args.device_data_bf16_mel,
        device_data_scan_steps=args.device_data_scan_steps)

    mesh = make_mesh(data_parallel=args.data_parallel)
    print(f"mesh: {mesh.shape} over {jax.device_count()} devices")

    hifigan_cfg, hifigan_params = HifiGanConfig(), None
    if os.path.isfile(args.hifigan_checkpoint):
        from efficientspeech_tpu.convert import load_hifigan_checkpoint

        cfg_json = os.path.join(os.path.dirname(args.hifigan_checkpoint),
                                "config.json")
        if os.path.isfile(cfg_json):
            hifigan_cfg = HifiGanConfig.from_json(cfg_json)
        hifigan_params = load_hifigan_checkpoint(
            args.hifigan_checkpoint,
            num_kernels=len(hifigan_cfg.resblock_kernel_sizes))

    trainer = Trainer(model_cfg, train_cfg, preprocess_cfg,
                      hifigan_cfg=hifigan_cfg, hifigan_params=hifigan_params,
                      dtype=jnp.bfloat16 if args.precision == "bf16"
                      else jnp.float32,
                      mesh=mesh)
    start = time.time()
    final_step = trainer.fit(max_epochs=args.max_epochs,
                             max_steps=args.max_steps)
    elapsed = time.time() - start
    print(f"Training done at step {final_step}: {elapsed:.2f}s "
          f"({elapsed/3600:.2f}h)")


if __name__ == "__main__":
    main()
