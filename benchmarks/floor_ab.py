#!/usr/bin/env python3
"""Reconstruction-floor A/B: the same trained acoustic model scored with
the stock LJ_V2 generator vs the --from-acoustic fine-tuned generator.

VERDICT r4 next #4 asked for floor-referenced quality numbers at scale:
``mcd_floor_db`` (ground-truth mel → vocoder → wav → mel, same DTW) is
the part of val MCD no acoustic model can remove.  On the synthetic
scale corpus the stock LJ_V2 floor is *above* the model's mel-domain
MCD — the vocoder, not the acoustic model, is the quality limiter —
and the LJ_FT-style fine-tune (train_vocoder.py --from-acoustic,
the recipe behind the reference's bundled LJ_FT_T2_V2 weights) is
what moves it.  This script measures exactly that movement.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/floor_ab.py \
        --preprocess-config configs/scale13k.yaml \
        --acoustic-ckpt outputs/r5_acoustic/ckpt \
        --vocoder-ckpt outputs/r5_voc/ckpt \
        --wav-root outputs/r5_acoustic/listening

Wav dumps (prediction*.wav + reconstruction*.wav per vocoder) land under
--wav-root/<stock|finetuned>/ — the listening set the reference's
validation dump produces (reference: model.py:246-271).
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preprocess-config", required=True)
    ap.add_argument("--acoustic-ckpt", required=True)
    ap.add_argument("--vocoder-ckpt", default="",
                    help="orbax dir of train_vocoder.py step_* checkpoints "
                         "(VocoderTrainState); empty = stock-only")
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--hifigan-checkpoint",
                    default="/root/reference/hifigan/LJ_V2/generator_v2")
    ap.add_argument("--wav-root", default="outputs/floor_ab")
    ap.add_argument("--quality-n", type=int, default=16)
    args = ap.parse_args()

    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from efficientspeech_tpu.config import (
        HifiGanConfig, ModelConfig, PreprocessConfig, TrainConfig)
    from efficientspeech_tpu.convert import load_hifigan_checkpoint
    from efficientspeech_tpu.parallel import make_mesh
    from efficientspeech_tpu.training.checkpoint import latest_checkpoint
    from efficientspeech_tpu.training.loop import Trainer

    pre_cfg = PreprocessConfig.from_yaml(args.preprocess_config)
    stats = pre_cfg.load_stats()
    model_cfg = ModelConfig.preset(
        args.preset, pitch_stats=tuple(stats["pitch"][:2]),
        energy_stats=tuple(stats["energy"][:2]))
    train_cfg = TrainConfig(
        batch_size=args.batch_size,
        checkpoint_dir=args.acoustic_ckpt,
        log_dir=os.path.join(args.wav_root, "logs"),
        wav_path=os.path.join(args.wav_root, "stock"))

    cfg_json = os.path.join(os.path.dirname(args.hifigan_checkpoint),
                            "config.json")
    hifigan_cfg = (HifiGanConfig.from_json(cfg_json)
                   if os.path.isfile(cfg_json) else HifiGanConfig())
    stock = load_hifigan_checkpoint(
        args.hifigan_checkpoint,
        num_kernels=len(hifigan_cfg.resblock_kernel_sizes))

    trainer = Trainer(model_cfg, train_cfg, pre_cfg,
                      hifigan_cfg=hifigan_cfg, hifigan_params=stock,
                      dtype=jnp.bfloat16, mesh=make_mesh(data_parallel=1))
    step = trainer.maybe_resume()
    if step == 0:
        raise SystemExit(f"no acoustic checkpoint in {args.acoustic_ckpt}")
    print(f"acoustic step {step}; scoring {args.quality_n} val utterances")

    results = {}
    q = trainer.validate_audio(0, quality_n=args.quality_n)
    results["stock"] = q
    print("stock LJ_V2   :", json.dumps({k: round(v, 3)
                                         for k, v in q.items()}))

    if args.vocoder_ckpt:
        import orbax.checkpoint as ocp

        path = latest_checkpoint(args.vocoder_ckpt) or args.vocoder_ckpt
        payload = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        gen = payload["gen_params"] if "gen_params" in payload else payload
        trainer.hifigan_params = gen
        trainer._vocoder = None  # re-jit with the new params' structure
        trainer.train_cfg = dataclasses.replace(
            train_cfg, wav_path=os.path.join(args.wav_root, "finetuned"))
        q2 = trainer.validate_audio(0, quality_n=args.quality_n)
        results["finetuned"] = q2
        print("fine-tuned    :", json.dumps({k: round(v, 3)
                                             for k, v in q2.items()}))
        d = q2["mcd_floor_db"] - q["mcd_floor_db"]
        print(f"floor moved {q['mcd_floor_db']:.2f} -> "
              f"{q2['mcd_floor_db']:.2f} dB ({d:+.2f}); "
              f"gap-to-floor {q['mcd_db'] - q['mcd_floor_db']:+.2f}"
              f" -> {q2['mcd_db'] - q2['mcd_floor_db']:+.2f} dB")

    out = os.path.join(args.wav_root, "floor_ab.json")
    os.makedirs(args.wav_root, exist_ok=True)
    with open(out, "w") as f:
        json.dump({"acoustic_step": step, **results}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
