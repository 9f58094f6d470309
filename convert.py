#!/usr/bin/env python3
"""Checkpoint conversion / export CLI (reference: convert.py:17-48).

Modes:
  # reference torch .ckpt → native orbax params
  python convert.py --checkpoint tiny_eng_266k.ckpt --preset tiny \
      --output checkpoints/tiny_native

  # native/converted params → serialized StableHLO (ONNX analogue)
  python convert.py --checkpoint tiny_eng_266k.ckpt --preset tiny \
      --export tiny_eng.stablehlo --insize 128

  # native/converted params → .onnx (the reference's interchange format;
  # traced from the vendored torch mirror, reference: convert.py:35-42)
  python convert.py --checkpoint tiny_eng_266k.ckpt --preset tiny \
      --onnx tiny_eng.onnx --insize 128

  # native/converted params → traced TorchScript (reference: convert.py:43-48)
  python convert.py --checkpoint tiny_eng_266k.ckpt --preset tiny \
      --torchscript tiny_eng.pt --insize 128
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="tiny",
                        choices=["tiny", "small", "base"])
    parser.add_argument("--checkpoint", required=True,
                        help="torch .ckpt or orbax dir")
    parser.add_argument("--hifigan-checkpoint",
                        default="/root/reference/hifigan/LJ_V2/generator_v2")
    parser.add_argument("--output", default=None,
                        help="write native orbax params here")
    parser.add_argument("--export", default=None,
                        help="write serialized StableHLO program here")
    parser.add_argument("--onnx", default=None,
                        help="write a .onnx (traced from the vendored "
                             "torch mirror — standalone; reference --onnx)")
    parser.add_argument("--onnx-opset", type=int, default=17)
    parser.add_argument("--torchscript", default=None,
                        help="write a traced TorchScript module (vendored "
                             "torch mirror; reference convert.py:43-48)")
    parser.add_argument("--insize", type=int, default=128,
                        help="fixed phoneme length for export "
                             "(reference --onnx-insize)")
    parser.add_argument("--precision", default="bf16", choices=["bf16", "f32"])
    from efficientspeech_tpu.config import add_arch_args, arch_overrides

    add_arch_args(parser)
    args = parser.parse_args()

    import jax.numpy as jnp

    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from efficientspeech_tpu.infer import build_synthesizer

    synth = build_synthesizer(
        preset=args.preset, checkpoint=args.checkpoint,
        hifigan_checkpoint=args.hifigan_checkpoint
        if os.path.isfile(args.hifigan_checkpoint) else "",
        dtype=jnp.bfloat16 if args.precision == "bf16" else jnp.float32,
        model_overrides=arch_overrides(args))

    if args.output:
        from efficientspeech_tpu.training.checkpoint import save_params

        save_params(args.output, synth.params)
        print(f"wrote native params to {args.output}")

    if args.export:
        from efficientspeech_tpu.convert.export import (
            export_text_to_wav, save_exported)

        blob = export_text_to_wav(
            synth.cfg, synth.hifigan_cfg, synth.params, insize=args.insize,
            dtype=jnp.bfloat16 if args.precision == "bf16" else jnp.float32)
        save_exported(args.export, blob)
        print(f"wrote StableHLO program ({len(blob)} bytes) to {args.export}")

    if args.onnx:
        from efficientspeech_tpu.convert.onnx_export import export_onnx

        size = export_onnx(synth.params, synth.cfg, synth.hifigan_cfg,
                           args.onnx, insize=args.insize,
                           opset=args.onnx_opset)
        print(f"wrote ONNX model ({size} bytes) to {args.onnx}")

    if args.torchscript:
        from efficientspeech_tpu.convert.onnx_export import export_torchscript

        size = export_torchscript(synth.params, synth.cfg,
                                  synth.hifigan_cfg, args.torchscript,
                                  insize=args.insize)
        print(f"wrote TorchScript module ({size} bytes) to "
              f"{args.torchscript}")


if __name__ == "__main__":
    main()
