#!/usr/bin/env python3
"""Text→speech demo CLI (reference: demo.py:91-169).

Examples:
    python demo.py --preset tiny --text "the quick brown fox" \
        --wav-filename fox.wav
    python demo.py --checkpoint tiny_eng_266k.ckpt --preset tiny \
        --text "hello world" --iter 100

Accepts reference torch .ckpt checkpoints (converted on the fly) or native
orbax checkpoint directories.
"""

import argparse
import os


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="tiny",
                        choices=["tiny", "small", "base"],
                        help="Model size preset (reference flag presets, README.md:186-196)")
    parser.add_argument("--checkpoint", default=None,
                        help="Torch .ckpt (converted) or orbax checkpoint dir")
    parser.add_argument("--hifigan-checkpoint",
                        default="/root/reference/hifigan/LJ_V2/generator_v2")
    parser.add_argument("--preprocess-config", default=None,
                        help="preprocess yaml (for lexicon / audio params)")
    parser.add_argument("--text", default=None, required=True)
    parser.add_argument("--wav-path", default="outputs")
    parser.add_argument("--wav-filename", default="efficient_speech.wav")
    parser.add_argument("--iter", type=int, default=1,
                        help="benchmark iterations (reference: demo.py:149-167)")
    parser.add_argument("--warmup", type=int, default=10)
    parser.add_argument("--precision", default="bf16", choices=["bf16", "f32"])
    parser.add_argument("--speaker", type=int, default=None,
                        help="speaker id for multi-speaker checkpoints")
    parser.add_argument("--transfer", default="int16",
                        choices=["f32", "int16", "mulaw", "adpcm4", "adpcm3", "adpcm2"],
                        help="device→host PCM wire format")
    parser.add_argument("--vocoder", default="folded",
                        choices=["folded", "folded_pallas", "chunked"])
    parser.add_argument("--play", action="store_true",
                        help="play audio instead of saving (needs sounddevice)")
    parser.add_argument("--verbose", action="store_true")
    from efficientspeech_tpu.config import add_arch_args

    add_arch_args(parser)
    return parser.parse_args()


def _maybe_download(checkpoint):
    """URL checkpoints are fetched to the working directory first
    (reference: demo.py:100-102).  Zero-egress environments get a clear
    error instead of a hang."""
    if not (checkpoint and checkpoint.startswith(("http://", "https://"))):
        return checkpoint
    import urllib.request

    local = checkpoint.rsplit("/", 1)[-1]
    if not os.path.isfile(local):
        print(f"downloading {checkpoint} -> {local}")
        try:
            urllib.request.urlretrieve(checkpoint, local)
        except OSError as e:
            raise SystemExit(
                f"could not download {checkpoint}: {e} "
                "(no network egress? pass a local path instead)") from e
    return local


def main():
    args = get_args()
    args.checkpoint = _maybe_download(args.checkpoint)

    import jax.numpy as jnp
    import numpy as np

    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from efficientspeech_tpu.config import PreprocessConfig
    from efficientspeech_tpu.infer import build_synthesizer
    from efficientspeech_tpu.utils.tools import write_wav

    preprocess_cfg = (PreprocessConfig.from_yaml(args.preprocess_config)
                      if args.preprocess_config else None)
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    hifigan_ckpt = args.hifigan_checkpoint
    if not os.path.isfile(hifigan_ckpt):
        print(f"note: hifigan checkpoint {hifigan_ckpt} not found; "
              "using random vocoder weights")
        hifigan_ckpt = ""

    from efficientspeech_tpu.config import arch_overrides

    synth = build_synthesizer(
        preset=args.preset, checkpoint=args.checkpoint,
        hifigan_checkpoint=hifigan_ckpt, preprocess_cfg=preprocess_cfg,
        dtype=dtype, transfer=args.transfer, vocoder_mode=args.vocoder,
        bench_duration_bias=None if args.checkpoint else 6.0,
        model_overrides=arch_overrides(args))

    if args.iter > 1:
        synth.warmup(args.text, iters=args.warmup)

    wav, info = None, None
    rtfs = []
    for _ in range(args.iter):
        wav, info = synth.tts(args.text, speaker=args.speaker, verbose=args.verbose)
        rtfs.append(info["rtf"])

    print(f"voice length: {info['voice_secs']:.2f}s  "
          f"synthesis: {info['total_secs']*1e3:.2f}ms  "
          f"mean RTF over {args.iter} iter(s): {np.mean(rtfs):.1f}")
    if args.iter > 1:
        print("For benchmarking, use more iterations (e.g. --iter 100) "
              "after sufficient warmup.")

    if args.play:
        try:
            import sounddevice as sd

            sd.play(wav, synth.sampling_rate)
            sd.wait()
        except ImportError:
            print("sounddevice not installed; saving to file instead")
            args.play = False
    if not args.play:
        path = os.path.join(args.wav_path, args.wav_filename)
        write_wav(wav, path, synth.sampling_rate,
                  synth.preprocess_cfg.audio.max_wav_value)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
