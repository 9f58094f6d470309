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
                        help="Torch .ckpt (converted), orbax checkpoint dir, "
                             "or .onnx (run under onnxruntime if installed)")
    parser.add_argument("--onnx-insize", type=int, default=128,
                        help="fixed phoneme input length baked into the "
                             ".onnx graph (reference: demo.py:41-47)")
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


def run_onnx(args):
    """Consume an exported .onnx under onnxruntime (reference:
    demo.py:107-116 loads, demo.py:37-60 runs).  onnxruntime is an
    optional dependency — absent wheels get a clear message, not a
    traceback.  The graph contract matches our exporter
    (convert/onnx_export.py): inputs[1, insize] int → (wav, lengths,
    duration); duration is in mel frames, wav trim = sum(duration[:n])
    * hop_length for the unpadded phoneme count n."""
    try:
        import onnxruntime
    except ImportError:
        raise SystemExit(
            "onnxruntime is not installed; .onnx checkpoints need it "
            "(pip install onnxruntime).  Native orbax / torch .ckpt "
            "checkpoints run without it.")
    import time

    import numpy as np

    from efficientspeech_tpu.config import PreprocessConfig
    from efficientspeech_tpu.text.g2p import get_lexicon_and_g2p, text2phoneme
    from efficientspeech_tpu.utils.tools import write_wav

    cfg = (PreprocessConfig.from_yaml(args.preprocess_config)
           if args.preprocess_config else PreprocessConfig())
    lexicon, g2p = get_lexicon_and_g2p(cfg)
    session = onnxruntime.InferenceSession(args.checkpoint)
    in_name = session.get_inputs()[0].name

    text = args.text.strip().replace("-", " ")
    phoneme = text2phoneme(lexicon, g2p, text, cfg)
    n_real = min(len(phoneme), args.onnx_insize)
    # fixed-insize graph: pad the text with silence words then truncate
    # (reference: demo.py:41-47 — repeat_interleave blocks dynamic axes)
    padded = text + 2 * args.onnx_insize * "- "
    phoneme = text2phoneme(lexicon, g2p, padded, cfg)[None, :args.onnx_insize]
    ort_inputs = {in_name: phoneme.astype(np.int32)}

    wav = lengths = duration = None
    elapsed = []
    for _ in range(max(1, args.iter)):
        t0 = time.time()
        wav, lengths, duration = session.run(None, ort_inputs)
        elapsed.append(time.time() - t0)
    hop = cfg.audio.hop_length
    n_samples = int(np.sum(np.round(np.asarray(duration).squeeze())[:n_real])) * hop
    wav = np.asarray(wav).squeeze()[:n_samples]
    voice_secs = len(wav) / cfg.audio.sampling_rate
    med = float(np.median(elapsed))
    print(f"voice length: {voice_secs:.2f}s  synthesis: {med*1e3:.2f}ms  "
          f"median RTF over {len(elapsed)} iter(s): {voice_secs/med:.1f} "
          f"(onnxruntime, lengths={np.asarray(lengths).ravel()[:1]})")
    path = os.path.join(args.wav_path, args.wav_filename)
    write_wav(wav, path, cfg.audio.sampling_rate, cfg.audio.max_wav_value)
    print(f"wrote {path}")


def main():
    args = get_args()
    args.checkpoint = _maybe_download(args.checkpoint)
    if args.checkpoint and args.checkpoint.endswith(".onnx"):
        return run_onnx(args)

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
