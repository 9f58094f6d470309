#!/usr/bin/env python3
"""Model-tier comparison harness (analogue of the reference's NeMo benchmark,
reference: nemo/benchmark.py:105-202): RTF / mel-RTF / parameter counts for
tiny, small, and base, plus optionally the torch reference on CPU for a
direct framework-vs-framework comparison on identical hardware claims.

    python benchmarks/compare.py --iter 20 [--with-torch-reference]
"""

import argparse
import json
import sys
import time


def count_params(tree) -> int:
    import jax

    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def bench_ours(preset: str, text: str, iters: int):
    import jax.numpy as jnp
    import numpy as np

    from efficientspeech_tpu.infer import build_synthesizer

    synth = build_synthesizer(preset=preset,
                              hifigan_checkpoint="/root/reference/hifigan/LJ_V2/generator_v2",
                              dtype=jnp.bfloat16, bench_duration_bias=6.0)
    synth.warmup(text, iters=5)
    rtfs = []
    voice_secs = 1.0
    for _ in range(iters):
        wav, info = synth.tts(text)
        rtfs.append(info["rtf"])
        voice_secs = info["voice_secs"]
    row = {
        "preset": preset,
        "params_acoustic": count_params(synth.params["phoneme2mel"]),
        "params_vocoder": count_params(synth.params["hifigan"]),
        "rtf": round(float(np.mean(rtfs)), 1),
    }
    # FLOPs of the compiled serving program (fvcore analogue,
    # reference: nemo/benchmark.py:191-202): count at the routed shape
    seq = synth.phonemize(text)
    _, _, bucket = synth._pad_to_bucket(seq)
    frames = synth._spec_frames(len(seq), bucket)
    cost = synth.cost_analysis(bucket, frames)
    if cost and cost.get("flops"):
        row["gflops_per_synthesis"] = round(cost["flops"] / 1e9, 2)
        row["gflops_per_voice_sec"] = round(
            cost["flops"] / 1e9 / voice_secs, 2)
    return row


def bench_torch_reference(text: str, iters: int):
    """Run the torch reference end to end on CPU (its modules imported live;
    random acoustic weights with biased duration head, bundled vocoder)."""
    import numpy as np
    import torch

    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "tests")
    from ref_loader import load_reference_hifigan, load_reference_layers

    ref = load_reference_layers()
    hifigan_mod = load_reference_hifigan()
    import json as _json

    torch.manual_seed(0)
    pe = ref.PhonemeEncoder(pitch_stats=[-2.9, 11.4], energy_stats=[-1.4, 8.2],
                            depth=2, reduction=4, head=1, embed_dim=128,
                            kernel_size=3, expansion=1)
    md = ref.MelDecoder(dim=32, kernel_size=5, n_blocks=2, block_depth=2)
    p2m = ref.Phoneme2Mel(encoder=pe, decoder=md).eval()
    with torch.no_grad():
        p2m.encoder.duration_decoder.linear.bias.fill_(6.0)

    with open("/root/reference/hifigan/LJ_V2/config.json") as f:
        cfg = hifigan_mod.AttrDict(_json.load(f))
    gen = hifigan_mod.Generator(cfg)
    ckpt = torch.load("/root/reference/hifigan/LJ_V2/generator_v2",
                      map_location="cpu", weights_only=False)
    gen.load_state_dict(ckpt["generator"])
    gen.eval()
    gen.remove_weight_norm()

    from efficientspeech_tpu.config import PreprocessConfig
    from efficientspeech_tpu.text.g2p import G2p, text2phoneme

    seq = text2phoneme({}, G2p(), text, PreprocessConfig(lexicon_path="/x"))
    phoneme = torch.from_numpy(seq[None, :]).long()

    def run():
        with torch.no_grad():
            mel, mel_len, _ = p2m({"phoneme": phoneme}, train=False)
            wav = gen(mel.transpose(1, 2)).squeeze(1)
        return wav, int(mel_len[0])

    run()  # warmup
    rtfs = []
    for _ in range(iters):
        t0 = time.time()
        wav, mel_len = run()
        rtfs.append((wav.shape[-1] / 22050) / (time.time() - t0))
    import numpy as np

    return {"preset": "reference-tiny (torch CPU)",
            "rtf": round(float(np.mean(rtfs)), 1)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iter", type=int, default=20)
    parser.add_argument("--presets", nargs="+",
                        default=["tiny", "small", "base"])
    parser.add_argument("--with-torch-reference", action="store_true")
    parser.add_argument("--text", default=(
        "The quick brown fox jumps over the lazy dog while the curious cat "
        "watches from a warm windowsill in the late afternoon sun."))
    args = parser.parse_args()

    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    rows = []
    for preset in args.presets:
        rows.append(bench_ours(preset, args.text, args.iter))
        print(json.dumps(rows[-1]))
    if args.with_torch_reference:
        rows.append(bench_torch_reference(args.text, args.iter))
        print(json.dumps(rows[-1]))


if __name__ == "__main__":
    main()
