#!/usr/bin/env python3
"""Multi-speaker convergence demonstration (round-2 VERDICT next #8).

Generates a synthetic TWO-SPEAKER corpus whose speakers differ audibly
(SPK_A ~130 Hz fundamental, SPK_B ~240 Hz), runs the real
preprocess → train → synthesize pipeline with the speaker-embedding model
(n_speakers auto-sized from speakers.json), and shows:

1. val loss converges,
2. the same text synthesized as speaker 0 vs speaker 1 produces
   SYSTEMATICALLY different predictions — the speaker-conditioned predicted
   pitch separates in the right direction (B above A), and the wavs differ.

The reference is single-speaker end to end; this demonstrates the
beyond-parity capability actually *works*, not just compiles
(round-2 shipped it unit-tested only).

    python scripts/multispeaker_demo.py --root /tmp/mspk --steps 400
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 22050
PHONES = ["AA1", "IY1", "UW1", "EH1", "OW1", "M", "N", "S", "T", "K",
          "L", "R"]
WORDS = ["the", "cat", "sat", "on", "a", "mat", "with", "joy"]

SPEAKER_F0 = {"SPK_A": 130.0, "SPK_B": 240.0}


def make_textgrid(path, intervals):
    lines = ['File type = "ooTextFile"', 'Object class = "TextGrid"',
             "xmin = 0", f"xmax = {intervals[-1][1]}", "tiers? <exists>",
             "size = 1", "item []:", "    item [1]:",
             '        class = "IntervalTier"', '        name = "phones"',
             "        xmin = 0", f"        xmax = {intervals[-1][1]}",
             f"        intervals: size = {len(intervals)}"]
    for i, (s, e, t) in enumerate(intervals):
        lines += [f"        intervals [{i + 1}]:",
                  f"            xmin = {s}", f"            xmax = {e}",
                  f'            text = "{t}"']
    with open(path, "w") as f:
        f.write("\n".join(lines))


def gen(root: str, utts_per_speaker: int = 24, seed: int = 0):
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    for speaker, base_f0 in SPEAKER_F0.items():
        raw = os.path.join(root, "raw", speaker)
        tg_dir = os.path.join(root, "preprocessed", "TextGrid", speaker)
        os.makedirs(raw, exist_ok=True)
        os.makedirs(tg_dir, exist_ok=True)
        for u in range(utts_per_speaker):
            n_ph = int(rng.integers(6, 14))
            intervals = [(0.0, 0.1, "sil")]
            t = 0.1
            for d in rng.uniform(0.05, 0.11, size=n_ph):
                p = PHONES[rng.integers(len(PHONES))]
                intervals.append((round(t, 4), round(t + d, 4), p))
                t += d
            intervals.append((round(t, 4), round(t + 0.1, 4), "sp"))
            total = t + 0.1
            tt = np.arange(int(total * SR)) / SR
            f0 = base_f0 * (1 + 0.12 * np.sin(
                2 * np.pi * rng.uniform(0.5, 2.0) * tt + rng.uniform(0, 6)))
            wav = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / SR)
            wav += 0.02 * rng.standard_normal(len(wav))
            base = f"{speaker}-{u:04d}"
            wavfile.write(os.path.join(raw, f"{base}.wav"), SR,
                          (wav * 32000).astype(np.int16))
            with open(os.path.join(raw, f"{base}.lab"), "w") as f:
                f.write(" ".join(rng.choice(WORDS,
                                            size=max(2, n_ph // 4))))
            make_textgrid(os.path.join(tg_dir, f"{base}.TextGrid"),
                          intervals)
    print(f"gen: 2 speakers x {utts_per_speaker} utterances")


def write_yaml(root: str, val_size: int = 8) -> str:
    cfg = f"""dataset: "mspk"
path:
  corpus_path: "{root}"
  lexicon_path: "/nonexistent"
  raw_path: "{root}/raw"
  preprocessed_path: "{root}/preprocessed"
preprocessing:
  val_size: {val_size}
  text:
    text_cleaners: ["english_cleaners"]
    language: "en"
  audio:
    sampling_rate: {SR}
    max_wav_value: 32768.0
  stft:
    filter_length: 1024
    hop_length: 256
    win_length: 1024
  mel:
    n_mel_channels: 80
    mel_fmin: 0
    mel_fmax: 8000
  pitch:
    feature: "phoneme_level"
    normalization: true
  energy:
    feature: "phoneme_level"
    normalization: true
"""
    path = os.path.join(root, "mspk.yaml")
    with open(path, "w") as f:
        f.write(cfg)
    return path


def run(root: str, steps: int = 400, batch_size: int = 8,
        utts_per_speaker: int = 24):
    from efficientspeech_tpu.config import (
        ModelConfig,
        PreprocessConfig,
        TrainConfig,
    )
    from efficientspeech_tpu.data.preprocessor import Preprocessor
    from efficientspeech_tpu.training.loop import Trainer

    if not os.path.isdir(os.path.join(root, "raw")):
        gen(root, utts_per_speaker)
    yaml_path = write_yaml(root)
    pcfg = PreprocessConfig.from_yaml(yaml_path)
    if not os.path.isfile(os.path.join(pcfg.preprocessed_path,
                                       "stats.json")):
        Preprocessor(pcfg).build_from_path(verbose=False)
    speakers = json.load(open(os.path.join(pcfg.preprocessed_path,
                                           "speakers.json")))
    print("speakers:", speakers)
    assert len(speakers) == 2

    stats = json.load(open(os.path.join(pcfg.preprocessed_path,
                                        "stats.json")))
    model_cfg = ModelConfig.preset(
        "tiny", pitch_stats=tuple(stats["pitch"][:2]),
        energy_stats=tuple(stats["energy"][:2]),
        max_phoneme_len=32, max_mel_len=256)
    train_cfg = TrainConfig(
        batch_size=batch_size, max_epochs=10_000, warmup_epochs=1,
        val_every_n_epochs=10_000,
        checkpoint_dir=os.path.join(root, "ckpt"),
        log_dir=os.path.join(root, "logs"),
        wav_path=os.path.join(root, "wavs"))
    trainer = Trainer(model_cfg, train_cfg, pcfg)
    assert trainer.model_cfg.n_speakers == 2, trainer.model_cfg.n_speakers

    val0 = trainer.evaluate()
    t0 = time.time()
    trainer.fit(max_steps=steps, checkpoint_every_epochs=10_000)
    val1 = trainer.evaluate()
    print(f"trained {steps} steps in {time.time() - t0:.0f}s; "
          f"val loss {val0['loss']:.3f} -> {val1['loss']:.3f} "
          f"(mel {val0['mel']:.3f} -> {val1['mel']:.3f}, "
          f"pitch {val0['pitch']:.3f} -> {val1['pitch']:.3f})")

    # same phoneme sequence, both speakers: free-running predictions
    import jax
    import jax.numpy as jnp

    from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel

    rng = np.random.default_rng(1)
    phoneme = np.zeros((1, 32), np.int32)
    ids = rng.integers(70, 146, size=14)
    phoneme[0, :14] = ids
    mask = phoneme == 0
    model = Phoneme2Mel(trainer.model_cfg, dtype=jnp.float32)

    @jax.jit
    def predict(params, speaker):
        return model.apply({"params": params["phoneme2mel"]},
                           jnp.asarray(phoneme), jnp.asarray(mask),
                           speaker=speaker, train=False)

    pa = predict(trainer.state.params, jnp.asarray([0], jnp.int32))
    pb = predict(trainer.state.params, jnp.asarray([1], jnp.int32))
    pitch_a = float(np.asarray(pa["pitch"])[0, :14, 0].mean())
    pitch_b = float(np.asarray(pb["pitch"])[0, :14, 0].mean())
    mel_diff = float(np.abs(np.asarray(pa["mel"]) -
                            np.asarray(pb["mel"])).mean())
    lo = min(speakers, key=lambda s: SPEAKER_F0[s])
    lo_id, hi_id = speakers[lo], 1 - speakers[lo]
    pitches = {0: pitch_a, 1: pitch_b}
    print(f"predicted normalized pitch: speaker {lo} (low) = "
          f"{pitches[lo_id]:.3f}, other (high) = {pitches[hi_id]:.3f}; "
          f"mel MAD between speakers = {mel_diff:.4f}")
    ok = (pitches[hi_id] - pitches[lo_id] > 0.3) and mel_diff > 1e-3 \
        and val1["loss"] < val0["loss"]
    print("MULTISPEAKER DEMO:", "PASS" if ok else "FAIL")
    return ok


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/mspk_demo")
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--utts-per-speaker", type=int, default=24)
    args = parser.parse_args()
    ok = run(args.root, steps=args.steps, batch_size=args.batch_size,
             utts_per_speaker=args.utts_per_speaker)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
