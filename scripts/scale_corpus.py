#!/usr/bin/env python3
"""Generate a full-scale synthetic corpus shaped like LJSpeech (13,100
utterances, ~1-10 s each, ~24 h total) for preprocessing/training
scale verification when the real corpus is absent (VERDICT round 1,
item 10).

    python scripts/scale_corpus.py gen --root /root/repo/outputs/scale_corpus
    python scripts/scale_corpus.py loader-bench --root /root/repo/outputs/scale_corpus

Layout matches the preprocessing pipeline's expectations:
raw/LJSpeech/*.wav + *.lab and preprocessed/TextGrid/LJSpeech/*.TextGrid.
"""

import argparse
import os
import time

import numpy as np

SR = 22050
HOP = 256
PHONES = ["AA1", "AE1", "AH0", "AO1", "B", "D", "EH1", "ER0", "F", "IH0",
          "IY1", "K", "L", "M", "N", "OW1", "P", "R", "S", "T", "UW1", "Z"]
WORDS = ["time", "water", "people", "little", "world", "house", "never",
         "garden", "window", "music", "story", "mother", "paper", "light"]


def make_textgrid(path, intervals):
    lines = ['File type = "ooTextFile"', 'Object class = "TextGrid"',
             "xmin = 0", f"xmax = {intervals[-1][1]}", "tiers? <exists>",
             "size = 1", "item []:", "    item [1]:",
             '        class = "IntervalTier"', '        name = "phones"',
             "        xmin = 0", f"        xmax = {intervals[-1][1]}",
             f"        intervals: size = {len(intervals)}"]
    for i, (s, e, t) in enumerate(intervals):
        lines += [f"        intervals [{i+1}]:", f"            xmin = {s}",
                  f"            xmax = {e}", f'            text = "{t}"']
    with open(path, "w") as f:
        f.write("\n".join(lines))


def gen(root: str, n_utts: int = 13100, seed: int = 0):
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    raw = os.path.join(root, "raw", "LJSpeech")
    tg_dir = os.path.join(root, "preprocessed", "TextGrid", "LJSpeech")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(tg_dir, exist_ok=True)

    t0 = time.time()
    total_secs = 0.0
    for u in range(n_utts):
        # LJSpeech-like utterance length: mean ~6.5 s, clipped 1.1-10.1 s
        dur_target = float(np.clip(rng.normal(6.5, 2.2), 1.1, 10.1))
        # ~80 ms per phone plus boundary silences
        n_ph = max(4, int((dur_target - 0.2) / 0.08))
        intervals = [(0.0, 0.1, "sil")]
        t = 0.1
        seg_durs = rng.uniform(0.05, 0.11, size=n_ph)
        for d in seg_durs:
            p = PHONES[rng.integers(len(PHONES))]
            intervals.append((round(t, 4), round(t + d, 4), p))
            t += d
        intervals.append((round(t, 4), round(t + 0.1, 4), "sp"))
        total = t + 0.1
        total_secs += total

        tt = np.arange(int(total * SR)) / SR
        f0 = 170 + 50 * np.sin(2 * np.pi * rng.uniform(0.5, 2.0) * tt
                               + rng.uniform(0, 6))
        wav = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / SR)
        wav += 0.02 * rng.standard_normal(len(wav))

        base = f"LJ{u // 1000:03d}-{u % 1000:04d}"
        wavfile.write(os.path.join(raw, f"{base}.wav"), SR,
                      (wav * 32000).astype(np.int16))
        with open(os.path.join(raw, f"{base}.lab"), "w") as f:
            f.write(" ".join(rng.choice(WORDS, size=max(2, n_ph // 6))))
        make_textgrid(os.path.join(tg_dir, f"{base}.TextGrid"), intervals)
        if (u + 1) % 1000 == 0:
            print(f"  generated {u+1}/{n_utts} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    print(f"gen: {n_utts} utts, {total_secs/3600:.2f} h of audio, "
          f"{time.time()-t0:.0f} s wall", flush=True)


def preprocess(root: str, num_workers: int = 0):
    from efficientspeech_tpu.config import AudioConfig, PreprocessConfig
    from efficientspeech_tpu.data.preprocessor import Preprocessor

    cfg = PreprocessConfig(
        dataset="LJSpeech", corpus_path=root,
        lexicon_path="/nonexistent",
        raw_path=os.path.join(root, "raw"),
        preprocessed_path=os.path.join(root, "preprocessed"),
        val_size=512, audio=AudioConfig())
    t0 = time.time()
    Preprocessor(cfg).build_from_path(verbose=True, num_workers=num_workers)
    wall = time.time() - t0
    n = sum(1 for _ in open(os.path.join(root, "preprocessed", "train.txt")))
    print(f"preprocess: {wall:.0f} s wall for train={n} utts "
          f"({wall / max(n,1) * 1e3:.0f} ms/utt)", flush=True)


def loader_bench(root: str, batch_size: int = 128, epochs: int = 2):
    """Host-only loader throughput: can the bucketed RAM-cache loader feed
    ~360 steps/s?  First epoch is the cold np.load pass; the second is the
    steady state the TPU sees."""
    from efficientspeech_tpu.config import AudioConfig, PreprocessConfig
    from efficientspeech_tpu.data.dataset import BucketedLoader, LJSpeechDataset

    cfg = PreprocessConfig(
        dataset="LJSpeech", corpus_path=root,
        lexicon_path="/nonexistent",
        raw_path=os.path.join(root, "raw"),
        preprocessed_path=os.path.join(root, "preprocessed"),
        audio=AudioConfig())
    t0 = time.time()
    ds = LJSpeechDataset("train.txt", cfg)
    print(f"dataset init (tokenize {len(ds)}): {time.time()-t0:.1f} s",
          flush=True)
    loader = BucketedLoader(ds, batch_size, shuffle=True,
                            max_phoneme_len=128, max_mel_len=1024,
                            drop_last=True)
    for epoch in range(epochs):
        t0 = time.time()
        n = 0
        for batch in loader:
            n += 1
        dt = time.time() - t0
        print(f"epoch {epoch}: {n} batches in {dt:.1f} s = "
              f"{n/dt:.1f} batches/s "
              f"({'cold np.load' if epoch == 0 else 'RAM cache'})",
              flush=True)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("cmd", choices=["gen", "preprocess", "loader-bench"])
    parser.add_argument("--root", default="/root/repo/outputs/scale_corpus")
    parser.add_argument("--n-utts", type=int, default=13100)
    parser.add_argument("--num-workers", type=int, default=0)
    parser.add_argument("--batch-size", type=int, default=128)
    args = parser.parse_args()
    if args.cmd == "gen":
        gen(args.root, args.n_utts)
    elif args.cmd == "preprocess":
        preprocess(args.root, args.num_workers)
    else:
        loader_bench(args.root, args.batch_size)
