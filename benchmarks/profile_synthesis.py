#!/usr/bin/env python3
"""Split one synthesis into client-visible stages on the real chip:

  t_frontend   text → phoneme IDs (host)
  t_enqueue    fused() returns (async dispatch handed to the relay)
  t_fetch      device_get of (PCM chunks + mel_len) — ready-wait + payload
  t_decode     host µ-law decode + trim

Answers where the per-synthesis wall time beyond `one relay round +
payload` actually goes (STATUS round 2 models it as TWO blocked rounds;
this measures the split directly).

    python benchmarks/profile_synthesis.py --iter 30
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iter", type=int, default=30)
    parser.add_argument("--transfer", default="mulaw")
    parser.add_argument("--vocoder", default="folded_pallas")
    args = parser.parse_args()

    import jax

    from efficientspeech_tpu.audio.transfer import decode_host
    from efficientspeech_tpu.infer import build_synthesizer
    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import os
    hifigan = "/root/reference/hifigan/LJ_V2/generator_v2"
    synth = build_synthesizer(
        preset="tiny",
        hifigan_checkpoint=hifigan if os.path.isfile(hifigan) else "",
        transfer=args.transfer, vocoder_mode=args.vocoder,
        bench_duration_bias=6.0)

    from bench import LONG_TEXT
    synth.warmup(LONG_TEXT, iters=5)

    seq = synth.phonemize(LONG_TEXT)
    phoneme, pad_mask, bucket = synth._pad_to_bucket(seq)
    n_valid = int(min(len(seq), bucket))
    spec = synth._spec_frames(n_valid, bucket)
    fused = synth._get_fused(bucket, spec)

    rows = {"enqueue": [], "fetch": [], "decode": [], "total": []}
    up = synth.hifigan_cfg.total_upsample
    for i in range(args.iter):
        # vary an argument so the relay cannot serve a memoized result
        ph = phoneme.copy()
        ph[0, n_valid - 1] = 1 + (i % 100)
        t0 = time.time()
        pcm, mel_len_arr, _ = fused(ph)
        t1 = time.time()
        buf, mel_len = synth._fetch_single_pcm(pcm, mel_len_arr,
                                               n_valid, spec)
        t2 = time.time()
        wav = decode_host(buf, args.transfer)[: mel_len * up]
        t3 = time.time()
        rows["enqueue"].append(t1 - t0)
        rows["fetch"].append(t2 - t1)
        rows["decode"].append(t3 - t2)
        rows["total"].append(t3 - t0)

    n_ch = len(pcm) if isinstance(pcm, tuple) else 1
    print(f"bucket {bucket}, spec {spec} frames, mel_len {mel_len}, "
          f"{n_ch} chunk arrays, fetched {len(buf)} bytes/samples")
    for k, v in rows.items():
        v = np.asarray(v) * 1e3
        print(f"{k:>8}: median {np.median(v):6.1f} ms   "
              f"p10 {np.percentile(v, 10):6.1f}   "
              f"p90 {np.percentile(v, 90):6.1f}")

    # split the fetch itself: mel_len alone (tiny payload) vs chunks
    tls, tcs = [], []
    for i in range(args.iter):
        ph = phoneme.copy()
        ph[0, n_valid - 1] = 1 + (i % 100)
        pcm, mel_len_arr, _ = fused(ph)
        t0 = time.time()
        jax.device_get(mel_len_arr)            # ready-wait + 4 B
        t1 = time.time()
        k = min(len(pcm), 5) if isinstance(pcm, tuple) else 1
        jax.device_get(pcm[:k] if isinstance(pcm, tuple) else pcm)
        t2 = time.time()
        tls.append(t1 - t0)
        tcs.append(t2 - t1)
    print(f"mel_len-first: ready-wait {np.median(tls)*1e3:.1f} ms, "
          f"then chunks {np.median(tcs)*1e3:.1f} ms "
          f"(payload once ready)")


if __name__ == "__main__":
    main()
