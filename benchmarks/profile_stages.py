#!/usr/bin/env python3
"""Stage-level TPU timing bisect (development tool).

Times each acoustic sub-stage and vocoder variant as separate jitted
programs to locate where device time goes.  All weights pass as jit
arguments (closure constants would bloat remote compiles).
"""

import dataclasses
import time

import numpy as np


def timeit(name, fn, *args, n=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1e3:.2f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import LONG_TEXT
    from efficientspeech_tpu.infer import build_synthesizer
    from efficientspeech_tpu.models.acoustic import (
        AcousticDecoder, Encoder, Fuse)
    from efficientspeech_tpu.models.mel_decoder import MelDecoder
    from efficientspeech_tpu.ops.length_regulator import length_regulate

    DT = jnp.bfloat16
    synth = build_synthesizer(
        preset="tiny",
        hifigan_checkpoint="/root/reference/hifigan/LJ_V2/generator_v2",
        dtype=DT, bench_duration_bias=6.0)
    seq = synth.phonemize(LONG_TEXT)
    phoneme, pad_mask, bucket = synth._pad_to_bucket(seq)
    cfg = dataclasses.replace(synth.cfg, max_phoneme_len=bucket,
                              max_mel_len=bucket * 16)
    params = synth.params["phoneme2mel"]

    enc = Encoder(cfg, dtype=DT)
    timeit("encoder-only", jax.jit(
        lambda p, ph, m: enc.apply({"params": p}, ph, m)[0][-1]),
        params["encoder"]["encoder"], phoneme, pad_mask)

    fuse = Fuse(cfg, dtype=DT)

    @jax.jit
    def enc_fuse(p, ph, m):
        feats, masks = enc.apply({"params": p["encoder"]}, ph, m)
        return fuse.apply({"params": p["fuse"]}, feats, masks)

    fused = timeit("encoder+fuse", enc_fuse, params["encoder"], phoneme,
                   pad_mask)

    dec = AcousticDecoder(cfg.filter_dim, duration=True, dtype=DT)

    @jax.jit
    def decoders(p, f, m):
        d1, _ = dec.apply({"params": p["duration_decoder"]}, f, m)
        d2, _ = dec.apply({"params": p["pitch_decoder"]}, f, m)
        d3, _ = dec.apply({"params": p["energy_decoder"]}, f, m)
        return d1 + d2 + d3

    timeit("3 acoustic decoders", decoders, params["encoder"], fused,
           pad_mask)

    @jax.jit
    def regulate(f, d):
        feats4 = jnp.concatenate([f, f, f, f], axis=-1)
        return length_regulate(feats4, d, cfg.max_mel_len)[0]

    dur = jnp.ones((1, bucket), jnp.int32) * 6
    frames = timeit("regulate@4096", regulate, fused, dur)

    md = MelDecoder(cfg, dtype=DT)
    fmask = jnp.zeros((1, cfg.max_mel_len), bool)
    timeit("meldecoder@4096", jax.jit(
        lambda p, f, m: md.apply({"params": p}, f, m)),
        params["decoder"], frames, fmask)

    # vocoders
    acoustic = synth._get_acoustic(bucket)
    mel, mlen, _ = acoustic(params, phoneme, pad_mask)
    mel_len = int(jax.device_get(mlen)[0])
    print("mel_len", mel_len, flush=True)
    mel_in = jax.lax.slice_in_dim(mel, 0, 2048, axis=1)

    voc = synth._get_vocoder(2048)
    timeit("folded vocoder@2048 (XLA)", voc, synth.params["hifigan"],
           mel_in, mlen)

    synth.vocoder_mode = "folded_pallas"
    try:
        vocp = synth._get_vocoder(2048)
        timeit("folded vocoder@2048 (pallas)", vocp,
               synth.params["hifigan"], mel_in, mlen)
    except Exception as e:
        print("pallas vocoder failed:", str(e)[:300], flush=True)
    synth.vocoder_mode = "folded"


if __name__ == "__main__":
    main()
