#!/usr/bin/env python3
"""Device-compute sweep for the serving hot path (round-2 session 3).

Per-synthesis fetch time = relay round (~31 ms, irreducible) + DEVICE
COMPUTE + payload; this measures the compute summands in isolation with
RTT-amortized on-device chains (the pallas_verdict.py method — fori_loop
with a varying seed, device_get barrier):

  1. folded vocoder, pallas tile-height (tm) sweep at serving shapes
  2. ADPCM encode scan vs block size (fewer scan steps per block = less
     sequential overhead; wire overhead is 4 header bytes per block)
  3. acoustic (phoneme2mel) at the bench bucket, for the full picture

Run on the real chip:  python benchmarks/compute_sweep.py
"""

import argparse
import time

import numpy as np


from benchmarks._chain import chain_time  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--chain", type=int, default=16)
    parser.add_argument("--reps", type=int, default=7)
    parser.add_argument("--sizes", default="2048,3072,4096")
    parser.add_argument("--tms", default="128,256,512")
    parser.add_argument("--blocks", default="1024,512,256,128")
    parser.add_argument("--skip", default="",
                        help="comma list of parts to skip: voc,enc,ac")
    args = parser.parse_args()
    skip = set(args.skip.split(","))

    import jax
    import jax.numpy as jnp

    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from efficientspeech_tpu.audio.adpcm import encode_blocks_device
    from efficientspeech_tpu.infer import build_synthesizer
    from efficientspeech_tpu.models.hifigan_folded import folded_plan_apply

    synth = build_synthesizer(
        preset="tiny",
        hifigan_checkpoint="/root/reference/hifigan/LJ_V2/generator_v2",
        dtype=jnp.bfloat16, bench_duration_bias=6.0)
    synth._ensure_folded()
    arrays, meta = synth._folded_params
    cfg = synth.hifigan_cfg
    dtype = synth.dtype
    rng = np.random.default_rng(0)
    N = args.chain
    print(f"device: {jax.devices()[0]}  chain={N}", flush=True)

    if "voc" not in skip:
        print("== folded vocoder: pallas tm sweep (ms/apply) ==", flush=True)
        hdr = "  T      xla  " + "".join(
            f"tm={tm:<5}" for tm in args.tms.split(","))
        print(hdr, flush=True)
        for T in [int(s) for s in args.sizes.split(",")]:
            mel = jnp.asarray(rng.normal(size=(1, T, 80)) * 2 - 6, dtype)
            mel_len = jnp.asarray([T], jnp.int32)
            cols = []
            for use_pallas, tm in [(False, 256)] + [
                    (True, int(t)) for t in args.tms.split(",")]:
                def make(n_iters, up=use_pallas, tmv=tm):
                    @jax.jit
                    def chain(arrs, m, ml, seed):
                        def body(i, c):
                            wav = folded_plan_apply(
                                arrs, meta, cfg, m + (c + seed) * 1e-6,
                                valid_len=ml, dtype=dtype, use_pallas=up,
                                pallas_tm=tmv)
                            return c * 0.5 + wav[0, 0].astype(jnp.float32)
                        return jax.lax.fori_loop(0, n_iters, body,
                                                 jnp.float32(0.0))
                    return chain
                try:
                    t1, tN = chain_time(
                        make(1), make(N),
                        lambda k: (arrays, mel, mel_len, float(k)),
                        args.reps)
                    cols.append((tN - t1) / (N - 1) * 1e3)
                except Exception as e:
                    print(f"  fail up={use_pallas} tm={tm}: {str(e)[:160]}",
                          flush=True)
                    cols.append(float("nan"))
            print(f"{T:>5}  " + "  ".join(f"{c:6.2f}" for c in cols),
                  flush=True)

    if "enc" not in skip:
        print("== adpcm encode scan: block-size sweep (ms/encode of "
              "786432 samples) ==", flush=True)
        nsamp = 3072 * 256
        wav = jnp.asarray(rng.normal(size=(1, nsamp)) * 0.3,
                          jnp.float32)
        for blk in [int(b) for b in args.blocks.split(",")]:
            def make(n_iters, b=blk):
                @jax.jit
                def chain(w, seed):
                    def body(i, c):
                        enc = encode_blocks_device(w + (c + seed) * 1e-6,
                                                   block=b)
                        return c * 0.5 + enc[0, 0].astype(jnp.float32)
                    return jax.lax.fori_loop(0, n_iters, body,
                                             jnp.float32(0.0))
                return chain
            try:
                t1, tN = chain_time(make(1), make(N),
                                    lambda k: (wav, float(k)), args.reps)
                ms = (tN - t1) / (N - 1) * 1e3
                wire = (nsamp // blk) * (4 + blk // 2)
                print(f"  block={blk:>5}: {ms:6.2f} ms   wire {wire} B "
                      f"({wire * 8 / nsamp:.3f} bits/sample)", flush=True)
            except Exception as e:
                print(f"  block={blk} fail: {str(e)[:160]}", flush=True)

    if "ac" not in skip:
        print("== acoustic (phoneme2mel) at bucket 512 (ms) ==", flush=True)
        import dataclasses

        from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel

        bucket, spec = 512, 3072
        ph_np = np.zeros((1, bucket), np.int32)
        ph_np[0, :300] = rng.integers(2, 100, 300)
        ph = jnp.asarray(ph_np)
        model = Phoneme2Mel(
            cfg=dataclasses.replace(synth.cfg, max_phoneme_len=bucket,
                                    max_mel_len=spec), dtype=synth.dtype)
        p2m = jax.tree.map(jnp.asarray, synth.params["phoneme2mel"])
        first = int(ph_np[0, 0])
        alt = 3 if first == 2 else 2

        def make(n_iters):
            @jax.jit
            def chain(params, phon, seed):
                def body(i, c):
                    ph2 = phon.at[0, 0].set(
                        jnp.where((i + seed) % 2 == 0, first, alt))
                    pred = model.apply({"params": params}, ph2, ph2 == 0,
                                       train=False)
                    return (c * 0.5
                            + pred["mel"][0, 0, 0].astype(jnp.float32)
                            + pred["mel_len"][0].astype(jnp.float32))
                return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))
            return chain

        t1, tN = chain_time(make(1), make(N),
                            lambda k: (p2m, ph, k), args.reps)
        print(f"  acoustic: {(tN - t1) / (N - 1) * 1e3:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
