#!/usr/bin/env python3
"""Transport micro-profiler for the tunneled TPU relay (development tool).

Round 1 left ~95 ms of the ~160 ms/synthesis unexplained (VERDICT item 1a).
This script isolates every host<->device transport primitive the serving
path touches so the fused pipeline can be restructured around measured
costs rather than guesses:

  E1  round trip         device_get of a tiny device-resident array
  E2  upload             device_put of a 2 KB numpy array
  E3  enqueue+execute    trivial jitted op on device-resident args
  E4  fetch bandwidth    device_get at 0.25/1/2/4 MB
  E5  pipelining         K enqueues then K ordered fetches (+ async copy)
  E6  fused path         the real bucket-512 fused program: enqueue cost
                         with numpy args, separate vs packed fetch, and a
                         depth-2/3 pipelined loop

Run on the real chip:  python benchmarks/profile_transport.py
"""

import argparse
import time

import numpy as np


def med_ms(samples):
    return float(np.median(samples) * 1e3)


def timeloop(fn, n=30, warmup=3):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return ts


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--skip-fused", action="store_true",
                        help="skip E6 (needs the big cached fused program)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    N = args.iters

    # --- E1: round trip (tiny fetch of device-resident data)
    tiny = jax.device_put(np.zeros(8, np.float32))
    jax.block_until_ready(tiny)
    ts = timeloop(lambda: jax.device_get(tiny), n=N)
    print(f"E1 tiny fetch (RTT):            {med_ms(ts):8.2f} ms", flush=True)

    # --- E2: upload of a small numpy array (the per-call phoneme IDs)
    host2k = np.zeros(512, np.int32)
    ts = timeloop(
        lambda: jax.block_until_ready(jax.device_put(host2k)), n=N)
    print(f"E2 2KB upload (blocked):        {med_ms(ts):8.2f} ms", flush=True)

    # --- E3: enqueue + execute of a trivial op, device-resident args
    x = jax.device_put(np.ones((128, 128), np.float32))
    jax.block_until_ready(x)
    f = jax.jit(lambda a: a + 1.0)
    jax.block_until_ready(f(x))
    ts = timeloop(lambda: None if f(x) is None else None, n=N)  # enqueue only
    print(f"E3a enqueue only:               {med_ms(ts):8.2f} ms", flush=True)
    ts = timeloop(lambda: jax.block_until_ready(f(x)), n=N)
    print(f"E3b enqueue+execute (blocked):  {med_ms(ts):8.2f} ms", flush=True)

    # --- E3c: enqueue+execute with NUMPY args (implicit upload each call)
    xh = np.ones((512,), np.int32)
    g = jax.jit(lambda a: a + 1)
    jax.block_until_ready(g(xh))
    ts = timeloop(lambda: jax.block_until_ready(g(xh)), n=N)
    print(f"E3c exec w/ numpy arg (blocked):{med_ms(ts):8.2f} ms", flush=True)

    # --- E4: fetch bandwidth at serving-relevant sizes
    for mb in (0.25, 1.0, 2.0, 4.0):
        n_el = int(mb * 1e6 / 2)  # int16
        arr = jax.device_put(np.zeros(n_el, np.int16))
        jax.block_until_ready(arr)
        ts = timeloop(lambda a=arr: jax.device_get(a), n=max(8, N // 3))
        ms = med_ms(ts)
        print(f"E4 fetch {mb:4.2f} MB:              {ms:8.2f} ms "
              f"({mb / ms * 1e3:6.1f} MB/s)", flush=True)

    # --- E5: pipelining potential — K independent jobs, enqueue all then
    # fetch in order; compares serial (enqueue->fetch)^K vs overlapped.
    mb = 1.0
    n_el = int(mb * 1e6 / 2)
    seed = jax.device_put(np.zeros(n_el, np.int16))
    jax.block_until_ready(seed)
    h = jax.jit(lambda a, i: a + i)
    jax.block_until_ready(h(seed, 1))
    K = 8

    def serial():
        for i in range(K):
            jax.device_get(h(seed, i))

    def overlapped():
        outs = [h(seed, i) for i in range(K)]
        for o in outs:
            jax.device_get(o)

    def overlapped_async():
        outs = [h(seed, i) for i in range(K)]
        for o in outs:
            try:
                o.copy_to_host_async()
            except Exception:
                pass
        for o in outs:
            jax.device_get(o)

    for name, fn in (("serial", serial), ("overlap", overlapped),
                     ("overlap+async_copy", overlapped_async)):
        ts = timeloop(fn, n=6, warmup=1)
        print(f"E5 {name:20s} K={K}x1MB: {med_ms(ts):8.2f} ms total "
              f"({med_ms(ts)/K:6.2f} ms/job)", flush=True)

    if args.skip_fused:
        return

    # --- E6: the real fused serving program (cached compile from round 1)
    import os

    from bench import LONG_TEXT
    from efficientspeech_tpu.infer import build_synthesizer

    hifigan_ckpt = "/root/reference/hifigan/LJ_V2/generator_v2"
    if not os.path.isfile(hifigan_ckpt):
        print("E6 skipped (no hifigan checkpoint)", flush=True)
        return
    synth = build_synthesizer(preset="tiny", hifigan_checkpoint=hifigan_ckpt,
                              dtype=jnp.bfloat16, bench_duration_bias=6.0)
    seq = synth.phonemize(LONG_TEXT)
    phoneme, pad_mask, bucket = synth._pad_to_bucket(seq)
    spec = synth._spec_frames(len(seq), bucket)
    fused = synth._get_fused(bucket, spec)
    out = fused(phoneme)
    jax.block_until_ready(out)
    print(f"E6 program ready: bucket={bucket} pcm={out[0].shape} "
          f"{out[0].dtype}", flush=True)

    # enqueue cost with numpy args
    ts = timeloop(lambda: None if fused(phoneme) else None, n=N)
    print(f"E6a fused enqueue (numpy args): {med_ms(ts):8.2f} ms", flush=True)

    # blocked, fetch mel_len only (tiny) — isolates execute+RTT from payload
    def exec_tiny_fetch():
        pcm, mel_len, dur = fused(phoneme)
        jax.device_get(mel_len)

    ts = timeloop(exec_tiny_fetch, n=N)
    print(f"E6b exec + tiny fetch:          {med_ms(ts):8.2f} ms", flush=True)

    # blocked, fetch pcm + mel_len (current serving path)
    def exec_full_fetch():
        pcm, mel_len, dur = fused(phoneme)
        jax.device_get((pcm, mel_len))

    ts = timeloop(exec_full_fetch, n=N)
    full = med_ms(ts)
    print(f"E6c exec + pcm+len fetch:       {full:8.2f} ms", flush=True)

    # pipelined loop at depth 2 and 3
    for depth in (2, 3, 4):
        def pipelined(d=depth, iters=12):
            inflight = []
            t0 = time.time()
            for i in range(iters):
                pcm, mel_len, dur = fused(phoneme)
                try:
                    pcm.copy_to_host_async()
                except Exception:
                    pass
                inflight.append((pcm, mel_len))
                if len(inflight) >= d:
                    p, m = inflight.pop(0)
                    jax.device_get((p, m))
            for p, m in inflight:
                jax.device_get((p, m))
            return (time.time() - t0) / iters

        for _ in range(1):
            pipelined(depth, 4)  # warm
        per = min(pipelined(depth) for _ in range(3))
        print(f"E6d pipelined depth={depth}:         {per*1e3:8.2f} ms/iter "
              f"(vs {full:.1f} serial)", flush=True)


if __name__ == "__main__":
    main()
