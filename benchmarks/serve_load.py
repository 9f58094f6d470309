#!/usr/bin/env python3
"""Serving load test: concurrent /tts clients against a live serve.py.

Measures what a production caller sees — per-request latency percentiles
and aggregate served RTF — with dynamic batching fusing concurrent
requests into single batched dispatches (serve.py's DynamicBatcher).
bench.py's batch_rtf calls tts_batch directly; this exercises the real
HTTP + batcher path.

Spawns the server in-process (same TPU claim), fires ``--clients``
threads each sending ``--requests`` sequential POSTs, then reports.

    python benchmarks/serve_load.py --clients 16 --requests 6
"""

import argparse
import threading
import time
import urllib.request

import numpy as np

import bench

BENCH_TEXT = bench.LONG_TEXT  # the 28.6 s reference benchmark sentence


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--clients", type=int, default=16)
    parser.add_argument("--requests", type=int, default=6)
    parser.add_argument("--port", type=int, default=8731)
    parser.add_argument("--transfer", default="adpcm4")
    parser.add_argument("--text", default=BENCH_TEXT)
    parser.add_argument("--batch-window-ms", type=float, default=8.0)
    parser.add_argument("--cold-shape", action="store_true",
                        help="inject requests at an UNWARMED (bucket, "
                             "spec) shape mid-run: with warm_only routing "
                             "they ride the next-larger warm program, so "
                             "p99 must not blow up to remote-compile time "
                             "(round-3 VERDICT next #7)")
    args = parser.parse_args()

    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import os

    from http.server import ThreadingHTTPServer

    from efficientspeech_tpu.infer import build_synthesizer
    from serve import make_handler

    hifigan = "/root/reference/hifigan/LJ_V2/generator_v2"
    synth = build_synthesizer(
        preset="tiny",
        hifigan_checkpoint=hifigan if os.path.isfile(hifigan) else "",
        transfer=args.transfer, vocoder_mode="folded_pallas",
        bench_duration_bias=6.0)
    synth.warmup(args.text, iters=2)
    # warm every pow2 batch shape the batcher can hit (mirrors serve.py
    # main()'s precompile loop — a cold shape stalls a whole dispatch
    # generation for the remote-compile time)
    b = 2
    while b <= max(32, args.clients):
        synth.tts_batch([args.text] * b)
        b *= 2
    if args.cold_shape:
        # serving mode: cold shapes route to the next-larger warm program
        # instead of compiling inline (Synthesizer._route_warm)
        synth.warm_only = True

    lock = threading.Lock()
    handler = make_handler(synth, lock=lock, dynamic_batch=True,
                           batch_window_ms=args.batch_window_ms,
                           max_batch=max(32, args.clients))
    server = ThreadingHTTPServer(("127.0.0.1", args.port), handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    from urllib.parse import quote

    url = f"http://127.0.0.1:{args.port}/tts?text=" + quote(args.text)
    # one warm request through the HTTP path
    with urllib.request.urlopen(url, timeout=300) as r:
        wav0 = r.read()
    voice_secs = (len(wav0) - 44) / 2 / 22050.0
    print(f"voice {voice_secs:.2f}s/request, {args.clients} clients x "
          f"{args.requests} requests, window {args.batch_window_ms} ms",
          flush=True)

    lat = []
    batch_sizes = []
    lat_lock = threading.Lock()

    # a SHORT text maps to a different (bucket, spec) shape that was never
    # precompiled — the cold-shape scenario's probe
    cold_url = (f"http://127.0.0.1:{args.port}/tts?text=" +
                quote("a short cold shape probe"))
    cold_lat = []

    def client(ci):
        for ri in range(args.requests):
            cold = (args.cold_shape and ci < 4 and
                    ri == args.requests // 2)
            t0 = time.time()
            with urllib.request.urlopen(cold_url if cold else url,
                                        timeout=600) as r:
                r.read()
                bs = r.headers.get("X-Batch-Size")
            with lat_lock:
                (cold_lat if cold else lat).append(time.time() - t0)
                if bs:
                    batch_sizes.append(int(bs))

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.time() - t0
    server.shutdown()

    n = len(lat)
    served_audio = n * voice_secs
    lat_ms = np.array(lat) * 1e3
    if cold_lat:
        cl = np.array(cold_lat) * 1e3
        print(f"cold-shape requests: {len(cold_lat)}, latency p50 "
              f"{np.percentile(cl, 50):.0f} ms max {cl.max():.0f} ms "
              f"(must be request-scale, not compile-scale)", flush=True)
    print(f"aggregate: {n} requests in {wall:.2f} s -> "
          f"served RTF {served_audio / wall:.1f}", flush=True)
    print(f"latency ms: p50 {np.percentile(lat_ms, 50):.0f}  "
          f"p90 {np.percentile(lat_ms, 90):.0f}  "
          f"p99 {np.percentile(lat_ms, 99):.0f}", flush=True)
    if batch_sizes:
        print(f"dispatch batch sizes: mean {np.mean(batch_sizes):.1f}  "
              f"max {max(batch_sizes)}", flush=True)


if __name__ == "__main__":
    main()
