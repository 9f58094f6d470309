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


SHORT_TEXT = "good morning to you"
MEDIUM_TEXT = ("the quick brown fox jumps over the lazy dog while the "
               "river runs quietly past the old stone bridge")
# ~2x the bench sentence: phonemizes past the largest (512) bucket, so
# /tts exercises the {sp}-segmentation path on every request
XLONG_TEXT = BENCH_TEXT + " " + BENCH_TEXT
# odd-length probes that map to (bucket, spec) shapes precompilation
# never saw — with warm_only routing they must stay request-scale
COLD_TEXTS = [
    "a short cold shape probe",
    "this particular cold probe sentence lands on yet another phoneme "
    "bucket that the precompiled ladder has never seen before",
]


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def run_soak(args, synth, server):
    """Sustained mixed-traffic soak (VERDICT r3 next #4): concurrency
    ramp, mixed lengths incl. >bucket segmentation, cold-shape
    injections, optional speaker-conditioned traffic; reports served
    RTF, p50/p99, error rate, and RSS stability."""
    import random
    from urllib.parse import quote

    base = f"http://127.0.0.1:{args.port}/tts?text="
    mix = [("short", SHORT_TEXT, 3), ("medium", MEDIUM_TEXT, 3),
           ("long", args.text, 3), ("xlong", XLONG_TEXT, 1)]
    pool = [(k, base + quote(t)) for k, t, w in mix for _ in range(w)]

    levels = [1]
    while levels[-1] < args.clients:
        levels.append(min(levels[-1] * 2, args.clients))
    soak_secs = args.soak * 60.0
    phase_secs = soak_secs / len(levels)
    t_start = time.time()
    t_end = t_start + soak_secs

    def level_now():
        i = min(int((time.time() - t_start) / phase_secs), len(levels) - 1)
        return levels[i]

    external = server is None

    def _server_stat():
        """(rss_mb, generation): own process when in-process, /statusz
        when driving an external serve.py (worker recycles re-exec it,
        so /proc/self would be the wrong process)."""
        if not external:
            return _rss_mb(), 0
        try:
            import json as _json

            with urllib.request.urlopen(
                    f"http://127.0.0.1:{args.port}/statusz",
                    timeout=10) as r:
                s = _json.loads(r.read())
            return s["rss_mb"], s["generation"]
        except Exception:
            return float("nan"), -1  # mid-recycle: server re-warming

    records = []  # (t, latency_s, voice_s, kind, level, ok, sheds)
    rec_lock = threading.Lock()
    rss_samples = [(0.0,) + _server_stat()]

    def one_request(kind, url, rng):
        """One logical request, as a production client behaves: a 503 +
        Retry-After (queue shed, breaker open, or a worker recycle's
        warm-up window) is honored — wait, retry — rather than counted
        as a hard error.  ``sheds`` counts the 503s absorbed; latency is
        end-to-end including the retry waits, so recycle windows show up
        honestly in the percentiles."""
        import urllib.error

        if args.n_speakers > 1 and rng.random() < 0.2:
            url += f"&speaker={rng.randrange(args.n_speakers)}"
            kind += "+spk"
        lvl = level_now()
        t0 = time.time()
        deadline = min(t0 + 600.0, t_end + 120.0)
        sheds = 0
        while True:
            try:
                with urllib.request.urlopen(url, timeout=120) as r:
                    nbytes = len(r.read())
                ok, voice = True, max(0, nbytes - 44) / 2 / 22050.0
                break
            except urllib.error.HTTPError as e:
                if e.code == 503 and time.time() < deadline:
                    sheds += 1
                    try:
                        wait = float(e.headers.get("Retry-After", "5"))
                    except (TypeError, ValueError):
                        wait = 5.0
                    # exponential backoff + full jitter on top of the
                    # server hint: naive fixed-interval retries at high
                    # concurrency re-offer the whole shed load at once
                    # and a shed storm self-amplifies (observed in the
                    # round-5 soak: level-64 p50 climbed to ~200 s)
                    cap = min(max(wait, 2.0) * (2.0 ** min(sheds - 1, 4)),
                              60.0)
                    time.sleep(1.0 + rng.random() * cap)
                    continue
                ok, voice = False, 0.0
                break
            except Exception:
                ok, voice = False, 0.0
                break
        with rec_lock:
            records.append((time.time() - t_start, time.time() - t0,
                            voice, kind, lvl, ok, sheds))

    def client(ci):
        rng = random.Random(ci)
        while time.time() < t_end:
            if ci >= level_now():  # not yet ramped in
                time.sleep(0.5)
                continue
            kind, url = pool[rng.randrange(len(pool))]
            one_request(kind, url, rng)

    def injector():
        rng = random.Random(999)
        while time.time() < t_end:
            time.sleep(30)
            if time.time() >= t_end:
                break
            one_request("cold", base + quote(rng.choice(COLD_TEXTS)), rng)

    def monitor():
        while time.time() < t_end:
            time.sleep(15)
            rss_samples.append((time.time() - t_start,) + _server_stat())

    threads = ([threading.Thread(target=client, args=(i,))
                for i in range(args.clients)]
               + [threading.Thread(target=injector, daemon=True),
                  threading.Thread(target=monitor, daemon=True)])
    for th in threads:
        th.start()
    for th in threads[:args.clients]:
        th.join()
    wall = time.time() - t_start
    if server is not None:
        server.shutdown()
    rss_samples.append((wall,) + _server_stat())

    oks = [r for r in records if r[5]]
    errs = [r for r in records if not r[5]]
    lat = np.array([r[1] for r in oks]) * 1e3
    served = sum(r[2] for r in oks)
    shed_total = sum(r[6] for r in records)
    shed_reqs = sum(1 for r in records if r[6])
    print(f"\nsoak: {wall / 60:.1f} min, {len(records)} requests "
          f"({len(errs)} errors, {len(errs) / max(1, len(records)):.2%}), "
          f"ramp {levels}", flush=True)
    print(f"503 sheds absorbed: {shed_total} across {shed_reqs} requests "
          f"({shed_reqs / max(1, len(records)):.2%} of requests saw a "
          f"shed; all retried to completion unless counted as errors)",
          flush=True)
    print(f"overall: served {served:.0f}s audio -> served RTF "
          f"{served / wall:.1f}; latency p50 {np.percentile(lat, 50):.0f} "
          f"p90 {np.percentile(lat, 90):.0f} "
          f"p99 {np.percentile(lat, 99):.0f} ms", flush=True)
    for lvl in levels:
        sub = [r for r in oks if r[4] == lvl]
        if not sub:
            continue
        sl = np.array([r[1] for r in sub]) * 1e3
        sv = sum(r[2] for r in sub)
        span = max(r[0] for r in sub) - min(r[0] for r in sub) + 1e-9
        print(f"  level {lvl:>3}: {len(sub):>5} reqs  RTF {sv / span:7.1f}"
              f"  p50 {np.percentile(sl, 50):6.0f}  "
              f"p99 {np.percentile(sl, 99):6.0f} ms", flush=True)
    for kind in ("short", "medium", "long", "xlong", "cold"):
        sub = np.array([r[1] for r in oks if r[3].startswith(kind)]) * 1e3
        if len(sub):
            print(f"  {kind:>6}: n {len(sub):>5}  p50 "
                  f"{np.percentile(sub, 50):6.0f}  "
                  f"p99 {np.percentile(sub, 99):6.0f} ms", flush=True)
    spk = np.array([r[1] for r in oks if r[3].endswith("+spk")]) * 1e3
    if len(spk):
        print(f"  spkcnd: n {len(spk):>5}  p50 {np.percentile(spk, 50):6.0f}"
              f"  p99 {np.percentile(spk, 99):6.0f} ms", flush=True)
    rss = [m for _, m, _ in rss_samples if np.isfinite(m)]
    print(f"rss MB: start {rss[0]:.0f}  max {max(rss):.0f}  "
          f"end {rss[-1]:.0f}  (drift {rss[-1] - rss[0]:+.0f})",
          flush=True)
    gens = [g for _, _, g in rss_samples if g >= 0]
    if external and gens:
        recycles = gens[-1] - gens[0]
        warming = sum(1 for _, _, g in rss_samples if g < 0)
        print(f"worker recycles observed: {recycles} "
              f"(generation {gens[0]} -> {gens[-1]}; "
              f"{warming} samples landed mid-warmup)", flush=True)
        # p99 across recycle windows: requests completing within ±30 s
        # of a generation change (VERDICT r4 next #3 reporting)
        changes = [t for (t, _, g1), (_, _, g0) in
                   zip(rss_samples[1:], rss_samples) if g0 >= 0
                   and g1 >= 0 and g1 != g0]
        near = [r[1] for r in oks
                if any(abs(r[0] - c) < 30 for c in changes)]
        if near:
            nl = np.array(near) * 1e3
            print(f"recycle-window requests: n {len(near)}  "
                  f"p50 {np.percentile(nl, 50):.0f}  "
                  f"p99 {np.percentile(nl, 99):.0f} ms", flush=True)


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
    parser.add_argument("--soak", type=float, default=0.0, metavar="MIN",
                        help="soak mode (VERDICT r3 next #4): run for "
                             "MIN minutes of sustained mixed traffic — "
                             "concurrency ramps 1→--clients in pow2 "
                             "phases, text lengths mix short/medium/"
                             "long/segmentation-path (>bucket), cold "
                             "shapes inject every ~30 s, "
                             "speaker-conditioned requests mix in when "
                             "--n-speakers > 1.  Reports per-phase and "
                             "overall served RTF, p50/p99, error rate, "
                             "and RSS stability")
    parser.add_argument("--n-speakers", type=int, default=1,
                        help="build the served model with this many "
                             "speakers; soak traffic then includes "
                             "?speaker=K requests (direct path)")
    parser.add_argument("--vocoder-mode", default="folded_pallas",
                        help="folded_pallas (TPU default) or folded "
                             "(pure-XLA — lets the soak harness smoke "
                             "on CPU)")
    parser.add_argument("--max-programs", type=int, default=0,
                        help="cap live compiled programs (LRU eviction "
                             "past it, precompiled ladder pinned) — "
                             "exercises serve.py's --max-programs RSS "
                             "bound under soak traffic; 0 = unbounded")
    parser.add_argument("--max-batch", type=int, default=0,
                        help="cap the batcher / precompile ladder "
                             "(default max(32, --clients); CPU smoke "
                             "runs want a small cap — each ladder rung "
                             "is a 30-120 s CPU compile)")
    parser.add_argument("--external", action="store_true",
                        help="don't spawn an in-process server: drive an "
                             "already-running serve.py on --port.  "
                             "Required to soak the --rss-limit-mb worker-"
                             "recycle path (a re-exec would kill this "
                             "harness if the server lived in-process); "
                             "RSS/generation then come from /statusz")
    args = parser.parse_args()

    if args.external:
        if not args.soak:
            raise SystemExit("--external requires --soak")
        # readiness probe: serve.py may still be warming up
        url = f"http://127.0.0.1:{args.port}/healthz"
        deadline = time.time() + 600
        while True:
            try:
                with urllib.request.urlopen(url, timeout=5) as r:
                    if r.read() == b"ok":
                        break
            except Exception:
                if time.time() > deadline:
                    raise SystemExit(f"server on :{args.port} never "
                                     "became healthy")
                time.sleep(2)
        run_soak(args, None, None)
        return

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
        transfer=args.transfer, vocoder_mode=args.vocoder_mode,
        bench_duration_bias=6.0,
        model_overrides={"n_speakers": args.n_speakers}
        if args.n_speakers > 1 else None)
    synth.warmup(args.text, iters=2)
    # warm every pow2 batch shape the batcher can hit (mirrors serve.py
    # main()'s precompile loop — a cold shape stalls a whole dispatch
    # generation for the remote-compile time)
    max_batch = args.max_batch or max(32, args.clients)
    b = 2
    while b <= max_batch:
        synth.tts_batch([args.text] * b)
        b *= 2
    if args.cold_shape:
        # serving mode: cold shapes route to the next-larger warm program
        # instead of compiling inline (Synthesizer._route_warm)
        synth.warm_only = True
    if args.max_programs:
        synth.pin_programs()  # the ladder above stays resident
        synth.max_programs = args.max_programs

    lock = threading.Lock()
    handler = make_handler(synth, lock=lock, dynamic_batch=True,
                           batch_window_ms=args.batch_window_ms,
                           max_batch=max_batch)
    server = ThreadingHTTPServer(("127.0.0.1", args.port), handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    from urllib.parse import quote

    if args.soak > 0:
        run_soak(args, synth, server)
        return

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
