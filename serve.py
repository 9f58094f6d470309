#!/usr/bin/env python3
"""Minimal TTS serving layer: a warm Synthesizer behind HTTP.

The reference has no serving story (its GUI demo is bit-rotted,
reference: scripts/demo.py); this provides the production-shaped analogue:
programs are compiled at startup (one per length bucket), requests reuse
them, responses stream 16-bit WAV.

    python serve.py --preset tiny --checkpoint ... --port 8000
    curl "localhost:8000/tts?text=hello+world" -o out.wav
    curl "localhost:8000/healthz"
"""

import argparse
import struct
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def wav_bytes(wav, sampling_rate: int, max_wav_value: float) -> bytes:
    import numpy as np

    pcm = np.clip(wav * max_wav_value, -max_wav_value,
                  max_wav_value - 1).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt " + \
        struct.pack("<IHHIIHH", 16, 1, 1, sampling_rate, sampling_rate * 2,
                    2, 16) + b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="tiny",
                        choices=["tiny", "small", "base"])
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--hifigan-checkpoint",
                        default="/root/reference/hifigan/LJ_V2/generator_v2")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--warmup-text",
                        default="the quick brown fox jumps over the lazy dog")
    args = parser.parse_args()

    import os

    import jax.numpy as jnp

    from efficientspeech_tpu.infer import build_synthesizer
    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    synth = build_synthesizer(
        preset=args.preset, checkpoint=args.checkpoint,
        hifigan_checkpoint=args.hifigan_checkpoint
        if os.path.isfile(args.hifigan_checkpoint) else "",
        dtype=jnp.bfloat16,
        bench_duration_bias=None if args.checkpoint else 6.0)
    print("warming up ...")
    synth.warmup(args.warmup_text, iters=2)
    lock = threading.Lock()  # one device stream; serialize synthesis

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path == "/healthz":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"ok")
                return
            if parsed.path != "/tts":
                self.send_response(404)
                self.end_headers()
                return
            q = urllib.parse.parse_qs(parsed.query)
            text = (q.get("text") or [""])[0]
            if not text:
                self.send_response(400)
                self.end_headers()
                self.wfile.write(b"missing ?text=")
                return
            t0 = time.time()
            with lock:
                wav, info = synth.tts(text)
            payload = wav_bytes(wav, synth.sampling_rate,
                                synth.preprocess_cfg.audio.max_wav_value)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(payload)))
            self.send_header("X-RTF", f"{info['rtf']:.1f}")
            self.send_header("X-Latency-Ms",
                             f"{(time.time() - t0) * 1e3:.1f}")
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, fmt, *a):
            print(f"[serve] {fmt % a}")

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"serving on http://{args.host}:{args.port}  (/tts?text=..., /healthz)")
    server.serve_forever()


if __name__ == "__main__":
    main()
