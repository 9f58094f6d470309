"""Serving layer test: in-process HTTP server, /tts returns a valid WAV."""

import threading
import urllib.request

import numpy as np

import jax.numpy as jnp


def test_serve_tts_roundtrip():
    from http.server import ThreadingHTTPServer

    from efficientspeech_tpu.infer import build_synthesizer
    from serve import wav_bytes

    synth = build_synthesizer(preset="tiny", hifigan_checkpoint="",
                              dtype=jnp.float32, bench_duration_bias=4.0)
    synth.phoneme_buckets = (16, 32)
    synth.mel_expansion = 6

    # reuse serve.py's handler wiring inline (the module-level main() binds
    # flags; here we exercise the same request path)
    import urllib.parse
    from http.server import BaseHTTPRequestHandler

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path == "/healthz":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"ok")
                return
            q = urllib.parse.parse_qs(parsed.query)
            text = (q.get("text") or [""])[0]
            with lock:
                wav, info = synth.tts(text)
            payload = wav_bytes(wav, synth.sampling_rate, 32768.0)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert r.read() == b"ok"
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/tts?text=hello+world",
                timeout=300) as r:
            data = r.read()
        assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
        pcm = np.frombuffer(data[44:], dtype="<i2")
        assert len(pcm) > 0
        assert np.isfinite(pcm.astype(np.float32)).all()
    finally:
        server.shutdown()
