#!/usr/bin/env python3
"""Minimal TTS serving layer: a warm Synthesizer behind HTTP.

The reference has no serving story (its GUI demo is bit-rotted,
reference: scripts/demo.py); this provides the production-shaped analogue:
programs are compiled at startup (one per length bucket), requests reuse
them, responses stream 16-bit WAV.

    python serve.py --preset tiny --checkpoint ... --port 8000
    curl "localhost:8000/tts?text=hello+world" -o out.wav
    curl -N "localhost:8000/tts_stream?text=..." -o out.wav   # chunked
    curl "localhost:8000/healthz"

/tts_stream emits audio per {sp}-bounded segment as it is synthesized
(chunked transfer encoding): time-to-first-audio is one segment's latency
instead of the whole text's.
"""

import argparse
import struct
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_WAV_FMT = struct.pack("<IHHIIHH", 16, 1, 1, 22050, 22050 * 2, 2, 16)

# Browser playback UI (the reference's GUI demo analogue,
# reference: demo.py:126-143 / scripts/demo.py — replaced by a zero-
# dependency HTML page over the same /tts endpoints).
INDEX_HTML = b"""<!doctype html>
<html><head><meta charset="utf-8"><title>EfficientSpeech TPU</title>
<style>
 body{font-family:system-ui,sans-serif;max-width:720px;margin:3rem auto;
      padding:0 1rem;color:#222}
 textarea{width:100%;height:7rem;font:inherit;padding:.5rem;
          box-sizing:border-box}
 button{font:inherit;padding:.5rem 1.5rem;margin-right:.5rem;cursor:pointer}
 #stats{color:#666;margin-top:.75rem;font-size:.9rem}
 audio{width:100%;margin-top:1rem}
</style></head><body>
<h2>EfficientSpeech &middot; TPU</h2>
<p>Type text, press Synthesize (buffered) or Stream (chunked WAV &mdash;
audio starts after the first segment).</p>
<textarea id="t">The quick brown fox jumps over the lazy dog.</textarea>
<div>
 <button onclick="go('/tts')">Synthesize</button>
 <button onclick="go('/tts_stream')">Stream</button>
</div>
<div id="stats"></div>
<audio id="a" controls></audio>
<script>
async function go(ep){
  const text=document.getElementById('t').value.trim();
  if(!text)return;
  const t0=performance.now();
  const url=ep+'?text='+encodeURIComponent(text);
  const a=document.getElementById('a');
  const s=document.getElementById('stats');
  s.textContent='synthesizing\\u2026';
  try{
    const r=await fetch(url);
    if(!r.ok){s.textContent='error: '+await r.text();return;}
    const blob=await r.blob();
    const ms=performance.now()-t0;
    const rtf=r.headers.get('X-RTF');
    s.textContent='latency '+ms.toFixed(0)+' ms'+(rtf?'  \\u00b7  RTF '+rtf:'');
    a.src=URL.createObjectURL(blob);
    a.play();
  }catch(e){s.textContent='error: '+e;}
}
</script></body></html>
"""


def wav_header(n_pcm_bytes: int, sampling_rate: int) -> bytes:
    """RIFF header; pass n_pcm_bytes=0xFFFFFFF0 for streaming (unknown
    length — players accept the over-long size)."""
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, sampling_rate,
                      sampling_rate * 2, 2, 16)
    riff_len = (36 + n_pcm_bytes) & 0xFFFFFFFF
    return (b"RIFF" + struct.pack("<I", riff_len) + b"WAVEfmt " + fmt
            + b"data" + struct.pack("<I", n_pcm_bytes & 0xFFFFFFFF))


def pcm16(wav, max_wav_value: float) -> bytes:
    return np.clip(wav * max_wav_value, -max_wav_value,
                   max_wav_value - 1).astype("<i2").tobytes()


def wav_bytes(wav, sampling_rate: int, max_wav_value: float) -> bytes:
    pcm = pcm16(wav, max_wav_value)
    return wav_header(len(pcm), sampling_rate) + pcm


class CircuitBreaker:
    """Fail fast while the device is wedged; recover automatically.

    A fetch deadline expiry (SynthesisTimeout) opens the breaker for
    ``cooldown_s``: requests during that window get an immediate 503 +
    Retry-After instead of piling 30 s watchdog waits onto a relay that
    is already stuck (the relay is FIFO — queued dispatches make the
    wedge worse).  After the cooldown the next request probes the
    device (half-open); success closes the breaker."""

    def __init__(self, cooldown_s: float = 10.0):
        self.cooldown_s = cooldown_s
        self._open_until = 0.0
        self._lock = threading.Lock()

    def trip(self):
        with self._lock:
            self._open_until = time.time() + self.cooldown_s

    def close(self):
        with self._lock:
            self._open_until = 0.0

    def is_open(self) -> bool:
        return time.time() < self._open_until

    def retry_after(self) -> int:
        return max(1, int(self._open_until - time.time() + 0.999))


class RequestShed(Exception):
    """Request shed before dispatch (queue deadline exceeded or breaker
    open); maps to 503."""

    def __init__(self, msg: str, retry_after: int = 1):
        super().__init__(msg)
        self.retry_after = retry_after


def rss_mb() -> float:
    """This process's resident set size in MB (/proc, Linux)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


class ServeState:
    """Cross-request serving state: in-flight counter (drained before a
    recycle) and the recycle generation (inherited across re-execs via
    SERVE_GENERATION)."""

    def __init__(self, generation: int = 0):
        self.generation = generation
        self.draining = False
        # ready=False (set by main() during warm-up) sheds /tts with a
        # fast 503 + Retry-After instead of parking clients in the
        # kernel backlog past their timeouts — the "brief 503 window"
        # a recycle shows clients
        self.ready = True
        self._inflight = 0
        self._lock = threading.Lock()
        self._idle = threading.Condition(self._lock)

    def enter(self):
        with self._lock:
            self._inflight += 1

    def leave(self):
        with self._idle:
            self._inflight -= 1
            if self._inflight <= 0:
                self._idle.notify_all()

    @property
    def inflight(self) -> int:
        with self._lock:
            return self._inflight

    def wait_idle(self, timeout_s: float) -> bool:
        deadline = time.time() + timeout_s
        with self._idle:
            while self._inflight > 0:
                left = deadline - time.time()
                if left <= 0:
                    return False
                self._idle.wait(left)
        return True


def reexec_with_socket(server) -> None:
    """Replace this process with a fresh serve.py, handing the LISTENING
    socket across the exec: the child adopts it (SERVE_INHERIT_FD), so
    connections arriving during its warmup queue in the kernel backlog
    instead of being refused.  Never returns."""
    import os
    import sys

    sock = server.socket
    sock.set_inheritable(True)
    os.environ["SERVE_INHERIT_FD"] = str(sock.fileno())
    os.environ["SERVE_GENERATION"] = str(
        int(os.environ.get("SERVE_GENERATION", "0")) + 1)
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(sys.executable, [sys.executable] + sys.argv)


def make_server(host: str, port: int, handler) -> ThreadingHTTPServer:
    """ThreadingHTTPServer that adopts an inherited listening socket
    (post-recycle child) instead of binding when SERVE_INHERIT_FD is
    set — the socket never closes across recycles, so no client ever
    sees a refused connection."""
    import os
    import socket as socketlib

    class _Server(ThreadingHTTPServer):
        # connections arriving during a recycle's re-warm queue here in
        # the kernel backlog; the stdlib default (5) would drop SYNs
        # under any real client count
        request_queue_size = 128

    fd = os.environ.pop("SERVE_INHERIT_FD", None)
    if fd is None:
        return _Server((host, port), handler)
    server = _Server((host, port), handler, bind_and_activate=False)
    server.socket.close()
    server.socket = socketlib.socket(fileno=int(fd))
    server.server_address = server.socket.getsockname()
    server.server_name = socketlib.getfqdn(host)
    server.server_port = server.server_address[1]
    return server


class RssRecycler:
    """Worker-recycle watchdog (VERDICT r4 next #3).

    On this rig the serving RSS grows below JAX's jit layer (relay-
    plugin/XLA process caches that program eviction cannot free —
    STATUS round-4 session 8), so a long-lived server eventually needs
    a restart.  The persistent XLA compile cache makes a warm restart
    cheap; this automates it: when RSS exceeds ``limit_mb``, stop
    accepting (server.shutdown() — the listening socket STAYS open, new
    connections wait in the kernel backlog), drain in-flight requests,
    and re-exec the server in place.  The child adopts the socket and
    re-warms from the compile cache; clients see a latency bump, not
    errors.

    ``exec_fn``/``rss_fn`` are injectable for tests."""

    def __init__(self, server, state: ServeState, limit_mb: float,
                 check_interval_s: float = 5.0,
                 drain_timeout_s: float = 120.0,
                 min_uptime_s: float = 120.0,
                 headroom_mb: float = 512.0,
                 arm_guard: bool = True,
                 compile_lock=None, synth=None,
                 exec_fn=None, rss_fn=None):
        self.server = server
        self.state = state
        self.limit_mb = limit_mb
        self.check_interval_s = check_interval_s
        self.drain_timeout_s = drain_timeout_s
        self.min_uptime_s = min_uptime_s
        self.headroom_mb = headroom_mb
        self.arm_guard = arm_guard
        self.compile_lock = compile_lock
        self.synth = synth
        self.exec_fn = exec_fn or reexec_with_socket
        self.rss_fn = rss_fn or rss_mb
        self.recycling = False
        self._armed_at = None
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        # recycle-loop guard: if RSS already sits at/above the limit when
        # the watchdog arms (the warm server's floor on this rig can be
        # above a low limit), an unmodified limit would recycle forever
        # without serving a single request — raise the effective limit to
        # the observed floor plus headroom, loudly
        mb = self.rss_fn()
        if self.arm_guard and mb >= self.limit_mb:
            eff = mb + self.headroom_mb
            print(f"[serve] RSS {mb:.0f} MB already >= limit "
                  f"{self.limit_mb:.0f} MB at arm time: raising effective "
                  f"limit to {eff:.0f} MB (recycle-loop guard)", flush=True)
            self.limit_mb = eff
        self._armed_at = time.time()
        self._thread.start()

    def _run(self):
        while True:
            time.sleep(self.check_interval_s)
            mb = self.rss_fn()
            # min-uptime: never recycle within min_uptime_s of arming —
            # each generation must actually serve before the next re-warm
            if (mb > self.limit_mb
                    and time.time() - self._armed_at >= self.min_uptime_s):
                print(f"[serve] RSS {mb:.0f} MB > limit "
                      f"{self.limit_mb:.0f} MB: recycling worker "
                      f"(generation {self.state.generation})", flush=True)
                self.recycle()
                return

    def recycle(self):
        self.recycling = True
        self.state.draining = True
        # stop the accept loop; the listening socket remains open so the
        # kernel backlog buffers new connections through the re-exec
        threading.Thread(target=self.server.shutdown, daemon=True).start()
        drained = self.state.wait_idle(self.drain_timeout_s)
        print(f"[serve] drained={drained} inflight={self.state.inflight}; "
              f"re-exec", flush=True)
        if self.compile_lock is not None:
            # quiesce the background compile thread: exec'ing mid-remote-
            # compile kills the compile HTTP request and can wedge the
            # tunneled relay for 10-30 min (measured) — wait for the
            # in-flight compile (the thread starts no new one while
            # draining).  Not released: we exec immediately after.
            t0 = time.time()
            got = self.compile_lock.acquire(timeout=600.0)
            print(f"[serve] bg-compile quiesce "
                  f"{'ok' if got else 'TIMED OUT'} "
                  f"({time.time() - t0:.1f}s)", flush=True)
        if self.synth is not None:
            # watchdog-abandoned fetches outlive their (503'd, drained)
            # requests with a thread still parked inside the relay call;
            # exec'ing kills that transfer mid-round and wedges the relay
            # (round-5 soak: one such recycle cost a 776 s re-warm).
            # Wait them out, bounded: if one never drains the relay is
            # already wedged and exec'ing can't make it worse.
            t0 = time.time()
            while (n := self.synth.pending_fetches()) > 0 \
                    and time.time() - t0 < 300.0:
                time.sleep(0.5)
            print(f"[serve] fetch quiesce "
                  f"{'ok' if n == 0 else f'TIMED OUT ({n} live)'} "
                  f"({time.time() - t0:.1f}s)", flush=True)
        self.exec_fn(self.server)


class DynamicBatcher:
    """Aggregate concurrent /tts requests into one fused batched dispatch.

    The device round-trip dominates per-request latency on tunneled TPUs
    (and is fixed-cost on any accelerator); batching amortizes it — the
    measured batch-32 throughput is ~1.6× the single-stream RTF.  Requests
    arriving within ``window_ms`` of the first pending one are synthesized
    together via ``tts_batch`` (one dispatch + one fetch for the whole
    group); a lone request pays only the window.

    The reference has no serving layer at all; this is the production
    analogue of the dynamic batching every TTS service ends up building.
    """

    def __init__(self, synth, lock, window_ms: float = 8.0,
                 max_batch: int = 32, queue_deadline_s=None,
                 breaker=None):
        self.synth = synth
        self.lock = lock
        self.window = window_ms / 1e3
        self.max_batch = max_batch
        # a request older than this when its dispatch slot arrives is
        # shed with 503 instead of synthesized late (the client has
        # typically given up; synthesizing for a gone client steals
        # capacity from live ones)
        self.queue_deadline_s = queue_deadline_s
        self.breaker = breaker
        self._mutex = threading.Lock()
        self._pending = []
        self._wake = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # submit() polls at this granularity so a dead worker thread surfaces
    # as a 5xx instead of leaving HTTP handler threads blocked forever
    WAIT_SLICE_SECS = 5.0

    def submit(self, text: str):
        done = threading.Event()
        box = {}
        with self._mutex:
            self._pending.append((text, done, box, time.time()))
        self._wake.set()
        while not done.wait(self.WAIT_SLICE_SECS):
            if not self._worker.is_alive():
                raise RuntimeError("synthesis worker died")
        if "error" in box:
            raise box["error"]
        return box["wav"], box["info"]

    def _shed_stale(self):
        """Fail queued requests that outlived the deadline (503)."""
        if self.queue_deadline_s is None:
            return
        now = time.time()
        with self._mutex:
            stale = [e for e in self._pending
                     if now - e[3] > self.queue_deadline_s]
            self._pending = [e for e in self._pending
                             if now - e[3] <= self.queue_deadline_s]
        for _, done, box, t_in in stale:
            box["error"] = RequestShed(
                f"shed after {now - t_in:.1f}s in queue "
                f"(deadline {self.queue_deadline_s:.1f}s)")
            done.set()

    def _run(self):
        while True:
            self._wake.wait()
            with self._mutex:
                backlog = len(self._pending)
            if backlog < self.max_batch:
                time.sleep(self.window)  # collection window
            # else: a full batch is already waiting — drain immediately
            self._shed_stale()
            with self._mutex:
                group = self._pending[: self.max_batch]
                self._pending = self._pending[self.max_batch:]
                if not self._pending:
                    self._wake.clear()
            if not group:
                continue
            texts = [t for t, _, _, _ in group]
            try:
                with self.lock:
                    outs = self.synth.tts_batch(texts)
                if self.breaker is not None:
                    self.breaker.close()  # healthy dispatch: close breaker
                voice_total = sum(info["voice_secs"] for _, info in outs)
                for (t, done, box, _), (wav, info) in zip(group, outs):
                    box["wav"] = wav
                    # rtf = this request's share of the batch dispatch;
                    # batch_rtf = the aggregate throughput of the fused
                    # dispatch (total voice secs / elapsed) — the number
                    # that is comparable across batch sizes
                    box["info"] = dict(
                        info, batch_size=len(group),
                        rtf=info["voice_secs"]
                        / max(info["batch_secs"], 1e-9),
                        batch_rtf=voice_total
                        / max(info["batch_secs"], 1e-9))
                    done.set()
            except BaseException as e:  # deliver the failure to every waiter
                from efficientspeech_tpu.infer import SynthesisTimeout

                if isinstance(e, SynthesisTimeout) and self.breaker:
                    self.breaker.trip()  # wedged device: fail fast now
                for _, done, box, _ in group:
                    box["error"] = (e if isinstance(e, Exception)
                                    else RuntimeError(repr(e)))
                    done.set()
                if not isinstance(e, Exception):
                    raise


def make_handler(synth, lock=None, stream_segment_phonemes=None,
                 dynamic_batch: bool = False,
                 batch_window_ms: float = 8.0, max_batch: int = 32,
                 fetch_timeout_s=None, queue_deadline_s=None,
                 breaker_cooldown_s: float = 10.0,
                 state: ServeState = None):
    """Build the request handler around a warm Synthesizer (shared by
    serve.py main() and the tests).

    Deadline-and-shed behavior (VERDICT r3 next #3): ``fetch_timeout_s``
    arms the Synthesizer's per-dispatch watchdog (a wedged relay round
    becomes SynthesisTimeout → HTTP 503 + Retry-After instead of an
    indefinite hang), a timeout opens a circuit breaker for
    ``breaker_cooldown_s`` (immediate 503s, no new dispatches piled on
    the wedged FIFO relay), and queued requests older than
    ``queue_deadline_s`` are shed with 503 before dispatch."""
    lock = lock or threading.Lock()  # one device stream; serialize synthesis
    state = state or ServeState()
    if fetch_timeout_s is not None:
        synth.fetch_timeout_s = fetch_timeout_s
    breaker = CircuitBreaker(cooldown_s=breaker_cooldown_s)
    batcher = DynamicBatcher(synth, lock, window_ms=batch_window_ms,
                             max_batch=max_batch,
                             queue_deadline_s=queue_deadline_s,
                             breaker=breaker) if dynamic_batch else None

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _chunk(self, data: bytes):
            self.wfile.write(f"{len(data):X}\r\n".encode())
            self.wfile.write(data)
            self.wfile.write(b"\r\n")
            self.wfile.flush()

        def _unavailable(self, msg: str, retry_after: int):
            body = msg.encode()
            self.send_response(503)
            self.send_header("Retry-After", str(retry_after))
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            state.enter()  # drained before a worker recycle (RssRecycler)
            try:
                self._do_GET()
            finally:
                state.leave()

        def _do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path == "/statusz":
                import json as _json

                body = _json.dumps({
                    "generation": state.generation,
                    "rss_mb": round(rss_mb(), 1),
                    "inflight": state.inflight,
                    "ready": state.ready,
                    "draining": state.draining}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if parsed.path == "/healthz":
                if not state.ready:
                    self._unavailable("warming", 15)
                    return
                body = b"ok"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if parsed.path in ("/", "/index.html"):
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(INDEX_HTML)))
                self.end_headers()
                self.wfile.write(INDEX_HTML)
                return
            if parsed.path not in ("/tts", "/tts_stream"):
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            q = urllib.parse.parse_qs(parsed.query)
            text = (q.get("text") or [""])[0]
            if not text:
                body = b"missing ?text="
                self.send_response(400)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            # optional multi-speaker conditioning (?speaker=K); a
            # speaker-conditioned request takes the direct path — the
            # batcher fuses same-conditioning requests only
            try:
                speaker = int((q.get("speaker") or ["-1"])[0])
            except ValueError:
                speaker = -1
            speaker = speaker if speaker >= 0 else None
            if not state.ready:
                # warm-up / post-recycle re-warm: shed fast with a retry
                # hint instead of blocking on the synth lock for minutes
                self._unavailable("warming up (worker recycle)", 30)
                return
            if breaker.is_open():
                # device wedged moments ago: shed immediately instead of
                # stacking watchdog waits on the FIFO relay
                self._unavailable("device unavailable (circuit open)",
                                  breaker.retry_after())
                return
            max_wav = synth.preprocess_cfg.audio.max_wav_value
            t0 = time.time()

            if parsed.path == "/tts_stream":
                # chunked WAV: header first, then PCM per synthesized
                # segment — first audio after ONE segment's latency
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                self._chunk(wav_header(0xFFFFFFF0 - 36,
                                       synth.sampling_rate))
                first_ms = None
                # hold the device lock per SEGMENT, not across client
                # writes: a slow-draining client must never stall other
                # requests' synthesis
                from efficientspeech_tpu.infer import SynthesisTimeout

                seg_gen = synth.tts_stream(
                    text, segment_phonemes=stream_segment_phonemes)
                while True:
                    with lock:
                        try:
                            wav, info = next(seg_gen)
                        except StopIteration:
                            break
                        except SynthesisTimeout as e:
                            # headers already sent — the honest move is
                            # to end the stream early (client hears the
                            # segments that made it) and open the
                            # breaker for everyone else
                            breaker.trip()
                            print(f"[serve] /tts_stream timeout: {e}")
                            break
                    if first_ms is None:
                        first_ms = (time.time() - t0) * 1e3
                    self._chunk(pcm16(wav, max_wav))
                self._chunk(b"")  # terminator
                print(f"[serve] /tts_stream first-audio "
                      f"{first_ms if first_ms is None else round(first_ms, 1)}"
                      f" ms, total {(time.time() - t0) * 1e3:.1f} ms")
                return

            from efficientspeech_tpu.infer import SynthesisTimeout

            try:
                if batcher is not None and speaker is None:
                    wav, info = batcher.submit(text)
                else:
                    with lock:
                        wav, info = synth.tts(text, speaker=speaker)
                        breaker.close()
            except SynthesisTimeout as e:
                # wedged dispatch: 503 now, breaker sheds the pile-up;
                # the relay recovering closes it on the next success
                breaker.trip()
                self._unavailable(f"synthesis timed out: {e}",
                                  breaker.retry_after())
                return
            except RequestShed as e:
                self._unavailable(str(e), e.retry_after)
                return
            except Exception as e:
                body = f"synthesis failed: {e}".encode()
                self.send_response(500)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            payload = wav_bytes(wav, synth.sampling_rate, max_wav)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(payload)))
            if "batch_size" in info:
                self.send_header("X-Batch-Size", str(info["batch_size"]))
            if "batch_rtf" in info:
                # aggregate throughput of the fused dispatch; X-RTF is this
                # request's share of it when X-Batch-Size > 1
                self.send_header("X-Batch-RTF", f"{info['batch_rtf']:.1f}")
            self.send_header("X-RTF", f"{info['rtf']:.1f}")
            self.send_header("X-Latency-Ms",
                             f"{(time.time() - t0) * 1e3:.1f}")
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, fmt, *a):
            print(f"[serve] {fmt % a}")

    return Handler


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="tiny",
                        choices=["tiny", "small", "base"])
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--hifigan-checkpoint",
                        default="/root/reference/hifigan/LJ_V2/generator_v2")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--transfer", default="int16",
                        choices=["f32", "int16", "mulaw", "adpcm4", "adpcm3", "adpcm2"],
                        help="device→host wire format (mulaw halves the "
                             "dominant transfer on tunneled links)")
    parser.add_argument("--stream-segment-phonemes", type=int, default=128)
    parser.add_argument("--dynamic-batch", action="store_true", default=True,
                        help="aggregate concurrent /tts requests into one "
                             "batched dispatch (default on)")
    parser.add_argument("--no-dynamic-batch", dest="dynamic_batch",
                        action="store_false")
    parser.add_argument("--batch-window-ms", type=float, default=8.0)
    parser.add_argument("--max-batch", type=int, default=32)
    parser.add_argument("--warmup-text",
                        default="the quick brown fox jumps over the lazy dog")
    parser.add_argument("--precompile-buckets", default="128,512",
                        help="comma-separated phoneme buckets to precompile "
                             "serving programs for (each at its default "
                             "speculative frame level, for every pow2 batch "
                             "size up to --max-batch); requests hitting "
                             "other shapes are routed to the next-larger "
                             "warm program instead of compiling inline")
    parser.add_argument("--bg-compile", action="store_true", default=True,
                        help="compile cold shapes in the background "
                             "(lower+compile off the serving path) so later "
                             "requests get the exact program (default on)")
    parser.add_argument("--no-bg-compile", dest="bg_compile",
                        action="store_false")
    parser.add_argument("--max-programs", type=int, default=64,
                        help="cap on live compiled serving programs: past "
                             "it the least-recently-used background-"
                             "compiled shape is evicted (the startup "
                             "ladder is pinned).  Bounds the program-"
                             "cache RSS growth the 12-min soak measured "
                             "(~2.8 GB); 0 = unbounded")
    parser.add_argument("--fetch-timeout", type=float, default=30.0,
                        help="per-dispatch watchdog (seconds): a device "
                             "fetch exceeding this returns 503 + "
                             "Retry-After instead of hanging the client "
                             "(the tunneled relay wedges for 10-30 min "
                             "occasionally); 0 disables")
    parser.add_argument("--queue-deadline", type=float, default=60.0,
                        help="shed queued requests older than this "
                             "(seconds) with 503 before dispatch; 0 "
                             "disables")
    parser.add_argument("--breaker-cooldown", type=float, default=10.0,
                        help="after a timeout, fail fast (503) for this "
                             "many seconds before probing the device "
                             "again")
    parser.add_argument("--rss-limit-mb", type=float, default=0.0,
                        help="recycle the worker when RSS exceeds this "
                             "(MB): drain in-flight requests, re-exec "
                             "with the listening socket handed across "
                             "(connections queue in the kernel backlog "
                             "during re-warm — no refusals).  Bounds "
                             "the below-jit RSS growth program eviction "
                             "cannot (relay-plugin/XLA process caches); "
                             "0 disables")
    parser.add_argument("--drain-timeout", type=float, default=120.0,
                        help="max seconds to wait for in-flight requests "
                             "before a recycle re-execs anyway")
    parser.add_argument("--min-uptime", type=float, default=120.0,
                        help="seconds after the RSS watchdog arms before "
                             "a recycle may fire — guarantees each "
                             "generation serves before re-warming (plus "
                             "an arm-time guard: a limit at/below the "
                             "warm RSS floor is raised to floor+512 MB)")
    from efficientspeech_tpu.config import add_arch_args, arch_overrides

    add_arch_args(parser)
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
        dtype=jnp.bfloat16, transfer=args.transfer,
        bench_duration_bias=None if args.checkpoint else 6.0,
        model_overrides=arch_overrides(args))
    # the server accepts IMMEDIATELY: until state.ready flips, /tts and
    # /healthz answer a fast 503 + Retry-After (the "brief 503 window"
    # clients see across a worker recycle) instead of parking
    # connections in the kernel backlog past their timeouts — on this
    # rig a fresh process's first device dispatch costs minutes
    state = ServeState(generation=int(os.environ.get("SERVE_GENERATION",
                                                     "0")))
    state.ready = False
    handler = make_handler(
        synth, stream_segment_phonemes=args.stream_segment_phonemes,
        dynamic_batch=args.dynamic_batch,
        batch_window_ms=args.batch_window_ms, max_batch=args.max_batch,
        fetch_timeout_s=args.fetch_timeout or None,
        queue_deadline_s=args.queue_deadline or None,
        breaker_cooldown_s=args.breaker_cooldown, state=state)
    server = make_server(args.host, args.port, handler)
    compile_lock = threading.Lock()

    buckets = sorted(int(x) for x in args.precompile_buckets.split(",")
                     if x)
    batch_sizes = [1]
    if args.dynamic_batch:
        b = 2
        while b <= args.max_batch:
            batch_sizes.append(b)
            b *= 2
    cover_batches = sorted({batch_sizes[0], batch_sizes[-1]})

    import queue

    cold_q = queue.Queue()
    if args.bg_compile:
        seen = set()

        def _on_cold(shape):
            if shape not in seen:
                seen.add(shape)
                cold_q.put(shape)

        synth.on_cold_shape = _on_cold

    def _init_and_warm():
        """One background thread owns every device compile, in order:
        warmup execution → coverage shapes → ready → remaining ladder
        rungs (pinned) → cold exact shapes as traffic finds them
        (evictable, bg_compile).  Single-threaded = serialized remote
        compiles; each takes compile_lock so a recycle never exec's
        mid-compile (which wedges the tunneled relay)."""
        print("warming up ...", flush=True)
        _tw = time.time()
        seq = synth.phonemize(args.warmup_text)
        for _it in range(2):
            _ti = time.time()
            with compile_lock:
                synth.synthesize_ids(seq)
            print(f"[serve] warmup iter {_it} {time.time() - _ti:.1f}s",
                  flush=True)
        # Coverage-first warm-up: one LARGEST-bucket program per batch
        # extreme — batch 1 (the single-stream router only matches
        # batch-1 programs) and the max batch (covers every fused batch
        # shape) — covers EVERY request shape via warm_only routing, so
        # the server is ready after ~2 compiles instead of the full
        # bucket×batch ladder.  The remaining rungs (tighter shapes =
        # less wasted compute per request) warm while serving; a cold
        # remote compile never happens inline — an unseen shape is
        # served by the next-larger warm program (numerically identical;
        # the extra buffer tail never crosses the link).
        t0 = time.time()
        with compile_lock:
            shapes = synth.precompile(buckets=buckets[-1:],
                                      batch_sizes=cover_batches)
        print(f"coverage shapes ready ({time.time() - t0:.1f}s): "
              f"{shapes}", flush=True)
        synth.warm_only = True
        synth.pin_programs()  # coverage stays; bg-compiled shapes evict
        synth.max_programs = args.max_programs or None
        state.ready = True
        print(f"[serve] ready: 503 window closed "
              f"(generation {state.generation})", flush=True)
        if args.rss_limit_mb > 0:
            RssRecycler(server, state, limit_mb=args.rss_limit_mb,
                        drain_timeout_s=args.drain_timeout,
                        min_uptime_s=args.min_uptime,
                        compile_lock=compile_lock, synth=synth).start()
            print(f"[serve] RSS watchdog armed: limit "
                  f"{args.rss_limit_mb:.0f} MB "
                  f"(generation {state.generation})", flush=True)
        for bkt in buckets:
            for bs in batch_sizes:
                if bkt == buckets[-1] and bs in cover_batches:
                    continue
                if state.draining:
                    return  # recycle imminent: start no new compile
                # FIFO-relay courtesy (see the cold loop below): wait
                # for a near-idle moment so ladder compiles don't block
                # live dispatches; coverage shapes serve correctly in
                # the meantime, so a delayed rung costs only a little
                # wasted batch compute per request
                t_wait = time.time()
                while state.inflight > 2 and time.time() - t_wait < 60.0:
                    time.sleep(1.0)
                    if state.draining:
                        return
                try:
                    with compile_lock:
                        done = synth.precompile(buckets=[bkt],
                                                batch_sizes=[bs])
                    synth.pin_programs(
                        shapes=[(bb, ff) for _, bb, ff in done])
                except Exception as e:
                    print(f"[serve] ladder warm ({bs},{bkt}) failed: "
                          f"{e}", flush=True)
        print(f"[serve] full ladder warm ({time.time() - t0:.1f}s): "
              f"{sorted(synth._warm_shapes)}", flush=True)
        while True:
            shape = cold_q.get()
            if state.draining:
                return
            # the relay is FIFO: a remote compile in flight blocks every
            # serving dispatch queued behind it (20-30 s even on compile-
            # cache hits — measured in the round-5 soak, where per-
            # generation cold recompiles starved high-concurrency
            # phases).  Wait for a near-idle moment, bounded so constant
            # load can't postpone warms forever.
            t_wait = time.time()
            while state.inflight > 2 and time.time() - t_wait < 120.0:
                time.sleep(1.0)
                if state.draining:
                    return
            try:
                print(f"[serve] background-compiling cold shape {shape} "
                      f"(waited {time.time() - t_wait:.0f}s for quiet)",
                      flush=True)
                with compile_lock:
                    synth.aot_compile(*shape)
                print(f"[serve] shape {shape} now warm", flush=True)
            except Exception as e:
                print(f"[serve] background compile of {shape} "
                      f"failed: {e}", flush=True)

    threading.Thread(target=_init_and_warm, daemon=True).start()
    print(f"serving on http://{args.host}:{args.port}  "
          f"(UI at /, /tts?text=..., /tts_stream?text=..., /healthz, "
          f"/statusz)  generation {state.generation} — 503 until warm",
          flush=True)
    server.serve_forever()
    # serve_forever returns when a recycle's shutdown() fires; the
    # RssRecycler thread drains in-flight requests and re-execs.  Keep
    # the process alive until exec happens.
    threading.Event().wait()


if __name__ == "__main__":
    main()
