"""Serving layer tests: /tts returns a valid WAV; /tts_stream delivers the
first audio chunk BEFORE synthesis of later segments completes (streaming,
VERDICT round 1 item 9)."""

import http.client
import threading
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def synth():
    from efficientspeech_tpu.infer import build_synthesizer

    s = build_synthesizer(preset="tiny", hifigan_checkpoint="",
                          dtype=jnp.float32, bench_duration_bias=4.0)
    s.phoneme_buckets = (16, 32)
    s.mel_expansion = 6
    s.spec_min_frames = 32
    return s


def _start(handler):
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, server.server_address[1]


def test_serve_tts_roundtrip(synth):
    from serve import make_handler

    server, port = _start(make_handler(synth))
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


def test_serve_streaming_first_chunk_before_completion(synth):
    """Deterministic streaming proof: the generator GATES segment 2 on an
    event the client only sets after it has read first-segment audio — so a
    successful read of chunk 1 while ``produced_all`` is unset shows the
    server flushed audio before the response (or even synthesis) finished."""
    from serve import make_handler

    gate = threading.Event()
    produced_all = threading.Event()

    class GatedSynth:
        """Delegates to the real synthesizer but pauses after segment 1."""

        def __getattr__(self, name):
            return getattr(synth, name)

        def tts_stream(self, text, segment_phonemes=None):
            gen = synth.tts_stream(text, segment_phonemes=8)
            yield next(gen)
            assert gate.wait(timeout=120), "client never confirmed chunk 1"
            for item in gen:
                yield item
            produced_all.set()

    server, port = _start(make_handler(GatedSynth()))
    try:
        text = "hello there my good friend, how are you doing today"
        seq = synth.phonemize(text)
        assert len(synth._segment(seq, 8)) >= 2, "need a multi-segment text"

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("GET", "/tts_stream?text=" +
                     urllib.request.quote(text))
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Transfer-Encoding") == "chunked"

        header = resp.read(44)
        assert header[:4] == b"RIFF" and header[8:12] == b"WAVE"
        first_audio = resp.read(256)  # blocks until segment-1 PCM arrives
        assert len(first_audio) > 0
        # the audio is in hand while later segments are NOT yet synthesized
        assert not produced_all.is_set()

        gate.set()
        rest = resp.read()
        assert produced_all.is_set()
        pcm = np.frombuffer(first_audio + rest, dtype="<i2")
        assert len(pcm) > 0
        assert np.isfinite(pcm.astype(np.float32)).all()
        conn.close()
    finally:
        gate.set()
        server.shutdown()


def test_tts_stream_concat_matches_tts(synth):
    """Concatenated streamed segments == the one-shot synthesis of the same
    text at the same segmentation."""
    text = "the quick brown fox jumps over the lazy dog"
    seq = synth.phonemize(text)
    chunks = [w for w, _ in synth.tts_stream(text, segment_phonemes=8)]
    streamed = np.concatenate(chunks)
    segments = synth._segment(seq, 8)
    parts = [synth.synthesize_ids(s)[0] for s in segments]
    np.testing.assert_allclose(streamed, np.concatenate(parts), atol=1e-6)


def test_index_page_served(synth):
    from serve import make_handler

    server, port = _start(make_handler(synth))
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=30) as r:
            body = r.read()
        assert b"<audio" in body and b"/tts" in body
        assert r.headers["Content-Type"].startswith("text/html")
    finally:
        server.shutdown()


def test_fetch_timeout_503_breaker_and_recovery(synth):
    """Deadline-and-shed serving (VERDICT r3 next #3): a hung device
    fetch (simulated via the Synthesizer's fetch hook) returns a timely
    503 + Retry-After; while the circuit is open a second request gets
    an IMMEDIATE 503; once the fetch recovers and the cooldown passes,
    requests succeed again."""
    import time
    import urllib.error

    import jax

    from serve import make_handler

    release = threading.Event()
    hang = {"on": True}

    def hanging_fetch(tree):
        if hang["on"]:
            release.wait(timeout=60)  # simulated relay wedge
        return jax.device_get(tree)

    server, port = _start(make_handler(
        synth, fetch_timeout_s=0.3, breaker_cooldown_s=1.5))
    # warm the program first (compile must not eat the watchdog budget)
    synth._fetch_fn = None
    synth.fetch_timeout_s = None
    urllib.request.urlopen(
        f"http://127.0.0.1:{port}/tts?text=warm+me", timeout=600)
    synth.fetch_timeout_s = 0.3
    synth._fetch_fn = hanging_fetch
    try:
        t0 = time.time()
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/tts?text=hello", timeout=30)
        assert ei.value.code == 503
        assert int(ei.value.headers["Retry-After"]) >= 1
        assert time.time() - t0 < 10  # timely, not a 10-30 min hang
        # circuit open: the next request 503s immediately (no watchdog
        # wait, no new dispatch piled on the wedged relay)
        t1 = time.time()
        with pytest.raises(urllib.error.HTTPError) as e2:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/tts?text=world", timeout=30)
        assert e2.value.code == 503
        assert time.time() - t1 < 0.5
        # relay "recovers": cooldown expires, the next request probes
        # the device, succeeds, and closes the breaker
        hang["on"] = False
        release.set()
        time.sleep(1.6)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/tts?text=back+again",
                timeout=300) as r:
            data = r.read()
        assert data[:4] == b"RIFF"
    finally:
        synth._fetch_fn = None
        synth.fetch_timeout_s = None
        release.set()
        server.shutdown()


def test_queue_deadline_sheds_stale_requests(synth):
    """With the batcher's dispatch wedged, queued requests past the
    queue deadline are shed with 503 instead of waiting forever; after
    recovery a fresh request succeeds."""
    import time
    import urllib.error

    import jax

    from serve import make_handler

    release = threading.Event()
    hang = {"on": True}

    def hanging_fetch(tree):
        if hang["on"]:
            release.wait(timeout=60)
        return jax.device_get(tree)

    server, port = _start(make_handler(
        synth, dynamic_batch=True, batch_window_ms=5.0,
        fetch_timeout_s=1.0, queue_deadline_s=0.2,
        breaker_cooldown_s=0.5))
    synth._fetch_fn = None
    synth.fetch_timeout_s = None
    urllib.request.urlopen(
        f"http://127.0.0.1:{port}/tts?text=warm+me+too", timeout=600)
    synth.fetch_timeout_s = 1.0
    synth._fetch_fn = hanging_fetch
    try:
        results = {}

        def req(name):
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/tts?text={name}",
                        timeout=30) as r:
                    results[name] = r.status
            except urllib.error.HTTPError as e:
                results[name] = e.code

        ta = threading.Thread(target=req, args=("first",))
        ta.start()
        time.sleep(0.4)  # first is mid-dispatch (wedged); second queues
        tb = threading.Thread(target=req, args=("second",))
        tb.start()
        ta.join(30)
        tb.join(30)
        assert results["first"] == 503   # watchdog timeout
        assert results["second"] == 503  # shed (deadline) or breaker
        hang["on"] = False
        release.set()
        time.sleep(0.6)  # past the breaker cooldown
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/tts?text=recovered",
                timeout=300) as r:
            assert r.read()[:4] == b"RIFF"
    finally:
        synth._fetch_fn = None
        synth.fetch_timeout_s = None
        release.set()
        server.shutdown()


def test_dynamic_batching_groups_concurrent_requests(synth):
    """Concurrent /tts requests within the window synthesize as ONE batched
    dispatch (X-Batch-Size > 1) and every caller gets a valid WAV."""
    import concurrent.futures

    from serve import make_handler

    server, port = _start(make_handler(synth, dynamic_batch=True,
                                       batch_window_ms=150.0))
    try:
        # warm the batched program so the timed window isn't compile-bound
        urllib.request.urlopen(
            f"http://127.0.0.1:{port}/tts?text=warm+up+line", timeout=600)

        def fetch(i):
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/tts?text=hello+number+{i}",
                    timeout=600) as r:
                return r.read(), int(r.headers.get("X-Batch-Size", "1"))

        with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
            results = list(ex.map(fetch, range(4)))
        assert all(d[:4] == b"RIFF" for d, _ in results)
        assert max(b for _, b in results) > 1, \
            [b for _, b in results]
    finally:
        server.shutdown()


def test_statusz_reports_generation_and_inflight(synth):
    from serve import ServeState, make_handler

    state = ServeState(generation=3)
    server, port = _start(make_handler(synth, state=state))
    try:
        import json

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/statusz", timeout=30) as r:
            s = json.loads(r.read())
        assert s["generation"] == 3
        assert s["rss_mb"] > 0
        assert s["inflight"] >= 1  # this very request
        assert s["draining"] is False
    finally:
        server.shutdown()


def test_rss_recycler_drains_inflight_before_exec(synth):
    """RSS breach → accept loop stops but the listening socket stays
    open (new connections queue, not refused), in-flight requests finish
    BEFORE the (injected) exec fires (VERDICT r4 next #3)."""
    import socket
    import time

    from serve import make_handler, RssRecycler, ServeState

    release = threading.Event()
    entered = threading.Event()

    class GatedSynth:
        def __getattr__(self, name):
            return getattr(synth, name)

        def tts(self, text, speaker=None):
            entered.set()
            release.wait(timeout=60)
            return synth.tts(text)

    synth.tts("held request")  # warm the shape: the drain below must
    # wait on the GATE, not on a 60 s CPU compile
    state = ServeState(generation=0)
    server, port = _start(make_handler(GatedSynth(), state=state))
    execd = threading.Event()
    seen = {}

    def fake_exec(srv):
        seen["inflight_at_exec"] = state.inflight
        seen["socket_open"] = srv.socket.fileno() != -1
        execd.set()

    rec = RssRecycler(server, state, limit_mb=1.0,  # any real RSS breaches
                      check_interval_s=0.05, drain_timeout_s=30.0,
                      min_uptime_s=0.0, arm_guard=False,
                      exec_fn=fake_exec)
    results = {}

    def slow_request():
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/tts?text=held+request",
                timeout=300) as r:
            results["data"] = r.read()

    t = threading.Thread(target=slow_request)
    t.start()
    assert entered.wait(timeout=60)
    rec.start()  # breaches immediately; must WAIT for the held request
    time.sleep(0.5)
    assert not execd.is_set(), "exec fired while a request was in flight"
    # accept loop is stopping/stopped, but a new TCP connect must still
    # succeed (kernel backlog) — no client sees a refused connection
    c = socket.create_connection(("127.0.0.1", port), timeout=5)
    c.close()
    release.set()
    t.join(timeout=60)
    assert results["data"][:4] == b"RIFF"
    assert execd.wait(timeout=30)
    assert seen["inflight_at_exec"] == 0
    assert seen["socket_open"]


def test_rss_recycler_arm_guard_and_min_uptime(synth):
    """A limit at/below the warm RSS floor is raised (floor+headroom) at
    arm time — no recycle loop with zero serving — and a genuine later
    breach still recycles, but never inside min_uptime_s of arming."""
    import time

    from serve import RssRecycler, ServeState

    class FakeServer:
        def shutdown(self):
            pass

    rss = {"mb": 3000.0}
    execd = threading.Event()
    rec = RssRecycler(FakeServer(), ServeState(), limit_mb=2000.0,
                      check_interval_s=0.02, min_uptime_s=0.3,
                      headroom_mb=500.0,
                      exec_fn=lambda srv: execd.set(),
                      rss_fn=lambda: rss["mb"])
    rec.start()
    # arm guard: effective limit raised to 3000+500
    assert rec.limit_mb == 3500.0
    # breach the effective limit immediately: min-uptime must hold it
    rss["mb"] = 4000.0
    assert not execd.wait(timeout=0.15), "recycled before min_uptime_s"
    assert execd.wait(timeout=2.0), "never recycled after min_uptime_s"
    assert time.time() - rec._armed_at >= 0.3


def test_warmup_window_sheds_503_until_ready(synth):
    """While state.ready is False (startup or a recycle's re-warm), /tts
    and /healthz answer a fast 503 + Retry-After instead of blocking on
    the synth lock; flipping ready restores normal service."""
    import urllib.error

    from serve import make_handler, ServeState

    state = ServeState()
    state.ready = False
    server, port = _start(make_handler(synth, state=state))
    try:
        for path in ("/tts?text=hello", "/healthz"):
            try:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}", timeout=30)
                assert False, f"{path} served while not ready"
            except urllib.error.HTTPError as e:
                assert e.code == 503
                assert float(e.headers["Retry-After"]) > 0
        # statusz stays live mid-warmup (the soak monitor reads it)
        import json

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/statusz", timeout=30) as r:
            assert json.loads(r.read())["ready"] is False
        state.ready = True
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/tts?text=hello", timeout=60) as r:
            assert r.read()[:4] == b"RIFF"
    finally:
        server.shutdown()


def test_recycle_waits_for_inflight_compile(synth):
    """A recycle must not exec while the background warm thread holds
    the compile lock — exec'ing mid-remote-compile wedges the relay."""
    import time

    from serve import RssRecycler, ServeState

    class FakeServer:
        def shutdown(self):
            pass

    compile_lock = threading.Lock()
    execd = threading.Event()
    rec = RssRecycler(FakeServer(), ServeState(), limit_mb=1.0,
                      check_interval_s=0.02, min_uptime_s=0.0,
                      arm_guard=False, compile_lock=compile_lock,
                      exec_fn=lambda srv: execd.set(),
                      rss_fn=lambda: 100.0)
    compile_lock.acquire()  # a remote compile is in flight
    rec.start()
    assert not execd.wait(timeout=0.5), "exec fired mid-compile"
    compile_lock.release()  # compile finishes
    assert execd.wait(timeout=5.0)


def test_recycle_waits_for_abandoned_fetch(synth):
    """A watchdog-abandoned fetch (503'd request, thread still parked in
    the relay call) must hold the recycle's exec until the transfer
    drains — exec'ing mid-transfer wedges the relay."""
    import time

    from serve import RssRecycler, ServeState

    class FakeServer:
        def shutdown(self):
            pass

    # a real hung fetch through the Synthesizer watchdog: the counter
    # must stay 1 after SynthesisTimeout until the fetch unblocks
    from efficientspeech_tpu.infer import SynthesisTimeout

    release = threading.Event()
    old_fn, old_to = synth._fetch_fn, synth.fetch_timeout_s
    synth._fetch_fn = lambda tree: (release.wait(30), tree)[1]
    synth.fetch_timeout_s = 0.1
    try:
        with pytest.raises(SynthesisTimeout):
            synth._device_get({"x": 1})
        assert synth.pending_fetches() == 1
        execd = threading.Event()
        rec = RssRecycler(FakeServer(), ServeState(), limit_mb=1.0,
                          check_interval_s=0.02, min_uptime_s=0.0,
                          arm_guard=False, synth=synth,
                          exec_fn=lambda srv: execd.set(),
                          rss_fn=lambda: 100.0)
        rec.start()
        assert not execd.wait(timeout=1.0), "exec fired mid-transfer"
        release.set()  # the parked transfer completes
        assert execd.wait(timeout=10.0)
        assert synth.pending_fetches() == 0
    finally:
        synth._fetch_fn, synth.fetch_timeout_s = old_fn, old_to
        release.set()


def test_pin_programs_by_shape(synth):
    """pin_programs(shapes=...) pins exactly those (bucket, frames)
    programs — the background ladder warm uses it so concurrently
    bg-compiled cold shapes stay evictable."""
    try:
        fa, fb = 96, 192  # frame levels no other test compiles
        synth._get_fused(16, fa)
        synth._get_fused(16, fb)
        synth.pin_programs(shapes=[(16, fa)])
        key_a = ("fused", synth.vocoder_mode, synth.transfer, 16, fa)
        key_b = ("fused", synth.vocoder_mode, synth.transfer, 16, fb)
        assert key_a in synth._pinned_programs
        assert key_b not in synth._pinned_programs
    finally:
        synth._pinned_programs = set()


def test_make_server_adopts_inherited_fd(synth):
    """Post-recycle child: make_server picks up SERVE_INHERIT_FD and
    serves on the SAME listening socket instead of rebinding."""
    import os
    import socket

    from serve import make_handler, make_server

    lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(64)
    port = lsock.getsockname()[1]
    lsock.set_inheritable(True)
    os.environ["SERVE_INHERIT_FD"] = str(lsock.fileno())
    try:
        server = make_server("127.0.0.1", port, make_handler(synth))
        assert "SERVE_INHERIT_FD" not in os.environ  # consumed
        assert server.server_port == port
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
                assert r.read() == b"ok"
        finally:
            server.shutdown()
    finally:
        os.environ.pop("SERVE_INHERIT_FD", None)
