"""Dynamic-batching TTS server (infer/server.py).

The batching/lifecycle/HTTP logic is unit-tested against a fake pipeline
(no models — the server only calls `tts_batch`); one end-to-end test drives
it over the tiny e2e synthesis stack (marked slow)."""

import threading
import time

import numpy as np
import pytest

from latent_diffusion_speech_tpu.infer import TTSServer

from tests.test_e2e import pipeline  # noqa: F401 — tiny-model fixture (slow test)


class FakePipeline:
    """Records tts_batch calls; returns one dummy waveform per text."""

    def __init__(self, delay_s: float = 0.0, fail: bool = False):
        self.calls = []
        self.delay_s = delay_s
        self.fail = fail
        self.lock = threading.Lock()

    def tts_batch(self, texts, language="ZH", spk_ids=None, method="x",
                  infer_speedup=1, max_length=8, seed=0):
        if self.fail:
            raise ValueError("synthesizer exploded")
        if self.delay_s:
            time.sleep(self.delay_s)
        with self.lock:
            self.calls.append(
                {"texts": list(texts), "spk_ids": list(spk_ids or []), "seed": seed,
                 "language": language}
            )
        return [(np.full(32 + len(t), 0.1, np.float32), 8000) for t in texts]


def test_server_coalesces_and_serves():
    pipe = FakePipeline(delay_s=0.02)
    with TTSServer(pipe, max_batch=4, max_wait_ms=500) as server:
        futures = [server.submit(t, spk_id=i + 1) for i, t in enumerate(["a", "bb", "ccc"])]
        results = [f.result(timeout=30) for f in futures]
    for (wav, sr), t in zip(results, ["a", "bb", "ccc"]):
        assert sr == 8000 and len(wav) == 32 + len(t)  # per-request result order
    assert server.requests_served == 3
    assert server.batches_served == 1  # all three within the window
    assert pipe.calls[0]["spk_ids"] == [1, 2, 3]


def test_server_separates_unlike_seeds():
    """tts_batch takes one seed, so unlike seeds dispatch separately and
    every request's seed is honored."""
    pipe = FakePipeline(delay_s=0.02)
    with TTSServer(pipe, max_batch=4, max_wait_ms=300) as server:
        f1 = server.submit("a", seed=1)
        f2 = server.submit("bb", seed=2)
        for f in (f1, f2):
            f.result(timeout=30)
    assert server.batches_served == 2
    assert sorted(c["seed"] for c in pipe.calls) == [1, 2]


def test_server_window_anchored_to_first_arrival():
    """The batching window must not restart per arrival: a trickle of
    requests spaced inside max_wait_ms still dispatches the first batch
    within ~max_wait_ms of the first request."""
    pipe = FakePipeline()
    with TTSServer(pipe, max_batch=8, max_wait_ms=120) as server:
        t0 = time.monotonic()
        fut = server.submit("first")
        stop = threading.Event()

        def trickle():
            i = 0
            while not stop.is_set() and i < 20:
                server.submit(f"t{i}")
                i += 1
                time.sleep(0.08)  # < max_wait_ms: would restart a naive window

        th = threading.Thread(target=trickle, daemon=True)
        th.start()
        fut.result(timeout=30)
        latency = time.monotonic() - t0
        stop.set()
        th.join()
    assert latency < 1.0, f"first request waited {latency:.2f}s"


def test_server_single_request_not_delayed_forever():
    pipe = FakePipeline()
    with TTSServer(pipe, max_batch=8, max_wait_ms=10) as server:
        wav, sr = server.submit("solo").result(timeout=30)
        assert sr == 8000


def test_server_propagates_errors():
    pipe = FakePipeline(fail=True)
    with TTSServer(pipe, max_wait_ms=5) as server:
        fut = server.submit("x")
        with pytest.raises(ValueError, match="exploded"):
            fut.result(timeout=30)
    with pytest.raises(RuntimeError):
        server.submit("after close")


def test_server_close_drains_queue():
    pipe = FakePipeline(delay_s=0.05)
    server = TTSServer(pipe, max_batch=2, max_wait_ms=5)
    futures = [server.submit(t) for t in ["q1", "q2", "q3", "q4", "q5"]]
    server.close()  # must resolve everything already submitted
    for f in futures:
        wav, sr = f.result(timeout=1)
        assert len(wav) > 0


class TestHTTPEndpoint:
    def test_http_tts_and_healthz(self):
        import io
        import json
        import urllib.error
        import urllib.request
        import wave
        from http.server import ThreadingHTTPServer

        from latent_diffusion_speech_tpu.cli.serve import make_handler

        pipe = FakePipeline()
        with TTSServer(pipe, max_batch=4, max_wait_ms=20) as server:
            httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
            port = httpd.server_address[1]
            t = threading.Thread(target=httpd.serve_forever, daemon=True)
            t.start()
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/tts",
                    data=json.dumps({"text": "hello", "spk_id": 2}).encode(),
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=30) as resp:
                    assert resp.status == 200
                    assert resp.headers["Content-Type"] == "audio/wav"
                    body = resp.read()
                with wave.open(io.BytesIO(body)) as wf:
                    assert wf.getframerate() == 8000
                    assert wf.getnframes() == 32 + len("hello")

                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=30
                ) as resp:
                    stats = json.loads(resp.read())
                assert stats["ok"] and stats["requests_served"] == 1

                # malformed requests -> 400, not a dropped connection
                for payload in (b"{}", b"[1,2]", b'{"text": 5}',
                                b'{"text": "x", "spk_id": "abc"}'):
                    bad = urllib.request.Request(
                        f"http://127.0.0.1:{port}/tts", data=payload,
                        headers={"Content-Type": "application/json"},
                    )
                    try:
                        urllib.request.urlopen(bad, timeout=30)
                        raise AssertionError(f"expected 400 for {payload!r}")
                    except urllib.error.HTTPError as e:
                        assert e.code == 400, payload
            finally:
                httpd.shutdown()

    def test_http_long_text_splits_and_stitches(self):
        import io
        import json
        import urllib.request
        import wave
        from http.server import ThreadingHTTPServer

        from latent_diffusion_speech_tpu.cli.serve import make_handler

        pipe = FakePipeline()
        with TTSServer(pipe, max_batch=8, max_wait_ms=30) as server:
            httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
            port = httpd.server_address[1]
            threading.Thread(target=httpd.serve_forever, daemon=True).start()
            try:
                text = "第一句话。第二句话。第三句话。"
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/tts",
                    data=json.dumps({"text": text, "max_chars": 5,
                                     "pause_ms": 125.0}).encode(),
                    headers={"Content-Type": "application/json"},
                )
                with urllib.request.urlopen(req, timeout=30) as resp:
                    assert resp.status == 200
                    body = resp.read()
                with wave.open(io.BytesIO(body)) as wf:
                    assert wf.getframerate() == 8000
                    # 3 pieces of 5 chars -> 3x(32+5) samples + 2 gaps of 1000
                    assert wf.getnframes() == 3 * 37 + 2 * 1000
                # pieces went through the batching server (coalesced or not,
                # all three texts were served)
                served = [t for c in pipe.calls for t in c["texts"]]
                assert served == ["第一句话。", "第二句话。", "第三句话。"]
            finally:
                httpd.shutdown()


@pytest.mark.slow
def test_server_end_to_end_synthesis(pipeline, monkeypatch):  # noqa: F811
    """Real tiny synthesis stack behind the server: audio comes back finite."""

    def fake_phones(self, text, language="ZH"):
        n = 4 + len(text) % 3
        r = np.random.default_rng(len(text))
        return (
            r.integers(1, 50, n).astype(np.int32),
            r.integers(0, 6, n).astype(np.int32),
        )

    monkeypatch.setattr(type(pipeline), "text_to_phones", fake_phones)
    with TTSServer(
        pipeline, max_batch=4, max_wait_ms=300, method="ddim",
        infer_speedup=25, max_length=8,
    ) as server:
        futures = [server.submit(t, spk_id=i + 1) for i, t in enumerate(["a", "bb"])]
        for f in futures:
            wav, sr = f.result(timeout=120)
            assert sr == 8000 and np.isfinite(wav).all()
    assert server.batches_served == 1
