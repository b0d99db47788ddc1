"""Dynamic-batching TTS server (infer/server.py) on the tiny e2e pipeline."""

import time

import numpy as np
import pytest

from latent_diffusion_speech_tpu.infer import TTSServer

from tests.test_e2e import pipeline  # noqa: F401 — tiny-model fixture


def _patch_frontend(monkeypatch, pipeline):
    def fake_phones(self, text, language="ZH"):
        n = 4 + len(text) % 3
        r = np.random.default_rng(len(text))
        return (
            r.integers(1, 50, n).astype(np.int32),
            r.integers(0, 6, n).astype(np.int32),
        )

    monkeypatch.setattr(type(pipeline), "text_to_phones", fake_phones)


def test_server_coalesces_and_serves(pipeline, monkeypatch):  # noqa: F811
    _patch_frontend(monkeypatch, pipeline)
    with TTSServer(
        pipeline, max_batch=4, max_wait_ms=300, method="ddim",
        infer_speedup=25, max_length=8,
    ) as server:
        futures = [server.submit(t, spk_id=i + 1) for i, t in enumerate(["a", "bb", "ccc"])]
        results = [f.result(timeout=120) for f in futures]
    for wav, sr in results:
        assert sr == 8000
        assert np.isfinite(wav).all()
    assert server.requests_served == 3
    # all three arrived within the batching window -> one batched call
    assert server.batches_served == 1


def test_server_single_request_not_delayed_forever(pipeline, monkeypatch):  # noqa: F811
    _patch_frontend(monkeypatch, pipeline)
    with TTSServer(
        pipeline, max_batch=8, max_wait_ms=10, method="ddim",
        infer_speedup=25, max_length=8,
    ) as server:
        wav, sr = server.submit("solo").result(timeout=120)
        assert sr == 8000 and np.isfinite(wav).all()


def test_server_propagates_errors(pipeline, monkeypatch):  # noqa: F811
    _patch_frontend(monkeypatch, pipeline)

    def boom(*a, **k):
        raise ValueError("synthesizer exploded")

    monkeypatch.setattr(pipeline, "tts_batch", boom)
    with TTSServer(pipeline, max_wait_ms=5) as server:
        fut = server.submit("x")
        with pytest.raises(ValueError, match="exploded"):
            fut.result(timeout=30)

    with pytest.raises(RuntimeError):
        server.submit("after close")


def test_server_close_drains_queue(pipeline, monkeypatch):  # noqa: F811
    _patch_frontend(monkeypatch, pipeline)
    server = TTSServer(
        pipeline, max_batch=2, max_wait_ms=5, method="ddim",
        infer_speedup=25, max_length=8,
    )
    futures = [server.submit(t) for t in ["q1", "q2", "q3"]]
    server.close()  # must resolve everything already submitted
    for f in futures:
        wav, sr = f.result(timeout=1)
        assert np.isfinite(wav).all()


class TestHTTPEndpoint:
    def test_http_tts_and_healthz(self, pipeline, monkeypatch):  # noqa: F811
        import io
        import json
        import threading
        import urllib.request
        import wave
        from http.server import ThreadingHTTPServer

        from latent_diffusion_speech_tpu.cli.serve import make_handler

        _patch_frontend(monkeypatch, pipeline)
        with TTSServer(
            pipeline, max_batch=4, max_wait_ms=50, method="ddim",
            infer_speedup=25, max_length=8,
        ) as server:
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
                with urllib.request.urlopen(req, timeout=300) as resp:
                    assert resp.status == 200
                    assert resp.headers["Content-Type"] == "audio/wav"
                    body = resp.read()
                with wave.open(io.BytesIO(body)) as wf:
                    assert wf.getframerate() == 8000
                    assert wf.getnframes() > 0

                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=30
                ) as resp:
                    stats = json.loads(resp.read())
                assert stats["ok"] and stats["requests_served"] == 1

                # malformed request -> 400, not a server crash
                bad = urllib.request.Request(
                    f"http://127.0.0.1:{port}/tts", data=b"{}",
                    headers={"Content-Type": "application/json"},
                )
                try:
                    urllib.request.urlopen(bad, timeout=30)
                    assert False, "expected HTTPError"
                except urllib.error.HTTPError as e:
                    assert e.code == 400
            finally:
                httpd.shutdown()


def test_server_separates_unlike_seeds(pipeline, monkeypatch):  # noqa: F811
    """tts_batch takes one seed, so requests with different seeds must
    dispatch as separate batches (every request's seed honored)."""
    _patch_frontend(monkeypatch, pipeline)
    with TTSServer(
        pipeline, max_batch=4, max_wait_ms=300, method="ddim",
        infer_speedup=25, max_length=8,
    ) as server:
        f1 = server.submit("a", seed=1)
        f2 = server.submit("bb", seed=2)
        for f in (f1, f2):
            wav, sr = f.result(timeout=120)
            assert np.isfinite(wav).all()
    assert server.requests_served == 2
    assert server.batches_served == 2
