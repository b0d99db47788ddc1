"""Serving-under-load benchmark: concurrent clients against the HTTP daemon.

The reference serves one request at a time through `22_infer_tts.py`; this
framework ships a dynamic-batching HTTP daemon (`cli/serve.py` over
`infer/TTSServer`).  This benchmark is its load test (VERDICT r2 item 6):

* N concurrent clients POST /tts with MIXED text lengths (three ZH texts
  cycling, so phone buckets 16/32/48 and varying latent lengths all occur),
* per-request wall latency recorded -> p50/p90/p95/p99 + throughput
  (requests/s and audio-seconds/s) and the batcher's achieved batch size,
* an overload burst (more simultaneous requests than max_queue admits)
  demonstrating backpressure: some 429s, every admitted request served.

The pipeline is the flagship serve geometry with synthesized weights (same
as bench.py — perf is weight-independent); the daemon runs in-process so the
device has a single client.  Compiled-program surface is bounded by
`tts_batch(batch_bucket=True)` (batch dims pad to powers of two) and two
unrecorded warmup passes of the full workload prime every program past the
relay's ~30-execution settling.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/serve_load.py
"""

from __future__ import annotations

import json
import sys
import threading
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import sys
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).parent.parent))
from bench import probe_devices

probe_devices(metric="serve_load")  # fail fast if the relay is wedged

import jax.numpy as jnp
import numpy as np

N_CLIENTS = 16
REQS_PER_CLIENT = 8
WARMUP_PASSES = 2
MAX_BATCH = 8
MAX_WAIT_MS = 30.0
MAX_QUEUE = 32
BURST = 96
MAX_LENGTH = 128  # latent buckets {64, 128} keep the program surface small
SPEEDUP = 50      # 20-step dpm-solver, the serve default

TEXTS = [
    "你好世界。",
    "今天的天气真的非常不错，适合出门散步。",
    "很久很久以前，在一座被群山环绕的小村庄里，住着一位喜欢讲故事的老人，孩子们每天都来听。",
]


def _note(msg):
    print(f"[serve_load] {msg}", file=sys.stderr, flush=True)


def build_pipeline():
    from latent_diffusion_speech_tpu.infer import TTSPipeline
    from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig, Unit2MelSystem
    from latent_diffusion_speech_tpu.models.lm.roformer import RoformerConfig, RoformerSystem
    from latent_diffusion_speech_tpu.models.vocoder import Vocoder

    rng = np.random.default_rng(0)
    codebook = rng.standard_normal((4096, 1280)).astype(np.float32)
    diffusion = Unit2MelSystem(Unit2MelConfig(), dtype=jnp.bfloat16)
    vocoder = Vocoder("hifi-vaegan", dtype=jnp.bfloat16)
    lm = RoformerSystem(RoformerConfig(), dtype=jnp.bfloat16)
    return TTSPipeline(diffusion, vocoder, lm=lm, codebook=codebook)


def post_tts(port, text, seed, timeout=600.0):
    """POST /tts; returns (status, latency_s, audio_seconds)."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/tts",
        data=json.dumps({"text": text, "seed": seed, "max_chars": 200}).encode(),
        headers={"Content-Type": "application/json"},
    )
    t0 = time.perf_counter()
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
            dt = time.perf_counter() - t0
            # WAV: 44-byte header, pcm16 @44.1k
            return resp.status, dt, max(len(body) - 44, 0) / 2 / 44100.0
    except urllib.error.HTTPError as e:
        e.read()
        return e.code, time.perf_counter() - t0, 0.0


def run_pass(port, record=None, n_clients=N_CLIENTS, reqs=REQS_PER_CLIENT, seed0=0):
    def client(cid):
        for i in range(reqs):
            text = TEXTS[(cid + i) % len(TEXTS)]
            status, dt, audio_s = post_tts(port, text, seed=seed0 + cid * 1000 + i)
            if record is not None:
                record.append({"status": status, "latency_s": dt, "audio_s": audio_s})

    threads = [threading.Thread(target=client, args=(c,)) for c in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return time.perf_counter() - t0


def percentiles(xs):
    xs = np.sort(np.asarray(xs))
    return {
        f"p{p}": round(float(np.percentile(xs, p)), 4)
        for p in (50, 90, 95, 99)
    } | {"mean": round(float(xs.mean()), 4), "max": round(float(xs.max()), 4)}


def main():
    from latent_diffusion_speech_tpu.cli.serve import TTSHTTPServer, make_handler
    from latent_diffusion_speech_tpu.infer import TTSServer

    _note(f"devices: {jax.devices()}")
    pipe = build_pipeline()

    with TTSServer(
        pipe, max_batch=MAX_BATCH, max_wait_ms=MAX_WAIT_MS,
        method="dpm-solver", infer_speedup=SPEEDUP, max_length=MAX_LENGTH,
        max_queue=MAX_QUEUE,
    ) as server:
        httpd = TTSHTTPServer(("127.0.0.1", 0), make_handler(server))
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            for w in range(WARMUP_PASSES):
                t = run_pass(port, record=None, seed0=10_000 * (w + 1))
                _note(f"warmup pass {w + 1}/{WARMUP_PASSES}: {t:.1f}s "
                      f"({server.batches_served} batches so far)")

            base_batches = server.batches_served
            base_reqs = server.requests_served
            base_audio = server.audio_seconds_served
            records = []
            wall = run_pass(port, record=records, seed0=0)
            n = len(records)
            ok = [r for r in records if r["status"] == 200]
            lat = percentiles([r["latency_s"] for r in ok])
            batches = server.batches_served - base_batches
            served = server.requests_served - base_reqs
            audio_s = server.audio_seconds_served - base_audio
            load = {
                "clients": N_CLIENTS, "requests": n, "ok": len(ok),
                "wall_s": round(wall, 2),
                "latency_s": lat,
                "throughput_rps": round(n / wall, 2),
                "audio_seconds_per_s": round(audio_s / wall, 2),
                "serve_rtf_under_load": round(wall / audio_s, 5) if audio_s else None,
                "mean_batch_size": round(served / max(batches, 1), 2),
                "batches": batches,
            }
            _note(json.dumps(load))

            # overload burst: BURST simultaneous single-piece requests against
            # max_queue admissions -> expect 429s and zero failures
            statuses = []

            def burst_client(i):
                status, _, _ = post_tts(port, TEXTS[0], seed=7_000_000 + i)
                statuses.append(status)

            threads = [threading.Thread(target=burst_client, args=(i,)) for i in range(BURST)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            overload = {
                "burst": BURST, "max_queue": MAX_QUEUE,
                "served_200": statuses.count(200),
                "rejected_429": statuses.count(429),
                "other": sorted(set(statuses) - {200, 429}),
            }
            _note(json.dumps(overload))
        finally:
            httpd.shutdown()

    out = {
        "bench": "serve_load (HTTP daemon, dynamic batching, mixed text lengths)",
        "device": str(jax.devices()[0]),
        "config": {
            "max_batch": MAX_BATCH, "max_wait_ms": MAX_WAIT_MS,
            "max_queue": MAX_QUEUE, "method": "dpm-solver", "speedup": SPEEDUP,
            "max_length": MAX_LENGTH, "texts_chars": [len(t) for t in TEXTS],
            "batch_bucket": True,
        },
        "load": load,
        "overload": overload,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
