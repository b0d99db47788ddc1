"""Serving-under-load with realistic LONG generations (VERDICT r3 item 5).

SERVE_LOAD.json measured short utterances only (max_length 128, texts 5-43
chars).  This run drives the daemon at the reference generation cap —
max_length 1024 (`/root/reference/22_infer_tts.py:87-91`, ~12 s of audio) —
with a mixed short/medium/long corpus, and records what the short bench
could not see:

* per-request QUEUE time (admission -> batch dispatch; new server counters),
* latency p50..p99 split by text class, and audio-seconds histogram,
* batch occupancy under mixed lengths (bucket fragmentation),
* the decode-kernel VMEM gate decision at every (B_pad, N, enc_len) the
  workload produces (the whole-decode Pallas kernel must refuse long shapes
  and fall back to the scan — `models/lm/roformer.py:632-675`),
* the latent bucket set actually compiled (must stay bounded).

Writes benchmarks/SERVE_LOAD_LONG.json.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/serve_load_long.py
"""

from __future__ import annotations

import json
import sys
import threading
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).parent))
from serve_load import build_pipeline, percentiles, post_tts  # noqa: E402

N_CLIENTS = 12
REQS_PER_CLIENT = 4
WARMUP_PASSES = 2
MAX_BATCH = 8
MAX_WAIT_MS = 30.0
MAX_QUEUE = 48
MAX_LENGTH = 1024  # the reference generation cap
SPEEDUP = 50

# mixed corpus: short / medium / long (long pieces stay unsplit via
# max_chars=220 in post_tts, matching a single near-cap generation)
TEXTS = {
    "short": "你好世界。",
    "medium": "今天的天气真的非常不错，适合出门散步。",
    "long": (
        "很久很久以前，在一座被群山环绕的小村庄里，住着一位非常喜欢讲故事的老人，"
        "每天傍晚的时候，村子里的孩子们都会围坐在他家门前的大树下，听他讲那些关于"
        "远方的海洋、沙漠和星空的故事，直到月亮升起来才依依不舍地回家。"
    ),
}
MIX = ["short", "medium", "long", "long"]  # long-heavy, as item 5 asks


def _note(msg):
    print(f"[serve_load_long] {msg}", file=sys.stderr, flush=True)


def post_tts_stream(port, text, seed, max_chars=60, timeout=600.0):
    """POST /tts/stream; returns (status, ttfa_s, total_s, audio_seconds).

    TTFA (time-to-first-audio) = request start -> first body bytes of the
    chunked response (http.client de-chunks transparently, so the first
    successful read IS the first streamed piece).  max_chars=60 (the serve
    default) splits long texts into sentence pieces so streaming can pay:
    the client starts playback after piece 1 while pieces 2..n synthesize."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/tts/stream",
        data=json.dumps({"text": text, "seed": seed,
                         "max_chars": max_chars}).encode(),
        headers={"Content-Type": "application/json"},
    )
    t0 = time.perf_counter()
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            first = resp.read(4096)
            ttfa = time.perf_counter() - t0
            n = len(first)
            while True:
                block = resp.read(1 << 16)
                if not block:
                    break
                n += len(block)
            total = time.perf_counter() - t0
            return resp.status, ttfa, total, max(n - 44, 0) / 2 / 44100.0
    except urllib.error.HTTPError as e:
        e.read()
        dt = time.perf_counter() - t0
        return e.code, dt, dt, 0.0


def run_stream_pass(port, record, n_clients=N_CLIENTS, reqs=REQS_PER_CLIENT,
                    seed0=0):
    def client(cid):
        for i in range(reqs):
            cls = MIX[(cid + i) % len(MIX)]
            status, ttfa, total, audio_s = post_tts_stream(
                port, TEXTS[cls], seed=seed0 + cid * 1000 + i)
            if record is not None:
                record.append({"class": cls, "status": status, "ttfa_s": ttfa,
                               "latency_s": total, "audio_s": audio_s})

    threads = [threading.Thread(target=client, args=(c,)) for c in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return time.perf_counter() - t0


def run_pass(port, record, n_clients=N_CLIENTS, reqs=REQS_PER_CLIENT, seed0=0):
    def client(cid):
        for i in range(reqs):
            cls = MIX[(cid + i) % len(MIX)]
            status, dt, audio_s = post_tts(port, TEXTS[cls], seed=seed0 + cid * 1000 + i)
            if record is not None:
                record.append({"class": cls, "status": status,
                               "latency_s": dt, "audio_s": audio_s})

    threads = [threading.Thread(target=client, args=(c,)) for c in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return time.perf_counter() - t0


def main():
    from latent_diffusion_speech_tpu.cli.serve import TTSHTTPServer, make_handler
    from latent_diffusion_speech_tpu.infer import TTSServer

    _note(f"devices: {jax.devices()}")
    pipe = build_pipeline()

    # the decode-kernel VMEM gate at the shapes this workload produces: at
    # N=1024 the whole-decode kernel MUST refuse (KV cache alone exceeds the
    # 15 MiB budget) and generation takes the scan path
    gate = {}
    for b in (1, 2, 4, 8):
        for enc_len in (16, 64, 128):
            gate[f"B{b}_enc{enc_len}_N{MAX_LENGTH}"] = bool(
                pipe.lm._decode_fits_vmem(b, MAX_LENGTH, enc_len))
    _note(f"vmem gate at N=1024: {gate}")

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

            base = (server.batches_served, server.requests_served,
                    server.audio_seconds_served, server.queue_wait_count)
            server._recent_waits.clear()
            records = []
            wall = run_pass(port, record=records, seed0=0)
            ok = [r for r in records if r["status"] == 200]
            waits = server.queue_wait_recent()
            batches = server.batches_served - base[0]
            served = server.requests_served - base[1]
            audio_s = server.audio_seconds_served - base[2]

            by_class = {}
            for cls in TEXTS:
                rows = [r for r in ok if r["class"] == cls]
                if rows:
                    by_class[cls] = {
                        "n": len(rows),
                        "latency_s": percentiles([r["latency_s"] for r in rows]),
                        "audio_s_mean": round(float(np.mean(
                            [r["audio_s"] for r in rows])), 2),
                        "audio_s_max": round(float(np.max(
                            [r["audio_s"] for r in rows])), 2),
                    }
            load = {
                "clients": N_CLIENTS, "requests": len(records), "ok": len(ok),
                "wall_s": round(wall, 2),
                "latency_s": percentiles([r["latency_s"] for r in ok]),
                "queue_wait_s": percentiles(waits) if waits else None,
                "by_class": by_class,
                "throughput_rps": round(len(records) / wall, 2),
                "audio_seconds_per_s": round(audio_s / wall, 2),
                "serve_rtf_under_load": round(wall / audio_s, 5) if audio_s else None,
                "mean_batch_size": round(served / max(batches, 1), 2),
                "batches": batches,
            }
            _note(json.dumps(load))

            # ---- streaming TTFA pass (VERDICT r4 weak #7) -------------------
            # /tts/stream exists to cut perceived latency; measure the metric
            # it exists to improve.  max_chars=60 splits the long text into
            # sentence pieces, so TTFA ~ first-piece latency under load.
            run_stream_pass(port, record=None, seed0=50_000)  # warm shapes
            srecords = []
            swall = run_stream_pass(port, record=srecords, seed0=77)
            sok = [r for r in srecords if r["status"] == 200]
            ttfa_by_class = {}
            for cls in TEXTS:
                rows = [r for r in sok if r["class"] == cls]
                if rows:
                    ttfa_by_class[cls] = {
                        "n": len(rows),
                        "ttfa_s": percentiles([r["ttfa_s"] for r in rows]),
                        "total_s": percentiles([r["latency_s"] for r in rows]),
                        "audio_s_mean": round(float(np.mean(
                            [r["audio_s"] for r in rows])), 2),
                    }
            stream = {
                "requests": len(srecords), "ok": len(sok),
                "wall_s": round(swall, 2),
                "ttfa_s": percentiles([r["ttfa_s"] for r in sok]),
                "total_s": percentiles([r["latency_s"] for r in sok]),
                "by_class": ttfa_by_class,
                "note": "ttfa = first chunked body bytes (first synthesized "
                        "piece); max_chars=60 piece split",
            }
            _note(json.dumps(stream))

            # ---- unloaded streaming TTFA (the per-request story) ------------
            # Under 12-way saturation every piece of every request shares the
            # same batches, so TTFA ~= total above.  Streaming's win is the
            # interactive case: ONE client, a long multi-sentence text whose
            # pieces synthesize sequentially — playback starts after piece 1.
            long_text = TEXTS["long"] * 3  # ~9 sentence pieces at max_chars=60
            rows = []
            for i in range(6):
                status, ttfa, total, audio_s = post_tts_stream(
                    port, long_text, seed=900 + i)
                if status == 200:
                    rows.append((ttfa, total, audio_s))
            stream_unloaded = {
                "requests": 6, "ok": len(rows),
                "text_chars": len(long_text),
                "ttfa_s": percentiles([r[0] for r in rows]),
                "total_s": percentiles([r[1] for r in rows]),
                "audio_s_mean": round(float(np.mean([r[2] for r in rows])), 2),
                "ttfa_over_total_p50": round(
                    percentiles([r[0] for r in rows])["p50"]
                    / percentiles([r[1] for r in rows])["p50"], 3),
                "note": "1 client, sequential requests: TTFA = first-piece "
                        "synthesis; total = all pieces",
            }
            _note(json.dumps(stream_unloaded))
        finally:
            httpd.shutdown()

    out = {
        "bench": "serve_load_long (mixed short/long, generation cap 1024)",
        "device": str(jax.devices()[0]),
        "config": {
            "max_batch": MAX_BATCH, "max_wait_ms": MAX_WAIT_MS,
            "max_queue": MAX_QUEUE, "method": "dpm-solver", "speedup": SPEEDUP,
            "max_length": MAX_LENGTH,
            "texts_chars": {k: len(v) for k, v in TEXTS.items()},
            "mix": MIX,
        },
        "vmem_gate_N1024": gate,
        "lm_impl": pipe.lm_impl,
        "load": load,
        "stream": stream,
        "stream_unloaded": stream_unloaded,
    }
    Path(__file__).parent.joinpath("SERVE_LOAD_LONG.json").write_text(
        json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
