"""HTTP TTS serving daemon (stdlib-only) over the dynamic-batching server.

The reference ships only the one-shot `22_infer_tts.py` CLI; production
serving wants a daemon that keeps the compiled programs warm and coalesces
concurrent requests into batched device calls.  This is that daemon:

    python -m latent_diffusion_speech_tpu.cli.serve -c configs/config.yaml \\
        --port 8400 [--model exp/diffusion/model_x.ckpt --lm-model ...]

    POST /tts   {"text": "...", "language": "ZH", "spk_id": 1}  -> audio/wav
    GET  /healthz                                               -> JSON stats

Long text is handled transparently: input longer than `max_chars` (default
60) is split into sentence-sized pieces (text/segment.py), every piece is
submitted to the batching server — so the pieces coalesce into batched
device calls, together with any concurrent traffic — and the waveforms are
stitched with `pause_ms` (default 180) of silence between pieces.

`ThreadingHTTPServer` gives each request its own thread; every request
submits to the shared `infer.TTSServer`, whose single dispatch thread owns
the device and batches whatever arrives within the batching window
(`infer/server.py`).  No third-party web framework — the image has none.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from latent_diffusion_speech_tpu.cli._common import config_parser, load

__all__ = ["make_handler", "main"]


def make_handler(tts_server, timeout_s: float = 300.0):
    from latent_diffusion_speech_tpu.ops.audio_io import wav_bytes

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(
                    200,
                    {
                        "ok": True,
                        "requests_served": tts_server.requests_served,
                        "batches_served": tts_server.batches_served,
                    },
                )
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/tts":
                self._json(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(req, dict):
                    raise ValueError("body must be a JSON object")
                text = req["text"]
                if not isinstance(text, str):
                    raise ValueError("'text' must be a string")
                language = str(req.get("language", "ZH"))
                spk_id = int(req.get("spk_id", 1))
                seed = int(req.get("seed", 0))
                max_chars = int(req.get("max_chars", 60))
                pause_ms = float(req.get("pause_ms", 180.0))
            except (ValueError, KeyError, TypeError) as e:
                self._json(400, {"error": f"bad request: {e}"})
                return
            try:
                from latent_diffusion_speech_tpu.text.segment import split_sentences

                pieces = split_sentences(text, max_chars=max_chars) or [text]
                # every piece goes through the batching server, so a long
                # text's pieces coalesce into batched device calls together
                # with any concurrent requests
                futs = [
                    tts_server.submit(p, language=language, spk_id=spk_id, seed=seed + i)
                    for i, p in enumerate(pieces)
                ]
                results = [f.result(timeout=timeout_s) for f in futs]
                sr = results[0][1]
                if len(results) == 1:
                    wav = results[0][0]
                else:
                    gap = np.zeros(int(round(sr * pause_ms / 1000.0)), np.float32)
                    chunks = []
                    for i, (w, _) in enumerate(results):
                        if i:
                            chunks.append(gap)
                        chunks.append(np.asarray(w, np.float32))
                    wav = np.concatenate(chunks)
            except Exception as e:  # noqa: BLE001 — surfaced to the client
                self._json(500, {"error": str(e)})
                return
            body = wav_bytes(np.asarray(wav, np.float32), sr)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main():
    p = config_parser("HTTP TTS serving daemon")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8400)
    p.add_argument("--model", type=str, default=None, help="diffusion checkpoint path")
    p.add_argument("--lm-model", type=str, default=None, help="LM checkpoint path")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=30.0)
    p.add_argument("--speedup", type=int, default=None)
    p.add_argument("--method", type=str, default=None)
    args = p.parse_args()
    cfg = load(args)

    from latent_diffusion_speech_tpu.cli.infer_tts import build_pipeline
    from latent_diffusion_speech_tpu.infer import TTSServer

    pipe = build_pipeline(cfg, args.model, args.lm_model)
    with TTSServer(
        pipe,
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        method=args.method or cfg.common.infer.method,
        infer_speedup=args.speedup or cfg.common.infer.speedup,
    ) as server:
        httpd = ThreadingHTTPServer((args.host, args.port), make_handler(server))
        print(f"serving on http://{args.host}:{httpd.server_address[1]} "
              f"(max_batch={args.max_batch}, wait={args.max_wait_ms} ms)")
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.shutdown()


if __name__ == "__main__":
    main()
