"""End-to-end inference runtime (L8).

Capability parity with the reference `DiffusionSVC` facade
(`tools/infer_tools.py:9-117`) and the `22_infer_tts.py` serve path:

text -> phones/tones (text frontend) -> AR LM -> semantic tokens ->
k-means centroid embedding -> conditional latent diffusion -> HiFi-VAEGAN
decode -> waveform.  Plus the long-audio SVC-style path: RMS slicing, per
segment units -> diffusion -> stitch with cross-fades
(`infer_tools.py:84-117`).

The compute chain after the text frontend is fully jitted; the pipeline pads
token counts to buckets so repeated calls hit the XLA compile cache
(SURVEY.md "Hard parts": shape polymorphism vs recompiles).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from latent_diffusion_speech_tpu.models.diffusion import Unit2MelSystem
from latent_diffusion_speech_tpu.models.lm.roformer import RoformerSystem
from latent_diffusion_speech_tpu.models.vocoder import Vocoder
from latent_diffusion_speech_tpu.ops.slicer import split_voiced
from latent_diffusion_speech_tpu.ops.alignment import cross_fade, units_forced_alignment
from latent_diffusion_speech_tpu.ops.volume import extract_volume, get_volume_mask
from latent_diffusion_speech_tpu.quantize import EuclideanCodebook

__all__ = ["TTSPipeline"]


def _bucket(n: int, multiple: int = 64) -> int:
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


class TTSPipeline:
    def __init__(
        self,
        diffusion: Unit2MelSystem,
        vocoder: Vocoder,
        lm: Optional[RoformerSystem] = None,
        codebook: Optional[np.ndarray] = None,
        units_encoder=None,
        lm_impl: str = "auto",
    ):
        self.diffusion = diffusion
        self.vocoder = vocoder
        self.lm = lm
        self.codebook = EuclideanCodebook(codebook) if codebook is not None else None
        self.units_encoder = units_encoder
        if lm_impl == "auto":
            # the whole-decode Pallas kernel (ops/pallas/ar_decode.py) is
            # TPU-only; anywhere else (CPU tests, virtual meshes) use the scan
            d = jax.devices()[0]
            on_tpu = d.platform == "tpu" or "tpu" in getattr(d, "device_kind", "").lower()
            lm_impl = "pallas" if on_tpu else "xla"
        self.lm_impl = lm_impl
        # one compiled program per (T_bucket, method, speedup): condition ->
        # diffusion scan -> vocoder decode, fused end-to-end (eager dispatch
        # over a tunneled TPU is catastrophic for the sampler's ~2k ops)
        self._infer_cache = {}

    # -- text -> semantic ----------------------------------------------------

    def text_to_phones(self, text: str, language: str = "ZH") -> Tuple[np.ndarray, np.ndarray]:
        from latent_diffusion_speech_tpu.text import text_to_sequence

        (phones, tones, _lang), _ = text_to_sequence(text, language)
        return np.asarray(phones, np.int32), np.asarray(tones, np.int32)

    def generate_semantic(
        self,
        phones: np.ndarray,
        tones: np.ndarray,
        spk_id: int = 1,
        max_length: int = 1024,
        top_k: int = 5,
        end_gate_threshold: Optional[float] = None,
        rng: Optional[jax.Array] = None,
    ) -> np.ndarray:
        """Run the LM; returns semantic token ids (L,) with BOS/EOS stripped
        (`22_infer_tts.py:83-103` behavior)."""
        assert self.lm is not None, "pipeline built without a language model"
        phones = jnp.asarray(np.asarray(phones)[None])
        tones = jnp.asarray(np.asarray(tones)[None])
        tokens, lengths = self.lm.generate(
            phones, tones, spk_id=spk_id, max_length=max_length, top_k=top_k,
            end_gate_threshold=end_gate_threshold, rng=rng, impl=self.lm_impl,
        )
        n = int(lengths[0])
        toks = np.asarray(tokens)[0, :n]
        # strip EOS if present, and any stray BOS/PAD
        toks = toks[toks < self.lm.cfg.semantic_kmeans_num]
        return toks.astype(np.int32)

    def semantic_to_units(self, tokens: np.ndarray) -> jnp.ndarray:
        """Token ids -> unit embeddings via k-means centroids
        (`22_infer_tts.py:46-52,105-106`)."""
        assert self.codebook is not None, "pipeline built without a semantic codebook"
        return self.codebook.dequantize(jnp.asarray(tokens))[None]  # (1, L, D)

    # -- units -> audio ------------------------------------------------------

    def infer(
        self,
        units: jnp.ndarray,
        spk_id=1,
        method: str = "dpm-solver",
        infer_speedup: int = 50,
        rng: Optional[jax.Array] = None,
        pad_to_bucket: bool = True,
    ) -> jnp.ndarray:
        """units (B, T, D) -> waveform (B, T*hop). One XLA program end-to-end,
        with zero eager ops between host and the compiled calls (each eager op
        is a device round-trip; they dominated serve latency).

        spk_id: a scalar, or a (B,) array for per-item speakers."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        T = units.shape[1]
        padded_T = _bucket(T) if pad_to_bucket else T

        # ONE cached program: pad + condition + sampling scan + vocoder decode
        # + crop. Safe to fuse because params are jit ARGUMENTS — closing over
        # them would bake ~100MB of weights into the HLO as constants and blow
        # remote-compile limits; as arguments the HLO stays small and each
        # serve costs a single host->device dispatch.
        key = (padded_T, T, units.shape[0], method, infer_speedup)
        if key not in self._infer_cache:
            diffusion, vocoder = self.diffusion, self.vocoder
            hop = self.vocoder.vocoder_hop_size

            def serve_fn(dparams, gparams, units, spk_id, rng):
                if padded_T != units.shape[1]:
                    units = jnp.pad(
                        units, ((0, 0), (0, padded_T - units.shape[1]), (0, 0)), mode="edge"
                    )
                spk = jnp.broadcast_to(
                    jnp.asarray(spk_id, jnp.int32).reshape(-1, 1), (units.shape[0], 1)
                )
                cond = diffusion.module.apply(
                    {"params": dparams}, units, None, spk, None,
                    method=diffusion.module.condition,
                )
                mel = diffusion.diffusion.sample(
                    dparams, cond, rng, method=method, infer_speedup=infer_speedup
                )
                wav = vocoder.vocoder.generator.apply({"params": gparams}, mel)
                return wav[:, : T * hop]

            self._infer_cache[key] = jax.jit(serve_fn)

        return self._infer_cache[key](
            self.diffusion.params,
            self.vocoder.vocoder.generator_params,
            units,
            np.asarray(spk_id, np.int32),
            rng,
        )

    def mel2wav(self, mel: jnp.ndarray) -> jnp.ndarray:
        return self.vocoder.infer(mel)

    # -- full TTS ------------------------------------------------------------

    def tts(
        self,
        text: str,
        language: str = "ZH",
        spk_id: int = 1,
        method: str = "dpm-solver",
        infer_speedup: int = 50,
        max_length: int = 1024,
        top_k: int = 5,
        end_gate_threshold: Optional[float] = None,
        seed: int = 0,
    ) -> Tuple[np.ndarray, int]:
        """Text -> (waveform (T,), sample_rate). The `22_infer_tts.py` path."""
        phones, tones = self.text_to_phones(text, language)
        return self.tts_from_phones(
            phones, tones, spk_id=spk_id, method=method, infer_speedup=infer_speedup,
            max_length=max_length, top_k=top_k, end_gate_threshold=end_gate_threshold,
            seed=seed,
        )

    def tts_from_phones(
        self, phones, tones, spk_id=1, method="dpm-solver", infer_speedup=50,
        max_length=1024, top_k=5, end_gate_threshold=None, seed=0,
    ) -> Tuple[np.ndarray, int]:
        rng = jax.random.PRNGKey(seed)
        r1, r2 = jax.random.split(rng)
        tokens = self.generate_semantic(
            phones, tones, spk_id=spk_id, max_length=max_length, top_k=top_k,
            end_gate_threshold=end_gate_threshold, rng=r1,
        )
        if len(tokens) == 0:
            return np.zeros(0, np.float32), self.vocoder.vocoder_sample_rate
        units = self.semantic_to_units(tokens)
        wav = self.infer(units, spk_id=spk_id, method=method, infer_speedup=infer_speedup, rng=r2)
        return np.asarray(wav[0]), self.vocoder.vocoder_sample_rate

    def tts_long_text(
        self,
        text: str,
        language: str = "ZH",
        spk_id: int = 1,
        pause_ms: float = 180.0,
        max_chars: int = 60,
        batched: bool = True,
        **kw,
    ) -> Tuple[np.ndarray, int]:
        """Long-text TTS: split into sentence-sized pieces (text/segment.py),
        synthesize them — as ONE batched call by default — and stitch with
        `pause_ms` of silence between pieces.

        The reference has no long-TEXT path (only long-audio SVC slicing); a
        single LM call degrades past the ~1024-token generation cap, so this
        bounds every piece.  `kw` forwards to tts_batch / tts (method,
        infer_speedup, top_k, seed, ...)."""
        from latent_diffusion_speech_tpu.text.segment import split_sentences

        pieces = split_sentences(text, max_chars=max_chars)
        sr = self.vocoder.vocoder_sample_rate
        if not pieces:
            return np.zeros(0, np.float32), sr
        if batched:
            results = self.tts_batch(pieces, language=language,
                                     spk_ids=[spk_id] * len(pieces), **kw)
        else:
            results = [self.tts(p, language=language, spk_id=spk_id, **kw) for p in pieces]
        gap = np.zeros(int(round(sr * pause_ms / 1000.0)), np.float32)
        chunks: list = []
        for i, (wav, _) in enumerate(results):
            if i:
                chunks.append(gap)
            chunks.append(np.asarray(wav, np.float32))
        return np.concatenate(chunks), sr

    def tts_batch(
        self,
        texts,
        language: str = "ZH",
        spk_ids=None,
        method: str = "dpm-solver",
        infer_speedup: int = 50,
        max_length: int = 1024,
        top_k: int = 5,
        end_gate_threshold: Optional[float] = None,
        seed: int = 0,
        phone_bucket: int = 16,
        batch_bucket: bool = True,
    ):
        """Batched serve: N texts -> list of (waveform, sample_rate).

        Phones are padded to a shared bucket with encoder attention masks and
        the LM decodes all sequences in one scan.  Generated sequences are then
        grouped by latent-length bucket and diffusion+vocoder run ONCE per
        bucket (batched: one compiled call, B items), each item edge-padded to
        the bucket and cropped back on host.  Throughput path for production
        serving (the B=1 `tts` is the latency path).

        `batch_bucket` additionally pads the BATCH dimension to the next power
        of two (rows replicate row 0; pad outputs are dropped).  A dynamic
        batcher otherwise presents every batch size 1..max_batch as a distinct
        XLA program — on TPU each is a fresh compile (tens of seconds through
        a remote-compile relay), so under mixed load the first b=3 batch would
        stall the whole queue.  Bucketing bounds the program count at
        log2(max_batch)+1 per length bucket for a <=2x padded-compute cost."""
        assert self.lm is not None and self.codebook is not None
        B = len(texts)
        seqs = [self.text_to_phones(t, language) for t in texts]
        L = max(len(p) for p, _ in seqs)
        L = max(phone_bucket, ((L + phone_bucket - 1) // phone_bucket) * phone_bucket)
        pad_id = self.lm.cfg.phone_pad
        B_pad = (1 << (B - 1).bit_length()) if batch_bucket and B > 0 else B
        phones = np.full((B_pad, L), pad_id, np.int32)
        tones = np.zeros((B_pad, L), np.int32)
        enc_mask = np.zeros((B_pad, L), np.int32)
        spk = np.asarray(spk_ids if spk_ids is not None else [1] * B, np.int32)
        spk = np.concatenate([spk, np.repeat(spk[:1], B_pad - B)])
        for b in range(B_pad):
            p, t = seqs[b] if b < B else seqs[0]  # pad rows replicate row 0
            phones[b, : len(p)] = p
            tones[b, : len(t)] = t
            enc_mask[b, : len(p)] = 1

        rng = jax.random.PRNGKey(seed)
        r1, r2 = jax.random.split(rng)
        tokens, lengths = self.lm.generate(
            jnp.asarray(phones), jnp.asarray(tones),
            spk_id=jnp.asarray(spk)[:, None] * jnp.ones((1, L), jnp.int32),
            attention_mask=jnp.asarray(enc_mask),
            max_length=max_length, top_k=top_k,
            end_gate_threshold=end_gate_threshold, rng=r1, impl=self.lm_impl,
        )
        tokens_np = np.asarray(tokens)[:B]
        lengths_np = np.asarray(lengths)[:B]
        K = self.lm.cfg.semantic_kmeans_num
        sr = self.vocoder.vocoder_sample_rate
        hop = self.vocoder.vocoder_hop_size
        centroids = np.asarray(self.codebook.codebook)

        # group generated sequences by latent-length bucket; diffusion+vocoder
        # run once per bucket as one batched compiled call
        out = [None] * B
        buckets: dict = {}
        for b in range(B):
            toks = tokens_np[b, : int(lengths_np[b])]
            toks = toks[toks < K].astype(np.int32)
            if len(toks) == 0:
                out[b] = (np.zeros(0, np.float32), sr)
                continue
            buckets.setdefault(_bucket(len(toks)), []).append((b, toks))

        for Lb, items in sorted(buckets.items()):
            n = len(items)
            n_pad = (1 << (n - 1).bit_length()) if batch_bucket else n
            units = np.empty((n_pad, Lb, centroids.shape[1]), np.float32)
            for j in range(n_pad):
                _, toks = items[j] if j < n else items[0]  # pad rows replicate
                emb = centroids[toks]
                units[j, : len(toks)] = emb
                units[j, len(toks):] = emb[-1]  # edge-pad to the bucket
            spk_rows = [int(spk[b]) for b, _ in items]
            spk_rows += [spk_rows[0]] * (n_pad - n)
            r2, sub = jax.random.split(r2)
            wavs = np.asarray(
                self.infer(
                    jnp.asarray(units),
                    spk_id=np.asarray(spk_rows, np.int32),
                    method=method, infer_speedup=infer_speedup, rng=sub,
                )
            )
            for j, (b, toks) in enumerate(items):
                out[b] = (wavs[j, : len(toks) * hop], sr)
        return out

    # -- long audio (SVC-style) ----------------------------------------------

    def infer_from_long_audio(
        self,
        audio: np.ndarray,
        sample_rate: int,
        spk_id: int = 1,
        method: str = "dpm-solver",
        infer_speedup: int = 50,
        threshold_db: float = -40.0,
        mask_threshold_db: float = -60.0,
        seed: int = 0,
    ) -> Tuple[np.ndarray, int]:
        """Slice long audio at silences, synthesize voiced segments, gate each
        by the source volume mask, stitch (`infer_tools.py:84-117`)."""
        assert self.units_encoder is not None, "long-audio path needs a units encoder"
        hop = self.vocoder.vocoder_hop_size
        out_sr = self.vocoder.vocoder_sample_rate
        segments = split_voiced(audio, sample_rate, hop, threshold_db=threshold_db)
        rng = jax.random.PRNGKey(seed)

        # source-side volume mask at the output rate (ref infer_tools.py:89,106)
        src = jnp.asarray(audio)
        if sample_rate != out_sr:
            from latent_diffusion_speech_tpu.ops.resample import resample as _rs

            src = _rs(src, sample_rate, out_sr)
        volume = extract_volume(src, hop)
        mask = np.asarray(get_volume_mask(volume, hop, mask_threshold_db))[0]

        result = np.zeros(0, np.float32)
        current_length = 0
        for start_frame, seg in segments:
            rng, sub = jax.random.split(rng)
            units = self.units_encoder.encode(jnp.asarray(seg), sample_rate)
            if units.ndim == 2:
                units = units[None]
            # re-time to the latent grid of this segment
            n_frames = len(seg) * out_sr // sample_rate // hop
            units = units_forced_alignment(units, n_frames=max(n_frames, 1))
            wav = np.array(self.infer(units, spk_id=spk_id, method=method,
                                      infer_speedup=infer_speedup, rng=sub)[0])
            # gate by the source volume mask window (ref infer_tools.py:106-108);
            # the mask lives on the output-rate grid, so rescale the source-rate
            # frame offset by out_sr/sample_rate to index it
            _left = round(start_frame * hop * out_sr / sample_rate)
            win = mask[_left : _left + len(wav)]
            wav[: len(win)] *= win
            silent_length = round(start_frame * hop * out_sr / sample_rate) - current_length
            if silent_length >= 0:
                result = np.append(result, np.zeros(silent_length, np.float32))
                result = np.append(result, wav)
            else:
                result = cross_fade(result, wav, current_length + silent_length)
            current_length = current_length + silent_length + len(wav)
        return result, out_sr
