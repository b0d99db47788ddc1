"""Semantic unit extraction facade (reference `Units_Encoder`, tools/tools.py:43-103).

Registry of unit encoders (whisper_large_v3 implemented natively in JAX;
w2v-bert / xlsr slots kept behind the same interface), cached input
resampling, <400-sample pad rule, and rate-forcing modes.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.models.whisper import (
    WhisperDims,
    WhisperEncoder,
    whisper_encoder_params_from_torch,
)
from latent_diffusion_speech_tpu.ops.resample import resample
from latent_diffusion_speech_tpu.ops.stft import whisper_log_mel

ENCODER_OUT_CHANNELS = {
    "whisper_large_v3": 1280,
    "w2v-bert": 1024,
    "xlsr_53_56k": 1024,
    "hubert_soft": 256,
}


def get_encoder_out_channels(encoder: str) -> int:
    """Reference `get_encdoer_out_channels` (tools/tools.py:257+)."""
    if encoder not in ENCODER_OUT_CHANNELS:
        raise ValueError(f"[x] Unknown units encoder: {encoder}")
    return ENCODER_OUT_CHANNELS[encoder]


class WhisperLargeV3Units:
    """Whisper-large-v3 encoder as the unit extractor (ref tools/tools.py:105-126).

    16 kHz audio -> log-mel(128) -> encoder -> (T // 320) frames of 1280-d units.
    """

    def __init__(self, ckpt_path: Optional[str] = None, dims: Optional[WhisperDims] = None, dtype=jnp.bfloat16, seed: int = 0):
        if ckpt_path and Path(ckpt_path).exists():
            import torch

            ck = torch.load(ckpt_path, map_location="cpu", weights_only=False)
            self.dims = WhisperDims.from_checkpoint_dims(ck["dims"])
            self.model = WhisperEncoder(self.dims, dtype=dtype)
            self.params = jax.tree_util.tree_map(
                jnp.asarray, whisper_encoder_params_from_torch(ck["model_state_dict"], self.dims)
            )
        else:
            self.dims = dims or WhisperDims()
            self.model = WhisperEncoder(self.dims, dtype=dtype)
            probe = jnp.zeros((1, self.dims.n_mels, 8))
            self.params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), probe)["params"]
        self._apply = jax.jit(lambda p, mel: self.model.apply({"params": p}, mel))

    def __call__(self, audio16k: jnp.ndarray) -> jnp.ndarray:
        """(B, T) 16 kHz float audio -> (B, T // 320, n_state) units."""
        if audio16k.ndim == 1:
            audio16k = audio16k[None]
        mel = whisper_log_mel(audio16k, n_mels=self.dims.n_mels)
        return self._apply(self.params, mel)


class HubertSoftUnits:
    """HuBERT-soft unit extractor (reference alternative encoder,
    `encoder/hubert/model.py:72-80`): 16 kHz audio -> 50 fps 256-d units."""

    def __init__(self, ckpt_path: Optional[str] = None, dtype=jnp.bfloat16, seed: int = 0):
        from latent_diffusion_speech_tpu.models.hubert import HubertSoft

        self.model = HubertSoft(dtype=dtype)
        if ckpt_path and Path(ckpt_path).exists():
            import torch

            from latent_diffusion_speech_tpu.models.hubert import hubert_params_from_torch

            ck = torch.load(ckpt_path, map_location="cpu", weights_only=False)
            state = ck.get("hubert", ck.get("model", ck))  # bshall release layout
            self.params = jax.tree_util.tree_map(jnp.asarray, hubert_params_from_torch(state))
        else:
            probe = jnp.zeros((1, 960))
            self.params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), probe)["params"]
        self._units = jax.jit(
            lambda p, wav: self.model.apply({"params": p}, wav, method=self.model.units)
        )

    def __call__(self, audio16k: jnp.ndarray) -> jnp.ndarray:
        if audio16k.ndim == 1:
            audio16k = audio16k[None]
        return self._units(self.params, audio16k)


class Wav2Vec2BertUnits:
    """w2v-BERT 2.0 units, TPU-native (ref `tools/tools.py:128-142`).

    The whole chain — Kaldi fbank frontend, 2-frame stacking, feature
    projection, 24 conformer blocks — runs as jitted XLA programs
    (`models/w2vbert.py`); torch is touched only when importing a local
    HF checkpoint's weights.  Output: 50 fps 1024-d hidden states."""

    def __init__(self, ckpt_path: Optional[str] = None, cache_dir: str = "pretrain",
                 dtype=jnp.bfloat16, seed: int = 0, hf_model=None, **_):
        from latent_diffusion_speech_tpu.models.w2vbert import (
            W2vBertConfig,
            W2vBertModel,
            w2vbert_fbank,
            w2vbert_params_from_torch,
        )

        self._fbank = w2vbert_fbank
        if hf_model is not None:
            # direct injection (tests / already-loaded HF torch model)
            self.cfg = W2vBertConfig.from_hf(hf_model.config)
            params = w2vbert_params_from_torch(hf_model.state_dict(), self.cfg)
        elif ckpt_path and Path(ckpt_path).exists():
            import torch

            state = torch.load(ckpt_path, map_location="cpu", weights_only=False)
            state = state.get("model", state)
            self.cfg = W2vBertConfig()
            params = w2vbert_params_from_torch(state, self.cfg)
        else:
            try:
                from transformers import Wav2Vec2BertModel as _HF

                hf = _HF.from_pretrained(
                    "facebook/w2v-bert-2.0", cache_dir=cache_dir, local_files_only=True
                ).eval()
                self.cfg = W2vBertConfig.from_hf(hf.config)
                params = w2vbert_params_from_torch(hf.state_dict(), self.cfg)
            except Exception:
                # no local weights: random-init at flagship geometry (same
                # posture as the whisper slot without its checkpoint)
                self.cfg = W2vBertConfig()
                self.model = W2vBertModel(self.cfg, dtype=dtype)
                probe = jnp.zeros((1, 4, self.cfg.feature_projection_input_dim))
                self.params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), probe)["params"]
                self._apply = jax.jit(lambda p, f: self.model.apply({"params": p}, f))
                return
        self.model = W2vBertModel(self.cfg, dtype=dtype)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self._apply = jax.jit(lambda p, f: self.model.apply({"params": p}, f))

    def __call__(self, audio16k):
        if audio16k.ndim == 1:
            audio16k = audio16k[None]
        feats = self._fbank(audio16k)
        return self._apply(self.params, feats)


class XLSRUnits:
    """XLSR-53 (wav2vec 2.0 large) units, TPU-native (ref `tools/tools.py:144-163`).

    Replaces the reference's fairseq `extract_features()["x"]` with a flax
    wav2vec2 encoder (`models/wav2vec2.py`); accepts the fairseq
    `xlsr_53_56k.pt` checkpoint or an HF `Wav2Vec2Model` state dict."""

    def __init__(self, ckpt_path: Optional[str] = None, dtype=jnp.bfloat16,
                 seed: int = 0, hf_model=None, **_):
        from latent_diffusion_speech_tpu.models.wav2vec2 import (
            Wav2Vec2Config,
            Wav2Vec2Encoder,
            wav2vec2_params_from_fairseq,
            wav2vec2_params_from_hf,
        )

        if hf_model is not None:
            self.cfg = Wav2Vec2Config.from_hf(hf_model.config)
            params = wav2vec2_params_from_hf(hf_model.state_dict(), self.cfg)
        elif ckpt_path and Path(ckpt_path).exists():
            import torch

            ck = torch.load(ckpt_path, map_location="cpu", weights_only=False)
            state = ck.get("model", ck)  # fairseq checkpoint layout
            self.cfg = Wav2Vec2Config()
            if any(k.startswith("post_extract_proj") for k in state):
                params = wav2vec2_params_from_fairseq(state, self.cfg)
            else:
                params = wav2vec2_params_from_hf(state, self.cfg)
        else:
            self.cfg = Wav2Vec2Config()
            self.model = Wav2Vec2Encoder(self.cfg, dtype=dtype)
            self.params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), jnp.zeros((1, 1600)))["params"]
            self._apply = jax.jit(lambda p, w: self.model.apply({"params": p}, w))
            return
        self.model = Wav2Vec2Encoder(self.cfg, dtype=dtype)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self._apply = jax.jit(lambda p, w: self.model.apply({"params": p}, w))

    def __call__(self, audio16k: jnp.ndarray) -> jnp.ndarray:
        if audio16k.ndim == 1:
            audio16k = audio16k[None]
        return self._apply(self.params, audio16k)


class UnitsEncoder:
    def __init__(
        self,
        encoder: str = "whisper_large_v3",
        encoder_sample_rate: int = 16000,
        encoder_hop_size: int = 320,
        units_forced_mode: str = "nearest",
        ckpt_path: Optional[str] = None,
        **kw,
    ):
        self.encoder = encoder
        if encoder == "whisper_large_v3":
            self.model = WhisperLargeV3Units(ckpt_path=ckpt_path, **kw)
        elif encoder == "hubert_soft":
            self.model = HubertSoftUnits(ckpt_path=ckpt_path, **kw)
        elif encoder == "w2v-bert":
            self.model = Wav2Vec2BertUnits(ckpt_path=ckpt_path, **kw)
        elif encoder == "xlsr_53_56k":
            self.model = XLSRUnits(ckpt_path=ckpt_path, **kw)
        else:
            raise ValueError(f"[x] Unknown units encoder: {encoder}")

        self.units_forced_mode = units_forced_mode or "left"
        # rate-forcing modes resample to a slightly detuned encoder rate so the
        # unit frame grid lands exactly on the 44.1k/512 latent grid
        # (ref tools/tools.py:67-70)
        if units_forced_mode == "rfa512to441":
            encoder_sample_rate = encoder_sample_rate * 441 // 512
        if units_forced_mode == "rfa441to512":
            encoder_sample_rate = encoder_sample_rate * 512 // 441
        self.encoder_sample_rate = encoder_sample_rate
        self.encoder_hop_size = encoder_hop_size

    def encode(
        self, audio: jnp.ndarray, sample_rate: int, pad_to_bucket: bool = True
    ) -> jnp.ndarray:
        """Audio (B, T) or (T,) at `sample_rate` -> units (B, T_units, C).

        Lengths are padded to half-second buckets (outputs cropped to the true
        frame count) so variable-length inputs — e.g. the long-audio SVC path's
        segments — reuse a bounded set of compiled programs."""
        if audio.ndim == 1:
            audio = audio[None]
        if sample_rate != self.encoder_sample_rate:
            audio = resample(audio, sample_rate, self.encoder_sample_rate)
        if audio.shape[-1] < 400:  # ref tools/tools.py:96-97
            audio = jnp.pad(audio, ((0, 0), (0, 400 - audio.shape[-1])))
        T = audio.shape[-1]
        true_frames = T // self.encoder_hop_size
        if pad_to_bucket:
            step = self.encoder_sample_rate // 2
            padded = max(step, ((T + step - 1) // step) * step)
            if padded != T:
                audio = jnp.pad(audio, ((0, 0), (0, padded - T)))
        units = self.model(audio)
        return units[:, :true_frames]
