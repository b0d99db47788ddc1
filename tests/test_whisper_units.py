"""Whisper encoder parity vs a torch re-statement of the reference architecture,
plus UnitsEncoder facade behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.models.units import UnitsEncoder, get_encoder_out_channels
from latent_diffusion_speech_tpu.models.whisper import (
    WhisperDims,
    WhisperEncoder,
    whisper_encoder_params_from_torch,
)
from latent_diffusion_speech_tpu.ops.attention import dot_product_attention

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

TINY = WhisperDims(n_mels=16, n_audio_ctx=100, n_audio_state=32, n_audio_head=4, n_audio_layer=2)


class TorchBlock(tnn.Module):
    """Reference ResidualAttentionBlock semantics (whisper/model.py:42-110)."""

    def __init__(self, n_state, n_head):
        super().__init__()
        self.n_head = n_head
        self.attn_ln = tnn.LayerNorm(n_state)
        self.query = tnn.Linear(n_state, n_state)
        self.key = tnn.Linear(n_state, n_state, bias=False)
        self.value = tnn.Linear(n_state, n_state)
        self.out = tnn.Linear(n_state, n_state)
        self.mlp_ln = tnn.LayerNorm(n_state)
        self.mlp0 = tnn.Linear(n_state, 4 * n_state)
        self.mlp2 = tnn.Linear(4 * n_state, n_state)

    def attention(self, x):
        q, k, v = self.query(x), self.key(x), self.value(x)
        B, T, C = q.shape
        scale = (C // self.n_head) ** -0.25
        q = q.view(B, T, self.n_head, -1).permute(0, 2, 1, 3) * scale
        k = k.view(B, T, self.n_head, -1).permute(0, 2, 3, 1) * scale
        v = v.view(B, T, self.n_head, -1).permute(0, 2, 1, 3)
        w = tF.softmax((q @ k).float(), dim=-1).to(q.dtype)
        return self.out((w @ v).permute(0, 2, 1, 3).flatten(start_dim=2))

    def forward(self, x):
        x = x + self.attention(self.attn_ln(x))
        x = x + self.mlp2(tF.gelu(self.mlp0(self.mlp_ln(x))))
        return x


class TorchWhisperEncoder(tnn.Module):
    def __init__(self, dims):
        super().__init__()
        self.conv1 = tnn.Conv1d(dims.n_mels, dims.n_audio_state, 3, padding=1)
        self.conv2 = tnn.Conv1d(dims.n_audio_state, dims.n_audio_state, 3, stride=2, padding=1)
        self.blocks = tnn.ModuleList([TorchBlock(dims.n_audio_state, dims.n_audio_head) for _ in range(dims.n_audio_layer)])
        self.ln_post = tnn.LayerNorm(dims.n_audio_state)
        self.n_state = dims.n_audio_state

    def forward(self, mel):
        x = tF.gelu(self.conv1(mel))
        x = tF.gelu(self.conv2(x))
        x = x.permute(0, 2, 1)
        T, C = x.shape[1], self.n_state
        inc = np.log(10000) / (C // 2 - 1)
        inv = torch.exp(-inc * torch.arange(C // 2))
        scaled = torch.arange(T)[:, None] * inv[None, :]
        pos = torch.cat([torch.sin(scaled), torch.cos(scaled)], dim=1)
        x = x + pos
        for b in self.blocks:
            x = b(x)
        return self.ln_post(x)

    def state_dict_reference_layout(self):
        """Rename to the reference checkpoint key layout."""
        sd = {}
        for k, v in self.state_dict().items():
            k = (
                k.replace("mlp0", "mlp.0")
                .replace("mlp2", "mlp.2")
                .replace("query", "attn.query")
                .replace("key", "attn.key")
                .replace("value", "attn.value")
                .replace("out", "attn.out")
            )
            sd[k] = v
        return sd


class TestWhisperParity:
    def test_encoder_matches_torch(self, rng):
        tmodel = TorchWhisperEncoder(TINY).eval()
        params = whisper_encoder_params_from_torch(tmodel.state_dict_reference_layout(), TINY)

        mel = rng.standard_normal((2, 16, 50)).astype(np.float32)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(mel)).numpy()

        enc = WhisperEncoder(TINY)
        mine = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(mel))
        assert mine.shape == ref.shape  # (2, 25, 32)
        np.testing.assert_allclose(np.asarray(mine), ref, atol=2e-4)


class TestAttentionOp:
    def test_causal_masks_future(self, rng):
        q = jnp.asarray(rng.standard_normal((1, 4, 2, 8)).astype(np.float32))
        out_causal = dot_product_attention(q, q, q, is_causal=True)
        # first position can only attend to itself -> equals v[0]
        np.testing.assert_allclose(np.asarray(out_causal[:, 0]), np.asarray(q[:, 0]), atol=1e-6)

    def test_mask_equivalent_to_bias(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 5, 2, 8)).astype(np.float32))
        mask = jnp.ones((1, 1, 5, 5), dtype=bool).at[..., 3:].set(False)
        bias = jnp.where(mask, 0.0, -1e30)
        np.testing.assert_allclose(
            np.asarray(dot_product_attention(x, x, x, mask=mask)),
            np.asarray(dot_product_attention(x, x, x, bias=bias)),
            atol=1e-6,
        )


class TestUnitsEncoder:
    def test_whisper_units_pipeline(self, rng):
        ue = UnitsEncoder(
            "whisper_large_v3",
            dims=TINY,
            dtype=jnp.float32,
        )
        audio = jnp.asarray(rng.standard_normal(8000).astype(np.float32) * 0.1)  # 0.5 s 16 kHz
        units = ue.encode(audio, 16000)
        # whisper mel: T//160 frames, encoder halves -> T//320
        assert units.shape == (1, 8000 // 320, TINY.n_audio_state)

    def test_short_audio_padded_to_400(self):
        ue = UnitsEncoder("whisper_large_v3", dims=TINY, dtype=jnp.float32)
        units = ue.encode(jnp.zeros(100), 16000)
        assert units.shape[1] == 400 // 320

    def test_resamples_44k_input(self, rng):
        ue = UnitsEncoder("whisper_large_v3", dims=TINY, dtype=jnp.float32)
        audio = jnp.asarray(rng.standard_normal(44100).astype(np.float32) * 0.1)
        units = ue.encode(audio, 44100)
        assert units.shape == (1, 16000 // 320, TINY.n_audio_state)

    def test_out_channels_registry(self):
        assert get_encoder_out_channels("whisper_large_v3") == 1280
        with pytest.raises(ValueError):
            get_encoder_out_channels("nope")

    def test_unknown_encoder_raises(self):
        with pytest.raises(ValueError):
            UnitsEncoder("not_an_encoder")
