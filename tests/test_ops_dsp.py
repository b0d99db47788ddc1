"""Golden tests for the DSP layer: STFT/mel vs torch.stft, filterbank vs the
whisper-published npz, volume/alignment vs reference-semantics numpy."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from latent_diffusion_speech_tpu.ops.mel import mel_filterbank
from latent_diffusion_speech_tpu.ops.stft import (
    MelSpectrogram,
    hann_window,
    istft,
    stft,
    whisper_log_mel,
)
from latent_diffusion_speech_tpu.ops.volume import extract_volume, get_volume_mask
from latent_diffusion_speech_tpu.ops.alignment import units_forced_alignment, cross_fade
from latent_diffusion_speech_tpu.ops.resample import resample
from latent_diffusion_speech_tpu.ops.audio_io import read_wav, write_wav

torch = pytest.importorskip("torch")

WHISPER_FILTERS = "/root/reference/encoder/whisper/assets/mel_filters.npz"


class TestMelFilterbank:
    @pytest.mark.skipif(not os.path.exists(WHISPER_FILTERS), reason="no golden npz")
    @pytest.mark.parametrize("n_mels", [80, 128])
    def test_matches_whisper_assets(self, n_mels):
        golden = np.load(WHISPER_FILTERS)[f"mel_{n_mels}"]
        mine = mel_filterbank(16000, 400, n_mels)
        assert mine.shape == golden.shape
        np.testing.assert_allclose(mine, golden, atol=2e-7)

    def test_htk_roundtrip(self):
        from latent_diffusion_speech_tpu.ops.mel import hz_to_mel, mel_to_hz

        f = np.array([0.0, 440.0, 1000.0, 8000.0, 22050.0])
        for htk in (False, True):
            np.testing.assert_allclose(mel_to_hz(hz_to_mel(f, htk), htk), f, rtol=1e-9)


class TestSTFT:
    @pytest.mark.parametrize("center", [True, False])
    @pytest.mark.parametrize("n_fft,hop", [(400, 160), (2048, 512), (1024, 256)])
    def test_matches_torch_stft(self, rng, center, n_fft, hop):
        y = rng.standard_normal(8192).astype(np.float32)
        mine = np.asarray(stft(jnp.asarray(y)[None], n_fft, hop, center=center))[0]
        ref = torch.stft(
            torch.from_numpy(y),
            n_fft,
            hop_length=hop,
            window=torch.hann_window(n_fft),
            center=center,
            return_complex=True,
        ).numpy()
        assert mine.shape == ref.shape
        np.testing.assert_allclose(mine, ref, atol=2e-3)

    def test_hann_matches_torch(self):
        np.testing.assert_allclose(
            np.asarray(hann_window(1024)), torch.hann_window(1024).numpy(), atol=1e-6
        )

    def test_istft_roundtrip(self, rng):
        y = rng.standard_normal(4096).astype(np.float32)
        spec = stft(jnp.asarray(y)[None], 1024, 256, center=True)
        rec = np.asarray(istft(spec, 1024, 256, center=True, length=4096))[0]
        np.testing.assert_allclose(rec, y, atol=1e-3)


class TestVAEGANMel:
    """Reference semantics: nvSTFT.get_mel (`nvSTFT.py:69-118`)."""

    def _torch_get_mel(self, y, sr=44100, n_mels=128, n_fft=2048, win=2048, hop=512,
                       fmin=40, fmax=16000, clip_val=1e-5):
        mel_basis = torch.from_numpy(mel_filterbank(sr, n_fft, n_mels, fmin, fmax)).float()
        yt = torch.from_numpy(y)
        pad_left = (win - hop) // 2
        pad_right = max((win - hop + 1) // 2, win - yt.size(-1) - pad_left)
        mode = "reflect" if pad_right < yt.size(-1) else "constant"
        yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad_left, pad_right), mode=mode).squeeze(1)
        spec = torch.stft(yt, n_fft, hop_length=hop, win_length=win,
                          window=torch.hann_window(win), center=False, return_complex=True)
        spec = torch.sqrt(spec.real.pow(2) + spec.imag.pow(2) + 1e-9)
        spec = torch.matmul(mel_basis, spec)
        return torch.log(torch.clamp(spec, min=clip_val)).numpy()

    def test_matches_reference_semantics(self, rng):
        y = (rng.standard_normal((2, 22050)) * 0.1).astype(np.float32)
        mel = MelSpectrogram()
        mine = np.asarray(mel(jnp.asarray(y)))
        ref = self._torch_get_mel(y)
        assert mine.shape == ref.shape
        np.testing.assert_allclose(mine, ref, atol=5e-3)

    def test_short_audio_constant_pad(self, rng):
        y = (rng.standard_normal((1, 700)) * 0.1).astype(np.float32)
        mine = np.asarray(MelSpectrogram()(jnp.asarray(y)))
        ref = self._torch_get_mel(y)
        np.testing.assert_allclose(mine, ref, atol=5e-3)

    def test_frames_for_length(self):
        mel = MelSpectrogram()
        for n in (22050, 44100, 700, 512 * 86):
            y = jnp.zeros((1, n))
            assert mel(y).shape[-1] == mel.frames_for_length(n)


class TestWhisperMel:
    def test_matches_reference_semantics(self, rng):
        """whisper log_mel_spectrogram (`whisper/audio.py:62-82`) re-done in torch."""
        y = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        mine = np.asarray(whisper_log_mel(jnp.asarray(y), n_mels=128))

        yt = torch.from_numpy(y)
        window = torch.hann_window(400)
        st = torch.stft(yt, 400, 160, window=window, return_complex=True)
        mags = st[..., :-1].abs() ** 2
        filters = torch.from_numpy(np.load(WHISPER_FILTERS)["mel_128"]) if os.path.exists(WHISPER_FILTERS) else torch.from_numpy(mel_filterbank(16000, 400, 128))
        mel_spec = filters @ mags
        log_spec = torch.clamp(mel_spec, min=1e-10).log10()
        log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
        ref = ((log_spec + 4.0) / 4.0).numpy()

        assert mine.shape == ref.shape
        np.testing.assert_allclose(mine, ref, atol=5e-4)


class TestVolume:
    def test_matches_reference_loop(self, rng):
        """Reference Volume_Extractor.extract (`tools/tools.py:23-33`)."""
        hop = 512
        audio = rng.standard_normal(22050).astype(np.float32) * 0.3
        n_frames = int(len(audio) // hop) + 1
        a2 = np.pad(audio**2, (hop // 2, (hop + 1) // 2), mode="reflect")
        ref = np.sqrt(np.array([np.mean(a2[n * hop : (n + 1) * hop]) for n in range(n_frames)]))
        mine = np.asarray(extract_volume(jnp.asarray(audio), hop))
        np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-6)

    def test_mask_shape_and_binary(self, rng):
        vol = jnp.asarray(np.abs(rng.standard_normal(40)).astype(np.float32))
        mask = get_volume_mask(vol, block_size=512, threshold_db=-60)
        assert mask.shape == (1, 40 * 512)
        assert float(jnp.min(mask)) >= 0.0 and float(jnp.max(mask)) <= 1.0


class TestAlignment:
    @pytest.mark.parametrize("mode", ["nearest", "linear"])
    @pytest.mark.parametrize("t_in,t_out", [(50, 87), (87, 50), (100, 100)])
    def test_matches_torch_interpolate(self, rng, mode, t_in, t_out):
        units = rng.standard_normal((2, t_in, 8)).astype(np.float32)
        mine = np.asarray(units_forced_alignment(jnp.asarray(units), n_frames=t_out, mode=mode))
        ref = (
            torch.nn.functional.interpolate(
                torch.from_numpy(units).transpose(-1, -2), size=t_out, mode=mode
            )
            .transpose(-1, -2)
            .numpy()
        )
        np.testing.assert_allclose(mine, ref, atol=1e-5)

    def test_cross_fade(self):
        a = np.ones(100)
        b = np.zeros(100) + 2.0
        out = cross_fade(a, b, 80)
        assert out.shape == (180,)
        np.testing.assert_allclose(out[:80], 1.0)
        np.testing.assert_allclose(out[100:], 2.0)
        assert np.all(np.diff(out[79:101]) >= 0)


class TestResample:
    @pytest.mark.parametrize("orig,new", [(44100, 16000), (16000, 44100), (48000, 44100)])
    def test_tone_preserved(self, orig, new):
        t = np.arange(orig) / orig  # 1 second
        y = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        out = np.asarray(resample(jnp.asarray(y), orig, new))
        assert out.shape[-1] == int(np.ceil(len(y) * new / orig))
        # windowed middle section should still be a 440 Hz tone
        mid = out[new // 4 : new // 4 + 2048]
        spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
        peak_hz = np.argmax(spec) * new / len(mid)
        assert abs(peak_hz - 440.0) < 25.0
        # amplitude approximately preserved
        assert 0.9 < np.max(np.abs(mid)) < 1.1

    def test_identity(self, rng):
        y = rng.standard_normal(1000).astype(np.float32)
        out = np.asarray(resample(jnp.asarray(y), 16000, 16000))
        np.testing.assert_array_equal(out, y)


class TestAudioIO:
    @pytest.mark.parametrize("subtype", ["pcm16", "float32"])
    def test_roundtrip(self, tmp_path, rng, subtype):
        y = np.clip(rng.standard_normal(1000) * 0.3, -0.99, 0.99).astype(np.float32)
        p = tmp_path / "x.wav"
        write_wav(p, y, 44100, subtype=subtype)
        out, sr = read_wav(p)
        assert sr == 44100
        atol = 1e-4 if subtype == "pcm16" else 1e-7
        np.testing.assert_allclose(out, y, atol=atol)

    def test_non_wav_without_ffmpeg_raises_with_guidance(self, tmp_path, monkeypatch):
        import shutil as _shutil

        p = tmp_path / "x.mp3"
        p.write_bytes(b"ID3\x04\x00" + b"\x00" * 64)
        monkeypatch.setattr(_shutil, "which", lambda name: None)
        from latent_diffusion_speech_tpu.ops.audio_io import load_audio

        with pytest.raises(ValueError, match="ffmpeg"):
            load_audio(p)

    def test_non_wav_decodes_via_ffmpeg_when_present(self, tmp_path, monkeypatch):
        # stub `ffmpeg` on PATH emitting a known f32le stream (reference
        # whisper/audio.py:15-32 pipes exactly this format)
        import os

        ref = np.linspace(-0.5, 0.5, 64, dtype=np.float32)
        raw = tmp_path / "ref.f32"
        raw.write_bytes(ref.tobytes())
        stub = tmp_path / "ffmpeg"
        stub.write_text(f"#!/bin/sh\ncat {raw}\n")
        stub.chmod(0o755)
        monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}{os.environ['PATH']}")

        p = tmp_path / "x.mp3"
        p.write_bytes(b"ID3\x04\x00" + b"\x00" * 64)
        from latent_diffusion_speech_tpu.ops.audio_io import load_audio

        out, sr = load_audio(p, target_sr=16000)
        assert sr == 16000
        np.testing.assert_array_equal(out, ref)
