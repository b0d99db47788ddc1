"""HiFi-VAEGAN codec tests: numerical parity against a torch model with the
reference architecture (weights imported through the checkpoint importer),
plus shape/loss/discriminator sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.models.vaegan import (
    Generator,
    HifiVAEGAN,
    VAEEncoder,
    VAEGANConfig,
)
from latent_diffusion_speech_tpu.models.vaegan.import_torch import (
    encoder_params_from_torch,
    generator_params_from_torch,
)

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402
from torch.nn.utils import weight_norm  # noqa: E402

# Tiny geometry: hop 8 = 4*2, 2 resblock kernels
TINY = VAEGANConfig(
    sampling_rate=8000,
    inter_channels=6,
    resblock="1",
    resblock_kernel_sizes=(3, 7),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
    upsample_rates=(4, 2),
    upsample_initial_channel=16,
    upsample_kernel_sizes=(8, 4),
)


def _pad(k, d=1):
    return (k * d - d) // 2


class TorchResBlock1(tnn.Module):
    """Reference ResBlock1 semantics (models.py:161-198)."""

    def __init__(self, ch, k, dilations):
        super().__init__()
        self.convs1 = tnn.ModuleList(
            [weight_norm(tnn.Conv1d(ch, ch, k, 1, dilation=d, padding=_pad(k, d))) for d in dilations]
        )
        self.convs2 = tnn.ModuleList(
            [weight_norm(tnn.Conv1d(ch, ch, k, 1, dilation=1, padding=_pad(k, 1))) for _ in dilations]
        )

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = tF.leaky_relu(x, 0.1)
            xt = c1(xt)
            xt = tF.leaky_relu(xt, 0.1)
            xt = c2(xt)
            x = x + xt
        return x


class TorchEncoder(tnn.Module):
    """Reference Encoder semantics (models.py:14-59)."""

    def __init__(self, cfg):
        super().__init__()
        L = len(cfg.upsample_rates)
        self.num_kernels = len(cfg.resblock_kernel_sizes)
        self.num_down = L
        self.conv_pre = weight_norm(tnn.Conv1d(1, cfg.upsample_initial_channel // (2**L), 7, 1, padding=3))
        self.ups = tnn.ModuleList()
        for i, (u, k) in enumerate(zip(reversed(cfg.upsample_rates), reversed(cfg.upsample_kernel_sizes))):
            self.ups.append(
                weight_norm(
                    tnn.Conv1d(
                        cfg.upsample_initial_channel // (2 ** (L - i)),
                        cfg.upsample_initial_channel // (2 ** (L - i - 1)),
                        k,
                        u,
                        padding=(k - u + 1) // 2,
                    )
                )
            )
        self.resblocks = tnn.ModuleList()
        for i in range(L, 0, -1):
            ch = cfg.upsample_initial_channel // (2 ** (i - 1))
            for k, d in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                self.resblocks.append(TorchResBlock1(ch, k, d))
        self.conv_post = weight_norm(tnn.Conv1d(ch, 2 * cfg.inter_channels, 7, 1, padding=3))
        self.out_channels = cfg.inter_channels

    def forward(self, x):
        x = x[:, None, :]
        x = self.conv_pre(x)
        for i in range(self.num_down):
            x = tF.leaky_relu(x, 0.1)
            x = self.ups[i](x)
            xs = None
            for j in range(self.num_kernels):
                y = self.resblocks[i * self.num_kernels + j](x)
                xs = y if xs is None else xs + y
            x = xs / self.num_kernels
        x = tF.leaky_relu(x)
        x = self.conv_post(x)
        m, logs = torch.split(x, self.out_channels, dim=1)
        return m, logs


class TorchGenerator(tnn.Module):
    """Reference Generator semantics (models.py:224-264)."""

    def __init__(self, cfg):
        super().__init__()
        self.num_kernels = len(cfg.resblock_kernel_sizes)
        self.num_up = len(cfg.upsample_rates)
        self.conv_pre = weight_norm(tnn.Conv1d(cfg.inter_channels, cfg.upsample_initial_channel, 7, 1, padding=3))
        self.ups = tnn.ModuleList()
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            self.ups.append(
                weight_norm(
                    tnn.ConvTranspose1d(
                        cfg.upsample_initial_channel // (2**i),
                        cfg.upsample_initial_channel // (2 ** (i + 1)),
                        k,
                        u,
                        padding=(k - u + 1) // 2,
                    )
                )
            )
        self.resblocks = tnn.ModuleList()
        for i in range(self.num_up):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            for k, d in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                self.resblocks.append(TorchResBlock1(ch, k, d))
        self.conv_post = weight_norm(tnn.Conv1d(ch, 1, 7, 1, padding=3))

    def forward(self, x):
        x = self.conv_pre(x)
        for i in range(self.num_up):
            x = tF.leaky_relu(x, 0.1)
            x = self.ups[i](x)
            xs = None
            for j in range(self.num_kernels):
                y = self.resblocks[i * self.num_kernels + j](x)
                xs = y if xs is None else xs + y
            x = xs / self.num_kernels
        x = tF.leaky_relu(x)
        x = self.conv_post(x)
        return torch.tanh(x)


class TestEncoderParity:
    def test_encoder_matches_torch(self, rng):
        tmodel = TorchEncoder(TINY).eval()
        state = tmodel.state_dict()
        params = encoder_params_from_torch(state, TINY)

        audio = rng.standard_normal((2, 64)).astype(np.float32) * 0.3
        with torch.no_grad():
            m_t, logs_t = tmodel(torch.from_numpy(audio))

        enc = VAEEncoder(TINY)
        _, m_j, logs_j = enc.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(audio),
            rng=jax.random.PRNGKey(0),
        )
        np.testing.assert_allclose(np.asarray(m_j), m_t.numpy().transpose(0, 2, 1), atol=2e-5)
        np.testing.assert_allclose(np.asarray(logs_j), logs_t.numpy().transpose(0, 2, 1), atol=2e-5)


class TestGeneratorParity:
    def test_generator_matches_torch(self, rng):
        tmodel = TorchGenerator(TINY).eval()
        params = generator_params_from_torch(tmodel.state_dict(), TINY)

        z = rng.standard_normal((2, 6, 10)).astype(np.float32)  # (B, C, T) torch layout
        with torch.no_grad():
            wav_t = tmodel(torch.from_numpy(z)).numpy()[:, 0, :]

        gen = Generator(TINY)
        wav_j = gen.apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(z.transpose(0, 2, 1)),
        )
        assert wav_j.shape == wav_t.shape
        np.testing.assert_allclose(np.asarray(wav_j), wav_t, atol=2e-5)


class TestCodecFacade:
    def test_extract_decode_shapes(self):
        codec = HifiVAEGAN.random_init(TINY, seed=0)
        audio = jnp.zeros((1, 100))  # not a hop multiple -> padded to 104
        lat = codec.extract(audio)
        assert lat.shape == (1, 13, 12)  # 104/8 frames, 2*6 channels
        m = lat[..., :6]
        wav = codec.decode(m)
        assert wav.shape == (1, 13 * 8)

    def test_only_mean_zeroes_logs(self):
        codec = HifiVAEGAN.random_init(TINY, seed=0)
        lat = codec.extract(jnp.ones((1, 64)), only_mean=True)
        np.testing.assert_array_equal(np.asarray(lat[..., 6:]), 0.0)

    def test_get_mel_shape(self):
        codec = HifiVAEGAN.random_init(TINY, seed=0)
        mel = codec.get_mel(jnp.zeros((1, 4096)))
        assert mel.shape[0] == 1 and mel.shape[2] == 128


class TestDiscriminatorsAndLosses:
    def test_bank_smoke(self, rng):
        from latent_diffusion_speech_tpu.models.vaegan.discriminators import DiscriminatorBank

        bank = DiscriminatorBank(periods=(2, 3), stft_scales=((256, 64, 256),))
        x = jnp.asarray(rng.standard_normal((1, 2048)).astype(np.float32))
        variables = bank.init(jax.random.PRNGKey(0), x)
        logits, fmaps = bank.apply(variables, x)
        assert len(logits) == 1 + 1 + 2  # stft + scale + periods
        assert len(fmaps) == len(logits)
        assert all(len(fm) >= 5 for fm in fmaps)

    def test_lsgan_losses(self, rng):
        from latent_diffusion_speech_tpu.models.vaegan.losses import (
            discriminator_loss,
            feature_loss,
            generator_loss,
            kl_loss,
            rss_loss,
        )

        real = [jnp.ones((2, 5))]
        fake = [jnp.zeros((2, 5))]
        d, _ = discriminator_loss(real, fake)
        assert float(d) == 0.0  # perfect discriminator
        g, _ = generator_loss(fake)
        assert float(g) == 1.0

        fm_r = [[jnp.ones((2, 4, 3))]]
        fm_g = [[jnp.zeros((2, 4, 3))]]
        assert float(feature_loss(fm_r, fm_g)) == 2.0

        m = jnp.zeros((2, 7, 6))
        logs = jnp.zeros_like(m)
        assert float(kl_loss(logs, m)) == 0.0  # prior == posterior

        x = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32) * 0.1)
        assert float(rss_loss(x, x, scales=(256,))) < 1e-5
