"""The full UNet block zoo: torch parity where the reference's 1-D forward is
valid, intent tests where it carries 2-D residue (see blocks.py module doc),
and whole-model parity for the general UNet1DCondition builder."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.models.diffusion import blocks as bl
from latent_diffusion_speech_tpu.models.diffusion.import_torch import block_params_from_torch
from latent_diffusion_speech_tpu.models.diffusion.unet1d_condition import (
    UNet1DCondition,
    UNet1DConditionConfig,
)

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "diffusion"))

B, T, C, E, S, CD = 2, 32, 24, 64, 7, 40


def jx(a):
    return jnp.asarray(a.transpose(0, 2, 1))


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return dict(
        x=rng.standard_normal((B, C, T)).astype(np.float32),
        temb=rng.standard_normal((B, E)).astype(np.float32),
        enc=rng.standard_normal((B, S, CD)).astype(np.float32),
        rng=rng,
    )


def transfer_and_compare(tmod, mmod, targs, margs, pick=lambda r: r, mpick=lambda r: r, atol=5e-5):
    torch = pytest.importorskip("torch")
    tmod = tmod.eval()
    with torch.no_grad():
        ref = pick(tmod(*targs))
    var = mmod.init(jax.random.PRNGKey(0), *margs)
    params = block_params_from_torch(tmod.state_dict(), var["params"])
    mine = mpick(mmod.apply({"params": params}, *margs))
    np.testing.assert_allclose(
        np.asarray(mine).transpose(0, 2, 1), ref.numpy(), atol=atol, rtol=1e-4
    )


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
class TestBlockParityVsReference:
    """Every block whose reference forward is valid on (B, C, T)."""

    def _ref(self):
        torch = pytest.importorskip("torch")
        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        from diffusion.unet1d import unet_1d_blocks as rb

        return torch, rb

    def test_down_block(self, data):
        torch, rb = self._ref()
        transfer_and_compare(
            rb.DownBlock2D(in_channels=C, out_channels=C, temb_channels=E, num_layers=2, resnet_groups=8),
            bl.DownBlock1D(C, E, num_layers=2, resnet_groups=8),
            (torch.from_numpy(data["x"]), torch.from_numpy(data["temb"])),
            (jx(data["x"]), jnp.asarray(data["temb"])),
            pick=lambda r: r[0], mpick=lambda r: r[0],
        )

    def test_cross_attn_down_block_real_cross_attention(self, data):
        torch, rb = self._ref()
        transfer_and_compare(
            rb.CrossAttnDownBlock2D(
                in_channels=C, out_channels=C, temb_channels=E, num_layers=1,
                resnet_groups=8, num_attention_heads=4, cross_attention_dim=CD),
            bl.CrossAttnDownBlock1D(
                C, E, num_layers=1, resnet_groups=8, num_attention_heads=4, cross_attention_dim=CD),
            (torch.from_numpy(data["x"]), torch.from_numpy(data["temb"]), torch.from_numpy(data["enc"])),
            (jx(data["x"]), jnp.asarray(data["temb"]), jnp.asarray(data["enc"])),
            pick=lambda r: r[0], mpick=lambda r: r[0],
        )

    def test_up_block(self, data):
        torch, rb = self._ref()
        rng = data["rng"]
        h = rng.standard_normal((B, C, T)).astype(np.float32)
        sk1 = rng.standard_normal((B, C, T)).astype(np.float32)
        sk2 = rng.standard_normal((B, C, T)).astype(np.float32)
        transfer_and_compare(
            rb.UpBlock2D(in_channels=C, prev_output_channel=C, out_channels=C,
                         temb_channels=E, num_layers=2, resnet_groups=8),
            bl.UpBlock1D(C, E, num_layers=2, resnet_groups=8),
            (torch.from_numpy(h), (torch.from_numpy(sk2), torch.from_numpy(sk1)), torch.from_numpy(data["temb"])),
            (jx(h), (jx(sk2), jx(sk1)), jnp.asarray(data["temb"])),
        )

    def test_simple_cross_attn_added_kv(self, data):
        torch, rb = self._ref()
        transfer_and_compare(
            rb.SimpleCrossAttnDownBlock2D(
                in_channels=C, out_channels=C, temb_channels=E, num_layers=1, resnet_groups=8,
                attention_head_dim=6, cross_attention_dim=CD, add_downsample=False),
            bl.SimpleCrossAttnDownBlock1D(
                C, E, num_layers=1, resnet_groups=8, attention_head_dim=6,
                cross_attention_dim=CD, add_downsample=False),
            (torch.from_numpy(data["x"]), torch.from_numpy(data["temb"]), torch.from_numpy(data["enc"])),
            (jx(data["x"]), jnp.asarray(data["temb"]), jnp.asarray(data["enc"])),
            pick=lambda r: r[0], mpick=lambda r: r[0],
        )

    def test_resnet_upsample_block(self, data):
        torch, rb = self._ref()
        rng = data["rng"]
        h = rng.standard_normal((B, C, T)).astype(np.float32)
        sk = rng.standard_normal((B, C, T)).astype(np.float32)
        transfer_and_compare(
            rb.ResnetUpsampleBlock2D(in_channels=C, prev_output_channel=C, out_channels=C,
                                     temb_channels=E, num_layers=1, resnet_groups=8, add_upsample=True),
            bl.ResnetUpsampleBlock1D(C, E, num_layers=1, resnet_groups=8, add_upsample=True),
            (torch.from_numpy(h), (torch.from_numpy(sk),), torch.from_numpy(data["temb"])),
            (jx(h), (jx(sk),), jnp.asarray(data["temb"])),
        )

    def test_encoder_decoder_blocks(self, data):
        torch, rb = self._ref()
        transfer_and_compare(
            rb.DownEncoderBlock2D(in_channels=C, out_channels=C, num_layers=2, resnet_groups=8),
            bl.DownEncoderBlock1D(C, num_layers=2, resnet_groups=8),
            (torch.from_numpy(data["x"]),), (jx(data["x"]),), mpick=lambda r: r[0],
        )
        transfer_and_compare(
            rb.UpDecoderBlock2D(in_channels=C, out_channels=C, num_layers=2, resnet_groups=8),
            bl.UpDecoderBlock1D(C, num_layers=2, resnet_groups=8),
            (torch.from_numpy(data["x"]),), (jx(data["x"]),),
        )

    def test_mid_blocks(self, data):
        torch, rb = self._ref()
        transfer_and_compare(
            rb.UNetMidBlock2DCrossAttn(in_channels=C, temb_channels=E, resnet_groups=8,
                                       num_attention_heads=4, cross_attention_dim=CD),
            bl.MidBlock1DCrossAttn(C, E, resnet_groups=8, num_attention_heads=4, cross_attention_dim=CD),
            (torch.from_numpy(data["x"]), torch.from_numpy(data["temb"]), torch.from_numpy(data["enc"])),
            (jx(data["x"]), jnp.asarray(data["temb"]), jnp.asarray(data["enc"])),
        )
        transfer_and_compare(
            rb.UNetMidBlock2DSimpleCrossAttn(in_channels=C, temb_channels=E, resnet_groups=8,
                                             attention_head_dim=6, cross_attention_dim=CD),
            bl.MidBlock1DSimpleCrossAttn(C, E, resnet_groups=8, attention_head_dim=6, cross_attention_dim=CD),
            (torch.from_numpy(data["x"]), torch.from_numpy(data["temb"]), torch.from_numpy(data["enc"])),
            (jx(data["x"]), jnp.asarray(data["temb"]), jnp.asarray(data["enc"])),
        )

    def test_reference_resnet_downsampler_is_2d_residue(self, data):
        """Documents WHY the resnet-downsampler path is intent-implemented:
        the reference's ResnetBlock2D(down=True) AvgPool2d cannot process a
        (B, C, T) tensor (resnet.py:585)."""
        torch, rb = self._ref()
        tb = rb.SimpleCrossAttnDownBlock2D(
            in_channels=C, out_channels=C, temb_channels=E, num_layers=1, resnet_groups=8,
            attention_head_dim=6, cross_attention_dim=CD, add_downsample=True).eval()
        with pytest.raises(RuntimeError):
            with torch.no_grad():
                tb(torch.from_numpy(data["x"]), torch.from_numpy(data["temb"]),
                   torch.from_numpy(data["enc"]))


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
class TestGeneralModelParity:
    """UNet1DCondition vs the full reference UNet1DConditionModel, loaded
    through the one generic path-translating converter."""

    BOC = (16, 24)
    KW = dict(in_channels=6, out_channels=6, norm_num_groups=8,
              cross_attention_dim=20, attention_head_dim=4, layers_per_block=1,
              down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
              up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"))

    @pytest.fixture(scope="class")
    def pair(self):
        torch = pytest.importorskip("torch")
        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        from diffusion.unet1d.unet_1d_condition import UNet1DConditionModel

        tm = UNet1DConditionModel(block_out_channels=self.BOC, **self.KW).eval()
        cfg = UNet1DConditionConfig(block_out_channels=self.BOC, **self.KW)
        m = UNet1DCondition(cfg)
        rng = np.random.default_rng(1)
        x = rng.standard_normal((B, 6, 16)).astype(np.float32)
        t = np.array([5, 900], np.int64)
        enc = rng.standard_normal((B, S, 20)).astype(np.float32)
        var = m.init(jax.random.PRNGKey(0), jx(x), jnp.asarray(t), jnp.asarray(enc))
        params = block_params_from_torch(tm.state_dict(), var["params"])
        return tm, m, params, x, t, enc, rng

    def test_forward_matches(self, pair):
        torch = pytest.importorskip("torch")
        tm, m, params, x, t, enc, _ = pair
        with torch.no_grad():
            ref = tm(torch.from_numpy(x), torch.from_numpy(t),
                     encoder_hidden_states=torch.from_numpy(enc)).sample.numpy()
        mine = m.apply({"params": params}, jx(x), jnp.asarray(t), jnp.asarray(enc))
        np.testing.assert_allclose(np.asarray(mine).transpose(0, 2, 1), ref, atol=5e-5, rtol=1e-4)

    def test_encoder_attention_mask_matches(self, pair):
        torch = pytest.importorskip("torch")
        tm, m, params, x, t, enc, rng = pair
        mask = (rng.random((B, S)) > 0.3).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x), torch.from_numpy(t),
                     encoder_hidden_states=torch.from_numpy(enc),
                     encoder_attention_mask=torch.from_numpy(mask)).sample.numpy()
        mine = m.apply({"params": params}, jx(x), jnp.asarray(t), jnp.asarray(enc),
                       encoder_attention_mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(mine).transpose(0, 2, 1), ref, atol=5e-5, rtol=1e-4)

    def test_controlnet_residual_hooks_match(self, pair):
        torch = pytest.importorskip("torch")
        tm, m, params, x, t, enc, rng = pair
        # residuals mirror (conv_in, *down skips): channel/length layout per block
        shapes = [(B, 16, 16), (B, 16, 16), (B, 16, 8), (B, 24, 8)]
        res = [rng.standard_normal(s).astype(np.float32) * 0.1 for s in shapes]
        mid = rng.standard_normal((B, 24, 8)).astype(np.float32) * 0.1
        with torch.no_grad():
            ref = tm(torch.from_numpy(x), torch.from_numpy(t),
                     encoder_hidden_states=torch.from_numpy(enc),
                     down_block_additional_residuals=[torch.from_numpy(r) for r in res],
                     mid_block_additional_residual=torch.from_numpy(mid)).sample.numpy()
        mine = m.apply({"params": params}, jx(x), jnp.asarray(t), jnp.asarray(enc),
                       down_block_additional_residuals=tuple(jx(r) for r in res),
                       mid_block_additional_residual=jx(mid))
        np.testing.assert_allclose(np.asarray(mine).transpose(0, 2, 1), ref, atol=5e-5, rtol=1e-4)

    def test_effective_tts_config_matches(self):
        torch = pytest.importorskip("torch")
        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        from diffusion.unet1d.unet_1d_condition import UNet1DConditionModel

        kw = dict(in_channels=28, out_channels=12, block_out_channels=self.BOC,
                  norm_num_groups=8, cross_attention_dim=self.BOC, attention_head_dim=4,
                  only_cross_attention=True, layers_per_block=1,
                  resnet_time_scale_shift="scale_shift",
                  down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
                  up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"))
        tm = UNet1DConditionModel(**kw).eval()
        m = UNet1DCondition(UNet1DConditionConfig(**{**kw, "cross_attention_dim": tuple(self.BOC)}))
        rng = np.random.default_rng(2)
        x = rng.standard_normal((B, 28, 16)).astype(np.float32)
        t = np.array([5, 900], np.int64)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x), torch.from_numpy(t)).sample.numpy()
        var = m.init(jax.random.PRNGKey(0), jx(x), jnp.asarray(t))
        params = block_params_from_torch(tm.state_dict(), var["params"])
        mine = m.apply({"params": params}, jx(x), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(mine).transpose(0, 2, 1), ref, atol=5e-5, rtol=1e-4)


class TestResamplers:
    def test_avg_down2_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x = rng.standard_normal((B, C, T)).astype(np.float32)
        ref = torch.nn.functional.avg_pool1d(torch.from_numpy(x), 2, 2).numpy()
        mine = bl.avg_down2(jx(x))
        np.testing.assert_allclose(np.asarray(mine).transpose(0, 2, 1), ref, atol=1e-6)

    def test_fir_preserves_constants(self):
        x = jnp.ones((1, 16, 3))
        up = bl.fir_up2(x)
        assert up.shape == (1, 32, 3)
        np.testing.assert_allclose(np.asarray(up)[0, 4:-4], 1.0, atol=1e-6)
        dn = bl.fir_down2(x)
        assert dn.shape == (1, 8, 3)
        np.testing.assert_allclose(np.asarray(dn)[0, 1:-1], 1.0, atol=1e-6)

    def test_k_filters_preserve_constants(self):
        x = jnp.ones((1, 16, 3))
        up = bl.k_up2(x)
        assert up.shape == (1, 32, 3)
        np.testing.assert_allclose(np.asarray(up)[0, 4:-4], 1.0, atol=1e-6)
        dn = bl.k_down2(x)
        assert dn.shape == (1, 8, 3)
        np.testing.assert_allclose(np.asarray(dn), 1.0, atol=1e-6)

    def test_upfirdn1d_matches_naive(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 20, 2)).astype(np.float32)
        k = [1.0, 2.0, 1.0]
        out = np.asarray(bl.upfirdn1d(jnp.asarray(x), k, up=2, down=1, pad=(2, 2)))
        # naive: zero-stuff, pad, convolve (flipped kernel), no subsample
        up = np.zeros((1, 40, 2), np.float32)
        up[:, ::2] = x
        padded = np.pad(up, ((0, 0), (2, 2), (0, 0)))
        naive = sum(k[::-1][i] * padded[:, i : i + padded.shape[1] - 2] for i in range(3))
        np.testing.assert_allclose(out, naive, atol=1e-6)


class TestFactoriesAndIntent:
    """Factory dispatch + intent smokes for the 2-D-residue block types."""

    def test_all_factory_names_construct(self):
        for t in bl.DOWN_BLOCK_TYPES:
            blk = bl.get_down_block(
                t, num_layers=2, in_channels=32, out_channels=32, temb_channels=E,
                add_downsample=True, resnet_eps=1e-5,
                resnet_act_fn="gelu" if t.startswith("K") else "silu",
                resnet_groups=8, cross_attention_dim=CD, num_attention_heads=4,
                attention_head_dim=8)
            assert blk is not None
        for t in bl.UP_BLOCK_TYPES:
            blk = bl.get_up_block(
                t, num_layers=2, in_channels=32, out_channels=32, prev_output_channel=32,
                temb_channels=E, add_upsample=True, resnet_eps=1e-5,
                resnet_act_fn="gelu" if t.startswith("K") else "silu",
                resnet_groups=8, cross_attention_dim=CD, num_attention_heads=4,
                attention_head_dim=8)
            assert blk is not None
        with pytest.raises(ValueError):
            bl.get_down_block("NoSuchBlock2D", 1, 8, 8, E, True, 1e-5, "silu")
        with pytest.raises(ValueError):
            bl.get_up_block("NoSuchBlock2D", 1, 8, 8, 8, E, True, 1e-5, "silu")

    def _smoke(self, cfg, enc_dim=None, class_labels=None, added=None, atol_shape=True):
        rng = np.random.default_rng(3)
        m = UNet1DCondition(cfg)
        x = jnp.asarray(rng.standard_normal((2, 16, cfg.in_channels)), jnp.float32)
        t = jnp.asarray([3, 7])
        enc = jnp.asarray(rng.standard_normal((2, 5, enc_dim)), jnp.float32) if enc_dim else None
        kw = {}
        if class_labels is not None:
            kw["class_labels"] = class_labels
        if added is not None:
            kw["added_cond_kwargs"] = added
        var = m.init(jax.random.PRNGKey(0), x, t, enc, **kw)

        def loss(p):
            return jnp.sum(m.apply({"params": p}, x, t, enc, **kw) ** 2)

        v, g = jax.value_and_grad(loss)(var["params"])
        gnorm = jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b ** 2), g, 0.0) ** 0.5
        assert np.isfinite(float(v)) and np.isfinite(float(gnorm))
        out = m.apply({"params": var["params"]}, x, t, enc, **kw)
        assert out.shape == (2, 16, cfg.out_channels)

    def test_k_unet(self):
        self._smoke(UNet1DConditionConfig(
            in_channels=8, out_channels=8, block_out_channels=(32, 64), norm_num_groups=8,
            down_block_types=("KDownBlock2D", "KCrossAttnDownBlock2D"),
            up_block_types=("KCrossAttnUpBlock2D", "KUpBlock2D"),
            mid_block_type=None, layers_per_block=2, cross_attention_dim=20,
            attention_head_dim=8, resnet_time_scale_shift="ada_group"), enc_dim=20)

    def test_skip_pyramid(self):
        self._smoke(UNet1DConditionConfig(
            in_channels=8, out_channels=8, block_out_channels=(32, 64), norm_num_groups=8,
            down_block_types=("AttnSkipDownBlock2D", "SkipDownBlock2D"),
            up_block_types=("SkipUpBlock2D", "AttnSkipUpBlock2D"),
            mid_block_type="UNetMidBlock2D", layers_per_block=1, attention_head_dim=8))

    def test_added_kv_with_class_timestep(self):
        self._smoke(UNet1DConditionConfig(
            in_channels=8, out_channels=8, block_out_channels=(32, 64), norm_num_groups=8,
            down_block_types=("SimpleCrossAttnDownBlock2D", "ResnetDownsampleBlock2D"),
            up_block_types=("ResnetUpsampleBlock2D", "SimpleCrossAttnUpBlock2D"),
            mid_block_type="UNetMidBlock2DSimpleCrossAttn", layers_per_block=1,
            cross_attention_dim=20, attention_head_dim=8, class_embed_type="timestep"),
            enc_dim=20, class_labels=jnp.asarray([1, 2]))

    def test_fourier_time_and_sdxl_text_time(self):
        rng = np.random.default_rng(4)
        self._smoke(UNet1DConditionConfig(
            in_channels=8, out_channels=8, block_out_channels=(32, 64), norm_num_groups=8,
            down_block_types=("DownBlock2D", "AttnDownBlock2D"),
            up_block_types=("AttnUpBlock2D", "UpBlock2D"),
            mid_block_type="UNetMidBlock2DCrossAttn", layers_per_block=1,
            cross_attention_dim=20, attention_head_dim=8,
            time_embedding_type="fourier", addition_embed_type="text_time",
            addition_time_embed_dim=8, projection_class_embeddings_input_dim=34),
            enc_dim=20,
            added={"text_embeds": jnp.asarray(rng.standard_normal((2, 10)), jnp.float32),
                   "time_ids": jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)})

    def test_dual_transformer(self):
        # the dual transformer routes token slices (77, 257) to its two
        # sub-transformers, so the context must cover both slices
        rng = np.random.default_rng(5)
        cfg = UNet1DConditionConfig(
            in_channels=8, out_channels=8, block_out_channels=(32, 64), norm_num_groups=8,
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1, cross_attention_dim=20, attention_head_dim=8,
            dual_cross_attention=True)
        m = UNet1DCondition(cfg)
        x = jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.float32)
        t = jnp.asarray([3, 7])
        enc = jnp.asarray(rng.standard_normal((2, 334, 20)), jnp.float32)
        var = m.init(jax.random.PRNGKey(0), x, t, enc)
        out = m.apply({"params": var["params"]}, x, t, enc)
        assert out.shape == (2, 16, 8) and bool(jnp.isfinite(out).all())

    def test_kandinsky_surface_raises(self):
        with pytest.raises(NotImplementedError):
            UNet1DConditionConfig(encoder_hid_dim=8, encoder_hid_dim_type="image_proj")
        with pytest.raises(NotImplementedError):
            UNet1DConditionConfig(addition_embed_type="text_image")


class TestFusedQKV:
    def test_fused_matches_split_on_flagship_unet(self):
        """UNet1DConfig.qkv='fused' computes the same function on the same
        param tree (one (C,3C) matmul vs three (C,C) ones)."""
        from latent_diffusion_speech_tpu.models.diffusion import UNet1D, UNet1DConfig

        rng = np.random.default_rng(6)
        kw = dict(in_channels=28, out_channels=12, block_out_channels=(16, 24, 32, 32),
                  layers_per_block=2, n_heads=4, norm_num_groups=8)
        split = UNet1D(UNet1DConfig(**kw, qkv="split"))
        fused = UNet1D(UNet1DConfig(**kw, qkv="fused"))
        x = jnp.asarray(rng.standard_normal((2, 16, 28)), jnp.float32)
        t = jnp.asarray([5, 900])
        params = split.init(jax.random.PRNGKey(0), x, t)["params"]
        a = split.apply({"params": params}, x, t)
        b = fused.apply({"params": params}, x, t)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5)


class TestGeneralDenoiserInUnit2Mel:
    def test_general_denoiser_trains_and_samples(self):
        """Unit2MelConfig(denoiser='general') swaps the block-graph builder in
        behind the same system facade: loss differentiable, sampler runs."""
        from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig, Unit2MelSystem

        cfg = Unit2MelConfig(
            input_channel=16, n_spk=4, out_dims=12, n_layers=1,
            block_out_channels=(16, 24), n_heads=4, n_hidden=16,
            timesteps=20, k_step=20, denoiser="general",
            down_block_types=("SimpleCrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "SimpleCrossAttnUpBlock2D"),
            mid_block_type="UNetMidBlock2D",
        )
        sys_ = Unit2MelSystem(cfg)
        rng = np.random.default_rng(7)
        units = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
        gt = jnp.asarray(rng.standard_normal((2, 8, 12)), jnp.float32)
        spk = jnp.ones((2, 8), jnp.int32)

        loss, grads = jax.value_and_grad(
            lambda p: sys_.loss(p, units, gt, jax.random.PRNGKey(0), spk_id=spk)
        )(sys_.params)
        gnorm = jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b ** 2), grads, 0.0) ** 0.5
        assert np.isfinite(float(loss)) and np.isfinite(float(gnorm))

        out = sys_.infer(units, jax.random.PRNGKey(1), spk_id=spk, method="ddim", infer_speedup=10)
        assert out.shape == (2, 8, 12) and bool(jnp.isfinite(out).all())

    def test_general_denoiser_rejects_flagship_only_knobs(self):
        from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig, Unit2MelSystem

        cfg = Unit2MelConfig(denoiser="general")
        with pytest.raises(ValueError):
            Unit2MelSystem(cfg, weight_quant="int8")
