"""The real-weights readiness kit (VERDICT r2 item 5).

Every torch importer is parity-tested against synthetic checkpoints because
the real blobs are absent from this environment; these tests pin the two
pieces that make the day-one smoke with REAL weights trivial:

* `cli/verify_import.py` — one command that detects a checkpoint's kind,
  infers its geometry from the state dict, imports, forward-smokes, and
  compares/writes goldens; driven here end-to-end over every artifact kind
  using reference-format synthetic checkpoints.
* importer fuzz — randomized weight-norm magnitudes (real checkpoints have
  g != ||v||, unlike freshly-initialized torch modules) and non-default
  geometries, checked for torch parity.
"""

import argparse
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.test_reference_migration import reference_artifacts  # noqa: F401 (fixture)

from latent_diffusion_speech_tpu.cli.verify_import import detect_kind, main as cli_main, verify


def _args(path, **over):
    base = dict(path=str(path), kind="auto", heads=0, golden=None,
                save_golden=None, tol=1e-3, json=True)
    base.update(over)
    return argparse.Namespace(**base)


class TestVerifyImportCLI:
    def test_unit2mel(self, reference_artifacts):
        root, _ = reference_artifacts
        report = verify(_args(root / "diffusion" / "model_77.pt"))
        assert report["kind"] == "unit2mel"
        assert report["output_finite"]
        assert report["geometry"]["block_out_channels"] == [16, 24, 32, 32]

    def test_roformer_geometry_inferred(self, reference_artifacts):
        root, _ = reference_artifacts
        report = verify(_args(root / "lm" / "model_55.pt", heads=2))
        assert report["kind"] == "roformer"
        g = report["geometry"]
        assert g["encoder_layers"] == 1 and g["decoder_layers"] == 1
        assert g["hidden"] == 16 and g["semantic_kmeans_num"] == 32 and g["n_spk"] == 4
        assert report["output_finite"]
        assert report["output_shape"][-1] == 32 + 3  # semantic vocab logits

    def test_vaegan_pair_directory(self, reference_artifacts):
        root, _ = reference_artifacts
        report = verify(_args(root / "vaegan"))
        assert report["encoder"]["kind"] == "vaegan-encoder"
        assert report["decoder"]["kind"] == "vaegan-decoder"
        assert report["encoder"]["output_finite"] and report["decoder"]["output_finite"]
        # geometry came from the checkpoint's own h dict, not defaults
        assert report["encoder"]["geometry"]["from_checkpoint_config"]

    def test_codebook(self, reference_artifacts):
        root, _ = reference_artifacts
        report = verify(_args(root / "semantic_codebook.pt"))
        assert report["kind"] == "codebook"
        assert report["geometry"] == {"clusters": 32, "dim": 1280}
        assert report["output_finite"]

    def test_whisper_wrapper_checkpoint(self, tmp_path):
        """A {dims, model_state_dict} checkpoint (the large-v3_encoder.pt
        layout, tools/tools.py:105-117) detects and forward-smokes."""
        from tests.test_whisper_units import TINY, TorchWhisperEncoder

        tmodel = TorchWhisperEncoder(TINY)
        ckpt = tmp_path / "encoder.pt"
        torch.save(
            {"dims": {"n_mels": TINY.n_mels, "n_audio_ctx": TINY.n_audio_ctx,
                      "n_audio_state": TINY.n_audio_state, "n_audio_head": TINY.n_audio_head,
                      "n_audio_layer": TINY.n_audio_layer},
             "model_state_dict": tmodel.state_dict_reference_layout()},
            ckpt,
        )
        report = verify(_args(ckpt))
        assert report["kind"] == "whisper"
        assert report["output_finite"]
        # the whisper importer bulk-transforms the dict (prefix strip), so
        # per-key coverage is reported as not-trackable
        assert report["torch_keys_unused"] is None

    def test_golden_roundtrip_and_mismatch(self, reference_artifacts, tmp_path):
        root, _ = reference_artifacts
        golden = tmp_path / "g.npz"
        verify(_args(root / "lm" / "model_55.pt", heads=2, save_golden=str(golden)))
        ok = verify(_args(root / "lm" / "model_55.pt", heads=2, golden=str(golden)))
        assert ok["golden_match"] is True

        # corrupt the golden -> mismatch reported and non-zero exit
        g = dict(np.load(golden, allow_pickle=True))
        g["output"] = np.asarray(g["output"]) + 1.0
        np.savez(golden, **g)
        bad = verify(_args(root / "lm" / "model_55.pt", heads=2, golden=str(golden)))
        assert bad["golden_match"] is False
        rc = cli_main([str(root / "lm" / "model_55.pt"), "--heads", "2",
                       "--golden", str(golden), "--json"])
        assert rc == 1

    def test_cli_main_exit_zero(self, reference_artifacts, capsys):
        root, _ = reference_artifacts
        rc = cli_main([str(root / "semantic_codebook.pt"), "--json"])
        assert rc == 0
        report = json.loads(capsys.readouterr().out)
        assert report["kind"] == "codebook"

    def test_detect_kind_fingerprints(self):
        assert detect_kind({"cluster_centers_": np.zeros((4, 8))}, "x") == "codebook"
        assert detect_kind({"dims": {}, "model_state_dict": {}}, "x") == "whisper"
        assert (
            detect_kind({"model": {"llama.model.layers.0.self_attn.q_proj.weight": 0}}, "x")
            == "llama"
        )
        with pytest.raises(ValueError, match="--kind"):
            detect_kind({"model": {"mystery.weight": 0}}, "x")


class TestImporterFuzz:
    """Real checkpoints differ from freshly-initialized torch modules in two
    ways the synthetic parity tests didn't cover: trained weight-norm
    magnitudes (g != ||v||) and non-default geometry."""

    def _randomize_weight_norm(self, model, rng):
        with torch.no_grad():
            for name, p in model.named_parameters():
                if name.endswith("weight_g"):
                    scale = torch.from_numpy(
                        rng.uniform(0.2, 3.0, p.shape).astype(np.float32)
                    )
                    p.mul_(scale)
        return model

    @pytest.mark.parametrize("which", ["encoder", "generator"])
    def test_vaegan_randomized_weight_norm(self, rng, which):
        from tests.test_vaegan import TINY, TorchEncoder, TorchGenerator

        from latent_diffusion_speech_tpu.models.vaegan.import_torch import (
            encoder_params_from_torch,
            generator_params_from_torch,
        )
        from latent_diffusion_speech_tpu.models.vaegan.models import Generator, VAEEncoder

        if which == "encoder":
            tmodel = self._randomize_weight_norm(TorchEncoder(TINY).eval(), rng)
            params = encoder_params_from_torch(tmodel.state_dict(), TINY)
            audio = (0.1 * rng.standard_normal((1, TINY.hop_size * 4))).astype(np.float32)
            with torch.no_grad():
                m_t, logs_t = tmodel(torch.from_numpy(audio))
            _, m, logs = VAEEncoder(TINY).apply(
                {"params": jax.tree_util.tree_map(jnp.asarray, params)},
                jnp.asarray(audio), rngs={"latent": jax.random.PRNGKey(0)},
            )
            np.testing.assert_allclose(
                np.asarray(m), m_t.numpy().transpose(0, 2, 1), atol=5e-5, rtol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(logs), logs_t.numpy().transpose(0, 2, 1), atol=5e-5, rtol=1e-4
            )
        else:
            tmodel = self._randomize_weight_norm(TorchGenerator(TINY).eval(), rng)
            params = generator_params_from_torch(tmodel.state_dict(), TINY)
            z = rng.standard_normal((1, 6, TINY.inter_channels)).astype(np.float32)
            with torch.no_grad():
                wav_t = tmodel(torch.from_numpy(z.transpose(0, 2, 1))).numpy()
            wav = Generator(TINY).apply(
                {"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(z)
            )
            np.testing.assert_allclose(
                np.asarray(wav)[:, None, :], wav_t, atol=5e-5, rtol=1e-4
            )

    def test_vaegan_nondefault_geometry(self, rng):
        """Different rates/kernels/dilations/width — the h-dict path.
        (The in-test torch reference implements ResBlock1 only, so the
        resblock type stays '1'; the type-'2' layout is covered by the
        importer's `_resblock` unit mapping.)"""
        import dataclasses

        from tests.test_vaegan import TINY, TorchEncoder

        from latent_diffusion_speech_tpu.models.vaegan.import_torch import (
            encoder_params_from_torch,
        )
        from latent_diffusion_speech_tpu.models.vaegan.models import VAEEncoder

        cfg = dataclasses.replace(
            TINY,
            resblock_kernel_sizes=(3, 5, 7),
            resblock_dilation_sizes=((1, 2, 4), (2, 6, 8), (1, 3, 9)),
            upsample_rates=(4, 2, 2),
            upsample_kernel_sizes=(8, 4, 4),
            upsample_initial_channel=24,
        )
        tmodel = TorchEncoder(cfg).eval()
        params = encoder_params_from_torch(tmodel.state_dict(), cfg)
        audio = (0.1 * rng.standard_normal((1, cfg.hop_size * 4))).astype(np.float32)
        with torch.no_grad():
            m_t, _ = tmodel(torch.from_numpy(audio))
        _, m, _ = VAEEncoder(cfg).apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(audio), rngs={"latent": jax.random.PRNGKey(0)},
        )
        np.testing.assert_allclose(
            np.asarray(m), m_t.numpy().transpose(0, 2, 1), atol=5e-5, rtol=1e-4
        )

    def test_roformer_nondefault_geometry(self, rng):
        from tests.test_lm import _build_hf_roformer

        from latent_diffusion_speech_tpu.models.lm.import_hf import (
            roformer_params_from_torch,
        )
        from latent_diffusion_speech_tpu.models.lm.roformer import (
            Roformer, RoformerConfig, StackConfig,
        )

        cfg = RoformerConfig(
            encoder=StackConfig(hidden_size=24, num_attention_heads=3,
                                num_hidden_layers=3, intermediate_size=40),
            decoder=StackConfig(hidden_size=24, num_attention_heads=2,
                                num_hidden_layers=2, intermediate_size=56),
            semantic_kmeans_num=17, n_spk=6,
        )
        ref = _build_hf_roformer(cfg)
        params = roformer_params_from_torch(ref.state_dict(), cfg)
        B, L, S = 2, 5, 4
        phone = rng.integers(0, 40, (B, L))
        tone = rng.integers(0, 6, (B, L))
        semantic = rng.integers(0, 17, (B, S))
        spk = rng.integers(0, 6, (B, L))
        with torch.no_grad():
            ref_logits = ref(
                torch.from_numpy(phone), torch.from_numpy(tone),
                torch.from_numpy(semantic), torch.from_numpy(spk),
            ).numpy()
        mine = Roformer(cfg).apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)},
            jnp.asarray(phone), jnp.asarray(tone), jnp.asarray(semantic), jnp.asarray(spk),
        )
        np.testing.assert_allclose(np.asarray(mine), ref_logits, atol=3e-4, rtol=1e-3)

    def test_llama_nondefault_geometry(self, rng):
        from transformers import LlamaConfig as HFLlamaConfig
        from transformers import LlamaForCausalLM

        from latent_diffusion_speech_tpu.models.lm.import_hf import llama_params_from_torch
        from latent_diffusion_speech_tpu.models.lm.llama import Llama, LlamaConfig

        cfg = LlamaConfig(hidden_size=48, num_attention_heads=6, num_hidden_layers=3,
                          intermediate_size=80, semantic_kmeans_num=23)
        hf_cfg = HFLlamaConfig(
            hidden_size=48, num_attention_heads=6, num_hidden_layers=3,
            intermediate_size=80, vocab_size=cfg.vocab_size, num_key_value_heads=6,
        )
        ref = LlamaForCausalLM(hf_cfg).eval()
        params = llama_params_from_torch(ref.state_dict(), cfg)
        ids = rng.integers(0, cfg.vocab_size, (2, 7))
        with torch.no_grad():
            ref_logits = ref(torch.from_numpy(ids)).logits.numpy()
        mine = Llama(cfg).apply(
            {"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(ids)
        )
        np.testing.assert_allclose(np.asarray(mine), ref_logits, atol=3e-4, rtol=1e-3)
