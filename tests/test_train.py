"""Training runtime tests: datasets over a synthetic npy pipeline layout,
jit train steps on the 8-device mesh, loss decrease, checkpoint resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.config import Config
from latent_diffusion_speech_tpu.data import (
    DataLoader,
    DiffusionDataset,
    TextDataset,
    collate_text_batch,
)
from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig
from latent_diffusion_speech_tpu.models.lm import RoformerConfig
from latent_diffusion_speech_tpu.models.lm.roformer import StackConfig
from latent_diffusion_speech_tpu.train import (
    DiffusionTrainer,
    LMTrainer,
    latest_checkpoint_step,
    load_checkpoint,
    save_checkpoint,
    warmup_step_decay,
)

UNIT_DIM = 8
MEL_DIM = 4


@pytest.fixture
def pipeline_dir(tmp_path, rng):
    """Synthetic data/train layout: 2 speakers x 3 files."""
    root = tmp_path / "train"
    for spk in ("1", "2"):
        for n in range(3):
            name = f"{spk}/{n}"
            (root / "audio" / spk).mkdir(parents=True, exist_ok=True)
            (root / "audio" / spk / f"{n}.wav").write_bytes(b"")
            T = 100 + n * 10
            for kind, arr in [
                ("mel", rng.standard_normal((T, 2 * MEL_DIM)).astype(np.float32)),
                ("aug_mel", rng.standard_normal((T, 2 * MEL_DIM)).astype(np.float32)),
                ("units", rng.standard_normal((T // 2, UNIT_DIM)).astype(np.float32)),
            ]:
                p = root / kind / spk
                p.mkdir(parents=True, exist_ok=True)
                np.save(p / f"{n}.wav.npy", arr)
            # LM side
            phones = rng.integers(1, 50, 12)
            utt = np.array(
                (phones, rng.integers(0, 6, 12), np.zeros(12, np.int64), np.ones(12, np.int64)),
                dtype=object,
            )
            for kind, arr in [("utt", utt), ("semantic_token", rng.integers(0, 64, 30))]:
                p = root / kind / spk
                p.mkdir(parents=True, exist_ok=True)
                np.save(p / f"{n}.wav.npy", arr, allow_pickle=True)
    return root


TINY_MODEL = Unit2MelConfig(
    input_channel=UNIT_DIM, n_spk=4, out_dims=MEL_DIM, n_hidden=8,
    block_out_channels=(8, 8), n_heads=2, timesteps=20, k_step=20,
)

TINY_LM = RoformerConfig(
    # dropout 0 so the fixed-batch objective is deterministic for the descent check
    encoder=StackConfig(hidden_size=16, num_attention_heads=2, num_hidden_layers=1,
                        intermediate_size=16, hidden_dropout_prob=0.0),
    decoder=StackConfig(hidden_size=16, num_attention_heads=2, num_hidden_layers=1,
                        intermediate_size=16, hidden_dropout_prob=0.0),
    semantic_kmeans_num=64,
    n_spk=4,
)


def _tiny_config(tmp_path) -> Config:
    cfg = Config()
    cfg.common.n_spk = 4
    cfg.diffusion.train.batch_size = 4
    cfg.diffusion.train.expdir = str(tmp_path / "exp_diff")
    cfg.diffusion.train.warm_up_steps = 2
    cfg.text2semantic.train.expdir = str(tmp_path / "exp_lm")
    cfg.text2semantic.train.warm_up_steps = 2
    cfg.data.block_size = 2
    cfg.data.sampling_rate = 100  # 1s crop => 50 frames
    return cfg


class TestDiffusionDataset:
    def test_item_shapes_and_crop(self, pipeline_dir):
        ds = DiffusionDataset(pipeline_dir, waveform_sec=1.0, hop_size=2, sample_rate=100, n_spk=4)
        assert len(ds) == 6
        item = ds[0]
        assert item["mel"].shape == (50, MEL_DIM)
        assert item["units"].shape == (50, UNIT_DIM)
        assert item["spk_id"].shape == (1,)
        assert 1 <= int(item["spk_id"]) <= 2

    def test_only_mean_is_deterministic(self, pipeline_dir):
        ds = DiffusionDataset(pipeline_dir, waveform_sec=1.0, hop_size=2, sample_rate=100,
                              n_spk=4, only_mean=True, whole_audio=True)
        a, b = ds[0]["mel"], ds[0]["mel"]
        np.testing.assert_array_equal(a, b)

    def test_rank_sharding_partitions(self, pipeline_dir):
        d0 = DiffusionDataset(pipeline_dir, hop_size=2, sample_rate=100, process_index=0, process_count=2)
        d1 = DiffusionDataset(pipeline_dir, hop_size=2, sample_rate=100, process_index=1, process_count=2)
        assert set(d0.paths).isdisjoint(d1.paths)
        assert len(d0.paths) + len(d1.paths) == 6

    def test_clamp(self, pipeline_dir):
        ds = DiffusionDataset(pipeline_dir, waveform_sec=1.0, hop_size=2, sample_rate=100, clamp=0.1)
        assert float(np.abs(ds[0]["mel"]).max()) <= 0.1 + 1e-6


class TestTextDataset:
    def test_item_and_collate(self, pipeline_dir):
        ds = TextDataset(pipeline_dir, semantic_bos=64, semantic_eos=65, n_spk=4)
        assert len(ds) == 6
        item = ds[0]
        assert item["semantic"][0] == 64 and item["semantic"][-1] == 65
        batch = collate_text_batch([ds[0], ds[1]], phone_pad=99, semantic_pad=66, pad_multiple=8)
        assert batch["phone"].shape[1] % 8 == 0
        assert batch["labels"].dtype == np.int32
        # padding positions carry -100 labels and 0 mask
        L = batch["semantic"].shape[1]
        assert batch["labels"][0, L - 1] == -100 or batch["attention_mask"][0, L - 1] == 1


class TestLoader:
    def test_prefetch_loader_yields_batches(self, pipeline_dir):
        ds = DiffusionDataset(pipeline_dir, waveform_sec=1.0, hop_size=2, sample_rate=100, n_spk=4)
        loader = DataLoader(ds, batch_size=2, shuffle=True, seed=0)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0]["mel"].shape == (2, 50, MEL_DIM)


class TestSchedule:
    def test_warmup_then_decay(self):
        sched = warmup_step_decay(lr=1.0, start_lr=0.1, warm_up_steps=10, decay_step=100, gamma=0.5)
        assert float(sched(0)) == pytest.approx(0.1)
        assert float(sched(5)) == pytest.approx(0.55)
        assert float(sched(10)) == pytest.approx(1.0)
        assert float(sched(150)) == pytest.approx(0.5)
        assert float(sched(250)) == pytest.approx(0.25)


class TestCheckpoint:
    def test_save_load_scan_resume(self, tmp_path):
        params = {"w": jnp.ones((3, 3)), "b": jnp.zeros((3,))}
        for step in (100, 200, 300):
            save_checkpoint(tmp_path, step, params, keep=2)
        assert latest_checkpoint_step(tmp_path) == 300
        # retention enforced
        assert not (tmp_path / "model_100.ckpt").exists()
        step, loaded, opt = load_checkpoint(tmp_path, params)
        assert step == 300
        np.testing.assert_array_equal(np.asarray(loaded["w"]), np.ones((3, 3)))
        assert opt is None


class TestDiffusionTrainer:
    def test_loss_decreases_and_resumes(self, pipeline_dir, tmp_path):
        cfg = _tiny_config(tmp_path)
        trainer = DiffusionTrainer(cfg, model_cfg=TINY_MODEL)
        ds = DiffusionDataset(pipeline_dir, waveform_sec=1.0, hop_size=2, sample_rate=100, n_spk=4)
        batch = trainer.device_put_batch(ds.batch(range(4)))

        # fixed rng -> fixed (t, noise): a deterministic objective that must
        # decrease under gradient steps
        sub = jax.random.PRNGKey(7)
        losses = [float(trainer.train_step(batch, sub)["loss"]) for _ in range(8)]
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

        trainer.save()
        t2 = DiffusionTrainer(cfg, model_cfg=TINY_MODEL)
        assert t2.resume()
        assert t2.step == trainer.step
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(t2.system.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(trainer.system.params)[0]),
        )

    def test_ema_tracks_saves_and_resumes(self, pipeline_dir, tmp_path):
        """ema_decay > 0: EMA tree tracks training, is used for sampler eval,
        persists as a model_<step>.ema.ckpt sidecar, and resumes."""
        cfg = _tiny_config(tmp_path)
        cfg.diffusion.train.ema_decay = 0.9
        trainer = DiffusionTrainer(cfg, model_cfg=TINY_MODEL)
        ds = DiffusionDataset(pipeline_dir, waveform_sec=1.0, hop_size=2, sample_rate=100, n_spk=4)
        batch = trainer.device_put_batch(ds.batch(range(4)))
        for _ in range(4):
            trainer.train_step(batch, jax.random.PRNGKey(3))
        diff = sum(
            float(np.abs(np.asarray(a) - np.asarray(b)).sum())
            for a, b in zip(
                jax.tree_util.tree_leaves(trainer.system.params),
                jax.tree_util.tree_leaves(trainer.ema_params),
            )
        )
        assert diff > 0  # EMA is a lagging copy, not an alias
        assert trainer.eval_params is trainer.ema_params

        trainer.save()
        step = trainer.step
        assert (tmp_path / "exp_diff" / f"model_{step}.ema.ckpt").exists()
        t2 = DiffusionTrainer(cfg, model_cfg=TINY_MODEL)
        assert t2.resume()
        for a, b in zip(
            jax.tree_util.tree_leaves(t2.ema_params),
            jax.tree_util.tree_leaves(trainer.ema_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_ema_sidecar_retention(self, tmp_path):
        params = {"w": jnp.ones((2,))}
        for step in (1, 2, 3):
            save_checkpoint(tmp_path, step, params, keep=2, extra={"ema": params})
        assert not (tmp_path / "model_1.ckpt").exists()
        assert not (tmp_path / "model_1.ema.ckpt").exists()
        assert (tmp_path / "model_3.ema.ckpt").exists()

    def test_batch_sharded_over_8_devices(self, pipeline_dir, tmp_path):
        cfg = _tiny_config(tmp_path)
        trainer = DiffusionTrainer(cfg, model_cfg=TINY_MODEL)
        ds = DiffusionDataset(pipeline_dir, waveform_sec=1.0, hop_size=2, sample_rate=100, n_spk=4)
        batch = trainer.device_put_batch(ds.batch(list(range(6)) + [0, 1]))  # B=8
        assert batch["mel"].addressable_shards[0].data.shape[0] == 1  # 8/8
        m = trainer.train_step(batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))


class TestLMTrainer:
    def test_lm_step_eval_and_nan_guard(self, pipeline_dir, tmp_path):
        cfg = _tiny_config(tmp_path)
        trainer = LMTrainer(cfg, lm_cfg=TINY_LM)
        ds = TextDataset(pipeline_dir, semantic_bos=TINY_LM.semantic_bos,
                         semantic_eos=TINY_LM.semantic_eos, n_spk=4)
        items = [ds[i] for i in range(4)]
        batch = collate_text_batch(items, phone_pad=TINY_LM.phone_pad,
                                   semantic_pad=TINY_LM.semantic_pad, pad_multiple=8)
        b = trainer.device_put_batch(batch)
        losses = [float(trainer.train_step(b)["loss"]) for _ in range(6)]
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

        ev = trainer.evaluate(b)
        assert 0.0 <= ev["val/top5_acc"] <= 1.0

    def test_validate_audio_through_frozen_diffusion(self, pipeline_dir, tmp_path):
        """Reference roformer/train.py:33-53: LM validation synthesizes audio
        with the current LM weights through the frozen diffusion stack."""
        from latent_diffusion_speech_tpu.infer import TTSPipeline
        from latent_diffusion_speech_tpu.models.diffusion import Unit2MelSystem
        from latent_diffusion_speech_tpu.models.vaegan import VAEGANConfig
        from latent_diffusion_speech_tpu.models.vaegan.codec import HifiVAEGAN
        from latent_diffusion_speech_tpu.models.vocoder import Vocoder

        cfg = _tiny_config(tmp_path)
        trainer = LMTrainer(cfg, lm_cfg=TINY_LM)
        ds = TextDataset(pipeline_dir, semantic_bos=TINY_LM.semantic_bos,
                         semantic_eos=TINY_LM.semantic_eos, n_spk=4)
        batch = collate_text_batch([ds[0], ds[1]], phone_pad=TINY_LM.phone_pad,
                                   semantic_pad=TINY_LM.semantic_pad, pad_multiple=8)

        diffusion = Unit2MelSystem(TINY_MODEL)
        vocoder = Vocoder("hifi-vaegan")
        vocoder.vocoder = HifiVAEGAN.random_init(VAEGANConfig(
            sampling_rate=800, inter_channels=MEL_DIM, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),), upsample_rates=(4, 2),
            upsample_initial_channel=16, upsample_kernel_sizes=(8, 4),
        ))
        codebook = np.random.default_rng(0).standard_normal(
            (TINY_LM.semantic_kmeans_num, UNIT_DIM)).astype(np.float32)
        pipe = TTSPipeline(diffusion, vocoder, lm=trainer.system, codebook=codebook)

        logged = []

        class Cap:
            def log_audio(self, step, tag, audio, sr):
                logged.append((step, tag, np.asarray(audio), sr))

        trainer.validate_audio(pipe, batch, Cap(), n_items=1, infer_speedup=10)
        assert len(logged) == 1
        _, tag, wav, sr = logged[0]
        assert tag == "val/audio_0" and sr == 800
        assert wav.ndim == 1 and np.isfinite(wav).all() and wav.size > 0


class TestVQJointTraining:
    def test_vq_trains_with_diffusion(self, pipeline_dir, tmp_path):
        from latent_diffusion_speech_tpu.quantize import VectorQuantize

        cfg = _tiny_config(tmp_path)
        vq = VectorQuantize(dim=UNIT_DIM, codebook_size=16, codebook_dim=4)
        trainer = DiffusionTrainer(cfg, model_cfg=TINY_MODEL, quantizer=vq)
        ds = DiffusionDataset(pipeline_dir, waveform_sec=1.0, hop_size=2, sample_rate=100, n_spk=4)
        batch = trainer.device_put_batch(ds.batch(range(4)))
        m = trainer.train_step(batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))
        assert float(vq.utilization(trainer.vq_state)) > 0
        trainer.save()
        import glob
        assert glob.glob(str(tmp_path / "exp_diff" / "*_semantic_codebook.ckpt"))
