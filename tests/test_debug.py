"""Debug/sanitizer switch tests (train/debug.py — SURVEY.md §5, a subsystem
the reference lacks entirely: config-gated NaN debugging, periodic finite-tree
assertions, dump-on-NaN forensics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_speech_tpu.config import Config, DebugConfig
from latent_diffusion_speech_tpu.train.debug import (
    NonFiniteError,
    assert_tree_finite,
    check_step,
    dump_nan_batch,
    install,
    tree_nonfinite_paths,
)


class TestTreeFiniteness:
    def test_finite_tree_passes(self):
        tree = {"a": jnp.ones((3, 3)), "b": {"c": jnp.zeros(5)}}
        assert tree_nonfinite_paths(tree) == []
        assert_tree_finite(tree)  # no raise

    def test_bad_leaf_named(self):
        tree = {"good": jnp.ones(4), "bad": {"w": jnp.array([1.0, np.nan])}}
        paths = tree_nonfinite_paths(tree)
        assert len(paths) == 1 and "bad" in paths[0] and "w" in paths[0]
        with pytest.raises(NonFiniteError) as e:
            assert_tree_finite(tree, name="params")
        assert "params" in str(e.value) and "bad" in str(e.value)
        assert e.value.paths == paths

    def test_inf_detected_and_int_leaves_ignored(self):
        tree = {"ids": jnp.arange(4), "w": jnp.array([jnp.inf])}
        paths = tree_nonfinite_paths(tree)
        assert len(paths) == 1 and "w" in paths[0]


class TestInstall:
    def test_sets_and_restores_debug_nans(self):
        assert not jax.config.jax_debug_nans
        with install(DebugConfig(debug_nans=True)):
            assert jax.config.jax_debug_nans
        assert not jax.config.jax_debug_nans

    def test_noop_when_off_or_none(self):
        with install(None):
            assert not jax.config.jax_debug_nans
        with install(DebugConfig()):
            assert not jax.config.jax_debug_nans

    def test_debug_nans_raises_at_the_op(self):
        with install(DebugConfig(debug_nans=True)):
            with pytest.raises(FloatingPointError):
                jax.jit(lambda x: x / x)(jnp.zeros(2)).block_until_ready()


class TestCheckStep:
    def test_off_cadence_is_noop(self):
        bad = {"w": jnp.array([np.nan])}
        check_step(DebugConfig(check_interval=10), 7, bad, jnp.nan)  # step 7 % 10 != 0
        check_step(None, 10, bad, jnp.nan)
        check_step(DebugConfig(), 10, bad, jnp.nan)  # interval 0 = disabled

    def test_nan_loss_raises_and_dumps(self, tmp_path):
        dcfg = DebugConfig(check_interval=5, dump_on_nan=True)
        batch = {"mel": np.ones((2, 4), np.float32), "spk_id": np.zeros((2, 1), np.int32)}
        with pytest.raises(NonFiniteError, match="step 10"):
            check_step(dcfg, 10, {"w": jnp.ones(2)}, jnp.nan, batch=batch,
                       expdir=str(tmp_path))
        dump = np.load(tmp_path / "nan_dump_10.npz")
        np.testing.assert_array_equal(dump["mel"], batch["mel"])
        assert not np.isfinite(dump["__loss__"])
        assert int(dump["__step__"]) == 10

    def test_finite_step_passes(self, tmp_path):
        dcfg = DebugConfig(check_interval=1, dump_on_nan=True)
        check_step(dcfg, 3, {"w": jnp.ones(2)}, jnp.float32(0.5),
                   batch={"x": np.ones(2)}, expdir=str(tmp_path))
        assert not list(tmp_path.glob("nan_dump_*"))

    def test_dump_roundtrip_skips_none(self, tmp_path):
        path = dump_nan_batch(str(tmp_path), 2, {"a": np.arange(3), "b": None})
        data = np.load(path)
        assert "a" in data and "b" not in data


class TestTrainerIntegration:
    def test_diffusion_trainer_raises_on_poisoned_batch(self, tmp_path):
        """End-to-end: a NaN batch through the real trainer loop trips the
        sanitizer, names the failure, and dumps the batch."""
        from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig
        from latent_diffusion_speech_tpu.train import DiffusionTrainer

        cfg = Config()
        cfg.common.n_spk = 2
        cfg.diffusion.train.batch_size = 2
        cfg.diffusion.train.expdir = str(tmp_path / "exp")
        cfg.diffusion.train.interval_val = 10_000  # no mid-test saves
        cfg.debug = DebugConfig(check_interval=1, dump_on_nan=True)
        model_cfg = Unit2MelConfig(
            input_channel=8, n_spk=2, out_dims=4, n_hidden=8,
            block_out_channels=(8, 8), n_heads=2, timesteps=20, k_step=20,
        )
        trainer = DiffusionTrainer(cfg, model_cfg=model_cfg)
        batch = {
            "units": np.full((2, 16, 8), np.nan, np.float32),
            "mel": np.ones((2, 16, 4), np.float32),
            "spk_id": np.zeros((2, 1), np.int32),
        }
        loader = [batch]
        with pytest.raises(NonFiniteError):
            trainer.train(loader, max_steps=4)
        assert list((tmp_path / "exp").glob("nan_dump_*.npz"))
