"""Tensor-parallel sharding rules on the simulated 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from latent_diffusion_speech_tpu.config import Config, ParallelConfig
from latent_diffusion_speech_tpu.models.diffusion import Unit2MelConfig
from latent_diffusion_speech_tpu.parallel.mesh import build_mesh
from latent_diffusion_speech_tpu.parallel.sharding import (
    DEFAULT_TP_RULES,
    apply_param_shardings,
    infer_param_shardings,
)
from latent_diffusion_speech_tpu.train import DiffusionTrainer

TINY = Unit2MelConfig(
    input_channel=16, n_spk=4, out_dims=8, n_hidden=16,
    block_out_channels=(16, 16), n_heads=2, timesteps=20, k_step=20,
)


def _tiny_cfg(tmp_path, model_axis):
    cfg = Config()
    cfg.parallel = ParallelConfig(data=8 // model_axis, model=model_axis)
    cfg.diffusion.train.expdir = str(tmp_path / "exp")
    cfg.diffusion.train.warm_up_steps = 2
    return cfg


class TestShardingRules:
    def test_rules_match_attention_and_ff(self):
        mesh = build_mesh(ParallelConfig(data=4, model=2))
        params = {
            "attn": {"to_q": {"kernel": jnp.zeros((16, 16))}},
            "ff_in": {"kernel": jnp.zeros((16, 32)), "bias": jnp.zeros((32,))},
            "other": {"kernel": jnp.zeros((3, 3))},
        }
        sh = infer_param_shardings(params, mesh)
        assert sh["attn"]["to_q"]["kernel"].spec == P(None, "model")
        assert sh["ff_in"]["kernel"].spec == P(None, "model")
        assert sh["ff_in"]["bias"].spec == P("model")
        assert sh["other"]["kernel"].spec == P()

    def test_indivisible_dims_stay_replicated(self):
        mesh = build_mesh(ParallelConfig(data=4, model=2))
        params = {"to_q": {"kernel": jnp.zeros((16, 15))}}  # 15 % 2 != 0
        sh = infer_param_shardings(params, mesh)
        assert sh["to_q"]["kernel"].spec == P()

    def test_model_axis_1_is_noop(self):
        mesh = build_mesh(ParallelConfig(data=8, model=1))
        params = {"to_q": {"kernel": jnp.zeros((16, 16))}}
        sh = infer_param_shardings(params, mesh)
        assert sh["to_q"]["kernel"].spec == P()


class TestTensorParallelTraining:
    def test_dp2_tp2_step_matches_dp_only(self, tmp_path, rng):
        """The same batch + same init must give the same loss under dp8 and
        dp4xtp2 (sharding must not change the math)."""
        batch = {
            "units": rng.standard_normal((8, 32, 16)).astype(np.float32),
            "mel": rng.standard_normal((8, 32, 8)).astype(np.float32),
            "spk_id": np.ones((8, 1), np.int32),
            "aug_shift": np.zeros((8, 1), np.float32),
        }
        key = jax.random.PRNGKey(0)

        t_dp = DiffusionTrainer(_tiny_cfg(tmp_path / "dp", 1), model_cfg=TINY)
        loss_dp = float(t_dp.train_step(t_dp.device_put_batch(batch), key)["loss"])

        t_tp = DiffusionTrainer(_tiny_cfg(tmp_path / "tp", 2), model_cfg=TINY)
        # params are sharded over the model axis for the matched kernels
        specs = {str(s.spec) for s in jax.tree_util.tree_leaves(t_tp.param_shardings)}
        assert any("model" in s for s in specs)
        loss_tp = float(t_tp.train_step(t_tp.device_put_batch(batch), key)["loss"])

        np.testing.assert_allclose(loss_tp, loss_dp, rtol=1e-4)
