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


class TestTensorParallelGradients:
    def test_dp4_tp2_updated_params_match_dp8(self, tmp_path, rng):
        """Beyond loss equality: after one optimizer step from identical init,
        the FULL updated parameter tree must match between dp8 and dp4xtp2 —
        i.e. the gradient tree (and its all-reduce/all-gather pattern under
        GSPMD) is equivalent, not just the scalar loss."""
        batch = {
            "units": rng.standard_normal((8, 32, 16)).astype(np.float32),
            "mel": rng.standard_normal((8, 32, 8)).astype(np.float32),
            "spk_id": np.ones((8, 1), np.int32),
            "aug_shift": np.zeros((8, 1), np.float32),
        }
        key = jax.random.PRNGKey(0)

        t_dp = DiffusionTrainer(_tiny_cfg(tmp_path / "dp", 1), model_cfg=TINY)
        t_tp = DiffusionTrainer(_tiny_cfg(tmp_path / "tp", 2), model_cfg=TINY)
        for t in (t_dp, t_tp):
            t.train_step(t.device_put_batch(batch), key)

        flat_dp = jax.tree_util.tree_leaves_with_path(t_dp.system.params)
        flat_tp = jax.tree_util.tree_leaves_with_path(t_tp.system.params)
        assert len(flat_dp) == len(flat_tp)
        for (path, a), (_, b) in zip(flat_dp, flat_tp):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg=f"param {path} diverged between dp8 and dp4xtp2",
            )


class TestRoformerTensorParallel:
    """TP-shard the LM serve path the sharding-rule regexes target
    (query/key/value/out/ff_in/ff_out) and check logits + greedy decode."""

    def _tiny_lm(self):
        from latent_diffusion_speech_tpu.models.lm.roformer import (
            RoformerConfig,
            RoformerSystem,
            StackConfig,
        )

        small = StackConfig(hidden_size=16, num_attention_heads=2,
                            num_hidden_layers=2, intermediate_size=16,
                            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
        return RoformerSystem(RoformerConfig(encoder=small, decoder=small,
                                             semantic_kmeans_num=32, n_spk=4))

    def test_teacher_forced_logits_match(self, rng):
        lm = self._tiny_lm()
        mesh = build_mesh(ParallelConfig(data=4, model=2))
        sh = infer_param_shardings(lm.params, mesh)
        specs = {str(s.spec) for s in jax.tree_util.tree_leaves(sh)}
        assert any("model" in s for s in specs), "LM kernels must match the TP rules"
        sharded = apply_param_shardings(lm.params, sh)

        phone = jnp.asarray(rng.integers(1, 50, (2, 12)), jnp.int32)
        tone = jnp.asarray(rng.integers(0, 6, (2, 12)), jnp.int32)
        sem = jnp.asarray(rng.integers(0, 32, (2, 9)), jnp.int32)
        spk = jnp.ones((2, 12), jnp.int32)

        fwd = jax.jit(lambda p: lm.module.apply({"params": p}, phone, tone, sem, spk))
        ref = np.asarray(fwd(lm.params))
        tp = np.asarray(fwd(sharded))
        np.testing.assert_allclose(tp, ref, rtol=2e-4, atol=2e-5)

    def test_greedy_decode_tokens_match(self, rng):
        lm = self._tiny_lm()
        mesh = build_mesh(ParallelConfig(data=4, model=2))
        sharded = apply_param_shardings(lm.params, infer_param_shardings(lm.params, mesh))

        phone = jnp.asarray(rng.integers(1, 50, (1, 8)), jnp.int32)
        tone = jnp.asarray(rng.integers(0, 6, (1, 8)), jnp.int32)

        from latent_diffusion_speech_tpu.models.lm.sampling import SamplingConfig

        sampling = SamplingConfig(
            max_new_tokens=16, do_sample=False, temperature=1.0, top_k=1, top_p=1.0,
            repetition_penalty=1.0, end_gate_threshold=None,
            eos_token_id=lm.cfg.semantic_eos, pad_token_id=lm.cfg.semantic_pad,
            bos_token_id=lm.cfg.semantic_bos,
        )
        key = jax.random.PRNGKey(3)
        toks_ref, len_ref = lm._generate(lm.params, phone, tone, None, None, sampling, key)
        toks_tp, len_tp = lm._generate(sharded, phone, tone, None, None, sampling, key)
        np.testing.assert_array_equal(np.asarray(toks_ref), np.asarray(toks_tp))
        np.testing.assert_array_equal(np.asarray(len_ref), np.asarray(len_tp))
