"""Pipeline parallelism (parallel/pipeline.py): GPipe microbatching over the
mesh 'pipe' axis.

The reference has no PP (SURVEY.md §2.8) — these tests pin the framework's
pipeline path: the generic stage op against sequential composition, the
Llama loss_pp against the plain loss (values AND gradients), and a combined
dp2 x pp4 layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_speech_tpu.config import ParallelConfig
from latent_diffusion_speech_tpu.parallel.mesh import build_mesh
from latent_diffusion_speech_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_stage_params,
)


def _tree_allclose(a, b, rtol=2e-5, atol=2e-5):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


@pytest.fixture(scope="module")
def pipe_mesh():
    return build_mesh(ParallelConfig(data=2, pipe=4), devices=jax.devices()[:8])


class TestPipelineApply:
    def test_matches_sequential(self, pipe_mesh, rng):
        S, M, mb, D = 4, 6, 2, 16
        Ws = jnp.asarray(rng.standard_normal((S, D, D)) * 0.3, jnp.float32)
        bs = jnp.asarray(rng.standard_normal((S, D)) * 0.1, jnp.float32)
        x = jnp.asarray(rng.standard_normal((M, mb, D)), jnp.float32)

        def stage(p, h):
            return jnp.tanh(h @ p["w"] + p["b"])

        params = {"w": Ws, "b": bs}
        out = pipeline_apply(pipe_mesh, stage, params, x)

        ref = x
        for s in range(S):
            ref = jnp.tanh(ref @ Ws[s] + bs[s])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_pytree_activation_rides_along(self, pipe_mesh, rng):
        """Aux leaves (e.g. masks) are injected/shifted with their microbatch."""
        S, M, mb, D = 4, 5, 2, 8
        Ws = jnp.asarray(rng.standard_normal((S, D, D)) * 0.3, jnp.float32)
        x = jnp.asarray(rng.standard_normal((M, mb, D)), jnp.float32)
        gate = jnp.asarray(rng.standard_normal((M, mb, D)) > 0)  # bool aux

        def stage(p, act):
            h, g = act
            return jnp.where(g, jnp.tanh(h @ p), h), g

        h_out, g_out = pipeline_apply(pipe_mesh, stage, Ws, (x, gate))
        ref = x
        for s in range(S):
            ref = jnp.where(gate, jnp.tanh(ref @ Ws[s]), ref)
        np.testing.assert_allclose(np.asarray(h_out), np.asarray(ref), rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(g_out), np.asarray(gate))

    def test_gradients_match_sequential(self, pipe_mesh, rng):
        S, M, mb, D = 4, 4, 2, 8
        Ws = jnp.asarray(rng.standard_normal((S, D, D)) * 0.3, jnp.float32)
        x = jnp.asarray(rng.standard_normal((M, mb, D)), jnp.float32)

        def stage(p, h):
            return jnp.tanh(h @ p)

        def loss_pp(w):
            return jnp.sum(pipeline_apply(pipe_mesh, stage, w, x) ** 2)

        def loss_seq(w):
            h = x
            for s in range(S):
                h = jnp.tanh(h @ w[s])
            return jnp.sum(h**2)

        gp = jax.grad(loss_pp)(Ws)
        gs = jax.grad(loss_seq)(Ws)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs), rtol=2e-5, atol=1e-6)

    def test_batch_axis_sharding(self, pipe_mesh, rng):
        """Microbatch dim sharded over 'data' (dp x pp) gives the same values."""
        S, M, mb, D = 4, 4, 4, 8
        Ws = jnp.asarray(rng.standard_normal((S, D, D)) * 0.3, jnp.float32)
        x = jnp.asarray(rng.standard_normal((M, mb, D)), jnp.float32)

        def stage(p, h):
            return jnp.tanh(h @ p)

        out_rep = pipeline_apply(pipe_mesh, stage, Ws, x)
        out_dp = pipeline_apply(pipe_mesh, stage, Ws, x, batch_axis="data")
        np.testing.assert_allclose(np.asarray(out_dp), np.asarray(out_rep), rtol=1e-6)

    def test_remat(self, pipe_mesh, rng):
        S, M, mb, D = 4, 4, 2, 8
        Ws = jnp.asarray(rng.standard_normal((S, D, D)) * 0.3, jnp.float32)
        x = jnp.asarray(rng.standard_normal((M, mb, D)), jnp.float32)

        def stage(p, h):
            return jnp.tanh(h @ p)

        g1 = jax.grad(lambda w: jnp.sum(pipeline_apply(pipe_mesh, stage, w, x) ** 2))(Ws)
        g2 = jax.grad(
            lambda w: jnp.sum(pipeline_apply(pipe_mesh, stage, w, x, remat=True) ** 2)
        )(Ws)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)

    def test_degenerate_single_stage_mesh(self, rng):
        mesh = build_mesh(ParallelConfig(data=8), devices=jax.devices()[:8])
        Ws = jnp.asarray(rng.standard_normal((3, 8, 8)) * 0.3, jnp.float32)
        x = jnp.asarray(rng.standard_normal((2, 2, 8)), jnp.float32)

        def stage(p, h):
            return jnp.tanh(h @ p)

        out = pipeline_apply(mesh, stage, Ws, x)
        ref = x
        for s in range(3):
            ref = jnp.tanh(ref @ Ws[s])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


class TestLlamaPipeline:
    @pytest.fixture(scope="class")
    def setup(self):
        from latent_diffusion_speech_tpu.models.lm.llama import LlamaConfig, LlamaSystem

        cfg = LlamaConfig(
            hidden_size=32, num_attention_heads=2, num_hidden_layers=4,
            intermediate_size=48, semantic_kmeans_num=32,
        )
        system = LlamaSystem(cfg, seed=0)
        rng = np.random.default_rng(1)
        B, T = 8, 24
        ids = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)
        labels = ids.copy().astype(np.int32)
        lens = rng.integers(T // 2, T + 1, B)
        mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.int32)
        labels[mask == 0] = -100
        return system, jnp.asarray(ids), jnp.asarray(labels), jnp.asarray(mask)

    def test_loss_pp_matches_loss(self, setup, pipe_mesh):
        system, ids, labels, mask = setup
        base = system.loss(system.params, ids, labels, attention_mask=mask)
        pp = system.loss_pp(
            system.params, ids, labels, pipe_mesh, attention_mask=mask, microbatches=4
        )
        np.testing.assert_allclose(float(pp), float(base), rtol=2e-5)

    def test_loss_pp_grads_match(self, setup, pipe_mesh):
        system, ids, labels, mask = setup
        g_base = jax.grad(lambda p: system.loss(p, ids, labels, attention_mask=mask))(
            system.params
        )
        g_pp = jax.grad(
            lambda p: system.loss_pp(
                p, ids, labels, pipe_mesh, attention_mask=mask, microbatches=4
            )
        )(system.params)
        _tree_allclose(g_pp, g_base, rtol=5e-4, atol=1e-5)

    def test_lm_trainer_pp_matches_dp(self):
        """LMTrainer with parallel.pipe=4 x data=2 reproduces the dp8 run:
        identical params after 3 optimizer steps (same seed, same batches)."""
        from latent_diffusion_speech_tpu.config import Config
        from latent_diffusion_speech_tpu.train.lm_trainer import LMTrainer

        def make_cfg():
            cfg = Config()
            cfg.text2semantic.model.type = "llama"
            d = cfg.text2semantic.model.decoder
            d.hidden_size = 32
            d.num_attention_heads = 2
            d.num_hidden_layers = 4
            d.intermediate_size = 48
            cfg.text2semantic.model.semantic_kmeans_num = 16
            cfg.text2semantic.train.gradient_accumulation_steps = 1
            return cfg

        rng = np.random.default_rng(7)
        trainers = []
        for par in (ParallelConfig(data=8), ParallelConfig(data=2, pipe=4)):
            cfg = make_cfg()
            cfg.parallel = par
            trainers.append(LMTrainer(cfg, mesh=build_mesh(par, devices=jax.devices()[:8])))
        dp, pp = trainers
        V = dp.lm_cfg.vocab_size
        losses = {id(dp): [], id(pp): []}
        for step in range(3):
            ids = rng.integers(0, V, (8, 16)).astype(np.int32)
            batch = {
                "input_ids": ids,
                "labels": ids.copy(),
                "attention_mask": np.ones_like(ids),
            }
            for tr in (dp, pp):
                m = tr.train_step(tr.device_put_batch(dict(batch)))
                losses[id(tr)].append(float(m["loss"]))
        np.testing.assert_allclose(losses[id(pp)], losses[id(dp)], rtol=2e-5)
        _tree_allclose(pp.system.params, dp.system.params, rtol=5e-4, atol=1e-5)

    def test_loss_pp_dp_combo_jitted(self, setup, pipe_mesh):
        """jit-compiled dp2 x pp4: one program, batch sharded over 'data'."""
        system, ids, labels, mask = setup
        base = system.loss(system.params, ids, labels, attention_mask=mask)

        @jax.jit
        def step(p, ids, labels, mask):
            return system.loss_pp(
                p, ids, labels, pipe_mesh, attention_mask=mask,
                microbatches=2, batch_axis="data",
            )

        pp = step(system.params, ids, labels, mask)
        np.testing.assert_allclose(float(pp), float(base), rtol=2e-5)


class TestRoformerPipeline:
    """Enc-dec GPipe: kind-switched slots (enc/dec/identity) over 'pipe'
    (RoformerSystem.loss_pp).  The serve-default RoFormer can now pipeline —
    VERDICT r2 item 1a."""

    @pytest.fixture(scope="class")
    def setup(self):
        from latent_diffusion_speech_tpu.models.lm.roformer import (
            RoformerConfig, RoformerSystem, StackConfig,
        )

        cfg = RoformerConfig(
            encoder=StackConfig(num_hidden_layers=3, hidden_size=32,
                                num_attention_heads=2, intermediate_size=48),
            decoder=StackConfig(num_hidden_layers=2, hidden_size=32,
                                num_attention_heads=4, intermediate_size=48),
            semantic_kmeans_num=16, n_spk=4,
        )
        system = RoformerSystem(cfg, seed=0)
        rng = np.random.default_rng(2)
        B, L, S = 8, 12, 20
        phone = rng.integers(1, 40, (B, L)).astype(np.int32)
        tone = rng.integers(0, 5, (B, L)).astype(np.int32)
        semantic = rng.integers(0, 16, (B, S)).astype(np.int32)
        labels = rng.integers(0, 16, (B, S)).astype(np.int32)
        spk = np.ones((B, L), np.int32)
        plens = rng.integers(L // 2, L + 1, B)
        slens = rng.integers(S // 2, S + 1, B)
        emask = (np.arange(L)[None, :] < plens[:, None]).astype(np.int32)
        dmask = (np.arange(S)[None, :] < slens[:, None]).astype(np.int32)
        labels[dmask == 0] = -100
        return system, tuple(
            jnp.asarray(x) for x in (phone, tone, semantic, labels, spk, emask, dmask)
        )

    def test_loss_pp_matches_loss(self, setup, pipe_mesh):
        """5 enc+dec layers over 4 stages (2 slots/stage, 3 identity pads)."""
        system, (phone, tone, semantic, labels, spk, emask, dmask) = setup
        base = system.loss(
            system.params, phone, tone, semantic, labels, spk_id=spk,
            encoder_attention_mask=emask, attention_mask=dmask,
        )
        pp = system.loss_pp(
            system.params, phone, tone, semantic, labels, pipe_mesh, spk_id=spk,
            encoder_attention_mask=emask, attention_mask=dmask, microbatches=4,
        )
        np.testing.assert_allclose(float(pp), float(base), rtol=2e-5)

    def test_loss_pp_grads_match(self, setup, pipe_mesh):
        system, (phone, tone, semantic, labels, spk, emask, dmask) = setup

        def f_base(p):
            return system.loss(p, phone, tone, semantic, labels, spk_id=spk,
                               encoder_attention_mask=emask, attention_mask=dmask)

        def f_pp(p):
            return system.loss_pp(p, phone, tone, semantic, labels, pipe_mesh,
                                  spk_id=spk, encoder_attention_mask=emask,
                                  attention_mask=dmask, microbatches=2)

        g_base = jax.grad(f_base)(system.params)
        g_pp = jax.jit(jax.grad(f_pp))(system.params)
        _tree_allclose(g_pp, g_base, rtol=5e-4, atol=1e-5)

    def test_lm_trainer_pp_matches_dp(self):
        """Roformer LMTrainer on dp2 x pp4 == dp8 (3 optimizer steps)."""
        from latent_diffusion_speech_tpu.config import Config
        from latent_diffusion_speech_tpu.train.lm_trainer import LMTrainer

        def make_cfg():
            cfg = Config()
            m = cfg.text2semantic.model
            m.type = "roformer"
            m.semantic_kmeans_num = 16
            for stack in (m.encoder, m.decoder):
                stack.hidden_size = 32
                stack.num_attention_heads = 2
                stack.num_hidden_layers = 2
                stack.intermediate_size = 48
                stack.hidden_dropout_prob = 0.0
                stack.attention_probs_dropout_prob = 0.0
            cfg.text2semantic.train.gradient_accumulation_steps = 1
            return cfg

        rng = np.random.default_rng(9)
        trainers = []
        for par in (ParallelConfig(data=8), ParallelConfig(data=2, pipe=4)):
            cfg = make_cfg()
            cfg.parallel = par
            trainers.append(LMTrainer(cfg, mesh=build_mesh(par, devices=jax.devices()[:8])))
        dp, pp = trainers
        losses = {id(dp): [], id(pp): []}
        B, L, S = 8, 12, 16
        for step in range(3):
            batch = {
                "phone": rng.integers(1, 40, (B, L)).astype(np.int32),
                "tone": rng.integers(0, 5, (B, L)).astype(np.int32),
                "semantic": rng.integers(0, 16, (B, S)).astype(np.int32),
                "labels": rng.integers(0, 16, (B, S)).astype(np.int32),
                "spk_id": np.ones((B, L), np.int32),
                "encoder_attention_mask": np.ones((B, L), np.int32),
                "attention_mask": np.ones((B, S), np.int32),
            }
            for tr in (dp, pp):
                m = tr.train_step(tr.device_put_batch(dict(batch)))
                losses[id(tr)].append(float(m["loss"]))
        np.testing.assert_allclose(losses[id(pp)], losses[id(dp)], rtol=2e-5)
        _tree_allclose(pp.system.params, dp.system.params, rtol=5e-4, atol=1e-5)

    def test_pp_requires_dropout_off(self):
        from latent_diffusion_speech_tpu.config import Config
        from latent_diffusion_speech_tpu.train.lm_trainer import LMTrainer

        cfg = Config()
        cfg.text2semantic.model.type = "roformer"  # default dropout 0.1
        cfg.parallel = ParallelConfig(data=2, pipe=4)
        with pytest.raises(ValueError, match="dropout"):
            LMTrainer(cfg, mesh=build_mesh(cfg.parallel, devices=jax.devices()[:8]))


class TestThreeAxisTrainer:
    """dp2 x tp2 x pp2: batch on 'data', Megatron kernel layouts on 'model'
    (GSPMD auto inside the pipeline's partial-manual shard_map), GPipe over
    'pipe' — one jitted program.  Parameter equality vs dp8 after 2 steps
    (VERDICT r2 item 1c)."""

    def test_lm_trainer_dp_tp_pp_matches_dp(self):
        from latent_diffusion_speech_tpu.config import Config
        from latent_diffusion_speech_tpu.train.lm_trainer import LMTrainer

        def make_cfg():
            cfg = Config()
            m = cfg.text2semantic.model
            m.type = "llama"
            m.semantic_kmeans_num = 16
            d = m.decoder
            d.hidden_size, d.num_attention_heads = 32, 2
            d.num_hidden_layers, d.intermediate_size = 2, 48
            cfg.text2semantic.train.gradient_accumulation_steps = 1
            return cfg

        rng = np.random.default_rng(13)
        trainers = []
        for par in (ParallelConfig(data=8), ParallelConfig(data=2, model=2, pipe=2)):
            cfg = make_cfg()
            cfg.parallel = par
            trainers.append(LMTrainer(cfg, mesh=build_mesh(par, devices=jax.devices()[:8])))
        dp, combo = trainers
        # the 3-axis trainer really holds tensor-parallel params
        specs = {str(s.spec) for s in jax.tree_util.tree_leaves(combo.param_shardings)}
        assert any("model" in s for s in specs), specs
        losses = {id(dp): [], id(combo): []}
        for step in range(2):
            ids = rng.integers(0, dp.lm_cfg.vocab_size, (8, 16)).astype(np.int32)
            batch = {"input_ids": ids, "labels": ids.copy(),
                     "attention_mask": np.ones_like(ids)}
            for tr in (dp, combo):
                m = tr.train_step(tr.device_put_batch(dict(batch)))
                losses[id(tr)].append(float(m["loss"]))
        np.testing.assert_allclose(losses[id(combo)], losses[id(dp)], rtol=2e-5)
        _tree_allclose(combo.system.params, dp.system.params, rtol=5e-4, atol=1e-5)


class TestRoformerPipelineGuards:
    def test_mismatched_stack_geometry_raises(self, pipe_mesh):
        from latent_diffusion_speech_tpu.models.lm.roformer import (
            RoformerConfig, RoformerSystem, StackConfig,
        )

        cfg = RoformerConfig(
            encoder=StackConfig(num_hidden_layers=2, hidden_size=32,
                                num_attention_heads=2, intermediate_size=48),
            decoder=StackConfig(num_hidden_layers=1, hidden_size=64,
                                num_attention_heads=2, intermediate_size=48),
            semantic_kmeans_num=16, n_spk=2,
        )
        system = RoformerSystem(cfg, seed=0)
        phone = jnp.ones((4, 8), jnp.int32)
        sem = jnp.ones((4, 8), jnp.int32)
        with pytest.raises(ValueError, match="hidden"):
            system.loss_pp(system.params, phone, phone, sem, sem, pipe_mesh)
