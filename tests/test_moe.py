"""MoE FFN + expert parallelism.

No reference equivalent — the reference stack has no MoE models (SURVEY.md
§2.8 lists DDP as its only parallelism).  These tests pin the routing math
(dense equivalence, capacity drops, aux loss), the expert-axis sharding
rules, and dp×ep parity of the Llama MoE loss on the 8-virtual-device mesh.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from latent_diffusion_speech_tpu.config import Config, ParallelConfig
from latent_diffusion_speech_tpu.models.lm import LlamaConfig, LlamaSystem
from latent_diffusion_speech_tpu.ops.moe import MoEMLP
from latent_diffusion_speech_tpu.parallel.mesh import build_mesh
from latent_diffusion_speech_tpu.parallel.sharding import infer_param_shardings


def _init(module, x, seed=0):
    return module.init(jax.random.PRNGKey(seed), x)["params"]


class TestRouting:
    def test_single_expert_equals_dense_swiglu(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 6, 16)), jnp.float32)
        m = MoEMLP(num_experts=1, intermediate_size=32, top_k=1, capacity_factor=2.0)
        p = _init(m, x)
        y, _ = m.apply({"params": p}, x)
        ref = (
            jax.nn.silu(x @ p["w_gate"][0]) * (x @ p["w_up"][0])
        ) @ p["w_down"][0]
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5, atol=2e-6)

    def test_topk_matches_dense_reference_when_no_drops(self, rng):
        """capacity_factor = E makes capacity = k*S (no token can overflow);
        the output must equal the brute-force per-token expert mixture."""
        E, k = 4, 2
        x = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
        m = MoEMLP(num_experts=E, intermediate_size=16, top_k=k, capacity_factor=float(E))
        p = _init(m, x)
        y, _ = m.apply({"params": p}, x)

        xf = np.asarray(x).reshape(-1, 8)
        probs = np.asarray(jax.nn.softmax(xf @ np.asarray(p["gate"]), axis=-1))
        ref = np.zeros_like(xf)
        for s in range(xf.shape[0]):
            top = np.argsort(-probs[s])[:k]
            gates = probs[s][top] / probs[s][top].sum()
            for g, e in zip(gates, top):
                h = jax.nn.silu(xf[s] @ p["w_gate"][e]) * (xf[s] @ p["w_up"][e])
                ref[s] += g * np.asarray(h @ p["w_down"][e])
        np.testing.assert_allclose(np.asarray(y).reshape(-1, 8), ref, rtol=1e-4, atol=1e-5)

    def test_overflow_tokens_are_dropped(self, rng):
        """Identical tokens all route to one expert; with capacity 1, exactly
        one token is served and the rest fall back to the (zero) residual."""
        E, S = 4, 8
        x = jnp.tile(jnp.asarray(rng.standard_normal((1, 1, 8)), jnp.float32), (1, S, 1))
        m = MoEMLP(num_experts=E, intermediate_size=16, top_k=1, capacity_factor=0.5)
        p = _init(m, x)
        y, _ = m.apply({"params": p}, x)  # capacity = ceil(S/E * 0.5) = 1
        nonzero = np.abs(np.asarray(y)[0]).sum(-1) > 0
        assert nonzero.sum() == 1, nonzero

    def test_aux_loss_sown_and_finite(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8)), jnp.float32)
        m = MoEMLP(num_experts=4, intermediate_size=16, top_k=2)
        p = _init(m, x)
        (y, aux), muts = m.apply({"params": p}, x, mutable=["moe_losses"])
        assert np.isfinite(float(aux)) and float(aux) > 0
        sown = muts["moe_losses"]
        np.testing.assert_allclose(float(sown["aux"][0]), float(aux))
        # routing stats (2, E) reconstruct the aux: E * sum(f_e * p_e)
        stats = np.asarray(sown["stats"][0])
        assert stats.shape == (2, 4)
        np.testing.assert_allclose(4 * np.sum(stats[0] * stats[1]), float(aux), rtol=1e-6)

    def test_aux_loss_balanced_is_one(self):
        """Perfectly uniform router (zero gate weights) -> Switch aux == 1."""
        x = jnp.ones((1, 8, 8), jnp.float32)
        m = MoEMLP(num_experts=4, intermediate_size=16, top_k=1)
        p = _init(m, x)
        p = dict(p, gate=jnp.zeros_like(p["gate"]))
        _, aux = m.apply({"params": p}, x)
        np.testing.assert_allclose(float(aux), 1.0, rtol=1e-6)


class TestExpertSharding:
    def test_rules_shard_expert_banks(self):
        mesh = build_mesh(ParallelConfig(data=2, expert=4))
        params = {
            "moe": {
                "gate": jnp.zeros((16, 4)),
                "w_gate": jnp.zeros((4, 16, 32)),
                "w_up": jnp.zeros((4, 16, 32)),
                "w_down": jnp.zeros((4, 32, 16)),
            }
        }
        sh = infer_param_shardings(params, mesh)
        assert sh["moe"]["w_gate"].spec == P("expert", None, None)
        assert sh["moe"]["w_up"].spec == P("expert", None, None)
        assert sh["moe"]["w_down"].spec == P("expert", None, None)
        assert sh["moe"]["gate"].spec == P()  # router stays replicated

    def test_expert_composes_with_model_axis(self):
        mesh = build_mesh(ParallelConfig(data=2, model=2, expert=2))
        params = {"moe": {"w_gate": jnp.zeros((4, 16, 32)), "w_down": jnp.zeros((4, 32, 16))}}
        sh = infer_param_shardings(params, mesh)
        assert sh["moe"]["w_gate"].spec == P("expert", None, "model")
        assert sh["moe"]["w_down"].spec == P("expert", "model", None)

    def test_tp_rules_unchanged_on_plain_mesh(self):
        mesh = build_mesh(ParallelConfig(data=4, model=2))
        params = {"to_q": {"kernel": jnp.zeros((16, 16))}, "moe": {"w_gate": jnp.zeros((4, 16, 32))}}
        sh = infer_param_shardings(params, mesh)
        assert sh["to_q"]["kernel"].spec == P(None, "model")
        # expert axis has size 1 -> dropped; 16 % model(2) == 0 so model applies
        assert sh["moe"]["w_gate"].spec == P(None, None, "model")


def _moe_llama_cfg(**over):
    kw = dict(
        semantic_kmeans_num=32, hidden_size=32, num_attention_heads=4,
        num_hidden_layers=2, intermediate_size=32,
        moe_experts=4, moe_top_k=2, moe_capacity_factor=2.0,
    )
    kw.update(over)
    return LlamaConfig(**kw)


class TestLlamaMoE:
    def test_loss_includes_aux_and_descends(self, rng):
        sys_ = LlamaSystem(_moe_llama_cfg(), seed=0)
        ids = jnp.asarray(rng.integers(0, 60, (2, 12)), jnp.int32)
        loss = float(sys_.loss(sys_.params, ids, ids))
        assert np.isfinite(loss)
        grads = jax.grad(sys_.loss)(sys_.params, ids, ids)
        # expert banks and router receive gradient
        g = grads["block_0"]["moe"]
        assert float(jnp.abs(g["w_gate"]).max()) > 0
        assert float(jnp.abs(g["gate"]).max()) > 0

    def test_generate_runs_with_moe(self, rng):
        sys_ = LlamaSystem(_moe_llama_cfg(), seed=0)
        phones = np.asarray(rng.integers(1, 40, (1, 5)), np.int32)
        toks, lens = sys_.generate(
            phones, np.zeros_like(phones), spk_id=1, max_length=6,
            do_sample=False, rng=jax.random.PRNGKey(0), impl="scan",
        )
        assert toks.shape[0] == 1 and int(lens[0]) <= 6

    def test_loss_pp_moe_matches_loss(self, rng):
        """pp x ep composition: MoE blocks run INSIDE pipeline stages; with
        no capacity overflow (cf = E) the pipelined loss equals the plain one
        (per-layer aux reconstructed exactly from microbatch routing stats)."""
        mesh = build_mesh(ParallelConfig(data=2, pipe=2, expert=2))
        cfg = _moe_llama_cfg(moe_capacity_factor=4.0)
        sys_ = LlamaSystem(cfg, seed=0, mesh=mesh)
        ids = jnp.asarray(rng.integers(0, 60, (4, 12)), jnp.int32)
        base = float(sys_.loss(sys_.params, ids, ids))
        pp = float(
            jax.jit(
                lambda p: sys_.loss_pp(p, ids, ids, mesh, microbatches=2)
            )(sys_.params)
        )
        np.testing.assert_allclose(pp, base, rtol=2e-5)

    def test_loss_pp_moe_grads_match(self, rng):
        mesh = build_mesh(ParallelConfig(data=2, pipe=2, expert=2))
        cfg = _moe_llama_cfg(moe_capacity_factor=4.0)
        sys_ = LlamaSystem(cfg, seed=0, mesh=mesh)
        ids = jnp.asarray(rng.integers(0, 60, (4, 12)), jnp.int32)
        g_base = jax.grad(lambda p: sys_.loss(p, ids, ids))(sys_.params)
        g_pp = jax.jit(
            jax.grad(lambda p: sys_.loss_pp(p, ids, ids, mesh, microbatches=2))
        )(sys_.params)
        la, ta = jax.tree_util.tree_flatten(g_pp)
        lb, tb = jax.tree_util.tree_flatten(g_base)
        assert ta == tb
        for a, b in zip(la, lb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)

    def test_ep_loss_matches_unsharded(self, rng):
        """dp2 x ep4: expert-sharded params must give the replicated loss."""
        cfg = _moe_llama_cfg()
        base = LlamaSystem(cfg, seed=0)
        ids = jnp.asarray(rng.integers(0, 60, (4, 12)), jnp.int32)
        ref = float(jax.jit(base.loss)(base.params, ids, ids))

        mesh = build_mesh(ParallelConfig(data=2, expert=4))
        ep = LlamaSystem(cfg, params=base.params, seed=0, mesh=mesh)
        from latent_diffusion_speech_tpu.parallel.sharding import apply_param_shardings

        shardings = infer_param_shardings(ep.params, mesh)
        specs = {str(s.spec) for s in jax.tree_util.tree_leaves(shardings)}
        assert any("expert" in s for s in specs)
        params = apply_param_shardings(ep.params, shardings)
        got = float(jax.jit(ep.loss)(params, ids, ids))
        np.testing.assert_allclose(got, ref, rtol=2e-5)


class TestTrainerMoE:
    def test_trainer_ep_descends(self, rng, tmp_path):
        from tests.test_llama_training import _collate, _items, _tiny_cfg

        cfg = _tiny_cfg(tmp_path)
        m = dataclasses.replace(
            cfg.text2semantic.model, moe_experts=4, moe_top_k=2,
            moe_capacity_factor=2.0,
        )
        cfg = dataclasses.replace(
            cfg, text2semantic=dataclasses.replace(cfg.text2semantic, model=m),
            parallel=ParallelConfig(data=2, expert=4),
        )
        from latent_diffusion_speech_tpu.train.lm_trainer import LMTrainer

        trainer = LMTrainer(cfg)
        assert trainer.lm_cfg.moe_experts == 4
        specs = {str(s.spec) for s in jax.tree_util.tree_leaves(trainer.param_shardings)}
        assert any("expert" in s for s in specs)
        batch = trainer.device_put_batch(_collate(_items(rng, trainer.lm_cfg, n=4), trainer.lm_cfg))
        losses = [float(trainer.train_step(batch)["loss"]) for _ in range(15)]
        assert np.isfinite(losses).all()
        assert min(losses[-5:]) < losses[0], losses

    def test_trainer_pp_ep_matches_dp(self):
        """LMTrainer on dp2 x pp2 x ep2 == dp8: identical params after 2
        optimizer steps (MoE capacity ample so no overflow divergence)."""
        from latent_diffusion_speech_tpu.config import Config
        from latent_diffusion_speech_tpu.train.lm_trainer import LMTrainer

        def make_cfg():
            cfg = Config()
            m = cfg.text2semantic.model
            m.type = "llama"
            m.semantic_kmeans_num = 16
            d = m.decoder
            d.hidden_size, d.num_attention_heads = 32, 2
            d.num_hidden_layers, d.intermediate_size = 2, 32
            m.moe_experts = 2
            m.moe_top_k = 1
            m.moe_capacity_factor = 4.0
            cfg.text2semantic.train.gradient_accumulation_steps = 1
            return cfg

        rng = np.random.default_rng(11)
        trainers = []
        for par in (ParallelConfig(data=8), ParallelConfig(data=2, pipe=2, expert=2)):
            cfg = make_cfg()
            cfg.parallel = par
            trainers.append(LMTrainer(cfg, mesh=build_mesh(par, devices=jax.devices()[:8])))
        dp, ppep = trainers
        losses = {id(dp): [], id(ppep): []}
        for step in range(2):
            ids = rng.integers(0, dp.lm_cfg.vocab_size, (8, 12)).astype(np.int32)
            batch = {"input_ids": ids, "labels": ids.copy(),
                     "attention_mask": np.ones_like(ids)}
            for tr in (dp, ppep):
                m = tr.train_step(tr.device_put_batch(dict(batch)))
                losses[id(tr)].append(float(m["loss"]))
        np.testing.assert_allclose(losses[id(ppep)], losses[id(dp)], rtol=2e-5)
        la, ta = jax.tree_util.tree_flatten(ppep.system.params)
        lb, tb = jax.tree_util.tree_flatten(dp.system.params)
        assert ta == tb
        for a, b in zip(la, lb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)
