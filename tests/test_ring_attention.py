"""Ring attention over the simulated 8-device seq axis == full attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from latent_diffusion_speech_tpu.config import ParallelConfig
from latent_diffusion_speech_tpu.ops.attention import dot_product_attention
from latent_diffusion_speech_tpu.ops.ring_attention import ring_attention
from latent_diffusion_speech_tpu.parallel.mesh import build_mesh


@pytest.fixture(scope="module")
def seq_mesh():
    return build_mesh(ParallelConfig(data=2, seq=4))


class TestRingAttention:
    @pytest.mark.parametrize("is_causal", [False, True])
    def test_matches_full_attention(self, rng, seq_mesh, is_causal):
        B, T, H, D = 2, 64, 2, 16  # T divisible by seq=4
        q = rng.standard_normal((B, T, H, D)).astype(np.float32)
        k = rng.standard_normal((B, T, H, D)).astype(np.float32)
        v = rng.standard_normal((B, T, H, D)).astype(np.float32)

        ref = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), is_causal=is_causal)

        spec = NamedSharding(seq_mesh, P(None, "seq", None, None))
        qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
        out = jax.jit(
            lambda q, k, v: ring_attention(q, k, v, seq_mesh, is_causal=is_causal)
        )(qs, ks, vs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_sequence_parallel_context_routes_ring(self, rng, seq_mesh):
        """The shared attention op routes to ring attention inside the
        sequence_parallel context (and only for eligible self-attention)."""
        from latent_diffusion_speech_tpu.ops.attention import sequence_parallel

        B, T, H, D = 1, 32, 2, 8
        q = rng.standard_normal((B, T, H, D)).astype(np.float32)
        ref = dot_product_attention(*(jnp.asarray(x) for x in (q, q, q)))

        spec = NamedSharding(seq_mesh, P(None, "seq", None, None))
        qs = jax.device_put(q, spec)

        def fn(x):
            with sequence_parallel(seq_mesh):
                return dot_product_attention(x, x, x)

        out = jax.jit(fn)(qs)
        assert out.sharding.spec[1] == "seq"  # proof the ring path ran
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_roformer_encoder_seq_parallel(self, seq_mesh):
        """Full RoFormer text encoder, sequence-sharded: == unsharded encode."""
        from latent_diffusion_speech_tpu.models.lm.roformer import (
            RoformerConfig, RoformerSystem, StackConfig,
        )

        cfg = RoformerConfig(
            encoder=StackConfig(num_hidden_layers=2, hidden_size=32,
                                num_attention_heads=4, intermediate_size=64),
            decoder=StackConfig(num_hidden_layers=1, hidden_size=32,
                                num_attention_heads=4, intermediate_size=64),
            semantic_kmeans_num=16, n_spk=2,
        )
        system = RoformerSystem(cfg, seed=0)
        rng_np = np.random.default_rng(0)
        B, L = 2, 32  # L divisible by seq=4
        phone = rng_np.integers(1, 50, (B, L)).astype(np.int32)
        tone = rng_np.integers(0, 5, (B, L)).astype(np.int32)
        spk = np.ones((B, L), np.int32)

        ref = system.module.apply(
            {"params": system.params}, jnp.asarray(phone), jnp.asarray(tone),
            jnp.asarray(spk), method=system.module.encode,
        )
        out = system.encode_seq_parallel(phone, tone, spk, mesh=seq_mesh)
        assert out.sharding.spec[1] == "seq"
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    @pytest.mark.parametrize("is_causal", [False, True])
    def test_kv_mask_matches_full_attention(self, rng, seq_mesh, is_causal):
        """Key-padding mask rotates with its k/v block; exact vs masked SDPA.
        Includes rows whose padding spans entire ring blocks (the all-masked
        guard in _local_block_attention)."""
        B, T, H, D = 3, 64, 2, 16
        q = rng.standard_normal((B, T, H, D)).astype(np.float32)
        k = rng.standard_normal((B, T, H, D)).astype(np.float32)
        v = rng.standard_normal((B, T, H, D)).astype(np.float32)
        lengths = np.asarray([64, 40, 9])  # 9: blocks 1-3 fully padded
        kv_mask = (np.arange(T)[None, :] < lengths[:, None])

        ref = dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            mask=jnp.asarray(kv_mask)[:, None, None, :], is_causal=is_causal,
        )
        spec = NamedSharding(seq_mesh, P(None, "seq", None, None))
        qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
        ms = jax.device_put(kv_mask, NamedSharding(seq_mesh, P(None, "seq")))
        out = jax.jit(
            lambda q, k, v, m: ring_attention(
                q, k, v, seq_mesh, is_causal=is_causal, kv_mask=m
            )
        )(qs, ks, vs, ms)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("is_causal", [False, True])
    def test_gradients_match_full_attention(self, rng, seq_mesh, is_causal):
        """Reverse-mode AD through the ppermute ring == grads of full SDPA
        (the training-path requirement: SP is usable in a loss)."""
        B, T, H, D = 2, 32, 2, 8
        q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)  # cotangent mixer

        def loss_ring(q, k, v):
            return jnp.sum(ring_attention(q, k, v, seq_mesh, is_causal=is_causal) * w)

        def loss_full(q, k, v):
            return jnp.sum(dot_product_attention(q, k, v, is_causal=is_causal) * w)

        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
        g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
        for gr, gf in zip(g_ring, g_full):
            np.testing.assert_allclose(np.asarray(gr), np.asarray(gf), atol=3e-5)

    def test_gradients_with_kv_mask(self, rng, seq_mesh):
        B, T, H, D = 2, 32, 2, 8
        q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
        kv_mask = jnp.asarray(np.arange(T)[None, :] < np.asarray([32, 11])[:, None])

        def loss_ring(q):
            return jnp.sum(
                ring_attention(q, q, q, seq_mesh, is_causal=True, kv_mask=kv_mask) ** 2
            )

        def loss_full(q):
            return jnp.sum(
                dot_product_attention(
                    q, q, q, mask=kv_mask[:, None, None, :], is_causal=True
                )
                ** 2
            )

        g_ring = jax.jit(jax.grad(loss_ring))(q)
        g_full = jax.grad(loss_full)(q)
        np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_full), atol=3e-5)

    def test_output_stays_sequence_sharded(self, rng, seq_mesh):
        B, T, H, D = 1, 32, 2, 8
        x = jax.device_put(
            rng.standard_normal((B, T, H, D)).astype(np.float32),
            NamedSharding(seq_mesh, P(None, "seq", None, None)),
        )
        out = jax.jit(lambda q: ring_attention(q, q, q, seq_mesh))(x)
        assert out.sharding.spec[1] == "seq"
        # each device holds T/4 of the sequence
        assert out.addressable_shards[0].data.shape[1] == T // 4


class TestSeqParallelTraining:
    """Sequence-sharded LM *training*: LMTrainer on a dp2 x sp4 mesh
    reproduces the dp8 run (VERDICT r2 item 2: 'SP for training')."""

    def _make_cfg(self, lm_type: str):
        from latent_diffusion_speech_tpu.config import Config

        cfg = Config()
        m = cfg.text2semantic.model
        m.type = lm_type
        m.semantic_kmeans_num = 16
        for stack in (m.encoder, m.decoder):
            stack.hidden_size = 32
            stack.num_attention_heads = 2
            stack.num_hidden_layers = 2
            stack.intermediate_size = 48
            # ring attention has no attention-prob dropout; hidden dropout off
            # too so dp8 and dp2xsp4 see identical masks trivially
            stack.attention_probs_dropout_prob = 0.0
            stack.hidden_dropout_prob = 0.0
        cfg.text2semantic.train.gradient_accumulation_steps = 1
        return cfg

    @pytest.mark.parametrize("lm_type", ["roformer", "llama"])
    def test_lm_trainer_sp_matches_dp(self, lm_type):
        from latent_diffusion_speech_tpu.train.lm_trainer import LMTrainer

        rng = np.random.default_rng(3)
        trainers = []
        for par in (ParallelConfig(data=8), ParallelConfig(data=2, seq=4)):
            cfg = self._make_cfg(lm_type)
            cfg.parallel = par
            trainers.append(LMTrainer(cfg, mesh=build_mesh(par, devices=jax.devices()[:8])))
        dp, sp = trainers
        losses = {id(dp): [], id(sp): []}
        B, L, S = 8, 16, 32  # L, S divisible by seq=4
        for step in range(2):
            if lm_type == "llama":
                ids = rng.integers(0, dp.lm_cfg.vocab_size, (B, S)).astype(np.int32)
                batch = {"input_ids": ids, "labels": ids.copy(),
                         "attention_mask": np.ones_like(ids)}
            else:
                batch = {
                    "phone": rng.integers(1, 40, (B, L)).astype(np.int32),
                    "tone": rng.integers(0, 5, (B, L)).astype(np.int32),
                    "semantic": rng.integers(0, 16, (B, S)).astype(np.int32),
                    "labels": rng.integers(0, 16, (B, S)).astype(np.int32),
                    "spk_id": np.ones((B, L), np.int32),
                    "encoder_attention_mask": np.ones((B, L), np.int32),
                    "attention_mask": np.ones((B, S), np.int32),
                }
            for tr in (dp, sp):
                m = tr.train_step(tr.device_put_batch(dict(batch)))
                losses[id(tr)].append(float(m["loss"]))
        np.testing.assert_allclose(losses[id(sp)], losses[id(dp)], rtol=2e-5)
        la, ta = jax.tree_util.tree_flatten(sp.system.params)
        lb, tb = jax.tree_util.tree_flatten(dp.system.params)
        assert ta == tb
        for a, b in zip(la, lb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)

    def test_seq_requires_no_attention_dropout(self):
        from latent_diffusion_speech_tpu.train.lm_trainer import LMTrainer

        cfg = self._make_cfg("roformer")
        cfg.text2semantic.model.encoder.attention_probs_dropout_prob = 0.1
        cfg.parallel = ParallelConfig(data=2, seq=4)
        with pytest.raises(ValueError, match="attention_probs_dropout"):
            LMTrainer(cfg, mesh=build_mesh(cfg.parallel, devices=jax.devices()[:8]))
