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
