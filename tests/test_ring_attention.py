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
