"""Pallas kernel correctness vs XLA references (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.ops.attention import dot_product_attention

# On CPU the kernels run through the Pallas interpreter.
INTERPRET = jax.default_backend() != "tpu"


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    if INTERPRET:
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
        yield
        ctx.__exit__(None, None, None)
    else:
        yield


class TestFlashAttention:
    @pytest.mark.parametrize("tq,tkv", [(128, 128), (100, 260)])
    def test_matches_xla(self, rng, tq, tkv):
        from latent_diffusion_speech_tpu.ops.pallas.flash_attention import flash_attention

        q = jnp.asarray(rng.standard_normal((2, tq, 2, 64)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, tkv, 2, 64)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, tkv, 2, 64)).astype(np.float32))
        ref = dot_product_attention(q, k, v)
        out = flash_attention(q, k, v, block_q=64, block_k=64)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_causal_matches_xla(self, rng):
        from latent_diffusion_speech_tpu.ops.pallas.flash_attention import flash_attention

        x = jnp.asarray(rng.standard_normal((1, 96, 2, 32)).astype(np.float32))
        ref = dot_product_attention(x, x, x, is_causal=True)
        out = flash_attention(x, x, x, is_causal=True, block_q=32, block_k=32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_mask_falls_back_to_xla(self, rng):
        from latent_diffusion_speech_tpu.ops.pallas.flash_attention import flash_attention

        x = jnp.asarray(rng.standard_normal((1, 16, 2, 8)).astype(np.float32))
        mask = jnp.ones((1, 1, 16, 16), bool)
        out = flash_attention(x, x, x, mask=mask)
        ref = dot_product_attention(x, x, x, mask=mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


class TestFusedAttention:
    """Single-block fused attention (fwd + custom-VJP bwd) for the UNet's
    short sequences — parity vs the XLA einsum path, values AND gradients."""

    @pytest.mark.parametrize("t", [11, 22, 88])
    def test_forward_matches_xla(self, rng, t):
        from latent_diffusion_speech_tpu.ops.pallas.fused_attention import fused_attention

        q = jnp.asarray(rng.standard_normal((2, t, 4, 32)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, t, 4, 32)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, t, 4, 32)).astype(np.float32))
        ref = dot_product_attention(q, k, v)
        out = fused_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("t,g", [(11, 16), (40, 4)])
    def test_grads_match_xla(self, rng, t, g):
        from latent_diffusion_speech_tpu.ops.pallas.fused_attention import fused_attention

        q = jnp.asarray(rng.standard_normal((2, t, 4, 16)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, t, 4, 16)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, t, 4, 16)).astype(np.float32))
        co = jnp.asarray(rng.standard_normal((2, t, 4, 16)).astype(np.float32))

        def loss(fn, *args):
            return jnp.sum(fn(*args) * co)

        ref_grads = jax.grad(lambda *a: loss(dot_product_attention, *a),
                             argnums=(0, 1, 2))(q, k, v)
        out_grads = jax.grad(lambda *a: loss(fused_attention, *a, None, g),
                             argnums=(0, 1, 2))(q, k, v)
        for got, want, name in zip(out_grads, ref_grads, "qkv"):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4,
                err_msg=f"d{name}",
            )

    def test_bf16_close_to_f32_reference(self, rng):
        from latent_diffusion_speech_tpu.ops.pallas.fused_attention import fused_attention

        qf = rng.standard_normal((1, 88, 8, 32)).astype(np.float32)
        q = jnp.asarray(qf, jnp.bfloat16)
        ref = dot_product_attention(jnp.asarray(qf), jnp.asarray(qf), jnp.asarray(qf))
        out = fused_attention(q, q, q)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
        )

    def test_dispatch_through_dot_product_attention(self, rng):
        # impl='fused' routes eligible self-attention through the kernel and
        # falls back to XLA when masked/causal/cross
        x = jnp.asarray(rng.standard_normal((1, 16, 2, 8)).astype(np.float32))
        out = dot_product_attention(x, x, x, impl="fused")
        ref = dot_product_attention(x, x, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
        causal = dot_product_attention(x, x, x, impl="fused", is_causal=True)
        causal_ref = dot_product_attention(x, x, x, is_causal=True)
        np.testing.assert_allclose(np.asarray(causal), np.asarray(causal_ref), atol=2e-5)


class TestKmeansArgmin:
    @pytest.mark.parametrize("n,k,d", [(300, 700, 32), (256, 512, 64)])
    def test_matches_xla_argmin(self, rng, n, k, d):
        from latent_diffusion_speech_tpu.ops.pallas.kmeans import kmeans_argmin

        x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        cb = jnp.asarray(rng.standard_normal((k, d)).astype(np.float32))
        ref = jnp.argmin(
            jnp.sum(x**2, -1, keepdims=True) - 2 * x @ cb.T + jnp.sum(cb**2, -1)[None],
            axis=-1,
        )
        out = kmeans_argmin(x, cb, block_n=128, block_k=256)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
