"""LoRA adaptation: init/apply semantics, gradient isolation, merge effect."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.models.diffusion import UNet1D, UNet1DConfig
from latent_diffusion_speech_tpu.train.lora import lora_apply, lora_init, lora_param_count

TINY = UNet1DConfig(
    in_channels=12, out_channels=4, block_out_channels=(8, 8),
    layers_per_block=1, n_heads=2,
)


class TestLora:
    @pytest.fixture(scope="class")
    def setup(self):
        model = UNet1D(TINY)
        x = jnp.zeros((1, 16, 12))
        t = jnp.zeros((1,))
        params = model.init(jax.random.PRNGKey(0), x, t)["params"]
        lora = lora_init(params, jax.random.PRNGKey(1), rank=4)
        return model, params, lora

    def test_init_targets_attention(self, setup):
        _, params, lora = setup
        assert len(lora) > 0
        assert all("kernel" in k for k in lora)
        assert lora_param_count(lora) > 0

    def test_zero_b_means_identity(self, setup, rng):
        model, params, lora = setup
        x = jnp.asarray(rng.standard_normal((1, 16, 12)).astype(np.float32))
        t = jnp.zeros((1,))
        base = model.apply({"params": params}, x, t)
        merged = model.apply({"params": lora_apply(params, lora)}, x, t)
        np.testing.assert_allclose(np.asarray(base), np.asarray(merged), atol=1e-6)

    def test_nonzero_delta_changes_output(self, setup, rng):
        model, params, lora = setup
        lora2 = jax.tree_util.tree_map(lambda v: v + 0.1, lora)
        x = jnp.asarray(rng.standard_normal((1, 16, 12)).astype(np.float32))
        t = jnp.zeros((1,))
        base = model.apply({"params": params}, x, t)
        merged = model.apply({"params": lora_apply(params, lora2)}, x, t)
        assert float(jnp.abs(base - merged).max()) > 1e-5

    def test_grads_flow_to_lora_only(self, setup, rng):
        model, params, lora = setup
        x = jnp.asarray(rng.standard_normal((1, 16, 12)).astype(np.float32))
        t = jnp.zeros((1,))

        def loss(l):
            out = model.apply({"params": lora_apply(params, l)}, x, t)
            return jnp.mean(out**2)

        g = jax.grad(loss)(lora)
        # b factors start at zero, but a-grads flow through b only when b != 0;
        # b-grads are nonzero immediately
        b_grads = [v["b"] for v in g.values()]
        assert any(bool(jnp.any(b != 0)) for b in b_grads)
