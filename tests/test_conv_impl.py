"""Conv1dSame 'matmul' lowering == the XLA conv lowering (fwd + grads).

The matmul impl turns every UNet conv (and its backward) into plain
dot_generals; these tests pin exact-math equivalence so the lowering choice
is purely a performance knob.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_speech_tpu.models.diffusion.unet1d import (
    Conv1dSame,
    UNet1D,
    UNet1DConfig,
)


def _params(rng, k, cin, cout):
    kernel = jnp.asarray(rng.standard_normal((k, cin, cout)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    return {"params": {"kernel": kernel, "bias": bias}}


@pytest.mark.parametrize("kernel,stride,T", [(3, 1, 32), (3, 2, 32), (3, 2, 31), (1, 1, 17)])
def test_conv_impls_match(rng, kernel, stride, T):
    cin, cout = 8, 12
    x = jnp.asarray(rng.standard_normal((2, T, cin)), jnp.float32)
    p = _params(rng, kernel, cin, cout)

    y_xla = Conv1dSame(cout, kernel, stride=stride, impl="xla").apply(p, x)
    y_mm = Conv1dSame(cout, kernel, stride=stride, impl="matmul").apply(p, x)
    assert y_xla.shape == y_mm.shape
    np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_mm), rtol=1e-5, atol=1e-5)


def test_conv_impl_grads_match(rng):
    cin, cout, T = 8, 12, 32
    x = jnp.asarray(rng.standard_normal((2, T, cin)), jnp.float32)
    p = _params(rng, 3, cin, cout)

    def loss(impl, params, x):
        y = Conv1dSame(cout, 3, stride=2, impl=impl).apply(params, x)
        return jnp.sum(y**2)

    g_xla = jax.grad(lambda p_, x_: loss("xla", p_, x_), argnums=(0, 1))(p, x)
    g_mm = jax.grad(lambda p_, x_: loss("matmul", p_, x_), argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_xla), jax.tree_util.tree_leaves(g_mm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_upsample_polyphase_matches_repeat_conv(rng):
    from latent_diffusion_speech_tpu.models.diffusion.unet1d import Upsample1D

    cin = 8
    for T in (16, 17):
        x = jnp.asarray(rng.standard_normal((2, T, cin)), jnp.float32)
        up_xla = Upsample1D(cin, conv_impl="xla")
        up_mm = Upsample1D(cin, conv_impl="matmul")
        p = up_xla.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
            up_mm.init(jax.random.PRNGKey(0), x)
        )
        y_xla = up_xla.apply(p, x)
        y_mm = up_mm.apply(p, x)
        assert y_xla.shape == y_mm.shape == (2, 2 * T, cin)
        np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_mm), rtol=1e-5, atol=1e-5)


def test_unet_conv_impls_same_params_same_output(rng):
    cfg = dict(
        in_channels=12, out_channels=4, block_out_channels=(8, 8),
        layers_per_block=1, n_heads=2, cross_attn=(True, False),
    )
    x = jnp.asarray(rng.standard_normal((2, 16, 12)), jnp.float32)
    t = jnp.asarray([3, 7], jnp.int32)

    unet_xla = UNet1D(UNet1DConfig(**cfg, conv_impl="xla"))
    unet_mm = UNet1D(UNet1DConfig(**cfg, conv_impl="matmul"))
    params = unet_xla.init(jax.random.PRNGKey(0), x, t)

    # identical param pytree -> checkpoints interchangeable between impls
    mm_params = unet_mm.init(jax.random.PRNGKey(0), x, t)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(mm_params)

    y_xla = unet_xla.apply(params, x, t)
    y_mm = unet_mm.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(y_xla), np.asarray(y_mm), rtol=2e-4, atol=2e-4)
