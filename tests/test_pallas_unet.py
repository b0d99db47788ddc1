"""Parity tests for the fused Pallas UNet (ops/pallas/unet1d_fused.py).

Interpret mode on CPU; the kernel computes in bf16 (the serve dtype) so
parity is asserted against the flax module run in bf16, with the flax f32
output as the scale reference.  On-TPU timing is benchmarks/unet_kernel_bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_speech_tpu.models.diffusion.unet1d import UNet1D, UNet1DConfig
from latent_diffusion_speech_tpu.models.diffusion.unit2mel import Unit2MelConfig, Unit2MelSystem
from latent_diffusion_speech_tpu.ops.pallas.unet1d_fused import (
    build_unet_plan,
    pack_unet_params,
    unet_fwd_pallas,
    _op_weight_shapes,
)

TINY = UNet1DConfig(
    in_channels=24,
    out_channels=8,
    block_out_channels=(16, 24),
    layers_per_block=1,
    n_heads=4,
    norm_num_groups=8,
)


def _flax_and_kernel(cfg, T, seed=0):
    mod = UNet1D(cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (1, T, cfg.in_channels), jnp.bfloat16)
    t = jnp.array([437.0], jnp.float32)
    params = mod.init(jax.random.PRNGKey(seed), x, t)["params"]
    ref = np.asarray(mod.apply({"params": params}, x, t), np.float32)
    packed = pack_unet_params(params, cfg)
    got = np.asarray(unet_fwd_pallas(packed, x, t, cfg, interpret=True), np.float32)
    # f32 flax as the scale/agreement reference
    mod32 = UNet1D(cfg, dtype=jnp.float32)
    ref32 = np.asarray(
        mod32.apply({"params": jax.tree.map(lambda a: a.astype(jnp.float32), params)},
                    x.astype(jnp.float32), t),
        np.float32,
    )
    return ref, got, ref32


def test_plan_matches_packed_weights():
    ops, n_res = build_unet_plan(TINY)
    mod = UNet1D(TINY, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 16, TINY.in_channels), jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))["params"]
    packed = pack_unet_params(params, TINY)
    want = sum(len(_op_weight_shapes(op)) for op in ops)
    assert len(packed["weights"]) == want
    for arr, (sh, dt) in zip(
        packed["weights"],
        [s for op in ops for s in _op_weight_shapes(op)],
    ):
        assert tuple(arr.shape) == sh and arr.dtype == dt


def test_forward_parity_tiny():
    ref, got, ref32 = _flax_and_kernel(TINY, T=16)
    scale = np.abs(ref32).max()
    # kernel-vs-flax-bf16 disagreement must be same order as bf16 rounding
    bf16_err = np.abs(ref - ref32).max()
    kern_err = np.abs(got - ref).max()
    assert kern_err <= max(4 * bf16_err, 0.02 * scale), (kern_err, bf16_err, scale)
    corr = np.corrcoef(got.ravel(), ref32.ravel())[0, 1]
    assert corr > 0.999, corr


def test_forward_parity_uneven_channels():
    # channel change across down/up + no-attn final block, odd head dims
    cfg = UNet1DConfig(
        in_channels=16, out_channels=8, block_out_channels=(16, 32, 32),
        layers_per_block=2, n_heads=4, norm_num_groups=8,
        cross_attn=(True, True, False),
    )
    ref, got, ref32 = _flax_and_kernel(cfg, T=32)
    corr = np.corrcoef(got.ravel(), ref32.ravel())[0, 1]
    assert corr > 0.999, corr
    assert np.abs(got - ref).max() <= max(4 * np.abs(ref - ref32).max(), 0.02 * np.abs(ref32).max())


def test_sampler_wiring_matches_xla():
    """Unit2MelSystem(unet_impl='pallas') must produce the same trajectory as
    the XLA path through the real sampler scan (same rng, same weights)."""
    cfg = Unit2MelConfig(
        input_channel=16, n_spk=4, out_dims=8, n_hidden=16,
        block_out_channels=(16, 24), n_layers=1, n_heads=4,
        timesteps=50, k_step=50,
    )
    sys_xla = Unit2MelSystem(cfg, dtype=jnp.bfloat16, seed=0, unet_impl="xla")
    sys_pal = Unit2MelSystem(cfg, params=sys_xla.params, dtype=jnp.bfloat16, unet_impl="pallas")

    units = jax.random.normal(jax.random.PRNGKey(3), (1, 16, cfg.input_channel), jnp.bfloat16)
    spk = jnp.ones((1, 16), jnp.int32)
    rng = jax.random.PRNGKey(7)
    a = np.asarray(sys_xla.infer(units, rng, spk_id=spk, method="dpm-solver", infer_speedup=10), np.float32)
    b = np.asarray(sys_pal.infer(units, rng, spk_id=spk, method="dpm-solver", infer_speedup=10), np.float32)
    assert a.shape == b.shape
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.99, corr
    assert np.abs(a - b).max() < 0.15 * max(np.abs(a).max(), 1.0), np.abs(a - b).max()


def test_batched_sampling_falls_back_to_xla():
    """B>1 must run the flax path (kernel is B=1-only) and still work."""
    cfg = Unit2MelConfig(
        input_channel=16, n_spk=4, out_dims=8, n_hidden=16,
        block_out_channels=(16, 24), n_layers=1, n_heads=4,
        timesteps=50, k_step=50,
    )
    sys_pal = Unit2MelSystem(cfg, dtype=jnp.bfloat16, seed=0, unet_impl="pallas")
    units = jax.random.normal(jax.random.PRNGKey(3), (2, 16, cfg.input_channel), jnp.bfloat16)
    spk = jnp.ones((2, 16), jnp.int32)
    out = sys_pal.infer(units, jax.random.PRNGKey(7), spk_id=spk, method="dpm-solver", infer_speedup=25)
    assert out.shape == (2, 16, cfg.out_dims)
    assert np.isfinite(np.asarray(out, np.float32)).all()


@pytest.mark.slow
def test_forward_parity_flagship():
    cfg = UNet1DConfig()  # flagship geometry (256,384,512,512)
    ref, got, ref32 = _flax_and_kernel(cfg, T=64)
    corr = np.corrcoef(got.ravel(), ref32.ravel())[0, 1]
    assert corr > 0.999, corr
    assert np.abs(got - ref).max() <= max(4 * np.abs(ref - ref32).max(), 0.02 * np.abs(ref32).max())
