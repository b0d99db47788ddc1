"""int8 serve-weight quantization (ops/weight_quant.py).

Unit bounds on the quantizer itself plus an end-to-end sampler A/B through
Unit2MelSystem(weight_quant='int8') on a tiny config.  The on-TPU perf
result is recorded in TODO.md: ~5% at B=1 (the step is op/MXU-floor-bound,
not weight-bandwidth-bound), so this is an opt-in, not a default.
"""

import jax
import jax.numpy as jnp
import numpy as np

from latent_diffusion_speech_tpu.models.diffusion.unit2mel import Unit2MelConfig, Unit2MelSystem
from latent_diffusion_speech_tpu.ops.weight_quant import (
    QuantizedLeaf,
    dequantize_tree,
    quantize_tree_int8,
)


def test_roundtrip_error_bound(rng):
    w = jnp.asarray(rng.standard_normal((3, 64, 96)).astype(np.float32)) * 0.1
    tree = {"conv": {"kernel": w, "bias": jnp.zeros((96,))}}
    q = quantize_tree_int8(tree, min_size=1024)
    assert isinstance(q["conv"]["kernel"], QuantizedLeaf)
    assert q["conv"]["kernel"].q.dtype == jnp.int8
    # bias is 1-D -> passthrough
    assert not isinstance(q["conv"]["bias"], QuantizedLeaf)

    d = dequantize_tree(q, dtype=jnp.float32, barrier=False)
    # symmetric per-out-channel: rounding error <= scale/2, plus up to
    # |q| * scale * 2^-8 from the bf16-stored scale (|q| <= 127 -> ~scale/2)
    scale = np.abs(np.asarray(w)).max(axis=(0, 1)) / 127.0
    err = np.abs(np.asarray(d["conv"]["kernel"]) - np.asarray(w))
    assert (err <= scale[None, None, :] * 1.05 + 1e-6).all()


def test_small_leaves_pass_through(rng):
    tree = {"scale": jnp.ones((64,)), "tiny": jnp.ones((4, 4))}
    q = quantize_tree_int8(tree, min_size=4096)
    assert not any(isinstance(x, QuantizedLeaf) for x in jax.tree_util.tree_leaves(
        q, is_leaf=lambda x: isinstance(x, QuantizedLeaf)) if hasattr(x, "dtype"))
    d = dequantize_tree(q)
    np.testing.assert_array_equal(np.asarray(d["scale"]), np.asarray(tree["scale"]))


def test_quantized_tree_is_jit_transparent(rng):
    """quantize inside jit, dequant inside a scan body with the barrier —
    the shapes/dtypes must be stable and the result finite."""
    w = jnp.asarray(rng.standard_normal((128, 64)).astype(np.float32))

    def f(w, x):
        q = quantize_tree_int8({"k": w}, min_size=64)

        def body(c, _):
            d = dequantize_tree(q, dtype=jnp.float32)
            return jnp.tanh(c @ d["k"] @ d["k"].T), 0

        return jax.lax.scan(body, x, None, length=3)[0]

    out = jax.jit(f)(w, jnp.ones((4, 128)))
    assert np.isfinite(np.asarray(out)).all()


def test_sampler_int8_matches_fp(rng):
    cfg = Unit2MelConfig(
        input_channel=16, n_spk=4, out_dims=8, n_hidden=16,
        block_out_channels=(16, 24), n_layers=1, n_heads=4,
        timesteps=50, k_step=50,
    )
    sys_fp = Unit2MelSystem(cfg, dtype=jnp.bfloat16, seed=0)
    sys_q = Unit2MelSystem(cfg, params=sys_fp.params, dtype=jnp.bfloat16, weight_quant="int8")

    units = jax.random.normal(jax.random.PRNGKey(3), (1, 16, cfg.input_channel), jnp.bfloat16)
    spk = jnp.ones((1, 16), jnp.int32)
    key = jax.random.PRNGKey(7)
    a = np.asarray(sys_fp.infer(units, key, spk_id=spk, method="dpm-solver", infer_speedup=10), np.float32)
    b = np.asarray(sys_q.infer(units, key, spk_id=spk, method="dpm-solver", infer_speedup=10), np.float32)
    assert a.shape == b.shape
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.99, corr


def test_weight_quant_validation():
    cfg = Unit2MelConfig(
        input_channel=16, n_spk=4, out_dims=8, n_hidden=16,
        block_out_channels=(16, 24), n_layers=1, n_heads=4,
    )
    import pytest
    with pytest.raises(ValueError):
        Unit2MelSystem(cfg, weight_quant="fp4")
    with pytest.raises(ValueError):
        Unit2MelSystem(cfg, weight_quant="int8", unet_impl="pallas")
