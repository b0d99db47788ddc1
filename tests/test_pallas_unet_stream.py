"""Parity tests for the streamed-weights whole-step Pallas UNet
(ops/pallas/unet1d_stream.py), interpret mode on CPU.

The kernel computes in bf16 (the serve dtype); parity is asserted against
the flax module in bf16 with the f32 flax output as the scale reference.
On-TPU numbers and the measured bandwidth analysis live in the module
docstring and benchmarks/unet_kernel_bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent_diffusion_speech_tpu.models.diffusion.unet1d import UNet1D, UNet1DConfig
from latent_diffusion_speech_tpu.ops.pallas.unet1d_stream import (
    _MAX_BLOCK_ROWS,
    build_stream_schedule,
    pack_unet_params_stream,
    unet_fwd_pallas_stream,
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
    packed = pack_unet_params_stream(params, cfg)
    got = np.asarray(unet_fwd_pallas_stream(packed, x, t, cfg, interpret=True), np.float32)
    mod32 = UNet1D(cfg, dtype=jnp.float32)
    ref32 = np.asarray(
        mod32.apply({"params": jax.tree.map(lambda a: a.astype(jnp.float32), params)},
                    x.astype(jnp.float32), t),
        np.float32,
    )
    return ref, got, ref32


def test_schedule_is_consistent():
    """Flat-buffer offsets are dense per class, chunk rows respect the cap,
    and the packed buffers match the schedule's totals."""
    ops, n_res, chunks_per_op, srow_off, flat_rows, s_rows = build_stream_schedule(TINY)
    heads = {c: 0 for c in flat_rows}
    for chunks in chunks_per_op:
        for b in chunks:
            assert b.rows <= _MAX_BLOCK_ROWS
            assert b.off == heads[b.cls]
            heads[b.cls] += b.rows16
    assert heads == flat_rows

    mod = UNet1D(TINY, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 16, TINY.in_channels), jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))["params"]
    packed = pack_unet_params_stream(params, TINY)
    for c, arr in packed["flat"].items():
        assert arr.shape == (flat_rows[c], c)
    assert packed["smalls"].shape[0] == s_rows


def test_forward_parity_tiny():
    ref, got, ref32 = _flax_and_kernel(TINY, T=16)
    scale = np.abs(ref32).max()
    bf16_err = np.abs(ref - ref32).max()
    kern_err = np.abs(got - ref).max()
    assert kern_err <= max(4 * bf16_err, 0.02 * scale), (kern_err, bf16_err, scale)
    assert np.corrcoef(got.ravel(), ref32.ravel())[0, 1] > 0.999


def test_forward_parity_chunked_rows():
    """Config whose up-path concat channels exceed _MAX_BLOCK_ROWS, forcing
    multi-chunk matmuls against column slices of the activation."""
    cfg = UNet1DConfig(
        in_channels=32, out_channels=16, block_out_channels=(256, 384),
        layers_per_block=1, n_heads=4, norm_num_groups=8,
        cross_attn=(True, False),
    )
    # up-path res cin = 384 + 384 = 768 > 512 -> split into (512, 256) chunks
    ops, _, chunks_per_op, *_ = build_stream_schedule(cfg)
    assert any(len(chunks) > 7 for op, chunks in zip(ops, chunks_per_op)
               if type(op).__name__ == "_Res"), "expected at least one chunked res block"
    ref, got, ref32 = _flax_and_kernel(cfg, T=16)
    assert np.corrcoef(got.ravel(), ref32.ravel())[0, 1] > 0.999
    assert np.abs(got - ref).max() <= max(4 * np.abs(ref - ref32).max(), 0.02 * np.abs(ref32).max())


@pytest.mark.slow
def test_forward_parity_flagship():
    cfg = UNet1DConfig()  # (256,384,512,512): wide smalls rows + all classes
    ref, got, ref32 = _flax_and_kernel(cfg, T=64)
    assert np.corrcoef(got.ravel(), ref32.ravel())[0, 1] > 0.999
    assert np.abs(got - ref).max() <= max(4 * np.abs(ref - ref32).max(), 0.02 * np.abs(ref32).max())
