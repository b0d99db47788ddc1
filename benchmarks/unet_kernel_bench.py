"""Fused/streamed Pallas vs XLA UNet denoiser step at serve geometry
(B=1, T=448).

Measured result (see ops/pallas/unet1d_stream.py docstring for the full
analysis): the step is weight-bandwidth-bound (~187 MB/step, one DMA queue
~177 GB/s, multi-queue aggregate ~240-350 GB/s, XLA effective ~220 GB/s),
so neither kernel beats XLA — this bench exists to keep that measurement
reproducible.

Timing per the relay methodology (DESIGN.md): prime every program with ~30
unmeasured executions, then chain N executions with one terminal fetch.

Run ON the TPU chip: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/unet_kernel_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from latent_diffusion_speech_tpu.models.diffusion.unet1d import UNet1D, UNet1DConfig
from latent_diffusion_speech_tpu.ops.pallas.unet1d_fused import pack_unet_params, unet_fwd_pallas
from latent_diffusion_speech_tpu.ops.pallas.unet1d_stream import (
    pack_unet_params_stream,
    unet_fwd_pallas_stream,
)

T = 448
PRIME = 30
N = 100


def chain_time(fn, x, t, n=N, prime=PRIME):
    # prime
    y = x
    for i in range(prime):
        y = fn(y, t)
    float(np.asarray(y[0, 0, 0], np.float32))
    # chained-amortized timing
    t0 = time.perf_counter()
    y = x
    for i in range(n):
        y = fn(y, t)
    float(np.asarray(y[0, 0, 0], np.float32))
    return (time.perf_counter() - t0) / n


def main():
    cfg = UNet1DConfig()
    mod = UNet1D(cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, T, cfg.in_channels), jnp.bfloat16)
    t = jnp.array([437.0], jnp.float32)

    init = jax.jit(lambda r, x, t: mod.init(r, x, t))
    params = init(jax.random.PRNGKey(0), x, t)["params"]

    # params as explicit args (closure would inline weights into the HLO)
    def xla_fn(params, x, t):
        eps = mod.apply({"params": params}, x, t)
        return jnp.concatenate([eps, x[..., cfg.out_channels :]], axis=-1)

    def pallas_fn(packed, x, t):
        eps = unet_fwd_pallas(packed, x, t, cfg)
        return jnp.concatenate([eps, x[..., cfg.out_channels :]], axis=-1)

    xla_j = jax.jit(xla_fn)
    pallas_j = jax.jit(pallas_fn)
    pack_j = jax.jit(lambda p: pack_unet_params(p, cfg))

    print("compiling xla step...")
    t_xla = chain_time(lambda x, t: xla_j(params, x, t), x, t)
    print(f"xla step:    {t_xla*1e3:.3f} ms")

    print("packing + compiling pallas step (v1 segmented)...")
    packed = jax.block_until_ready(pack_j(params))
    t_pal = chain_time(lambda x, t: pallas_j(packed, x, t), x, t)
    print(f"pallas v1 step: {t_pal*1e3:.3f} ms   ({t_xla/t_pal:.2f}x)")

    def stream_fn(packed, x, t):
        eps = unet_fwd_pallas_stream(packed, x, t, cfg)
        return jnp.concatenate([eps, x[..., cfg.out_channels :]], axis=-1)

    stream_j = jax.jit(stream_fn)
    print("packing + compiling pallas step (v2 streamed)...")
    packed2 = jax.block_until_ready(jax.jit(lambda p: pack_unet_params_stream(p, cfg))(params))
    t_str = chain_time(lambda x, t: stream_j(packed2, x, t), x, t)
    print(f"pallas v2 step: {t_str*1e3:.3f} ms   ({t_xla/t_str:.2f}x)")

    # numerical sanity on-chip
    a = np.asarray(xla_j(params, x, t)[..., : cfg.out_channels], np.float32)
    b = np.asarray(pallas_j(packed, x, t)[..., : cfg.out_channels], np.float32)
    c = np.asarray(stream_j(packed2, x, t)[..., : cfg.out_channels], np.float32)
    print("v1 corr", np.corrcoef(a.ravel(), b.ravel())[0, 1], "max abs diff", np.abs(a - b).max())
    print("v2 corr", np.corrcoef(a.ravel(), c.ravel())[0, 1], "max abs diff", np.abs(a - c).max())


if __name__ == "__main__":
    main()
