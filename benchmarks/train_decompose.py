"""Decompose the flagship diffusion train step (B=256, T=88) block by block.

Round-2 established fwd 6.4 ms / bwd 12.5 ms / optimizer 4.3 ms at B=64 and
MFU 0.31 at B=256; this drills one level deeper to find WHICH blocks carry
the non-compute time before attacking with a Pallas kernel (VERDICT r2 #3).

Each component is timed scan-amortized (N applications inside ONE program —
standalone micro-jits carry 1-2 ms/exec dispatch overhead through the relay
and read up to 10x slow), primed past the relay's ~30-execution settling,
synced by scalar fetch.  Per-component FLOPs come from XLA cost_analysis of
the scan program / N, so each row reports its own achieved MFU.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/train_decompose.py
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from latent_diffusion_speech_tpu.models.diffusion.unet1d import (
    Conv1dSame,
    ResBlock1D,
    TransformerBlock1D,
    UNet1D,
    UNet1DConfig,
)
from latent_diffusion_speech_tpu.utils.flops import device_peak_flops

B, T = 256, 88
N_SCAN = 20
N_PRIME, N_TIME = 30, 30
DTYPE = jnp.bfloat16


def _note(msg):
    print(f"[decompose] {msg}", file=sys.stderr, flush=True)


def time_program(fn, *args) -> float:
    """Prime + time a jitted nullary-ish program; returns seconds/exec."""
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    for _ in range(N_PRIME):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])  # sync
    t0 = time.perf_counter()
    for _ in range(N_TIME):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])  # sync
    return (time.perf_counter() - t0) / N_TIME


def flops_of(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def scan_component(apply_fn, params, x, extra=None, grad=False):
    """Build a jitted program applying the component N_SCAN times with a data
    dependency (fresh x each iteration derived from the previous output's
    mean so XLA cannot CSE or dead-code the chain)."""

    def one(carry_x):
        if grad:
            def loss(p):
                out = apply_fn(p, carry_x, extra) if extra is not None else apply_fn(p, carry_x)
                return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6, out

            (l, out), g = jax.value_and_grad(loss, has_aux=True)(params)
            # fold a scalar from the grads into the next input
            leaf = jax.tree_util.tree_leaves(g)[0]
            bump = (l * 0 + jnp.mean(leaf) * 0).astype(carry_x.dtype)
            return (out[..., : x.shape[-1]] * 0).astype(carry_x.dtype) + carry_x + bump
        out = apply_fn(params, carry_x, extra) if extra is not None else apply_fn(params, carry_x)
        return (out[..., : x.shape[-1]] * 0 + jnp.mean(out) * 0).astype(carry_x.dtype) + carry_x

    @jax.jit
    def prog(x0):
        def body(c, _):
            return one(c), ()

        y, _ = jax.lax.scan(body, x0, None, length=N_SCAN)
        return jnp.mean(y)

    return prog


def measure(name, module, x_shape, temb=None, grad=False, results=None):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(x_shape), DTYPE)
    init_args = (x, temb) if temb is not None else (x,)
    params = module.init(jax.random.PRNGKey(0), *init_args)["params"]

    def apply_fn(p, xx, tt=None):
        return (
            module.apply({"params": p}, xx, tt)
            if tt is not None
            else module.apply({"params": p}, xx)
        )

    prog = scan_component(apply_fn, params, x, extra=temb, grad=grad)
    s = time_program(prog, x) / N_SCAN
    # XLA cost_analysis counts a scan BODY once (not x trip count), so the
    # per-iteration flops are the program's flops UNdivided
    fl = flops_of(prog, x)
    row = {
        "name": name + ("+bwd" if grad else ""),
        "shape": list(x_shape),
        "ms": s * 1e3,
        "gflops": (fl / 1e9) if fl else None,
        "mfu": (fl / s / PEAK) if fl else None,
    }
    _note(json.dumps(row))
    results.append(row)


PEAK = None


def main():
    global PEAK
    dev = jax.devices()[0]
    PEAK = device_peak_flops(dev) or 1.97e14
    results = []

    cfg = UNet1DConfig()
    # the four stage shapes of the flagship net at T=88
    stages = [(88, 256), (44, 384), (22, 512), (11, 512)]

    for t_len, ch in stages:
        temb = jnp.asarray(np.random.default_rng(1).standard_normal((B, 4 * 256)), DTYPE)
        for grad in (False, True):
            measure(
                f"resblock_T{t_len}_C{ch}",
                ResBlock1D(ch, cfg.norm_num_groups, dtype=DTYPE),
                (B, t_len, ch),
                temb=temb,
                grad=grad,
                results=results,
            )
            measure(
                f"attnblock_T{t_len}_C{ch}",
                TransformerBlock1D(ch, cfg.n_heads, cfg.norm_num_groups, dtype=DTYPE),
                (B, t_len, ch),
                grad=grad,
                results=results,
            )

    # isolated pieces at the big shape
    measure("conv_k3_T88_C256", Conv1dSame(256, 3, dtype=DTYPE), (B, 88, 256),
            grad=True, results=results)

    import flax.linen as nn

    class GNSiLU(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.GroupNorm(num_groups=8, epsilon=1e-5)(x).astype(DTYPE)
            return nn.silu(h)

    measure("gn_silu_T88_C256", GNSiLU(), (B, 88, 256), grad=True, results=results)

    # whole UNet fwd and fwd+bwd (for cross-checking the sum)
    unet = UNet1D(cfg, dtype=DTYPE)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, cfg.in_channels)), DTYPE)
    tt = jnp.asarray(np.ones((B,), np.int32))
    params = unet.init(jax.random.PRNGKey(0), x, tt)["params"]

    @jax.jit
    def fwd(p, xx):
        return jnp.mean(unet.apply({"params": p}, xx, tt))

    @jax.jit
    def fwdbwd(p, xx):
        def loss(q):
            return jnp.mean(unet.apply({"params": q}, xx, tt).astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss)(p)
        return l + 0 * jnp.mean(jax.tree_util.tree_leaves(g)[0])

    for nm, f in (("unet_fwd", fwd), ("unet_fwd+bwd", fwdbwd)):
        s = time_program(f, params, x)
        fl = flops_of(f, params, x)
        row = {"name": nm, "shape": [B, T, cfg.in_channels], "ms": s * 1e3,
               "gflops": (fl / 1e9) if fl else None,
               "mfu": (fl / s / PEAK) if fl else None}
        _note(json.dumps(row))
        results.append(row)

    print(json.dumps({"device": str(dev), "B": B, "T": T, "peak_bf16": PEAK,
                      "n_scan": N_SCAN, "results": results}))


if __name__ == "__main__":
    main()
