"""Per-step divergence of the 20-step DPM-Solver++ trajectory: TPU vs CPU f32.

VERDICT round-4 weak #5: the f32-on-TPU fidelity row shows latent
max-abs-err ~0.97 (on latents clamped to +/-10) vs the torch reference,
while the f32-on-CPU row shows ~1e-3 — so the deviation is TPU matmul
numerics amplified through the solver.  This script answers HOW it grows:
the same jax chain (same flagship Unit2Mel weights, same conditioning, same
x_T) runs step-instrumented on the TPU and on the host CPU backend, and we
record per-step max-abs / rms deviation between the two trajectories.

Interpretation key:
- smooth geometric growth => benign rounding accumulation through the
  recursive x-update (each step feeds the perturbed x back into the UNet);
- a single step where the error jumps orders of magnitude => a divergent
  op worth hunting (e.g. a cancellation in the solver coefficients).

Writes benchmarks/FIDELITY_DIVERGENCE.json and merges a summary into
FIDELITY.json detail.divergence_analysis.  Run WITH the TPU visible.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

sys.path.insert(0, str(Path(__file__).parent.parent))
from bench import probe_devices  # noqa: E402

probe_devices(metric="fidelity_divergence")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

T_FRAMES = 176
STEPS = 20
SPK = 5


def main():
    from latent_diffusion_speech_tpu.models.diffusion import Unit2Mel, Unit2MelConfig
    from latent_diffusion_speech_tpu.models.diffusion.samplers import dpmpp_sample
    from latent_diffusion_speech_tpu.models.diffusion.schedule import NoiseSchedule

    cfg = Unit2MelConfig(use_pitch_aug=False)
    module = Unit2Mel(cfg)  # f32

    rng = np.random.default_rng(0)
    units = jnp.asarray(
        rng.standard_normal((1, T_FRAMES, cfg.input_channel)).astype(np.float32)
    )
    spk = jnp.full((1, 1), SPK, jnp.int32)
    x_T = jnp.asarray(
        rng.standard_normal((1, T_FRAMES, cfg.out_dims)).astype(np.float32)
    )

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        params = jax.jit(
            lambda k: module.init(k, jnp.zeros((1, 8, cfg.input_channel)),
                                  volume=None, spk_id=jnp.ones((1, 8), jnp.int32),
                                  aug_shift=None)["params"]
        )(jax.random.PRNGKey(7))

    def chain(params, units, spk_id, x_init):
        cond = module.apply(
            {"params": params}, units, None, spk_id, None, method=module.condition
        )

        def eps_fn(x, t):
            return module.apply(
                {"params": params},
                jnp.concatenate([x, cond.astype(x.dtype)], axis=-1),
                t, method=module.denoise,
            )

        ns = NoiseSchedule(np.linspace(1e-4, 0.02, cfg.timesteps))
        return dpmpp_sample(
            eps_fn, ns, x_init, steps=STEPS, order=2, return_trajectory=True
        )

    trajs = {}
    for name, dev in (("cpu", cpu), ("tpu", tpu)):
        args = jax.device_put((params, units, spk, x_T), dev)
        with jax.default_device(dev):
            x, traj = jax.jit(chain)(*args)
        trajs[name] = np.asarray(traj, np.float32)  # (STEPS, 1, T, 128)
        print(f"[divergence] {name} trajectory done", file=sys.stderr)

    a, b = trajs["tpu"], trajs["cpu"]
    per_step = []
    for i in range(STEPS):
        d = np.abs(a[i] - b[i])
        scale = max(float(np.max(np.abs(b[i]))), 1e-12)
        per_step.append({
            "step": i + 1,
            "max_abs_err": float(np.max(d)),
            "rms_err": float(np.sqrt(np.mean(d * d))),
            "state_max_abs": scale,
            "rel_max_err": float(np.max(d)) / scale,
        })

    errs = np.array([r["max_abs_err"] for r in per_step])
    ratios = errs[1:] / np.maximum(errs[:-1], 1e-30)
    # classify: a "jump" is a step whose error grows >10x over the previous
    jumps = [int(i + 2) for i, r in enumerate(ratios) if r > 10.0]
    verdict = (
        "smooth geometric accumulation (no step grows the error >10x); "
        "TPU f32 matmuls round differently per step and the solver recursion "
        "compounds it" if not jumps
        else f"error jumps >10x at step(s) {jumps} — investigate those updates"
    )

    result = {
        "metric": "tpu_vs_cpu_f32_trajectory_divergence",
        "value": float(errs[-1]),
        "unit": "max_abs_err at final step",
        "detail": {
            "per_step": per_step,
            "growth_ratio_median": float(np.median(ratios)),
            "growth_ratio_max": float(np.max(ratios)),
            "verdict": verdict,
            "config": f"flagship f32, {STEPS}-step DPM-Solver++ order 2, "
                      f"T={T_FRAMES}, same weights/cond/x_T on both backends",
            "tpu": str(tpu),
        },
    }
    out = Path(__file__).parent / "FIDELITY_DIVERGENCE.json"
    out.write_text(json.dumps(result, indent=2))

    fid_path = Path(__file__).parent / "FIDELITY.json"
    if fid_path.exists():
        fid = json.loads(fid_path.read_text())
        fid.setdefault("detail", {})["divergence_analysis"] = {
            "final_step_max_abs_err": float(errs[-1]),
            "first_step_max_abs_err": float(errs[0]),
            "growth_ratio_median": float(np.median(ratios)),
            "verdict": verdict,
            "artifact": "benchmarks/FIDELITY_DIVERGENCE.json",
        }
        fid_path.write_text(json.dumps(fid, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
