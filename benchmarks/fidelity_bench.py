"""End-to-end fidelity vs the PyTorch reference (the BASELINE MCD target).

Measures mel MCD between the reference stack and this framework running the
SAME serve chain from the SAME weights and the SAME initial noise:

    units -> Unit2Mel condition -> DPM-Solver++ (20 steps, order 2,
    time_uniform multistep) -> latent -> HiFi-VAEGAN Generator -> waveform
    -> log-mel -> MCD / log-spectral distance

Reference side: the reference's own `diffusion.unit2mel.Unit2Mel` +
`GaussianDiffusion.forward(infer=True)` (`/root/reference/diffusion/
diffusion.py:189-343`) and its own `Generator` (`encoder/hifi_vaegan/modules/
models.py:224-264`), in torch.  Our side: the imported parameters through the
jitted JAX chain.  Flagship geometry (1280-d units, 128 latent bins,
block_out_channels (256, 384, 512, 512), hop-512 vocoder).

Weights are synthesized (torch default init; real pretrained blobs are not in
this environment — TODO.md) and imported via the same converters the serve
loader uses, so the number measures *implementation* fidelity of the full
chain, which is exactly the BASELINE "mel MCD <= 0.5 dB vs PyTorch reference"
claim.

Writes benchmarks/FIDELITY.json and prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")  # torch comparison: no TPU needed
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from bench import probe_devices

    probe_devices(metric="fidelity_bench")  # fail fast if the relay is wedged

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REFERENCE = "/root/reference"
T_FRAMES = 176          # ~2 s at 86 fps; multiple of the UNet's 8x grid
STEPS_SPEEDUP = 50      # k_step 1000 // 50 = 20 solver steps (BASELINE row)
SPK = 5


def _stub_reference_deps():
    import importlib.machinery
    import types

    for name in (
        "torchaudio", "torchaudio.transforms", "librosa", "librosa.filters",
        "librosa.core", "fairseq", "pynvml", "vector_quantize_pytorch", "soundfile",
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    sys.modules["torchaudio"].transforms = sys.modules["torchaudio.transforms"]
    sys.modules["torchaudio.transforms"].Resample = object
    sys.modules["fairseq"].checkpoint_utils = types.SimpleNamespace()
    sys.modules["librosa"].filters = sys.modules["librosa.filters"]
    sys.modules["librosa"].core = sys.modules["librosa.core"]
    sys.modules["librosa.filters"].mel = lambda **kw: None
    sys.modules["vector_quantize_pytorch"].VectorQuantize = object
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def _find_real_weights():
    """Locate real pretrained blobs if any exist (they are absent from the
    build environment; the day they appear this bench re-measures against
    them with NO flag changes).  Search order: $REAL_WEIGHTS_DIR, ./pretrain.
    Expects the reference layouts: exp-style diffusion `model_*.pt`
    (tools/saver.py:85-109) and a HiFi-VAEGAN dir with decoder.pth
    (hifi_vaegan.py:6-8)."""
    import os
    from glob import glob

    roots = [p for p in (os.environ.get("REAL_WEIGHTS_DIR"), "pretrain") if p]
    found = {}
    for root in roots:
        diff = sorted(glob(str(Path(root) / "**" / "model_*.pt"), recursive=True))
        if diff and "diffusion" not in found:
            found["diffusion"] = diff[-1]
        dec = sorted(glob(str(Path(root) / "**" / "decoder.pth"), recursive=True))
        if dec and "vocoder" not in found:
            found["vocoder"] = dec[-1]
    return found


def main():
    import torch

    _stub_reference_deps()
    torch.manual_seed(123)
    real = _find_real_weights()

    from latent_diffusion_speech_tpu.models.diffusion import Unit2Mel, Unit2MelConfig
    from latent_diffusion_speech_tpu.models.diffusion.import_torch import (
        unit2mel_params_from_torch,
    )
    from latent_diffusion_speech_tpu.models.diffusion.samplers import dpmpp_sample
    from latent_diffusion_speech_tpu.models.diffusion.schedule import NoiseSchedule
    from latent_diffusion_speech_tpu.models.vaegan import VAEGANConfig
    from latent_diffusion_speech_tpu.models.vaegan.models import Generator as JaxGenerator
    from latent_diffusion_speech_tpu.models.vaegan.import_torch import (
        generator_params_from_torch,
    )
    from latent_diffusion_speech_tpu.ops.metrics import log_spectral_distance, mcd
    from latent_diffusion_speech_tpu.ops.stft import MelSpectrogram

    from diffusion.unit2mel import Unit2Mel as RefUnit2Mel
    from encoder.hifi_vaegan.modules.models import Generator as RefGenerator

    cfg = Unit2MelConfig(use_pitch_aug=False)  # flagship; ref ctor has no aug embed
    ref = RefUnit2Mel(
        cfg.input_channel, cfg.n_spk, out_dims=cfg.out_dims, n_layers=cfg.n_layers,
        block_out_channels=cfg.block_out_channels, n_heads=cfg.n_heads,
        n_hidden=cfg.n_hidden, acoustic_scale=cfg.acoustic_scale,
    ).eval()
    if "diffusion" in real:
        ckpt = torch.load(real["diffusion"], map_location="cpu", weights_only=False)
        try:
            ref.load_state_dict(ckpt.get("model", ckpt))
        except RuntimeError as e:
            # non-flagship geometry: fidelity still runs on synthesized
            # weights; use cli/verify_import for arbitrary-geometry parity
            print(f"[fidelity] real diffusion ckpt geometry mismatch: {e}",
                  file=sys.stderr)
            real.pop("diffusion")
    params = jax.tree_util.tree_map(
        jnp.asarray, unit2mel_params_from_torch(ref.state_dict(), cfg)
    )
    module = Unit2Mel(cfg)

    vcfg = VAEGANConfig()  # flagship hop-512 / 128-bin generator
    h = {
        "sampling_rate": vcfg.sampling_rate, "inter_channels": vcfg.inter_channels,
        "resblock": vcfg.resblock,
        "resblock_kernel_sizes": list(vcfg.resblock_kernel_sizes),
        "resblock_dilation_sizes": [list(d) for d in vcfg.resblock_dilation_sizes],
        "upsample_rates": list(vcfg.upsample_rates),
        "upsample_initial_channel": vcfg.upsample_initial_channel,
        "upsample_kernel_sizes": list(vcfg.upsample_kernel_sizes),
    }
    if "vocoder" in real:
        vckpt = torch.load(real["vocoder"], map_location="cpu", weights_only=False)
        h = vckpt.get("config", h)
        vcfg = VAEGANConfig.from_torch_h(h)
    ref_gen = RefGenerator(h).eval()
    if "vocoder" in real:
        ref_gen.load_state_dict(vckpt["model"])
        ref_gen.eval()
    gen_params = jax.tree_util.tree_map(
        jnp.asarray, generator_params_from_torch(ref_gen.state_dict(), vcfg)
    )
    jax_gen = JaxGenerator(vcfg)

    # fixed inputs: semantic tokens -> k-means centroid unit embeddings
    rng = np.random.default_rng(0)
    centroids = rng.standard_normal((4096, cfg.input_channel)).astype(np.float32)
    tokens = rng.integers(0, 4096, T_FRAMES)
    units = centroids[tokens][None]  # (1, T, 1280)
    spk = np.full((1, 1), SPK, np.int64)

    # ---- reference chain (torch) -------------------------------------------
    with torch.no_grad():
        cond_t = ref.unit_embed(torch.from_numpy(units)) + ref.spk_embed(
            torch.from_numpy(spk) - 1
        )
        torch.manual_seed(0)  # decoder.forward draws x_T = torch.randn(shape)
        t0 = time.time()
        mel_ref = ref.decoder(
            cond_t, gt_spec=None, infer=True, infer_speedup=STEPS_SPEEDUP,
            method="dpm-solver",
        ).numpy()  # (1, T, 128)
        ref_sample_s = time.time() - t0
        wav_ref = ref_gen(torch.from_numpy(mel_ref).transpose(1, 2))[:, 0].numpy()

    # the exact x_T the reference drew, for a same-noise comparison
    torch.manual_seed(0)
    x_T = torch.randn((1, 1, cfg.out_dims, T_FRAMES)).numpy()

    # ---- this framework (jax) ----------------------------------------------
    def jax_chain(params, gen_params, units, spk_id, x_init):
        cond = module.apply(
            {"params": params}, units, None, spk_id, None, method=module.condition
        )

        def eps_fn(x, t):
            return module.apply(
                {"params": params},
                jnp.concatenate([x, cond.astype(x.dtype)], axis=-1),
                t,
                method=module.denoise,
            )

        ns = NoiseSchedule(np.linspace(1e-4, 0.02, cfg.timesteps))
        mel = dpmpp_sample(
            eps_fn, ns, x_init, steps=cfg.k_step // STEPS_SPEEDUP, order=2
        )
        wav = jax_gen.apply({"params": gen_params}, mel)
        return mel, wav

    x_init = jnp.asarray(x_T[:, 0].transpose(0, 2, 1))  # (1, T, 128)
    t0 = time.time()
    mel_jax, wav_jax = jax.jit(jax_chain)(
        params, gen_params, jnp.asarray(units), jnp.asarray(spk.astype(np.int32)), x_init
    )
    mel_jax = np.asarray(mel_jax)
    wav_jax = np.asarray(wav_jax)
    jax_sample_s = time.time() - t0

    # ---- metrics -------------------------------------------------------------
    melspec = MelSpectrogram(sr=vcfg.sampling_rate)
    logmel_ref = np.asarray(melspec(jnp.asarray(wav_ref))).transpose(0, 2, 1)
    logmel_jax = np.asarray(melspec(jnp.asarray(wav_jax))).transpose(0, 2, 1)

    mcd_db = float(mcd(jnp.asarray(logmel_jax), jnp.asarray(logmel_ref)))
    lsd_db = float(log_spectral_distance(jnp.asarray(logmel_jax), jnp.asarray(logmel_ref)))
    latent_err = float(np.max(np.abs(mel_jax - mel_ref)))
    wav_err = float(np.max(np.abs(wav_jax - wav_ref)))

    # ---- bf16 SHIPPING configuration row ------------------------------------
    # The serve chain behind the headline RTF runs dtype=bf16 modules
    # (bench.py build_pipeline); measure ITS fidelity vs the same torch f32
    # reference, same weights, same x_T — through the serve-facing system
    # objects rather than raw module calls.  "--tpu" runs it on the chip the
    # number ships on (bf16 rounding is hardware-exact there).
    from latent_diffusion_speech_tpu.models.diffusion import Unit2MelSystem

    system_bf16 = Unit2MelSystem(cfg, params=params, dtype=jnp.bfloat16)
    gen_bf16 = JaxGenerator(vcfg, dtype=jnp.bfloat16)

    def bf16_chain(params, gen_params, units, spk_id, x_init):
        mel = system_bf16.infer(
            units, jax.random.PRNGKey(0), spk_id=spk_id, method="dpm-solver",
            infer_speedup=STEPS_SPEEDUP, params=params, x_init=x_init,
        )
        wav = gen_bf16.apply({"params": gen_params}, mel)
        return mel, wav

    t0 = time.time()
    mel_b, wav_b = jax.jit(bf16_chain)(
        params, gen_params, jnp.asarray(units),
        jnp.asarray(spk.astype(np.int32)), x_init,
    )
    mel_b = np.asarray(mel_b, np.float32)
    wav_b = np.asarray(wav_b, np.float32)
    bf16_sample_s = time.time() - t0
    logmel_b = np.asarray(melspec(jnp.asarray(wav_b))).transpose(0, 2, 1)
    bf16_row = {
        "mcd_db": round(float(mcd(jnp.asarray(logmel_b), jnp.asarray(logmel_ref))), 6),
        "lsd_db": round(float(log_spectral_distance(
            jnp.asarray(logmel_b), jnp.asarray(logmel_ref))), 6),
        "latent_max_abs_err": float(np.max(np.abs(mel_b - mel_ref))),
        "wav_max_abs_err": float(np.max(np.abs(wav_b - wav_ref))),
        "platform": jax.devices()[0].platform,
        "wall_s_incl_compile": round(bf16_sample_s, 3),
        "config": "dtype=bfloat16 modules end-to-end (serve build_pipeline "
                  "config), same weights + same x_T as the f32 row",
    }

    # ---- int8 weight-quant row ----------------------------------------------
    # The serve-candidate configuration: bf16 modules + int8-quantized UNet
    # matmul kernels dequantized inside the sampler scan (ops/weight_quant.py).
    # Same weights + same x_T; its MCD must stay inside the 0.5 dB budget for
    # int8 to be adoptable (benchmarks/int8_serve_ab.py carries the speed A/B).
    system_int8 = Unit2MelSystem(
        cfg, params=params, dtype=jnp.bfloat16, weight_quant="int8"
    )

    def int8_chain(params, gen_params, units, spk_id, x_init):
        mel = system_int8.infer(
            units, jax.random.PRNGKey(0), spk_id=spk_id, method="dpm-solver",
            infer_speedup=STEPS_SPEEDUP, params=params, x_init=x_init,
        )
        wav = gen_bf16.apply({"params": gen_params}, mel)
        return mel, wav

    t0 = time.time()
    mel_q, wav_q = jax.jit(int8_chain)(
        params, gen_params, jnp.asarray(units),
        jnp.asarray(spk.astype(np.int32)), x_init,
    )
    mel_q = np.asarray(mel_q, np.float32)
    wav_q = np.asarray(wav_q, np.float32)
    int8_sample_s = time.time() - t0
    logmel_q = np.asarray(melspec(jnp.asarray(wav_q))).transpose(0, 2, 1)
    int8_row = {
        "mcd_db": round(float(mcd(jnp.asarray(logmel_q), jnp.asarray(logmel_ref))), 6),
        "lsd_db": round(float(log_spectral_distance(
            jnp.asarray(logmel_q), jnp.asarray(logmel_ref))), 6),
        "latent_max_abs_err": float(np.max(np.abs(mel_q - mel_ref))),
        "wav_max_abs_err": float(np.max(np.abs(wav_q - wav_ref))),
        "platform": jax.devices()[0].platform,
        "wall_s_incl_compile": round(int8_sample_s, 3),
        "config": "dtype=bfloat16 modules + weight_quant='int8' UNet sampling "
                  "(serve candidate), same weights + same x_T as the f32 row",
    }

    result = {
        "metric": "e2e_mel_mcd_vs_torch_reference",
        "value": round(mcd_db, 6),
        "unit": "dB",
        "vs_baseline": round(0.5 / max(mcd_db, 1e-12), 2),
        "detail": {
            "target_mcd_db": 0.5,
            "lsd_db": round(lsd_db, 6),
            "latent_max_abs_err": latent_err,
            "wav_max_abs_err": wav_err,
            "solver": "dpm-solver++ 20 steps order 2 time_uniform multistep",
            "geometry": "flagship: 1280-d units, 128 bins, (256,384,512,512), hop-512 generator",
            "frames": T_FRAMES,
            "audio_seconds": T_FRAMES * 512 / vcfg.sampling_rate,
            "same_weights": True,
            "same_initial_noise": True,
            "ref_sample_wall_s": round(ref_sample_s, 3),
            "jax_sample_wall_s_incl_compile": round(jax_sample_s, 3),
            "bf16_shipping": bf16_row,
            "int8_shipping": int8_row,
            "weights": {"diffusion": real.get("diffusion", "synthesized"),
                        "vocoder": real.get("vocoder", "synthesized")},
            "note": ("REAL pretrained weights" if real else
                     "synthesized weights (real pretrained blobs absent from env)")
                    + "; measures fidelity of the full serve chain",
        },
    }
    out = Path(__file__).parent / "FIDELITY.json"
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
