"""Import a reference Unit2Mel torch checkpoint (full model: embeds + UNet)
and verify numerical parity of condition + denoise."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent_diffusion_speech_tpu.models.diffusion import Unit2Mel, Unit2MelConfig
from latent_diffusion_speech_tpu.models.diffusion.import_torch import unit2mel_params_from_torch

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "diffusion")), reason="reference not mounted"
)

CFG = Unit2MelConfig(
    input_channel=16, n_spk=4, use_pitch_aug=False, out_dims=8, n_hidden=12,
    block_out_channels=(16, 24, 32, 32), n_layers=1, n_heads=4,
)


@pytest.fixture(scope="module")
def ref_model():
    torch = pytest.importorskip("torch")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    # stub the reference's unavailable heavy deps (torchaudio/librosa/fairseq)
    # so its unit2mel module imports; none are used by the code under test
    import types

    for name in (
        "torchaudio", "torchaudio.transforms", "librosa", "librosa.filters",
        "librosa.core", "fairseq", "pynvml", "vector_quantize_pytorch", "soundfile",
    ):
        if name not in sys.modules:
            import importlib.machinery

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
    from diffusion.unit2mel import Unit2Mel as RefUnit2Mel

    # the reference __init__'s actual (8-arg) signature (unit2mel.py:52)
    m = RefUnit2Mel(
        CFG.input_channel, CFG.n_spk, out_dims=CFG.out_dims, n_layers=CFG.n_layers,
        block_out_channels=CFG.block_out_channels, n_heads=CFG.n_heads,
        n_hidden=CFG.n_hidden, acoustic_scale=1.0,
    ).eval()
    return m


class TestUnit2MelImport:
    def test_condition_and_denoise_parity(self, ref_model, rng):
        torch = pytest.importorskip("torch")
        params = jax.tree_util.tree_map(
            jnp.asarray, unit2mel_params_from_torch(ref_model.state_dict(), CFG)
        )
        module = Unit2Mel(CFG)

        units = rng.standard_normal((2, 16, CFG.input_channel)).astype(np.float32)
        spk = np.ones((2, 1), np.int64)

        # condition: unit_embed + spk_embed(spk-1)
        with torch.no_grad():
            ref_cond = (
                ref_model.unit_embed(torch.from_numpy(units))
                + ref_model.spk_embed(torch.from_numpy(spk) - 1)
            ).numpy()
        cond = module.apply(
            {"params": params}, jnp.asarray(units), None, jnp.asarray(spk.astype(np.int32)),
            None, method=module.condition,
        )
        np.testing.assert_allclose(np.asarray(cond), ref_cond, atol=1e-5)

        # denoiser: channel-concat input through the UNet
        x = rng.standard_normal((2, 16, CFG.out_dims + CFG.n_hidden)).astype(np.float32)
        t = np.array([3, 17], np.int64)
        with torch.no_grad():
            ref_eps = (
                ref_model.decoder.denoise_fn(
                    torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(t)
                ).sample.numpy()
            )
        eps = module.apply({"params": params}, jnp.asarray(x), jnp.asarray(t), method=module.denoise)
        np.testing.assert_allclose(
            np.asarray(eps).transpose(0, 2, 1), ref_eps, atol=2e-4, rtol=1e-3
        )
