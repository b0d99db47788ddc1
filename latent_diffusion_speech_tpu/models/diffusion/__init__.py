"""Latent diffusion acoustic model (L6).

Parity surface with the reference `diffusion/` package: UNet-1D conditional
denoiser, Gaussian diffusion (linear beta schedule, eps-prediction), and the
sampler suite (DDPM ancestral, DDIM, PLMS/PNDM, DPM-Solver++ multistep,
UniPC-bh2) — all re-expressed as `lax.scan` programs so an entire sampling
trajectory compiles to one XLA computation.
"""

from latent_diffusion_speech_tpu.models.diffusion.schedule import (  # noqa: F401
    DiffusionSchedule,
    NoiseSchedule,
)
from latent_diffusion_speech_tpu.models.diffusion.unet1d import UNet1D, UNet1DConfig  # noqa: F401
from latent_diffusion_speech_tpu.models.diffusion.gaussian import GaussianDiffusion  # noqa: F401
from latent_diffusion_speech_tpu.models.diffusion.unit2mel import (  # noqa: F401
    Unit2Mel,
    Unit2MelConfig,
    Unit2MelSystem,
)
from latent_diffusion_speech_tpu.models.diffusion.blocks import (  # noqa: F401
    get_down_block,
    get_mid_block,
    get_up_block,
)
from latent_diffusion_speech_tpu.models.diffusion.unet1d_condition import (  # noqa: F401
    UNet1DCondition,
    UNet1DConditionConfig,
)
