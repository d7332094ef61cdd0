"""TPU-native training-free spatial control for Stable Diffusion.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
duongve13112002/DiffusionSpatialControl (see SURVEY.md): region-mask
cross-attention bias with noise-adaptive strength, the full k-diffusion
sampler family as lax.scan loops, CFG, ControlNet / T2I-Adapter / IP-Adapter,
img2img / inpainting / hires-fix, A1111 prompt weighting, and device-mesh
batched serving.
"""

from .config import (  # noqa: F401
    CLIPTextConfig,
    GenerationConfig,
    ModelConfig,
    UNetConfig,
    VAEConfig,
    sd15_config,
    sd21_config,
)

__version__ = "0.1.0"
