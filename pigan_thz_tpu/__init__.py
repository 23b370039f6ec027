"""pigan_thz_tpu — TPU-native physics-informed GAN framework for terahertz
metamaterial inverse design.

A ground-up JAX/XLA/pjit/Pallas re-design with the full capability surface of
the PyTorch reference (jianghu105/PI-GAN-THz): data pipeline + synthetic
generator, the complete model zoo (baseline + enhanced generators /
discriminators / forward surrogates), the physics-informed loss library,
fused single-program GAN training steps, multi-phase metric-gated training
programs, the four evaluation suites, checkpointing, and — new here —
mesh-parallel scale-out and batched inverse-design screening.
"""

from .config import (
    DataConfig,
    PiGanConfig,
    apply_overrides,
    default_config,
)

__version__ = "0.1.0"

__all__ = [
    "DataConfig",
    "PiGanConfig",
    "apply_overrides",
    "default_config",
    "__version__",
]
