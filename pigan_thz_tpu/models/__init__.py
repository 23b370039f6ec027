from .discriminator import (
    ConvDiscriminator,
    DualEncoderDiscriminator,
    MLPDiscriminator,
    MultiScaleDiscriminator,
)
from .forward_model import (
    BranchedForwardModel,
    ForwardMLP,
    PhysicsForwardModel,
    UncertaintyForwardModel,
    mc_dropout_predict,
    sample_predictions,
)
from .generator import ConvAttnGenerator, MLPGenerator, ResidualGenerator
from .registry import build_discriminator, build_forward_model, build_generator, build_trio

__all__ = [
    "ConvAttnGenerator",
    "ConvDiscriminator",
    "BranchedForwardModel",
    "DualEncoderDiscriminator",
    "ForwardMLP",
    "MLPDiscriminator",
    "MLPGenerator",
    "MultiScaleDiscriminator",
    "PhysicsForwardModel",
    "ResidualGenerator",
    "UncertaintyForwardModel",
    "build_discriminator",
    "build_forward_model",
    "build_generator",
    "build_trio",
    "mc_dropout_predict",
    "sample_predictions",
]
