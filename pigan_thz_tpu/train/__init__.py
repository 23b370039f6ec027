from . import checkpoint, programs, schedules
from .state import (
    ForwardState,
    ModelState,
    PiGanState,
    init_forward_state,
    init_pigan_state,
    make_optimizers,
)
from .steps import (
    ForwardStepSettings,
    StepSettings,
    make_epoch_fn,
    make_forward_step,
    make_multi_epoch_fn,
    make_pigan_step,
)
from .trainer import Trainer

__all__ = [
    "ForwardState",
    "ForwardStepSettings",
    "ModelState",
    "PiGanState",
    "StepSettings",
    "Trainer",
    "checkpoint",
    "init_forward_state",
    "init_pigan_state",
    "make_epoch_fn",
    "make_forward_step",
    "make_multi_epoch_fn",
    "make_optimizers",
    "make_pigan_step",
    "programs",
    "schedules",
]
