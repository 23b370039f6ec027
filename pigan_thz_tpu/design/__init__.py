from .inverse import DesignResult, InverseDesigner
from .screening import (
    METRIC_INDEX,
    ScreeningConfig,
    ScreeningResult,
    screen_designs,
)

__all__ = [
    "DesignResult",
    "InverseDesigner",
    "METRIC_INDEX",
    "ScreeningConfig",
    "ScreeningResult",
    "screen_designs",
]
