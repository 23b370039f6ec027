from .screening import (
    METRIC_INDEX,
    ScreeningConfig,
    ScreeningResult,
    screen_designs,
)

__all__ = ["METRIC_INDEX", "ScreeningConfig", "ScreeningResult", "screen_designs"]
