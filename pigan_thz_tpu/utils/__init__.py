from .logging import RunLogger
from .profiling import StepTimer, device_memory_stats, trace
from .seed import set_seed

__all__ = ["RunLogger", "StepTimer", "device_memory_stats", "set_seed", "trace"]
