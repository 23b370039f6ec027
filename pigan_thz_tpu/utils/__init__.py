from .logging import RunLogger
from .profiling import StepTimer, device_memory_stats, trace
from .seed import set_seed
from .tensorboard import TfEventsWriter

__all__ = [
    "RunLogger", "StepTimer", "TfEventsWriter", "device_memory_stats",
    "set_seed", "trace",
]
