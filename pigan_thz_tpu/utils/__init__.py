from .logging import RunLogger
from .seed import set_seed

__all__ = ["RunLogger", "set_seed"]
