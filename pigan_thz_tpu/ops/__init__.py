from . import losses, metrics, peaks

__all__ = ["losses", "metrics", "peaks"]
