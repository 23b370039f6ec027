from .evaluator import Evaluator
from .report import generate_summary_report

__all__ = ["Evaluator", "generate_summary_report"]
