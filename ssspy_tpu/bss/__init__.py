"""BSS algorithm families (populated bottom-up; see SURVEY.md §7)."""

from . import iva
from .base import IterativeMethodBase

__all__ = ["iva", "IterativeMethodBase"]
