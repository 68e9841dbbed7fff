"""BSS algorithm families (populated bottom-up; see SURVEY.md §7).

Parity: the reference eagerly imports ica/fdica/iva/ilrma/mnmf
(ssspy/bss/__init__.py:1-3); the rest are importable submodules.
"""

from . import admmbss, cacgmm, fdica, hva, ica, ilrma, ipsdta, iva, mnmf, pdsbss, proxbss
from .base import IterativeMethodBase

__all__ = [
    "ica",
    "fdica",
    "iva",
    "ilrma",
    "ipsdta",
    "mnmf",
    "proxbss",
    "pdsbss",
    "admmbss",
    "hva",
    "cacgmm",
    "IterativeMethodBase",
]
