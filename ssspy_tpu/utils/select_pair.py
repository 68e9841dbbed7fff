"""Pair-selection schedules for pairwise (IP2/ISS2) updates.

Parity: ssspy/utils/select_pair.py:5-76. These run at trace time and
produce static Python pair lists that unroll into the compiled program.
"""

import itertools
from typing import Iterable, Optional, Tuple


def sequential_pair_selector(
    n_sources: int, stop: Optional[int] = None, step: int = 1, sort: bool = False
) -> Iterable[Tuple[int, int]]:
    """Yield cyclic neighbor pairs ``(m, m+1 mod N)`` for ``m`` in ``range(0, stop, step)``."""
    if stop is None:
        stop = n_sources

    for m in range(0, stop, step):
        m, n = m % n_sources, (m + 1) % n_sources
        if sort:
            m, n = (n, m) if m > n else (m, n)
        yield m, n


def combination_pair_selector(n_sources: int, sort: bool = False) -> Iterable[Tuple[int, int]]:
    """Yield all unordered source pairs ``(m, n)`` with ``m < n``."""
    for m, n in itertools.combinations(range(n_sources), 2):
        if sort:
            m, n = (n, m) if m > n else (m, n)
        yield m, n
