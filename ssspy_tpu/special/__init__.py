from .flooring import (EPS, F32_EPS, add_flooring, dtype_flooring, identity, max_flooring, resolve_flooring_spec)
from .logsumexp import logsumexp
from .psd import to_psd
from .softmax import softmax

__all__ = [
    "EPS",
    "add_flooring",
    "identity",
    "dtype_flooring",
    "resolve_flooring_spec",
    "F32_EPS",
    "max_flooring",
    "to_psd",
    "softmax",
    "logsumexp",
]
